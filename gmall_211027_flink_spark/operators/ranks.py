"""Distributed global ranks: the two-level (bucket-grid + within-bucket)
rank that replaces single-task ``row_number() OVER (ORDER BY ...)``.

A global window with no PARTITION BY moves the whole input to one task
— the classic 100 TB killer that tests/test_plan_quality.py's
unpartitioned-Window sweep now gates.  But exact global ranks ARE the
published semantic of several operators (order statistics, systematic
sampling, pooled-ECDF tests).  The scalable equivalent is two-level:

1. bucket every row by a COARSE, ORDER-MONOTONE key (price band,
   length value, key block) — the bucket domain is bounded by the
   VALUE domain, not the row count;
2. aggregate per-bucket counts (and any running-sum inputs) and sweep
   an exclusive prefix over that bounded grid (a global window whose
   input is an Aggregate — exactly what the plan gate permits);
3. rank within each bucket with a PARTITIONED window and add the
   bucket's prefix offset.

The result is bit-identical to the single-task form (same total order,
same tie behavior) while the only per-row windows are partitioned and
the only global window runs over the grid.  Reference parity anchor:
the reference's BI layer has no global-rank operator at all (its ADS
tier pre-aggregates); this helper exists for the beyond-reference
statistics family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grid_rank(df: DataFrame, order_cols: list[str], bucket: Column,
              part_cols: tuple[str, ...] = (),
              cums: dict[str, Column] | None = None,
              out_rk: str = "rk") -> DataFrame:
    """Append ``out_rk`` = row_number() over (ORDER BY *order_cols*)
    [within *part_cols*] computed two-level, plus (optionally) INCLUSIVE
    running sums of the ``cums`` expressions in the same order.

    ``bucket`` must be a function of ``order_cols[0]`` that is monotone
    non-decreasing in it (equal order values land in the same bucket),
    so bucket order refines value order and the two-level rank equals
    the global one exactly.
    """
    cums = cums or {}
    b = df.withColumn("_grb", bucket)
    for name, expr in cums.items():
        b = b.withColumn(f"_grc_{name}", expr)
    aggs = [F.count("*").alias("_grn")]
    aggs += [F.sum(f"_grc_{n}").alias(f"_grs_{n}") for n in cums]
    per = b.groupBy(*part_cols, "_grb").agg(*aggs)
    # exclusive prefix over the bounded bucket grid: the ONE global
    # window, and its input is the Aggregate above — plan-gate clean
    wg = (Window.partitionBy(*part_cols).orderBy("_grb")
          .rowsBetween(Window.unboundedPreceding, -1))
    sel = [*part_cols, "_grb",
           F.coalesce(F.sum("_grn").over(wg), F.lit(0))
           .cast("bigint").alias("_groff")]
    for n in cums:
        sel.append(F.coalesce(F.sum(f"_grs_{n}").over(wg), F.lit(0))
                   .cast("bigint").alias(f"_grof_{n}"))
    offs = per.select(*sel)
    ww = Window.partitionBy(*part_cols, "_grb").orderBy(*order_cols)
    wwi = ww.rowsBetween(Window.unboundedPreceding, 0)
    # No broadcast hint on the offset grid (ADVICE r12): the grid is
    # usually value-bounded and AQE will broadcast it on its own, but a
    # KEY-BLOCK bucketing makes the grid data-proportional — an
    # unconditional F.broadcast would OOM the driver at 100 TB.  Left
    # unhinted, AQE picks broadcast for small grids and a shuffle join
    # (which reuses the (_grb) partitioning the within-bucket window
    # needs anyway) for large ones.  Callers must still keep the grid
    # count-capped (see sampling.py's CDF-capped block width) so the
    # prefix sweep above stays bounded.
    res = (b.join(offs, [*part_cols, "_grb"])
           .withColumn(out_rk,
                       (F.col("_groff") + F.row_number().over(ww))
                       .cast("bigint")))
    for n in cums:
        res = res.withColumn(
            n, (F.col(f"_grof_{n}")
                + F.sum(f"_grc_{n}").over(wwi)).cast("bigint"))
    drop = (["_grb", "_groff"]
            + [f"_grc_{n}" for n in cums]
            + [f"_grof_{n}" for n in cums])
    return res.drop(*drop)
