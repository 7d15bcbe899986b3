"""Query registry: every implemented operator registers a (spark, sf_dir) ->
DataFrame callable plus (when SQL-expressible) a DuckDB oracle SQL string.

This is the single source for ``__spark_entry__.queries()`` /
``oracle_sql()`` — the driver's correctness gate — and for ``bench.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}
BENCH_QUERIES: list[str] = []   # headline queries timed by bench.py


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``.

    ``oracle`` is equivalent ANSI SQL for DuckDB over the same parquet
    tables (views: region nation customer supplier part orders lineitem
    events documents embeddings). Omit only for ops that genuinely can't
    be expressed in SQL (the driver then records a weaker rows-only check).
    """
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if bench:
            BENCH_QUERIES.append(name)
        fn.query_name = name
        return fn
    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import gmall_211027_flink_spark.operators.aggregates  # noqa: F401
    import gmall_211027_flink_spark.operators.joins  # noqa: F401
    import gmall_211027_flink_spark.operators.windows  # noqa: F401
    import gmall_211027_flink_spark.operators.dedup  # noqa: F401
    import gmall_211027_flink_spark.operators.similarity  # noqa: F401
    import gmall_211027_flink_spark.operators.text  # noqa: F401
    import gmall_211027_flink_spark.operators.multimodal  # noqa: F401
    import gmall_211027_flink_spark.operators.asof  # noqa: F401
    import gmall_211027_flink_spark.operators.fuzzy  # noqa: F401
    import gmall_211027_flink_spark.operators.sampling  # noqa: F401
    import gmall_211027_flink_spark.plans.ads  # noqa: F401
    import gmall_211027_flink_spark.sources.cdc  # noqa: F401
    import gmall_211027_flink_spark.streaming.windows  # noqa: F401
