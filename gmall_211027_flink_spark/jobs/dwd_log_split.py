"""BaseLogApp rebuild: one behavior-log stream fanned out to five DWD
streams (SURVEY §2.2 P7/P8).

Reference (app/dwd/log/BaseLogApp.java):
- :45-59  — try-parse JSON, dirty rows to a side output;
- :68-118 — is_new correction via keyed first-visit-date state;
- :126-221 — split into err / start / display / action / page streams;
  array elements (displays, actions) are exploded and enriched with the
  parent's common/page_id/ts.

Spark shape: ONE parsed DataFrame; five filtered/exploded derivatives.
Catalyst prunes the unused struct fields per branch (the log source is
read once per sink in streaming; at 100 TB the five branches share the
scan via foreachBatch fan-out — see ``split_in_foreach_batch``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import LOG_SCHEMA


def parse_log(raw: DataFrame, json_col: str = "value") -> tuple[DataFrame, DataFrame]:
    """P1: parse + dirty split."""
    parsed = raw.withColumn("log", F.from_json(F.col(json_col), LOG_SCHEMA))
    clean = parsed.filter(F.col("log").isNotNull()
                          & F.col("log.ts").isNotNull()).select("log.*")
    dirty = parsed.filter(F.col("log").isNull()
                          | F.col("log.ts").isNull()).select(json_col)
    return clean, dirty


def split_log(log: DataFrame) -> dict[str, DataFrame]:
    """P7: the 5-way fan-out. Returns {stream_name: DataFrame}."""
    err = log.filter(F.col("err").isNotNull())
    no_err = log.drop("err").filter(F.col("err").isNull()) \
        if "err" in log.columns else log
    no_err = log.filter(F.col("err").isNull()).drop("err")

    start = no_err.filter(F.col("start").isNotNull())

    page_side = no_err.filter(F.col("start").isNull()).drop("start")

    display = (
        page_side.filter(F.size("displays") > 0)
        .select("common", F.col("page.page_id").alias("page_id"), "ts",
                F.explode("displays").alias("display"))
        .select("common", "page_id", "ts", "display.*")
    )
    action = (
        page_side.filter(F.size("actions") > 0)
        .select("common", F.col("page.page_id").alias("page_id"),
                F.explode("actions").alias("action"))
        # reference: action rows take the action's own ts (BaseLogApp.java:183-188)
        .select("common", "page_id", "action.*")
    )
    page = page_side.drop("displays", "actions")
    return {"err": err, "start": start, "display": display,
            "action": action, "page": page}


def split_in_foreach_batch(log_batch: DataFrame,
                           sinks: dict[str, object]) -> None:
    """Streaming fan-out: cache the parsed batch once, write all five
    branches from it (one source scan per micro-batch instead of five
    independent streaming queries — the scalable layout for a hot topic)."""
    log_batch = log_batch.cache()
    try:
        for name, df in split_log(log_batch).items():
            sink = sinks.get(name)
            if sink is not None:
                sink(df)  # each sink is a callable taking a batch DataFrame
    finally:
        log_batch.unpersist()
