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


# ---------------------------------------------------------------------------
# Driver-gated form of the 5-way split (P7): behavior-log JSON lines are
# synthesized from events in deterministic classes (event_id % 7: 0 ->
# err, 1 -> start, else a page log carrying event_id % 3 displays and
# event_id % 2 actions), run through parse_log + split_log, and each
# stream's (row count, common.mid checksum) must match the class
# arithmetic the oracle derives from events directly. The mid checksum
# rides through the array explodes, proving parent-context enrichment
# (BaseLogApp.java:160-188), not just routing.
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from gmall_211027_flink_spark.catalog import load_table  # noqa: E402
from gmall_211027_flink_spark.registry import query  # noqa: E402


@query(
    "dwd_log_split_fanout",
    oracle="""
    SELECT 'err' AS stream, COUNT(*) AS row_ct,
           CAST(SUM(user_id) AS BIGINT) AS mid_sum
    FROM events WHERE event_id % 7 = 0
    UNION ALL
    SELECT 'start', COUNT(*), CAST(SUM(user_id) AS BIGINT)
    FROM events WHERE event_id % 7 = 1
    UNION ALL
    SELECT 'page', COUNT(*), CAST(SUM(user_id) AS BIGINT)
    FROM events WHERE event_id % 7 NOT IN (0, 1)
    UNION ALL
    SELECT 'display', CAST(SUM(event_id % 3) AS BIGINT),
           CAST(SUM(user_id * (event_id % 3)) AS BIGINT)
    FROM events WHERE event_id % 7 NOT IN (0, 1)
    UNION ALL
    SELECT 'action', CAST(SUM(event_id % 2) AS BIGINT),
           CAST(SUM(user_id * (event_id % 2)) AS BIGINT)
    FROM events WHERE event_id % 7 NOT IN (0, 1)
    """,
)
def dwd_log_split_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cls = F.col("event_id") % 7
    common = F.struct(
        F.lit("ar1").alias("ar"), F.lit("b").alias("ba"),
        F.lit("ch").alias("ch"), F.lit("1").alias("is_new"),
        F.lit("md").alias("md"),
        F.col("user_id").cast("string").alias("mid"),
        F.lit("os").alias("os"),
        F.col("user_id").cast("string").alias("uid"),
        F.lit("v1").alias("vc"))
    page = F.struct(
        F.lit(5).cast("long").alias("during_time"),
        F.lit("i").alias("item"), F.lit("sku").alias("item_type"),
        F.lit(None).cast("string").alias("last_page_id"),
        F.col("event_type").alias("page_id"),
        F.lit("promo").alias("source_type"))
    # if() guard: Spark's sequence(1, 0) infers step -1 and yields
    # [1, 0] — the same trap documented at _shingle_arrays
    display = F.expr(
        "transform(if(event_id % 3 >= 1,"
        "   sequence(1, int(event_id % 3)), cast(array() as array<int>)),"
        " i -> named_struct('display_type', 'promo', 'item',"
        "   cast(event_id as string), 'item_type', 'sku',"
        "   'pos_id', cast(i as string), 'order', cast(i as string)))")
    action = F.expr(
        "transform(if(event_id % 2 >= 1,"
        "   sequence(1, int(event_id % 2)), cast(array() as array<int>)),"
        " i -> named_struct('action_id', 'cart', 'item',"
        "   cast(event_id as string), 'item_type', 'sku',"
        "   'ts', unix_millis(ts) + i))")
    start_s = F.struct(F.lit("icon").alias("entry"),
                       F.lit(100).cast("long").alias("loading_time"),
                       F.lit("ad1").alias("open_ad_id"))
    err_s = F.struct(F.lit("E42").alias("error_code"),
                     F.lit("boom").alias("msg"))
    empty_disp = "cast(array() as array<struct<display_type:string," \
        "item:string,item_type:string,pos_id:string,order:string>>)"
    empty_act = "cast(array() as array<struct<action_id:string," \
        "item:string,item_type:string,ts:bigint>>)"
    raw = ev.select(F.to_json(F.struct(
        common.alias("common"),
        F.when(cls >= 2, page).alias("page"),
        F.when(cls >= 2, display).otherwise(F.expr(empty_disp))
         .alias("displays"),
        F.when(cls >= 2, action).otherwise(F.expr(empty_act))
         .alias("actions"),
        F.when(cls == 1, start_s).alias("start"),
        F.when(cls == 0, err_s).alias("err"),
        F.unix_millis("ts").alias("ts"),
    )).alias("value"))
    clean, _dirty = parse_log(raw)
    streams = split_log(clean)
    mid = F.col("common")["mid"].cast("bigint")

    def agg(name: str) -> DataFrame:
        return streams[name].agg(
            F.count("*").alias("row_ct"),
            F.coalesce(F.sum(mid), F.lit(0)).cast("bigint").alias("mid_sum"),
        ).select(F.lit(name).alias("stream"), "row_ct", "mid_sum")

    out = agg("err")
    for name in ("start", "page", "display", "action"):
        out = out.unionByName(agg(name))
    return out
