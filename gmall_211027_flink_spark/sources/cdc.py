"""CDC-envelope handling (SURVEY §2.1 S5, §2.2 P1-P6).

The reference consumes a Maxwell CDC envelope over every MySQL business
table ({database, table, type, data MAP<STRING,STRING>,
old MAP<STRING,STRING>} — utils/MyKafkaUtil.java:91-100), then each DWD
job filters by table/type and projects ``data['col']`` with lazy casts
(DwdTradeCartAdd.java:37-59). This module provides the same surface over
any string-typed JSON column (batch or streaming DataFrame alike):

- ``parse_cdc``: from_json into the typed envelope + dirty-record split
  (P1 — reference sends unparseable rows to a side output,
  app/dim/DimApp.java:45-63).
- ``project_table``: table/type predicate + map-key projection with casts
  (P2/P3) — written so Catalyst pushes the table/type filters into the
  scan when the source is columnar.
- ``changed_cols`` / ``delta_int``: old-value change detection (P4/P5 —
  `old['k'] is not null`, new-minus-old increments, and the
  array_contains(map_keys(old),k) form the reference demonstrates in
  src/test/java/com/atguigu/app/ArrayContainsTest.java:26-28).
- ``prune_columns``: config-driven column pruning (P6 —
  TableProcessFunction.java:159-173).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import CDC_ENVELOPE_SCHEMA


def parse_cdc(raw: DataFrame, json_col: str = "value") -> tuple[DataFrame, DataFrame]:
    """Parse a raw JSON string column into the CDC envelope.

    Returns (clean, dirty): rows whose JSON fails to parse (from_json →
    null struct) go to the dirty side, mirroring the reference's side
    output for 脏数据 (dirty data).
    """
    parsed = raw.withColumn("_env", F.from_json(F.col(json_col), CDC_ENVELOPE_SCHEMA))
    clean = parsed.filter(F.col("_env").isNotNull()
                          & F.col("_env.table").isNotNull()).select("_env.*")
    dirty = parsed.filter(F.col("_env").isNull()
                          | F.col("_env.table").isNull()).select(F.col(json_col))
    return clean, dirty


def project_table(env: DataFrame, table: str, types: tuple[str, ...],
                  columns: dict[str, str]) -> DataFrame:
    """Filter one business table + op types out of the envelope and project
    ``data['col']`` into typed columns.

    ``columns`` maps output column name -> cast type (e.g. {"id": "bigint",
    "cart_price": "decimal(16,2)"}), mirroring the per-job select lists of
    dwd/db/* (types from DwdTradeOrderDetail.java:199-244).
    """
    out = [F.col("data")[name].cast(t).alias(name) for name, t in columns.items()]
    return (
        env.filter((F.col("table") == table) & F.col("type").isin(*types))
        .select(*out, "type", "old", "ts")
    )


def changed(env_old: Column, key: str) -> Column:
    """True when an UPDATE changed ``key`` (P5): the old map carries the
    pre-image only for changed columns."""
    return F.array_contains(F.map_keys(env_old), key)


def delta_int(env: DataFrame, key: str) -> Column:
    """Insert → full value; update → new-minus-old increment (P4 —
    DwdTradeCartAdd.java:43 computes the cart-quantity delta).

    Works on the raw envelope (reads ``data[key]``) or on a
    ``project_table`` output (reads the projected column directly)."""
    new_v = (F.col(key) if key in env.columns
             else F.col("data")[key]).cast("int")
    old_v = F.col("old")[key].cast("int")
    return (
        F.when(F.col("type") == "insert", new_v)
        .when(old_v.isNotNull(), new_v - old_v)
        .otherwise(new_v)
    )


def prune_columns(df: DataFrame, sink_columns: list[str]) -> DataFrame:
    """Config-driven pruning: keep only the configured sink columns that
    actually exist on the row (P6)."""
    keep = [c for c in sink_columns if c in df.columns]
    return df.select(*keep)


# ---------------------------------------------------------------------------
# Registered correctness query: envelope round-trip. Orders rows are
# serialized into Maxwell-style envelopes (all values stringified, exactly
# how Maxwell emits MySQL rows), parsed back through parse_cdc +
# project_table, and aggregated — proving the whole S5/P1-P4 path against
# a plain-SQL oracle.
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402
from gmall_211027_flink_spark.catalog import load_table  # noqa: E402
from gmall_211027_flink_spark.registry import query  # noqa: E402


@query(
    "cdc_envelope_roundtrip",
    oracle="""
    SELECT o_orderstatus AS status,
           COUNT(*) AS order_ct,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gmv
    FROM orders
    WHERE o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
    GROUP BY 1
    """,
)
def cdc_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # build Maxwell-style envelopes: every business value is a string in `data`
    raw = orders.select(
        F.to_json(F.struct(
            F.lit("gmall").alias("database"),
            F.lit("order_info").alias("table"),
            F.lit("insert").alias("type"),
            F.unix_millis(F.current_timestamp()).alias("ts"),
            F.create_map(
                F.lit("id"), F.col("o_orderkey").cast("string"),
                F.lit("user_id"), F.col("o_custkey").cast("string"),
                F.lit("order_status"), F.col("o_orderstatus"),
                F.lit("total_amount"),
                F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
                F.lit("priority"), F.col("o_orderpriority"),
            ).alias("data"),
        )).alias("value")
    )
    clean, _dirty = parse_cdc(raw)
    proj = project_table(
        clean, "order_info", ("insert", "update"),
        {"id": "bigint", "user_id": "bigint", "order_status": "string",
         "total_amount": "decimal(18,2)", "priority": "string"},
    )
    return (
        proj.filter(F.col("priority").like("1-%") | F.col("priority").like("2-%"))
        .groupBy(F.col("order_status").alias("status"))
        .agg(F.count("*").alias("order_ct"),
             F.sum("total_amount").cast("double").alias("gmv"))
    )


# ---------------------------------------------------------------------------
# Driver-gated dirty-side query (P1): the reference routes unparseable
# topic_db payloads to a side output ("脏数据", BaseApp/DimApp pattern)
# instead of crashing or dropping them silently. Here a deterministic
# subset of synthesized envelopes is corrupted (truncated JSON), and the
# clean/dirty split must reproduce the arithmetic the oracle derives
# from the corruption rule — proving both that bad payloads never reach
# the clean pipeline and that they are COUNTED, not lost.
# ---------------------------------------------------------------------------

DIRTY_MOD = 37   # orders with o_orderkey % 37 == 0 get truncated JSON


@query(
    "cdc_dirty_side_output",
    oracle=f"""
    SELECT 'clean' AS side, o_orderstatus AS status, COUNT(*) AS row_ct
    FROM orders WHERE o_orderkey % {DIRTY_MOD} <> 0 GROUP BY 1, 2
    UNION ALL
    SELECT 'dirty', NULL, COUNT(*)
    FROM orders WHERE o_orderkey % {DIRTY_MOD} = 0
    """,
)
def cdc_dirty_side_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    env = F.to_json(F.struct(
        F.lit("gmall").alias("database"),
        F.lit("order_info").alias("table"),
        F.lit("insert").alias("type"),
        F.unix_millis(F.current_timestamp()).alias("ts"),
        F.create_map(
            F.lit("id"), F.col("o_orderkey").cast("string"),
            F.lit("order_status"), F.col("o_orderstatus"),
        ).alias("data"),
    ))
    raw = orders.select(
        F.when(F.col("o_orderkey") % DIRTY_MOD == 0,
               F.substring(env, 1, 20))   # truncated -> unparseable
         .otherwise(env).alias("value"))
    clean, dirty = parse_cdc(raw)
    proj = project_table(clean, "order_info", ("insert",),
                         {"id": "bigint", "order_status": "string"})
    return (
        proj.groupBy(F.lit("clean").alias("side"),
                     F.col("order_status").alias("status"))
        .agg(F.count("*").alias("row_ct"))
        .unionByName(
            dirty.agg(F.count("*").alias("row_ct"))
            .select(F.lit("dirty").alias("side"),
                    F.lit(None).cast("string").alias("status"), "row_ct"))
    )


# ---------------------------------------------------------------------------
# Driver-gated old-value delta query (P4 + P5): the reference's cart-add
# job turns an UPDATE's (new - old) quantity into an increment, reading
# the pre-image from the Maxwell `old` map, which carries ONLY changed
# columns (DwdTradeCartAdd.java:43). Envelopes are synthesized from
# lineitem in three deterministic classes — insert, update-with-changed
# -qty, update-where-qty-unchanged (old map lacks the key) — and the
# per-flag delta sums must match the class arithmetic the oracle
# derives directly from lineitem. floor() is applied on BOTH sides
# before int conversion: Spark's string->int CAST truncates while
# DuckDB's rounds, so the raw double never crosses an implicit cast.
# ---------------------------------------------------------------------------

@query(
    "cdc_update_delta",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(SUM(CASE
             WHEN l_linenumber % 2 = 1 THEN CAST(floor(l_quantity) AS BIGINT)
             WHEN l_linenumber % 3 = 0 THEN CAST(floor(l_quantity) AS BIGINT)
             ELSE l_linenumber
           END) AS BIGINT) AS qty_delta_sum,
           COUNT(*) AS event_ct
    FROM lineitem GROUP BY 1
    """,
)
def cdc_update_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.floor("l_quantity").cast("int")
    is_insert = F.col("l_linenumber") % 2 == 1
    qty_unchanged = (~is_insert) & (F.col("l_linenumber") % 3 == 0)
    old_map = (
        F.when(is_insert, F.lit(None).cast("map<string,string>"))
        .when(qty_unchanged, F.create_map(F.lit("coupon"), F.lit("1")))
        .otherwise(F.create_map(
            F.lit("sku_num"),
            (qty - F.col("l_linenumber")).cast("string"))))
    raw = li.select(
        F.to_json(F.struct(
            F.lit("gmall").alias("database"),
            F.lit("cart_info").alias("table"),
            F.when(is_insert, "insert").otherwise("update").alias("type"),
            F.unix_millis(F.current_timestamp()).alias("ts"),
            F.create_map(
                F.lit("id"), F.col("l_orderkey").cast("string"),
                F.lit("flag"), F.col("l_returnflag"),
                F.lit("sku_num"), qty.cast("string"),
            ).alias("data"),
            old_map.alias("old"),
        )).alias("value"))
    clean, _dirty = parse_cdc(raw)
    proj = clean.filter((F.col("table") == "cart_info")
                        & F.col("type").isin("insert", "update"))
    delta = delta_int(proj, "sku_num")
    return (
        proj.select(F.col("data")["flag"].alias("flag"),
                    delta.alias("d"))
        .groupBy("flag")
        .agg(F.sum("d").cast("bigint").alias("qty_delta_sum"),
             F.count("*").alias("event_ct"))
    )


# ---------------------------------------------------------------------------
# Changelog compaction with DELETE TOMBSTONES (S4 + S8): the
# upsert-kafka sink contract — last op per primary key wins, and a
# trailing delete removes the key entirely (Maxwell "delete" rows /
# Kafka null-payload tombstones; reference sink DDL in e.g.
# DwdTradeOrderDetail.java and the Phoenix delete path of
# DimSinkFunction). A deterministic Maxwell changelog is synthesized
# from events ('error' -> delete, 'view' -> insert, else update),
# parsed through the real parse_cdc envelope path, and folded to final
# per-key state — checked against the oracle's direct last-row fold.
#
# Scale: one keyed shuffle (the per-key rank); the fold is the same
# shape ParquetUpsertSink applies per micro-batch, proven here over a
# full replay.
# ---------------------------------------------------------------------------

@query(
    "cdc_tombstone_compaction",
    oracle="""
    WITH ops AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS es,
             CASE WHEN event_type = 'error' THEN 'delete'
                  WHEN event_type = 'view' THEN 'insert'
                  ELSE 'update' END AS op,
             value
      FROM events
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY user_id
               ORDER BY es DESC, event_id DESC) AS rn
      FROM ops
    ),
    agg AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_ops,
             CAST(SUM(CASE WHEN op = 'delete' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_deletes
      FROM ops GROUP BY 1
    )
    SELECT a.user_id, a.n_ops, a.n_deletes,
           CAST(CASE WHEN r.op = 'delete' THEN 0 ELSE 1 END AS BIGINT)
             AS is_live,
           CASE WHEN r.op = 'delete' THEN NULL ELSE r.value END
             AS live_value
    FROM agg a JOIN ranked r ON r.user_id = a.user_id AND r.rn = 1
    """,
)
def cdc_tombstone_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    op = (F.when(F.col("event_type") == "error", "delete")
          .when(F.col("event_type") == "view", "insert")
          .otherwise("update"))
    raw = ev.select(F.to_json(F.struct(
        F.lit("gmall").alias("database"),
        F.lit("user_state").alias("table"),
        op.alias("type"),
        F.unix_millis(F.current_timestamp()).alias("ts"),
        F.create_map(
            F.lit("id"), F.col("user_id").cast("string"),
            F.lit("event_id"), F.col("event_id").cast("string"),
            F.lit("es"), F.unix_timestamp("ts").cast("string"),
            F.lit("val"), F.col("value").cast("string"),
        ).alias("data"),
    )).alias("value"))
    clean, _dirty = parse_cdc(raw)
    ops = (clean.filter(F.col("table") == "user_state")
           .select(F.col("data")["id"].cast("bigint").alias("user_id"),
                   F.col("data")["event_id"].cast("bigint")
                    .alias("event_id"),
                   F.col("data")["es"].cast("bigint").alias("es"),
                   F.col("type").alias("op"),
                   F.col("data")["val"].cast("double").alias("value")))
    w = Window.partitionBy("user_id").orderBy(
        F.desc("es"), F.desc("event_id"))
    ranked = ops.withColumn("rn", F.row_number().over(w))
    agg = (ops.groupBy("user_id")
           .agg(F.count("*").cast("bigint").alias("n_ops"),
                F.sum(F.when(F.col("op") == "delete", 1).otherwise(0))
                 .cast("bigint").alias("n_deletes")))
    last = ranked.filter(F.col("rn") == 1).select(
        F.col("user_id").alias("u2"), "op", "value")
    return (agg.join(last, F.col("user_id") == F.col("u2"))
            .select("user_id", "n_ops", "n_deletes",
                    F.when(F.col("op") == "delete", 0).otherwise(1)
                     .cast("bigint").alias("is_live"),
                    F.when(F.col("op") == "delete",
                           F.lit(None).cast("double"))
                     .otherwise(F.col("value")).alias("live_value")))
