"""Fuzzy (approximate-string) matching — the entity-resolution /
fuzzy-dedup operator a training-data pipeline runs on titles, names and
short identifiers (beyond the reference surface, like the rest of the
dedup family in dedup.py).

Scale design: edit-distance joins can't be equi-joins directly, and the
naive theta form is an all-pairs nested loop. The standard fix is
PIGEONHOLE BLOCKING: to find equal-length strings within edit distance
d, split every string into d+1 segments — two strings within distance d
must agree on at least one segment verbatim (each edit touches at most
one segment). Candidate generation is then d+1 ordinary equi-joins on
(segment_id, segment_value), and the exact `levenshtein` runs only on
candidates — the same bucket-then-verify shape as MinHash-LSH and
SimHash banding. Full recall (not approximate) for substitution-only
pairs; the DuckDB oracle states the raw theta predicate, so the gate
proves the blocked plan loses nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.registry import query


@query(
    "fuzzy_join_customer_names",
    oracle="""
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
    FROM customer a JOIN customer b
      ON a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def fuzzy_join_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer-name pairs within edit distance 1, via 2-projection
    pigeonhole blocking: names are fixed-length, so distance<=1 pairs
    differ by exactly one substitution, which touches exactly one of the
    two CHARACTER-PARITY projections (odd-position chars / even-position
    chars) — candidates must agree on at least one projection verbatim.

    Parity projections instead of contiguous halves on purpose: these
    names share a long constant prefix ('Customer#0...'), so a prefix
    half is one giant block (degenerates to a cross join as the table
    grows), while parity interleaving spreads the high-entropy suffix
    digits across BOTH block keys — block sizes stay small at any SF.
    Segment choice only affects candidate count, never recall."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    seg = c.select(
        "c_custkey", "c_name",
        # chars at positions 1,3,5,... and 2,4,6,... (1-indexed)
        F.regexp_replace(F.col("c_name"), "(.).", "$1").alias("h1"),
        F.regexp_replace(F.expr("substring(c_name, 2)"), "(.).", "$1")
         .alias("h2"),
    )
    cands = None
    for k in ("h1", "h2"):
        a = seg.select(F.col("c_custkey").alias("cust_a"),
                       F.col("c_name").alias("name_a"),
                       F.col(k).alias("blk"))
        b = seg.select(F.col("c_custkey").alias("cust_b"),
                       F.col("c_name").alias("name_b"),
                       F.col(k).alias("blk"))
        j = a.join(b, "blk").filter(F.col("cust_a") < F.col("cust_b")) \
             .select("cust_a", "cust_b", "name_a", "name_b")
        cands = j if cands is None else cands.unionByName(j)
    return (
        cands.distinct()
        .withColumn("edit_dist",
                    F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("edit_dist") <= 1)
    )
