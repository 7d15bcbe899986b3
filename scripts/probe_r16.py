"""r16 optimization probes: stage isolation + A/B of candidate shapes,
WITHOUT touching the registered query code (variants are re-implemented
here; the winner gets applied to the operator module and re-measured
through the registered path).

Usage: python scripts/probe_r16.py <probe> [sf_dir]
  probes: minhash | simhash | q21 | snowflake | ann | nulls

Methodology: min-of-3 wall + JVM cpu for the min-wall run, noop sink as
the timed action (guide §1.4), jobs labeled (§1.5). 10x corpora come
from bench.ensure_scale_corpus / ensure_tpch_scale_corpus (cached in
/tmp, same as the bench probes).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from bench import (  # noqa: E402
    _jvm_cpu_seconds, ensure_scale_corpus, ensure_tpch_scale_corpus,
)
from gmall_211027_flink_spark import get_spark  # noqa: E402
from gmall_211027_flink_spark.registry import QUERIES, load_all  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def timed(spark, label, mk, runs=3):
    """min-of-N wall/cpu of a noop-sink execution of mk() (fresh DF per
    run — construction inside the timer, like the bench)."""
    spark.sparkContext.setJobDescription(label)
    best, best_cpu = float("inf"), 0.0
    for _ in range(runs):
        c0 = _jvm_cpu_seconds()
        t0 = time.perf_counter()
        df = mk()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        if wall < best:
            best, best_cpu = wall, _jvm_cpu_seconds() - c0
    spark.sparkContext.setJobDescription(None)
    print(f"{label}: wall {best:.3f}s cpu {best_cpu:.2f}s")
    return best, best_cpu


def executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- minhash
def minhash_variant(spark, sf_dir, shape: str):
    """Verify-side variants for dedup_minhash_lsh.

    shape = "current"  : registered query as-is
            "ckpt_hint": arrs localCheckpoint'ed ONCE + F.broadcast(arrs)
                         hints on both verify joins (keeps the broadcast
                         bet the stats-driven plan makes today)
    """
    from gmall_211027_flink_spark.operators.dedup import (
        JACCARD_THRESHOLD, _shingle_arrays, minhash_bands,
    )
    if shape == "current":
        return QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    bands = minhash_bands(spark, sf_dir).cache()
    wdocs = _shingle_arrays(spark, sf_dir)
    bands.count()
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    ).cache()
    cand.count()
    cand_docs = (cand.select(F.col("doc_a").alias("doc_id"))
                 .union(cand.select("doc_b")).distinct())
    arrs = (wdocs.join(F.broadcast(cand_docs), "doc_id", "left_semi")
            .select("doc_id", "sh_arr"))
    arrs = arrs.localCheckpoint()
    scored = (
        cand
        .join(F.broadcast(arrs.select(F.col("doc_id").alias("doc_a"),
                                      F.col("sh_arr").alias("arr_a"))), "doc_a")
        .join(F.broadcast(arrs.select(F.col("doc_id").alias("doc_b"),
                                      F.col("sh_arr").alias("arr_b"))), "doc_b")
        .select("doc_a", "doc_b",
                F.size(F.array_intersect("arr_a", "arr_b")).alias("i"),
                F.size("arr_a").alias("na"), F.size("arr_b").alias("nb"))
    )
    jac = (F.col("i").cast("double")
           / (F.col("na") + F.col("nb") - F.col("i")).cast("double"))
    return (
        scored.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def probe_minhash(spark, sf_dir):
    probe10 = ensure_scale_corpus(spark, sf_dir)
    for label, d in (("1x", sf_dir), ("10x", probe10)):
        for shape in ("current", "ckpt_hint"):
            rows = sorted(minhash_variant(spark, d, shape)
                          .collect())
            print(f"minhash {shape} {label}: {len(rows)} rows")
            if shape == "current":
                base = rows
            else:
                assert rows == base, f"OUTPUT MISMATCH at {label}"
            timed(spark, f"minhash:{shape}:{label}",
                  lambda d=d, s=shape: minhash_variant(spark, d, s))
        # executed plan of the variant at this scale: join strategies
        plan = executed_plan(minhash_variant(spark, d, "ckpt_hint"))
        joins = [ln.strip()[:90] for ln in plan.splitlines()
                 if "Join" in ln and "+-" in ln or "Join" in ln and ":-" in ln]
        print(f"--- ckpt_hint executed joins at {label}:")
        for j in joins:
            print("   ", j)
        spark.catalog.clearCache()


# ---------------------------------------------------------------- simhash
def simhash_variant(spark, sf_dir, shape: str):
    """shape = "current" | "firstband" (emit each pair only from its
    FIRST matching band: all earlier bands must differ — cuts the
    distinct's input up to 4x; output set identical)."""
    from gmall_211027_flink_spark.operators.dedup import (
        HAMMING_MAX, SIMHASH_BAND_BITS, SIMHASH_BAND_MASK, SIMHASH_BANDS,
        dedup_simhash,
    )
    if shape == "current":
        return dedup_simhash(spark, sf_dir)
    import gmall_211027_flink_spark.operators.dedup as dd
    docs = dd.load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    sig = docs.select(
        "doc_id",
        F.expr(
            "transform(array_distinct(split(text, ' ')),"
            " t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
        ).alias("th"),
    ).select(
        "doc_id",
        F.expr(
            f"aggregate(aggregate(th, array_repeat(0, {dd.SIMHASH_BITS}),"
            f"  (acc, x) -> zip_with(acc, sequence(0, {dd.SIMHASH_BITS - 1}),"
            "   (a, j) -> a + (case when ((x >> j) & 1) = 1 then 1 else -1 end))),"
            " named_struct('j', 0, 's', cast(0 as bigint)),"
            " (st, c) -> named_struct('j', st.j + 1, 's', st.s +"
            "   (case when c > 0 then shiftleft(cast(1 as bigint), st.j)"
            "    else cast(0 as bigint) end)),"
            " st -> st.s)"
        ).alias("simhash"),
    ).cache()
    sig.count()
    bands = spark.range(SIMHASH_BANDS).withColumnRenamed("id", "band_id")
    banded = (
        sig.crossJoin(F.broadcast(bands))
        .withColumn("band_val", F.expr(
            f"(simhash >> cast(band_id * {SIMHASH_BAND_BITS} as int))"
            f" & {SIMHASH_BAND_MASK}"))
    )
    a = banded.alias("a")
    b = banded.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("bigint")
    # unrolled, allocation-free "no earlier band equal" predicate
    h = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    earlier_equal = F.lit(False)
    for j in range(SIMHASH_BANDS - 1):
        band_j_equal = (F.shiftright(h, j * SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit(SIMHASH_BAND_MASK)) == 0)
        earlier_equal = earlier_equal | (
            (F.col("a.band_id") > j) & band_j_equal)
    first_band = ~earlier_equal
    return (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .filter(first_band)
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                hamming.alias("hamming"))
        .filter(F.col("hamming") <= HAMMING_MAX)
        .distinct()
    )


def probe_simhash(spark, sf_dir):
    probe10 = ensure_scale_corpus(spark, sf_dir)
    for label, d in (("1x", sf_dir), ("10x", probe10)):
        base = None
        for shape in ("current", "firstband"):
            n = simhash_variant(spark, d, shape).count()
            print(f"simhash {shape} {label}: {n} rows")
            if base is None:
                base = n
            else:
                assert n == base, f"ROWCOUNT MISMATCH at {label}"
            timed(spark, f"simhash:{shape}:{label}",
                  lambda d=d, s=shape: simhash_variant(spark, d, s))
        spark.catalog.clearCache()
    # exact output equality at 1x (cheap)
    cur = sorted(simhash_variant(spark, sf_dir, "current").collect())
    new = sorted(simhash_variant(spark, sf_dir, "firstband").collect())
    assert cur == new, "OUTPUT MISMATCH at 1x"
    print("simhash: exact output equality at 1x OK")


# ---------------------------------------------------------------- q21
def q21_variant(spark, sf_dir, shape: str):
    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.plans.tpch import LATE_DAYS
    if shape == "current":
        return QUERIES["q21_sole_late_supplier"](spark, sf_dir)
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .filter(F.col("l_suppkey").isNotNull()))
    late = (F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS"))
    ol = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
          .groupBy("l_orderkey", "l_suppkey")
          .agg(F.max(F.when(late, 1).otherwise(0)).alias("is_late")))
    per_order = (ol.groupBy(F.col("l_orderkey").alias("po_orderkey"))
                 .agg(F.count("*").alias("supp_ct"),
                      F.sum("is_late").alias("late_ct")))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ol.filter(F.col("is_late") == 1)
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("supp_ct") >= 2) & (F.col("late_ct") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


def probe_q21(spark, sf_dir):
    probe10 = ensure_tpch_scale_corpus(spark, sf_dir)
    for label, d in (("1x", sf_dir), ("10x", probe10)):
        base = None
        for shape in ("current", "symm"):
            rows = q21_variant(spark, d, shape).collect()
            print(f"q21 {shape} {label}: {len(rows)} rows")
            if base is None:
                base = rows
            else:
                assert rows == base, f"OUTPUT MISMATCH at {label}"
            timed(spark, f"q21:{shape}:{label}",
                  lambda d=d, s=shape: q21_variant(spark, d, s))
        plan = executed_plan(q21_variant(spark, d, "symm"))
        n_reuse = plan.count("ReusedExchange")
        n_agg = plan.count("HashAggregate")
        n_scan_li = plan.count("Scan parquet")
        print(f"q21 symm {label}: ReusedExchange={n_reuse} "
              f"HashAggregate={n_agg} parquetScans={n_scan_li}")


# ------------------------------------------------------------- snowflake
def probe_snowflake(spark, sf_dir):
    """Labeled stage breakdown: scan+join only vs full agg vs noop/count
    gap — is the noop-vs-legacy delta the honest aggregate tail?"""
    q = QUERIES["dim_snowflake_enrich"]
    timed(spark, "snowflake:full_noop", lambda: q(spark, sf_dir))

    def count_timed():
        spark.sparkContext.setJobDescription("snowflake:count")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            q(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        print(f"snowflake:count: wall {best:.3f}s")
    count_timed()
    # the join alone (project to keys, no decimal math)
    from gmall_211027_flink_spark.catalog import load_table
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dim = (s.join(n, s.s_nationkey == n.n_nationkey)
           .join(r, n.n_regionkey == r.r_regionkey)
           .select("s_suppkey", F.col("n_name").alias("nation_name"),
                   F.col("r_name").alias("region_name")))
    timed(spark, "snowflake:join_count_only",
          lambda: li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
          .groupBy("region_name", "nation_name")
          .agg(F.count("*").alias("line_ct")))
    # decimal revenue agg alone, no join
    from gmall_211027_flink_spark.plans.tpch import dec
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    timed(spark, "snowflake:revenue_agg_only",
          lambda: li.groupBy("l_returnflag").agg(F.sum(rev).alias("r")))


# ------------------------------------------------------------------ ann
def probe_ann(spark, sf_dir):
    q = QUERIES["ann_cosine_topk"]
    timed(spark, "ann:full_noop", lambda: q(spark, sf_dir), runs=5)
    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.similarity import (
        N_QUERIES, _with_norm,
    )
    e = _with_norm(load_table(spark, sf_dir, "embeddings"))
    qs = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"),
        F.col("norm").alias("qnorm"))
    c = e.select(F.col("vec_id").alias("neighbor_id"), "emb", "norm")
    dot = F.expr(
        "aggregate(zip_with(qemb, emb, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)")
    timed(spark, "ann:scored_only",
          lambda: c.join(F.broadcast(qs),
                         F.col("neighbor_id") != F.col("query_id"))
          .withColumn("cosine", F.round(dot / (F.col("qnorm") * F.col("norm")), 6))
          .select("query_id", "neighbor_id", "cosine"), runs=5)
    timed(spark, "ann:norm_scan_only",
          lambda: e.select("vec_id", "norm"), runs=5)


# ---------------------------------------------------------- streamstartup
def probe_streamstartup(spark, sf_dir):
    """VERDICT r15 item 9: split the ~1 s fixed availableNow micro-batch
    cost into Spark streaming machinery vs repo operator code. Three
    timings over the SAME sf0.001 events data (min-of-3 after one
    throwaway warm batch each):
      batch_direct   the trivial projection as a plain batch collect
      stream_trivial the same projection through an availableNow
                     file-stream -> memory sink (pure machinery delta)
      stream_repo    a real repo path (tumbling_agg) availableNow
    """
    from gmall_211027_flink_spark.sources.files import stream_events
    from gmall_211027_flink_spark.streaming.windows import tumbling_agg
    d = "/root/testdata/sf0.001"

    def batch_direct():
        from gmall_211027_flink_spark.catalog import load_table
        load_table(spark, d, "events").select("event_id", "user_id").count()

    uid = [0]

    def stream(mk_out, mode):
        uid[0] += 1
        name = f"ss_probe_{uid[0]}"
        src = stream_events(spark, d)
        q = (mk_out(src).writeStream.format("memory").queryName(name)
             .outputMode(mode)
             .trigger(availableNow=True).start())
        q.awaitTermination(600)

    def trivial(src):
        return src.select("event_id", "user_id")

    def repo_path(src):
        return tumbling_agg(
            src, "ts", "10 minutes", "2 seconds", ["event_type"],
            [F.count("*").alias("pv_ct"),
             F.approx_count_distinct("user_id").alias("uv_ct")])

    for label, fn in (("batch_direct", batch_direct),
                      ("stream_trivial", lambda: stream(trivial, "append")),
                      ("stream_repo_tumbling",
                       lambda: stream(repo_path, "complete"))):
        fn()  # warm once
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"streamstartup:{label}: wall {best:.3f}s")


# ----------------------------------------------------------------- nulls
def probe_nulls(spark, sf_dir):
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
              "/root/testdata/sf0.1"):
        li = spark.read.parquet(f"{d}/lineitem.parquet")
        row = li.select(
            F.count("*").alias("n"),
            F.sum(F.col("l_suppkey").isNull().cast("int")).alias("null_supp"),
            F.sum(F.col("l_orderkey").isNull().cast("int")).alias("null_ord"),
        ).collect()[0]
        print(f"{d}: rows={row['n']} null_l_suppkey={row['null_supp']} "
              f"null_l_orderkey={row['null_ord']}")


def main():
    probe = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else SF_DIR
    load_all()
    spark = get_spark(f"probe_r16_{probe}")
    fn = {"minhash": probe_minhash, "simhash": probe_simhash,
          "q21": probe_q21, "snowflake": probe_snowflake,
          "streamstartup": probe_streamstartup,
          "ann": probe_ann, "nulls": probe_nulls}[probe]
    fn(spark, sf_dir)


if __name__ == "__main__":
    main()
