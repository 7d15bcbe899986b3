"""Physical-plan quality gates — the 100 TB design assertions.

Correctness tests prove the small-SF answer; these prove the PLAN is the
one that survives a 1000-executor scale-up: filters reach the parquet
scan, projections prune columns at the reader, small dims broadcast, and
aggregations combine map-side before shuffling.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.operators.bucketing import executed_plan


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    df = (load_table(spark, sf_dir, "orders")
          .filter(F.col("o_orderstatus") == "F")
          .select("o_orderkey", "o_totalprice"))
    df.collect()
    plan = executed_plan(df)
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in plan, plan


def test_column_pruning_reaches_parquet_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    df.collect()
    plan = executed_plan(df)
    # the scan must read ONLY the two projected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:" in plan, plan


def test_dim_join_is_broadcast_not_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey) \
        .select("l_orderkey", "p_brand")
    joined.collect()
    plan = executed_plan(joined)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_aggregation_has_mapside_partial(spark, sf_dir):
    agg = (load_table(spark, sf_dir, "lineitem")
           .groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q")))
    agg.collect()
    plan = executed_plan(agg)
    # two-phase hash aggregate: partial before the exchange, final after
    assert "partial_sum" in plan, plan
    assert "Exchange hashpartitioning(l_returnflag" in plan, plan


def test_whole_stage_codegen_covers_hot_path(spark, sf_dir):
    df = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_quantity") > 10)
          .groupBy("l_returnflag").count())
    df.collect()
    plan = executed_plan(df)
    # codegen'd spans print as "*(n) Operator" in the plan tree; both the
    # scan-side (partial agg + filter) and merge-side must be inside one
    assert "*(1) HashAggregate" in plan and "*(1) Filter" in plan, plan
    assert "*(2) HashAggregate" in plan, plan


def test_partition_pruning_at_scan(spark, sf_dir, tmp_path):
    """Hive-style partition dirs + a partition-key filter: the scan must
    prune at the PARTITION level (PartitionFilters), reading only the
    matching directories — the layout lever for date-partitioned facts."""
    path = str(tmp_path / "li_parted")
    load_table(spark, sf_dir, "lineitem").write.partitionBy(
        "l_returnflag").mode("overwrite").parquet(path)
    df = (spark.read.parquet(path)
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_quantity"))
    df.collect()
    plan = executed_plan(df)
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan, plan
    # the predicate is satisfied by pruning alone — no row-level Filter
    assert "PushedFilters: []" in plan, plan


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """DPP: a filter on the DIM side prunes the partitioned FACT scan at
    runtime (dynamicpruning subquery in the scan's PartitionFilters)."""
    path = str(tmp_path / "orders_parted")
    load_table(spark, sf_dir, "orders").write.partitionBy(
        "o_orderstatus").mode("overwrite").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")],
        "o_orderstatus string, label string")
    # dim-side filter + dim as the broadcast build side — the DPP shape
    joined = (fact.join(F.broadcast(dim.filter(F.col("label") == "finished")),
                        "o_orderstatus")
              .groupBy("label").count())
    joined.collect()
    plan = executed_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan


def test_band_join_binned_avoids_nested_loop(spark, sf_dir):
    """The raw theta band predicate plans as BroadcastNestedLoopJoin
    (all-pairs); the binned rewrite must plan as an equi-join on the bin
    id with the band predicate as a post-join filter."""
    from gmall_211027_flink_spark.operators.joins import band_join_binned

    p = load_table(spark, sf_dir, "part")
    a = p.select("p_partkey", "p_retailprice")
    b = p.select(F.col("p_partkey").alias("b_partkey"),
                 F.col("p_retailprice").alias("b_price"))

    naive = a.join(b, F.abs(a.p_retailprice - F.col("b_price")) <= 0.25)
    assert "NestedLoop" in naive._jdf.queryExecution().executedPlan().toString()

    binned = band_join_binned(a, b, "p_retailprice", "b_price", 0.25)
    binned.collect()
    plan = executed_plan(binned)
    assert "NestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q3_broadcasts_filtered_dim_single_shuffle_join(spark, sf_dir):
    """Q3's only shuffle join should be lineitem⋈orders; the segment-
    filtered customer keyset rides in as a broadcast."""
    from gmall_211027_flink_spark.operators.joins import q3_shipping_priority

    df = q3_shipping_priority(spark, str(sf_dir))
    df.collect()
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    # the segment filter must reach the customer parquet scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan, plan


def test_runtime_bloom_filter_prunes_fact_fact_join(spark, sf_dir):
    """At 100 TB a selective fact⋈fact join should push a runtime bloom
    filter of the selective side's keys into the big side's scan —
    rows that can't match die before the shuffle. Assert Spark injects
    it when the optimizer flags are on (config posture in session.py
    leaves it off by default; this documents the lever)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        o = (load_table(spark, sf_dir, "orders")
             .filter(F.col("o_orderpriority") == "1-URGENT"))
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """Skewed keys are the classic 100 TB join killer. With AQE skew-join
    on, a hot key's oversized shuffle partition must be split at runtime
    (SortMergeJoin marked skew=true reading 'coalesced and skewed') —
    no manual salting needed for moderate skew; the salting helpers in
    operators/joins.py remain the lever for extreme cases."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(200000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7))
             .otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("v"))
        right = spark.range(1000).select(
            F.col("id").alias("k"), F.lit("x").alias("tag"))
        j = left.join(right, "k").groupBy("tag").count()
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ivf_cell_layout_prunes_probe_scan(spark, sf_dir, tmp_path):
    """The IVF scale path end-to-end: write the embedding corpus
    PARTITIONED BY its cell assignment, then probe two cells — the scan
    must prune at the partition level (reads NPROBE/K of the data; at
    100 TB this is the difference between touching 2 directories and
    the whole corpus). Cell assignment reuses ann_ivf_probe's layout
    (deterministic first-K centroids)."""
    from gmall_211027_flink_spark.operators.similarity import K_CENTROIDS

    e = (load_table(spark, str(sf_dir), "embeddings")
         .withColumn("emb", F.expr("transform(embedding, x -> cast(x as double))"))
         .withColumn("da", F.expr(
             "aggregate(emb, cast(0 as double), (acc, x) -> acc + x * x)")))
    cen = (e.filter(F.col("vec_id") < K_CENTROIDS)
           .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"),
                   F.col("da").alias("dc")))
    dot = F.expr("aggregate(zip_with(emb, cemb, (x, y) -> x * y),"
                 " cast(0 as double), (acc, x) -> acc + x)")
    from pyspark.sql import Window
    wcell = Window.partitionBy("vec_id").orderBy("d2", "cid")
    cells = (e.crossJoin(F.broadcast(cen))
             .withColumn("d2", F.col("da") - 2 * dot + F.col("dc"))
             .withColumn("crk", F.row_number().over(wcell))
             .filter(F.col("crk") == 1)
             .select("vec_id", "embedding", F.col("cid").alias("cell")))
    path = str(tmp_path / "ivf_corpus")
    cells.write.partitionBy("cell").mode("overwrite").parquet(path)

    probe = (spark.read.parquet(path)
             .filter(F.col("cell").isin(2, 5))
             .select("vec_id", "embedding"))
    probe.collect()
    plan = executed_plan(probe)
    assert "PartitionFilters: [cell" in plan, plan
    assert "PushedFilters: []" in plan, plan


def test_q13_left_join_stays_left_with_condition_filter(spark, sf_dir):
    """Q13's priority filter lives in the JOIN CONDITION; if it ever
    migrates to a WHERE the left join silently turns inner and
    zero-order customers vanish — assert the plan keeps LeftOuter."""
    from gmall_211027_flink_spark.plans.tpch import q13_order_count_distribution

    df = q13_order_count_distribution(spark, str(sf_dir))
    df.collect()
    plan = executed_plan(df)
    assert "LeftOuter" in plan, plan


def test_q16_blacklist_is_broadcast_anti_join(spark, sf_dir):
    """Q16's negative-acctbal supplier exclusion must be a broadcast
    anti-join (the blacklist is dim-sized at every scale), never a
    shuffled one."""
    from gmall_211027_flink_spark.plans.tpch import q16_supplier_count_by_part

    df = q16_supplier_count_by_part(spark, str(sf_dir))
    df.collect()
    plan = executed_plan(df)
    anti_lines = [ln for ln in plan.splitlines()
                  if "LeftAnti" in ln and "BroadcastHashJoin" in ln]
    assert anti_lines, plan
    assert "LessThan(s_acctbal,0.0)" in plan, plan


def test_q21_single_orderkey_shuffle_no_self_joins(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS double correlation is reformulated as one
    per-(order,supplier) aggregation: the plan must not contain the two
    extra lineitem self-joins the literal translation would carry. The
    only joins are lineitem⋈orders (shuffle) + two broadcasts
    (per-order counts, supplier names)."""
    from gmall_211027_flink_spark.plans.tpch import q21_sole_late_supplier

    df = q21_sole_late_supplier(spark, str(sf_dir))
    df.collect()
    # optimized LOGICAL plan: li⋈orders (printed twice — the ol subtree
    # feeds both branches; the physical plan reuses the exchange),
    # ol⋈per_order, ⋈supplier = 4 Join nodes. The literal
    # EXISTS/NOT-EXISTS translation adds a LeftSemi and a LeftAnti
    # lineitem self-join on top — 6+.
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    n_joins = sum(1 for ln in logical.splitlines() if "Join " in ln)
    assert n_joins <= 4, f"{n_joins} joins\n{logical}"
    assert "LeftSemi" not in logical and "LeftAnti" not in logical, logical


def test_q19_derives_pushed_prefilters_from_disjunction(spark, sf_dir):
    """Q19's OR-of-ANDs must still prune both scans: Catalyst derives
    the brand-union filter onto part and the quantity envelope onto
    lineitem before the join evaluates the full disjunction."""
    from gmall_211027_flink_spark.plans.tpch import q19_disjunctive_revenue

    df = q19_disjunctive_revenue(spark, str(sf_dir))
    df.collect()
    # use the optimized LOGICAL plan: physical FileScan lines truncate
    # long filter lists mid-literal ("= Brand..."), which made a string
    # assertion on them order-dependent across the suite. A Filter
    # sitting directly on each relation is what becomes the scan's
    # pushed filters.
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    part_filter = [ln for ln in logical.splitlines()
                   if "Filter" in ln and "p_brand" in ln]
    li_filter = [ln for ln in logical.splitlines()
                 if "Filter" in ln and "l_quantity" in ln]
    # per-branch brand predicates are derivable on the part side alone
    assert part_filter and all("Brand#12" in ln for ln in part_filter), logical
    # the derived quantity envelope prunes the lineitem side pre-join
    assert li_filter, logical


def test_scd2_windows_share_one_exchange_and_sort(spark, sf_dir):
    """dim_scd2_history chains the change-collapse lag and the interval
    lead over the SAME (pk, ts, seq, status) order: the plan must carry
    exactly one Exchange and one Sort — a second shuffle or re-sort per
    window would double the cost of every SCD2 rebuild at scale."""
    from gmall_211027_flink_spark.operators.windows import dim_scd2_history

    df = dim_scd2_history(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    # under AQE the string carries Final AND Initial sections: count only
    # the final (executed) one
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final
    assert final.count("Sort [") == 1, final


def test_q8_dims_broadcast_filters_pushed(spark, sf_dir):
    """q8_market_share: every dim-chain join must be broadcast (no
    SortMergeJoin against region/nation/supplier/part/customer) and the
    selective filters must reach the scans."""
    from gmall_211027_flink_spark.plans.tpch import q8_market_share

    df = q8_market_share(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "EqualTo(p_type,ECONOMY)" in plan, plan
    assert "EqualTo(r_name,AMERICA)" in plan, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan
    # the only permissible SortMergeJoin is lineitem-orders (fact-fact);
    # at this SF AQE broadcasts it, so there should be none at all
    assert "BroadcastHashJoin" in plan, plan


def test_like_prefix_filter_pushes_to_scan(spark, sf_dir):
    """LIKE 'x%' must reach the parquet reader as StringStartsWith —
    prefix predicates are min/max-stat skippable at the row-group level,
    which at 100 TB is the difference between scanning a partition and
    skipping it."""
    df = (load_table(spark, sf_dir, "orders")
          .filter(F.col("o_orderpriority").like("1-%"))
          .select("o_orderkey"))
    df.collect()
    plan = executed_plan(df)
    assert "StringStartsWith(o_orderpriority,1-)" in plan, plan


def test_jl_projection_is_shuffle_free(spark, sf_dir):
    """project_embeddings must be a pure map stage: no Exchange, no UDF."""
    from gmall_211027_flink_spark.operators.semdedup import project_embeddings
    from gmall_211027_flink_spark.operators.similarity import _with_norm
    e = _with_norm(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "emb")
    p = project_embeddings(e)
    p.collect()
    plan = executed_plan(p)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_semdedup_pair_join_is_cluster_keyed_hash_join(spark, sf_dir):
    """The quadratic comparison must be an equi-join on the cluster key,
    never a cartesian/nested-loop over the corpus."""
    from gmall_211027_flink_spark.operators.semdedup import semdedup_prune
    df = semdedup_prune(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan


def test_pagerank_iteration_joins_stay_keyed(spark, sf_dir):
    from gmall_211027_flink_spark.operators.graph import (
        graph_pagerank_copurchase)
    df = graph_pagerank_copurchase(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    # final iteration: contribution join keyed by node, no nested loop
    # (the only BroadcastNestedLoop allowed is the 1-row n_nodes attach)
    assert "CartesianProduct" not in plan, plan


def test_bm25_broadcast_joins_and_group_limited_topk(spark, sf_dir):
    """The inverted-index claim: df/query-map/corpus-stats sides all
    broadcast (no SortMergeJoin — the only exchanges are the postings
    tf aggregation and the final per-query rank), and the top-k rank is
    group-limit-pushed (WindowGroupLimit) so no partition materializes
    more than k rows per query."""
    from gmall_211027_flink_spark.operators.search import text_bm25_search
    df = text_bm25_search(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_span_dedup_single_constant_key_shuffle(spark, sf_dir):
    """Span dedup must not join doc contents — only constant-size md5
    keys shuffle, and island merging is a per-doc window (partitioned
    sort, never a global one)."""
    from gmall_211027_flink_spark.operators.search import dedup_span_exact
    df = dedup_span_exact(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the islands window partitions by doc_id (no single-partition sort)
    assert "windowspecdefinition(doc_id" in plan.replace(" ", "") \
        or "Window" in plan, plan


def test_behavior_funnel_windows_share_one_user_sort(spark, sf_dir):
    """The funnel's two window passes must share ONE user_id
    exchange+sort (Catalyst collapses same-partitioning windows) —
    i.e. per plan copy (AQE prints initial+final), exactly one user_id
    exchange, one user_id sort, and TWO Window nodes stacked on it."""
    from gmall_211027_flink_spark.plans.behavior import ads_window_funnel
    df = ads_window_funnel(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    n_ex = plan.count("Exchange hashpartitioning(user_id")
    n_sort = plan.count("Sort [user_id")
    n_win = plan.count("Window [max(")
    assert n_ex >= 1 and n_sort == n_ex and n_win == 2 * n_sort, \
        (n_ex, n_sort, n_win, plan)


def test_pipeline_manifest_no_cartesian_no_sortmerge(spark, sf_dir):
    """The composed curation pipeline stays broadcast/keyed end to end."""
    from gmall_211027_flink_spark.plans.pipeline import (
        pipeline_training_manifest)
    df = pipeline_training_manifest(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan


def test_int8_quant_audit_is_shuffle_free(spark, sf_dir):
    """Quantization is a pure map stage: zero exchanges, zero Python."""
    from gmall_211027_flink_spark.operators.similarity import (
        embedding_int8_quant_audit)
    df = embedding_int8_quant_audit(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_winnowing_no_cartesian_and_keyed_window(spark, sf_dir):
    """Winnowing's only cross-document stage must be the fingerprint
    equi-join (stop-gram capped) — no cartesian/nested-loop anywhere,
    and the rolling window min is per-document, not a global sort."""
    from gmall_211027_flink_spark.operators.dedup import (
        dedup_winnowing_fingerprints)
    df = dedup_winnowing_fingerprints(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_tfidf_cosine_postings_equi_join(spark, sf_dir):
    """The sparse dot-product must be a term-keyed equi-join over the
    idf-capped postings — never a doc-pair cartesian."""
    from gmall_211027_flink_spark.operators.dedup import dedup_tfidf_cosine
    df = dedup_tfidf_cosine(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan


def test_span_multiscale_per_doc_windows_no_cartesian(spark, sf_dir):
    """The pyramid shuffles (width, md5) keys once and merges intervals
    per document — no cartesian, windows partitioned by doc."""
    from gmall_211027_flink_spark.operators.search import (
        dedup_span_multiscale)
    df = dedup_span_multiscale(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_quota_per_source_uses_window_group_limit(spark, sf_dir):
    """The per-source top-N cut must be WindowGroupLimit-pruned (each
    partition keeps <= quota rows before the final sort), not a full
    materialize-then-filter."""
    from gmall_211027_flink_spark.operators.curation import (
        curation_quota_per_source)
    df = curation_quota_per_source(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "WindowGroupLimit" in plan, plan


def test_zorder_write_path_single_range_exchange(spark, sf_dir, tmp_path):
    """The z-order write path must be exactly ONE range exchange on zval
    with the bit-interleave computed map-side (VERDICT r6 #7): no hash
    shuffle, no second exchange, and a within-partition (non-global)
    sort on zval. At 100 TB an accidental extra exchange or global sort
    here doubles the most expensive stage of the layout job."""
    from gmall_211027_flink_spark.operators.bucketing import zorder_write_path

    base = (load_table(spark, str(sf_dir), "lineitem")
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"))
    ext = base.agg(
        F.min("l_partkey"), F.greatest(F.max("l_partkey") - F.min("l_partkey"), F.lit(1)),
        F.min("l_suppkey"), F.greatest(F.max("l_suppkey") - F.min("l_suppkey"), F.lit(1)),
    ).first()
    out = zorder_write_path(base, "l_partkey", "l_suppkey",
                            ext[0], ext[1], ext[2], ext[3], num_files=8)
    path = str(tmp_path / "zorder_layout")
    out.write.mode("overwrite").parquet(path)
    plan = executed_plan(out)
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(exchanges) == 1, plan
    assert "rangepartitioning(zval" in exchanges[0], plan
    assert "hashpartitioning" not in plan, plan
    # the sort must be within-partition (global=false), not a global sort
    sorts = [ln for ln in plan.splitlines() if "Sort [zval" in ln]
    assert sorts and all("false" in ln for ln in sorts), plan
    # and the files written under the single exchange are range-disjoint
    # in zval — file i's max below file i+1's min
    import glob as _glob
    spans = []
    for f in sorted(_glob.glob(f"{path}/part-*.parquet")):
        pf = spark.read.parquet(f).agg(F.min("zval"), F.max("zval")).first()
        if pf[0] is not None:
            spans.append((pf[0], pf[1]))
    spans.sort()
    assert len(spans) > 1
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, spans


def test_salted_join_spreads_key_across_shuffle(spark, sf_dir):
    """The salted join must shuffle on (key, salt) — the whole point is
    that a hot key's rows hash to n_salts different reducers. Broadcast
    is disabled to force the shuffle plan (at real scale the dim is too
    big to broadcast — that's when salting is reached for)."""
    from gmall_211027_flink_spark.operators.joins import salted_join

    saved = {}
    for k, v in {"spark.sql.autoBroadcastJoinThreshold": "-1",
                 "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        ev = load_table(spark, str(sf_dir), "events").select(
            "event_id", "user_id", "value")
        cust = load_table(spark, str(sf_dir), "customer").select(
            "c_custkey", "c_nationkey")
        j = salted_join(ev, cust, "user_id", "c_custkey", "event_id")
        out = j.groupBy("c_nationkey").count()
        out.collect()
        plan = executed_plan(out)
        # a shuffle join (not broadcast) whose keys include the salt
        assert "BroadcastHashJoin" not in plan, plan
        join_lines = [ln for ln in plan.splitlines()
                      if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln]
        assert join_lines, plan
        assert any("_salt" in ln for ln in join_lines), plan
        assert any("user_id" in ln for ln in join_lines), plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_prefilter_broadcasts_bit_positions(spark, sf_dir):
    """The bloom membership test must be k BROADCAST left-semi joins on
    the bit-position table (the whole point: the fact side is pruned
    with zero extra shuffles before the exact join), and nothing in the
    plan may degenerate to a cartesian product."""
    from gmall_211027_flink_spark.operators.joins import (
        BLOOM_K, join_bloom_prefilter)

    out = join_bloom_prefilter(spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    assert "CartesianProduct" not in plan, plan
    semis = [ln for ln in plan.splitlines()
             if "BroadcastHashJoin" in ln and "LeftSemi" in ln]
    assert len(semis) >= BLOOM_K, plan


def test_link_prediction_no_cartesian_and_capped_wedges(spark, sf_dir):
    """Wedge generation must stay posting-list shaped: equi-joins only
    (no cartesian), and the hub cap must appear as a size() filter on
    the collected adjacency so fan-out is bounded at plan level."""
    from gmall_211027_flink_spark.operators.graph import (
        graph_link_prediction)

    out = graph_link_prediction(spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "size(ps" in plan, plan


def test_edit_distance_join_is_equi_on_block_key(spark, sf_dir):
    """The ER self-join must be an equi-join on the prefix block key —
    a cartesian with a levenshtein residual would be the classic
    quadratic blow-up this operator exists to avoid."""
    from gmall_211027_flink_spark.operators.dedup import (
        dedup_edit_distance_banded)

    out = dedup_edit_distance_banded(spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_dynamic_partition_pruning_subquery_on_fact_scan(spark, sf_dir, tmp_path):
    """The dt filter that arrives FROM THE DIM at runtime must reach the
    fact scan as a dynamicpruning subquery (DPP), not as a post-scan
    join residual — at 100 TB this is the difference between scanning
    6 partition directories and scanning all of them. Companion to the
    static PartitionFilters gate (source_partitioned_pruning)."""
    from gmall_211027_flink_spark.sources.files import (
        read_dpp_pruned_join, write_events_dt_dim, write_partitioned_events)

    write_partitioned_events(spark, str(sf_dir), str(tmp_path / "fact"))
    write_events_dt_dim(spark, str(sf_dir), str(tmp_path / "dim"))
    out = (read_dpp_pruned_join(spark, str(tmp_path / "fact"),
                                str(tmp_path / "dim"))
           .groupBy("event_type").agg(F.count("*").alias("n")))
    out.collect()
    plan = executed_plan(out)
    assert "dynamicpruning#" in plan, plan
    assert "SubqueryBroadcast" in plan or "SubqueryAdaptiveBroadcast" in plan, plan
    # and the dim side must still broadcast (the subquery reuses it)
    assert "BroadcastHashJoin" in plan, plan


def test_pca_scatter_is_mapside_partial_no_selfjoin(spark, sf_dir):
    """The scatter matrix must come from per-vector outer products that
    collapse in a map-side partial aggregate — a vec_id self-join of
    the long form would shuffle n*d rows twice and explode to n*d^2 at
    the join; the only exchange should carry d^2-keyed partials, and
    every join in the whole plan (moments + iteration) must broadcast."""
    from gmall_211027_flink_spark.operators.pca import (
        embedding_pca_power_iteration)

    out = embedding_pca_power_iteration(spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    assert "partial_sum" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dsir_bucket_lms_broadcast(spark, sf_dir):
    """The two DSIR bucket LMs are DSIR_BUCKETS-row aggregates; the
    per-doc weight join against them must broadcast — a shuffle join
    keyed on 256 buckets would funnel the whole corpus through 256
    reducers."""
    from gmall_211027_flink_spark.operators.sampling import (
        sample_dsir_importance)

    out = sample_dsir_importance(spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_markov_iteration_joins_broadcast(spark, sf_dir):
    """Journey extraction pays the one user-keyed shuffle; every
    chain-iteration join runs on the constant-size transition table
    and must broadcast."""
    from gmall_211027_flink_spark.plans.behavior import (
        ads_markov_attribution)

    out = ads_markov_attribution(spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_phash_invariance_shuffles_text_never_pixels(spark, sf_dir):
    """The pHash audit's ONLY exchange must be the deliberate
    round-robin repartition of the tiny (doc_id, text) rows BEFORE the
    decode (decode_parallel — spreads the CPU-heavy Python stage); at
    100 TB any post-decode shuffle would move pixel payloads."""
    from gmall_211027_flink_spark.operators.multimodal import (
        multimodal_phash_invariance)

    out = multimodal_phash_invariance(spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    # decode_parallel now SKIPS the repartition when the scan already
    # yields >= defaultParallelism splits (ADVICE r8) — so either shape
    # is valid: zero exchanges (already parallel), or only the
    # pre-decode round-robin of the tiny text rows.
    for ln in exchanges:
        assert "roundrobinpartitioning" in ln.lower(), plan
        # the shuffle happens before decode: it carries text, not pixels
        assert "phash_a" not in ln, plan


def test_compaction_plan_windows_are_partition_parallel(spark, sf_dir):
    """The binpack planner's windows must partition by dt (a table
    service plans per-partition); a global unpartitioned window here
    would single-task the whole file inventory."""
    from gmall_211027_flink_spark.operators.bucketing import (
        _register_compaction)  # noqa: F401  (registration side effect)
    from gmall_211027_flink_spark.registry import QUERIES

    out = QUERIES["lake_compaction_plan"](spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    # the running-bytes window is keyed by the dt partition column
    assert "windowspecdefinition(dt#" in plan, plan
    # and the window exchange partitions by dt, not a global singleton
    assert "Exchange hashpartitioning(dt#" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_hits_rounds_have_no_cartesian(spark, sf_dir):
    """HITS half-rounds must stay keyed joins against node-sized score
    vectors; the only crossJoins are broadcast 1-row norms."""
    from gmall_211027_flink_spark.operators.graph import graph_hits_scores

    out = graph_hits_scores(spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    assert "CartesianProduct" not in plan, plan


def test_ppr_pairs_are_posting_list_not_selfjoin(spark, sf_dir):
    """PPR's edge build must expand pairs map-side from per-order part
    lists — a lineitem self-join would shuffle the fact table twice."""
    from gmall_211027_flink_spark.operators.graph import graph_ppr_seeded

    out = graph_ppr_seeded(spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    assert "CartesianProduct" not in plan, plan
    # the pair stage reads lineitem ONCE (posting-list expansion);
    # localCheckpoint truncates the per-round lineage so the final
    # plan shows no repeated lineitem scans
    assert plan.count("lineitem.parquet") <= 1, plan


def test_shapley_lattice_math_is_broadcast_only(spark, sf_dir):
    """Shapley's coalition lattice must never shuffle: the only
    SortMergeJoins allowed are the user-grain journey joins; the
    16-row coalition/channel joins are broadcast, and no unbounded
    CartesianProduct appears."""
    from gmall_211027_flink_spark.plans.behavior import (
        ads_shapley_attribution)

    out = ads_shapley_attribution(spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    assert "CartesianProduct" not in plan, plan
    n_smj = plan.count("SortMergeJoin")
    assert n_smj <= 2, f"lattice math leaked into a shuffle join:\n{plan}"


def test_two_hop_wedge_join_has_hub_cap(spark, sf_dir):
    """The distance-2 expansion must not be a cartesian product and
    must carry the hub-cap degree filter before the wedge join."""
    from gmall_211027_flink_spark.operators.graph import (
        LP_HUB_CAP, graph_two_hop_neighborhood)

    out = graph_two_hop_neighborhood(spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    assert "CartesianProduct" not in plan, plan
    # tie the degree column to the cap in ONE pattern — separate
    # substring checks could pass vacuously on unrelated plan literals
    # (ADVICE r9)
    assert re.search(rf"\(d#\d+L? <= {LP_HUB_CAP}\)", plan), plan


def test_jpeg_and_decode_meta_are_map_only_after_spread(spark, sf_dir):
    """Decode queries: every Exchange (if any — decode_parallel skips
    the spread when the scan is already parallel) is the pre-decode
    round-robin of tiny text rows; pixels never shuffle."""
    from gmall_211027_flink_spark.operators.jpeg import (
        multimodal_jpeg_pixels)
    from gmall_211027_flink_spark.operators.multimodal import (
        multimodal_decode_meta)

    for fn in (multimodal_jpeg_pixels, multimodal_decode_meta):
        out = fn(spark, str(sf_dir))
        out.collect()
        plan = executed_plan(out)
        for ln in plan.splitlines():
            if "Exchange" in ln:
                assert "roundrobinpartitioning" in ln.lower(), plan
                assert "px_digest" not in ln and "content_digest" not in ln, plan


def test_hll_register_table_is_constant_size(spark, sf_dir):
    """The HLL query's post-shuffle state is the 512-row register
    table; the final aggregate must consume registers, not raw keys."""
    from gmall_211027_flink_spark.operators.sketches import (
        HLL_M, sketch_hll_registers)

    out = sketch_hll_registers(spark, str(sf_dir))
    row = out.collect()[0]
    assert row["m"] == HLL_M
    # registers bounded: zero_regs <= m, and the distinct-hash shuffle
    # is the ONLY corpus-sized exchange in the plan
    assert 0 <= row["zero_regs"] <= HLL_M


def test_interval_overlap_join_is_bucket_keyed_hash_join(spark, sf_dir):
    """The interval-vs-interval overlap must hash-join on the bucket
    grid; the only nested-loop allowed is the 1-row scalar attach of
    the n_activity/n_incidents counts (Cross over single-row frames)."""
    from gmall_211027_flink_spark.operators.joins import (
        join_interval_overlap)
    df = join_interval_overlap(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    # the bucket equi-join is a hash join keyed on b with the exact
    # overlap refinement as residual condition
    assert re.search(r"BroadcastHashJoin \[b#\d+L?\], \[b#\d+L?\]", plan) \
        or re.search(r"SortMergeJoin \[b#\d+L?\], \[b#\d+L?\]", plan), plan
    # nested loops only as Cross (single-row scalar attach), never as a
    # fallback for the interval predicate itself
    for m in re.finditer(r"BroadcastNestedLoopJoin BuildRight, (\w+)",
                         plan):
        assert m.group(1) == "Cross", plan


def test_isotonic_grid_math_stays_bounded(spark, sf_dir):
    """ml_isotonic_calibration_pava: the corpus scan feeds ONE
    aggregation to the 32-bin grid; everything after (pair/triple
    expansion, minimax) runs on bounded grid rows — no corpus-sized
    join, no cartesian wider than the grid self-join."""
    from gmall_211027_flink_spark.operators.mlfit import (
        ml_isotonic_calibration_pava)
    df = ml_isotonic_calibration_pava(spark, sf_dir)
    rows = df.collect()
    assert len(rows) <= 32
    # monotone non-decreasing fit, and weighted totals preserved
    fits = [r["iso_rate"] for r in rows]
    assert fits == sorted(fits)
    total_pos = sum(r["n_pos"] for r in rows)
    approx = sum(r["iso_rate"] * r["n"] for r in rows)
    assert abs(approx - total_pos) <= 1e-4 * max(total_pos, 1) + 1.0


def test_cdc_chunking_no_cartesian_single_chunk_shuffle(spark, sf_dir):
    """CDC chunking's only cross-doc stage is the (source, chunk-hash)
    aggregate; the boundary join back to docs is keyed by doc_id — no
    cartesian/nested-loop anywhere despite the double explode."""
    from gmall_211027_flink_spark.operators.dedup import dedup_cdc_chunking
    df = dedup_cdc_chunking(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_square_count_wedge_join_is_keyed(spark, sf_dir):
    """The wedge join must be hash-keyed on the shared endpoint and the
    pair aggregate map-side partial — the only cross tolerated is the
    1-row scalar attach of n_edges."""
    from gmall_211027_flink_spark.operators.graph import graph_square_count
    df = graph_square_count(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    # executed_plan carries the final AQE plan AND the initial plan —
    # count crosses in the final section only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_roc_auc_never_sorts_raw_rows(spark, sf_dir):
    """AUC's one full-data pass is the per-bucket aggregate; any Sort
    in the plan must sit above the ~6k-row bucket grid, never on the
    raw orders scan (the would-be single-task global rank)."""
    from gmall_211027_flink_spark.operators.mlfit import ml_roc_auc_exact
    df = ml_roc_auc_exact(spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    # the aggregate below the window must have a map-side partial
    assert "partial_sum" in plan or "partial_count" in plan, plan


# ---------------------------------------------------------------------------
# Unpartitioned-Window sweep (VERDICT r11 "what's wrong" #1): a Window
# with no PARTITION BY moves its whole input to one task.  That is fine
# exactly when the input is a BOUNDED GRAIN — an aggregate to the
# calendar / bucket grid, a top-k limit, a constant relation — and a
# 100 TB killer otherwise.  The day-grain contract was enforced by
# convention until now; this sweep makes it a gate over EVERY
# registered query's optimized plan.
# ---------------------------------------------------------------------------

# logical nodes that bound the cardinality of everything above them
_BOUNDED_NODES = {
    "Aggregate",        # grid/grain aggregate (day, week, bucket, cell)
    "GlobalLimit",      # top-k probes
    "LocalRelation",    # materialized bounded readouts
    "OneRowRelation",
    "Range",            # spark.range(k) grids
    "Expand",           # cube/rollup (always above an Aggregate input)
    "Deduplicate",      # distinct on a bounded key domain
}

# queries whose CONSTRUCTION executes work (streaming micro-batch
# harnesses, drained stores): their returned frame is a bounded
# LocalRelation by construction and their window shapes are the batch
# twins', which this sweep does cover.  Detected by the DEFINING
# MODULE — every gate-harness query lives in streaming/windows.py —
# not by name substring (ADVICE r12: a future BATCH query that merely
# carried "stream" in its name would have silently dodged the sweep;
# conversely a harness query without it, e.g. dws_late_data_drop,
# was swept for nothing).
_SWEEP_SKIP_MODULE = "gmall_211027_flink_spark.streaming.windows"


def _is_gate_harness(fn) -> bool:
    return getattr(fn, "__module__", "") == _SWEEP_SKIP_MODULE

# audited global windows over inputs whose bound the PLAN cannot show:
# localCheckpoint() rewrites the bounded subtree to a LogicalRDD, so
# the Aggregate evidence is erased even though the input is grid-sized
_GLOBAL_WINDOW_ALLOWLIST = {
    "ads_markov_attribution":
        "sum(removal_effect) OVER () runs over ONE ROW PER CHANNEL "
        "(bounded channel grid); the per-channel frame is a "
        "localCheckpoint product, so the plan shows LogicalRDD "
        "instead of the Aggregate that bounds it",
}


def _walk_jvm_plan(node):
    yield node
    children = node.children()
    for i in range(children.length()):
        yield from _walk_jvm_plan(children.apply(i))


def _unbounded_global_windows(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan()
    bad = []
    for node in _walk_jvm_plan(plan):
        if (node.nodeName() == "Window"
                and node.partitionSpec().isEmpty()):
            subtree = list(_walk_jvm_plan(node))[1:]
            if not any(n.nodeName() in _BOUNDED_NODES for n in subtree):
                bad.append(node.verboseString(1))
    return bad


def test_no_unbounded_global_windows_anywhere(spark, sf_dir):
    from gmall_211027_flink_spark import registry

    registry.load_all()
    offenders = {}
    for name, fn in registry.QUERIES.items():
        if _is_gate_harness(fn) or name in _GLOBAL_WINDOW_ALLOWLIST:
            continue
        df = fn(spark, sf_dir)
        bad = _unbounded_global_windows(df)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"global (unpartitioned) Window over an UNBOUNDED input in: "
        f"{sorted(offenders)} — every global window must sit on a "
        f"bounded-grain aggregate/limit (day-grain contract); details: "
        f"{offenders}")


def test_hilbert_write_path_single_range_exchange(spark, sf_dir, tmp_path):
    """The Hilbert write path must match the z-order one's shape
    exactly: ONE range exchange on hd with the whole unrolled bit
    machine computed map-side (chained projections, no UDF), no hash
    shuffle, and a within-partition (non-global) sort. At 100 TB an
    accidental extra exchange or global sort here doubles the most
    expensive stage of the layout job."""
    from gmall_211027_flink_spark.operators.bucketing import (
        hilbert_write_path)

    base = (load_table(spark, str(sf_dir), "lineitem")
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"))
    ext = base.agg(
        F.min("l_partkey"), F.greatest(F.max("l_partkey") - F.min("l_partkey"), F.lit(1)),
        F.min("l_suppkey"), F.greatest(F.max("l_suppkey") - F.min("l_suppkey"), F.lit(1)),
    ).first()
    out = hilbert_write_path(base, "l_partkey", "l_suppkey",
                             ext[0], ext[1], ext[2], ext[3], num_files=8)
    path = str(tmp_path / "hilbert_layout")
    out.write.mode("overwrite").parquet(path)
    plan = executed_plan(out)
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(exchanges) == 1, plan
    assert "rangepartitioning(hd" in exchanges[0], plan
    assert "hashpartitioning" not in plan, plan
    # the sort must be within-partition (global=false), not a global sort
    sorts = [ln for ln in plan.splitlines() if "Sort [hd" in ln]
    assert sorts and all("false" in ln for ln in sorts), plan
    # no Python worker anywhere: the bit machine is pure codegen
    assert "Python" not in plan, plan


def test_capped_jaccard_docsets_materialized_once(spark, sf_dir):
    """r15: the prefix-filter pipeline must consume ONE materialized
    docsets (localCheckpoint), not rebuild the explode + df-groupBy +
    collect_list aggregate per consumer. Before the fix the executed
    plan carried FOUR copies of that subtree (8 ObjectHashAggregate,
    10 Exchange — ReusedExchange never fires through the cached-scan +
    broadcast operators beneath it), measured at 4x the aggregate's
    cpu per query (28.3 -> 11.5 cpu-s at sf0.1, 129 -> 54 at the 10x
    probe). The checkpoint shows up as ExistingRDD scans: all four
    consumers (a/b prefix sides, both verification array sides) must
    read it, and no collect_list aggregate may remain in the plan."""
    from gmall_211027_flink_spark.operators.dedup import (
        _prefix_filtered_pairs, DF_CAP)

    df = _prefix_filtered_pairs(spark, sf_dir, df_cap=DF_CAP)
    df.collect()
    plan = executed_plan(df)
    assert "ObjectHashAggregate" not in plan, plan
    assert "collect_list" not in plan, plan
    # >= 4: the AQE executed-plan string repeats subtrees in its
    # "Initial Plan" section, so the count is a floor, not an identity
    n_rdd_scans = len(re.findall(r"Scan ExistingRDD", plan))
    assert n_rdd_scans >= 4, f"expected >=4 checkpoint reads, got {n_rdd_scans}\n{plan}"


def test_q21_ol_exchange_reused(spark, sf_dir):
    """r16: q21's ol subtree (lineitem⋈orders + per-(order,supplier)
    aggregate) feeds both the is_late branch and per_order. The
    supplier join pushes IsNotNull(l_suppkey) into its branch's scan;
    without the same filter on the other branch the two subtrees never
    canonicalize equal and the join + partial aggregate ran twice.
    With the hoisted filter the final AQE plan must REUSE the ol
    exchange (hashpartitioning on (l_orderkey, l_suppkey)) instead of
    rebuilding it — the free-reuse form of the diamond fix (the r15
    localCheckpoint attempt measured a wash; this one measured
    1x cpu 5.17 -> 3.00 s, 10x cpu 21.3 -> 18.0 s)."""
    from gmall_211027_flink_spark.plans.tpch import q21_sole_late_supplier

    df = q21_sole_late_supplier(spark, str(sf_dir))
    df.collect()
    plan = executed_plan(df)
    assert "isFinalPlan=true" in plan, plan
    reused = [ln for ln in plan.splitlines() if "ReusedExchange" in ln]
    assert any("l_suppkey" in ln and "hashpartitioning" in ln
               for ln in reused), plan


def test_q15_revenue_diamond_materialized_once(spark, sf_dir):
    """r15: q15's rev CTE feeds the scalar-max branch AND the join-back
    branch; before the localCheckpoint the executed plan rebuilt the
    lineitem scan + supplier aggregate for each (lineitem scanned
    twice, 0 ReusedExchange — measured ~-26% cpu at the 10x facts
    corpus after the fix). The checkpointed form must carry NO lineitem
    scan in the query plan (the single scan runs at checkpoint build)
    and read the materialized rev from ExistingRDD on both branches."""
    from gmall_211027_flink_spark.plans.tpch import q15_top_supplier

    df = q15_top_supplier(spark, str(sf_dir))
    df.collect()
    plan = executed_plan(df)
    assert "lineitem" not in plan, plan
    assert len(re.findall(r"Scan ExistingRDD", plan)) >= 2, plan
