"""Structural invariants of the round-5 operators — properties that
must hold by construction (not just hash-match an oracle): Bloom
no-false-negatives, BM25 postings membership, band-sweep candidate
nesting, quantization half-step error bound, pipeline-manifest
conservation, zero content-keyed split leakage, funnel partitioning.
"""

from __future__ import annotations

import duckdb

from tests.conftest import SF_DIR


def test_bloom_gate_has_no_false_negatives(spark, sf_dir):
    """Every incoming doc whose text exists in the seen half MUST be
    bloom-positive (positions derive from the same bytes); the query's
    counters must reflect that: positives >= exact dups, and FP count
    is exactly positives-minus-exact-dups only when all dups hit."""
    from gmall_211027_flink_spark.operators.dedup import (
        dedup_bloom_membership_audit)
    row = dedup_bloom_membership_audit(spark, sf_dir).collect()[0]
    assert row.n_bloom_positive >= row.n_exact_dup
    assert row.n_false_positive == row.n_bloom_positive - row.n_exact_dup


def test_bm25_results_contain_a_query_term(spark, sf_dir):
    from gmall_211027_flink_spark.operators.search import (
        BM25_QUERIES, text_bm25_search)
    terms = {q: set(ts) for q, ts in BM25_QUERIES}
    hits = text_bm25_search(spark, sf_dir).collect()
    assert hits, "BM25 returned nothing"
    con = duckdb.connect()
    texts = dict(con.execute(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'")
        .fetchall())
    for r in hits:
        assert terms[r.query_id] & set(texts[r.doc_id].split(" ")), r
        assert r.score > 0


def test_band_sweep_recall_monotone_in_band_count(spark, sf_dir):
    """(2x8) -> (4x4) -> (8x2) candidate sets NEST (every 4-aligned
    agreeing run contains a 2-aligned one), so recall must be
    non-decreasing as bands increase."""
    from gmall_211027_flink_spark.operators.dedup import (
        dedup_minhash_band_sweep)
    rows = {r.n_bands: r for r in
            dedup_minhash_band_sweep(spark, sf_dir).collect()}
    assert rows[2].lsh_found <= rows[4].lsh_found <= rows[8].lsh_found
    assert rows[2].recall <= rows[4].recall <= rows[8].recall
    assert len({r.exact_pairs for r in rows.values()}) == 1


def test_int8_quant_error_bounded_by_half_step(spark, sf_dir):
    """codes = floor(x/scale + 0.5) implies |x - code*scale| <= scale/2
    elementwise — the audit's max_abs_err must respect the bound."""
    from gmall_211027_flink_spark.operators.similarity import (
        embedding_int8_quant_audit)
    for r in embedding_int8_quant_audit(spark, sf_dir).collect():
        assert r.max_abs_err <= r.scale / 2 + 1e-6, r
        assert r.mse <= (r.scale / 2) ** 2 + 1e-6, r


def test_pipeline_manifest_conserves_documents(spark, sf_dir):
    """Per language: total = eval + quality-dropped + contaminated +
    dup-dropped + kept — no document may vanish or double-count."""
    from gmall_211027_flink_spark.plans.pipeline import (
        pipeline_training_manifest)
    rows = pipeline_training_manifest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_total == (r.n_eval + r.n_quality_dropped
                             + r.n_contaminated + r.n_dup_dropped
                             + r.n_kept), r
        assert 0.0 <= r.retention <= 1.0


def test_split_leakage_zero_under_content_keying(spark, sf_dir):
    from gmall_211027_flink_spark.operators.sampling import (
        sample_split_leakage_audit)
    rows = {r.keying: r for r in
            sample_split_leakage_audit(spark, sf_dir).collect()}
    assert rows["content"].n_leaky_groups == 0
    assert rows["content"].n_docs_affected == 0
    # both keyings see the same content universe
    assert rows["content"].n_content_groups \
        == rows["doc_id"].n_content_groups


def test_funnel_levels_partition_the_user_set(spark, sf_dir):
    from gmall_211027_flink_spark.plans.behavior import ads_window_funnel
    got = ads_window_funnel(spark, sf_dir).collect()
    con = duckdb.connect()
    n_users = con.execute(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert sum(r.n_users for r in got) == n_users
    assert all(0 <= r.funnel_level <= 3 for r in got)
