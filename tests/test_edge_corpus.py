"""Adversarial-corpus smoke: every documents-consuming query must run
(not hash-match — there's no oracle here; scripts/check.py owns that)
on a corpus a real crawl produces and the synthetic testdata never
does: empty strings, sub-n-gram docs, exact duplicates, unicode/CJK,
multi-space runs, and one huge document. The sequence(1,0) step=-1 bug
(fixed alongside this test) crashed four operator families on exactly
this input class.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from gmall_211027_flink_spark.registry import QUERIES, load_all

load_all()

_EDGE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (0, "", "en", "src0", 0),                      # empty
    (1, "one", "en", "src1", 3),                   # below 3-gram width
    (2, "two words", "en", "src2", 9),             # below 3-gram width
    (3, "three word doc", "en", "src3", 14),       # exactly one shingle
    (4, "four word doc here", "de", "src0", 18),   # below 5-gram width
    (5, "the quick brown fox jumps over the lazy dog again", "en",
     "src1", 49),
    (6, "the quick brown fox jumps over the lazy dog again", "en",
     "src2", 49),                                  # exact duplicate of 5
    (7, "数据 处理 管道 质量 检查 样本 数据 处理", "zh", "src3", 20),  # CJK
    (8, "naïve café résumé naïve café résumé naïve café", "fr",
     "src0", 46),                                  # accents + repetition
    (9, " ".join(f"w{i % 7}" for i in range(4000)), "en", "src1",
     4 * 4000),                                    # huge, highly repetitive
    (10, "solo", "es", "src2", 4),
]

# documents-consuming queries; embeddings/events/TPC-H tables are not in
# the edge dir, so only list queries whose inputs are documents alone
_DOC_QUERIES = [
    "dedup_exact", "dedup_ngram_jaccard", "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_cluster_canonical",
    "dedup_minhash_recall", "dedup_passage_exact",
    "text_lang_id", "text_quality_score", "quality_filter_rules",
    "text_token_count", "text_fingerprint", "text_repetition_ratio",
    "text_word_entropy", "text_tfidf_keywords", "text_normalize", "text_lm_score",
    "text_chunk_windows", "vocab_bigram_counts",
    "decontaminate_ngram", "decontaminate_fuzzy_minhash",
    "mixture_weighted_sample", "seq_pack_token_budget",
    "sample_split_stratified", "sample_stratified_downsample",
    "sample_deterministic_shuffle",
    "stream_dedup_exact_documents", "stream_sample_ingest",
    # round-4 additions
    "vocab_pmi_topk", "quality_threshold_calibration", "bpe_top_merges",
    "dataset_snapshot_diff", "stream_dedup_minhash_incremental",
    "multimodal_payload_dedup",
    # round-5 additions
    "text_bm25_search", "dedup_span_exact", "text_ngram_novelty",
    "text_zipf_fit", "dedup_bloom_membership_audit",
    "sample_reservoir_per_group", "sample_split_leakage_audit",
    "stream_decontaminate_ingest", "pipeline_training_manifest",
    "stream_index_stats_maintenance", "stats_ks_drift",
    "text_lang_confusion_audit", "dedup_minhash_band_sweep",
    "decontaminate_span_report", "vocab_coverage_curve",
    "stream_ks_drift_monitor", "sample_temperature_rates",
    # round-6 additions
    "dedup_winnowing_fingerprints", "dedup_tfidf_cosine",
    "dedup_span_multiscale", "sketch_countmin_freq_audit",
    "bpe_merge_sequence", "bpe_apply_fertility",
    "curation_quota_per_source", "curation_source_overlap_matrix",
    "curation_epoch_schedule", "multimodal_ahash_fingerprint",
    "multimodal_ahash_neardup", "multimodal_wav_features",
    "stream_winnowing_index_store", "dedup_minhash_estimate_bias",
    # round-7 additions
    "multimodal_png_pixels", "multimodal_gif_pixels",
    "multimodal_wav_autocorr", "multimodal_container_stats",
    "curation_dedup_rate_by_source", "curation_contamination_by_source",
    "text_url_canonicalize", "curation_boilerplate_ngrams",
    "dedup_edit_distance_banded", "text_flesch_readability",
    "sample_weighted_priority",
    # round-8 additions (documents-only inputs)
    "multimodal_resize", "multimodal_frame_sample",
    "sample_dsir_importance", "curation_token_budget_allocation",
    # round-9 additions (documents-only inputs)
    "text_hapax_ratio", "multimodal_decode_meta",
    "multimodal_wav_rms_windows", "multimodal_pixel_histogram",
    "multimodal_jpeg_pixels", "multimodal_jpeg_quant_mse",
    "multimodal_jpeg_transcode",
    # round-10 additions (documents-only inputs)
    "text_yules_k", "text_char_trigram_entropy", "text_zipf_slope",
    "text_heaps_law", "multimodal_jpeg_color_pixels",
    "multimodal_wav_dft_centroid",
    # round-11 additions (documents-only inputs)
    "text_mattr_sliding", "text_burstiness_fano",
    "text_mendenhall_spectrum", "text_bigram_novelty_decay",
    "multimodal_png_palette_pixels", "multimodal_gif_interlaced_pixels",
    "multimodal_jpeg_progressive_pixels", "multimodal_jpeg_restart_pixels",
    "curation_source_js_divergence", "stats_cohens_kappa",
    "stats_anderson_darling", "stats_cramer_von_mises",
    "ml_isotonic_calibration_pava", "multimodal_bmp_rle_pixels",
    # round-11 continuation (documents-only inputs)
    "dedup_cdc_chunking", "multimodal_wav_ulaw_roundtrip",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_corpus")
    (spark.createDataFrame(
        _EDGE_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long")
     .coalesce(1).write.mode("overwrite")
     .parquet(str(d / "documents.parquet")))
    return str(d)


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_query_survives_edge_corpus(spark, edge_dir, name):
    df = QUERIES[name](spark, edge_dir)
    n = df.count()
    assert n >= 0
    # exact dedup must see the duplicate pair collapsed
    if name == "dedup_exact":
        assert n == len(_EDGE_DOCS) - 1
    # docs 5 and 6 are identical -> jaccard 1.0 pair must survive
    if name in ("dedup_ngram_jaccard", "dedup_ngram_jaccard_capped"):
        pairs = {(r[0], r[1]) for r in df.collect()}
        assert (5, 6) in pairs
