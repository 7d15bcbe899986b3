"""Round-9 additions: Shapley axioms, HLL merge law, Bloom FPR
monotonicity, Neyman allocation, Holt fold, decode-meta dispatch, KL
non-negativity, Durbin-Watson bounds, silhouette range, NB posterior
exactness."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------- shapley ---------

def test_shapley_efficiency_axiom(spark, sf_dir):
    """sum of phi = v(full) - v(empty), exactly, in x24 integer units."""
    from gmall_211027_flink_spark.plans.behavior import (
        ads_shapley_attribution)
    rows = ads_shapley_attribution(spark, str(sf_dir)).collect()
    assert len(rows) == 4
    total_x24 = sum(r["phi_x24"] for r in rows)
    assert total_x24 == 24 * (rows[0]["v_full"] - rows[0]["v_empty"])
    for r in rows:
        assert r["phi_x24"] >= 0      # v is monotone -> marginals >= 0


def test_shapley_null_player_on_toy_lattice():
    """A channel absent from every converting journey gets phi = 0
    (null-player axiom), checked on a hand-built mask-count lattice."""
    # masks over 4 channels; channel 8 (bit 3) never appears
    cnt = {0b0001: 5, 0b0011: 2, 0b0000: 1}
    def v(s):
        return sum(c for m, c in cnt.items() if (m & ~s) == 0)
    w = {0: 6, 1: 2, 2: 2, 3: 6}
    for bit, expect_zero in ((1, False), (8, True)):
        phi = sum(w[bin(s).count("1")] * (v(s | bit) - v(s))
                  for s in range(16) if not s & bit)
        assert (phi == 0) == expect_zero


# ------------------------------------------------------- HLL -------------

def test_hll_register_merge_law():
    """merge(A, B) register-wise max == registers of the union stream —
    the property the streaming maintenance relies on."""
    def regs(keys, m=64, wbits=20):
        out = [0] * m
        for k in keys:
            h = int(hashlib.md5(str(k).encode()).hexdigest()[:6], 16)
            b, w = h % m, h // m
            if w == 0:
                r = wbits + 1
            else:
                r = ((w & -w).bit_length() - 1) + 1
            out[b] = max(out[b], r)
        return out
    a = regs(range(0, 500))
    b = regs(range(300, 900))
    ab = regs(range(0, 900))
    assert [max(x, y) for x, y in zip(a, b)] == ab


def test_hll_estimate_within_tolerance(spark, sf_dir):
    from gmall_211027_flink_spark.operators.sketches import (
        sketch_hll_registers)
    row = sketch_hll_registers(spark, str(sf_dir)).collect()[0]
    est = (row["est_linear"] if row["zero_regs"] > 0
           and row["est_linear"] is not None else row["est_raw"])
    # 512 registers -> ~1.04/sqrt(512) = 4.6% std error; allow 4 sigma
    assert abs(est - row["exact_distinct"]) / row["exact_distinct"] < 0.2


# ------------------------------------------------------- bloom -----------

def test_bloom_fpr_monotone_in_filter_size(spark, sf_dir):
    """Bigger filter -> fewer false positives; theory column must agree
    with measurement within the binomial noise band."""
    from gmall_211027_flink_spark.operators.sketches import (
        sketch_bloom_fpr_measured)
    rows = {r["m_bits"]: r
            for r in sketch_bloom_fpr_measured(spark, str(sf_dir)).collect()}
    small, big = rows[4096], rows[16384]
    assert small["fpr_measured"] >= big["fpr_measured"]
    for r in rows.values():
        n = r["n_probes"]
        p = max(r["fpr_theory"], 1e-9)
        sigma = (p * (1 - p) / n) ** 0.5
        assert abs(r["fpr_measured"] - p) < max(5 * sigma, 0.02)


# ------------------------------------------------------- neyman ----------

def test_neyman_allocation_sums_to_budget(spark, sf_dir):
    from gmall_211027_flink_spark.operators.sampling import (
        NEYMAN_BUDGET, sample_neyman_allocation)
    rows = sample_neyman_allocation(spark, str(sf_dir)).collect()
    assert sum(r["n_alloc"] for r in rows) == NEYMAN_BUDGET
    for r in rows:
        # largest-remainder never moves an allocation by more than 1
        assert abs(r["n_alloc"] - r["quota"]) < 1.0 + 1e-9


# ------------------------------------------------------- holt ------------

def test_holt_fold_matches_python_reference(spark, sf_dir):
    """The packed-BIGINT fold must equal a plain-Python recursion with
    the same integer rounding."""
    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.aggregates import (
        stats_holt_linear_smoothing)
    orders = load_table(spark, str(sf_dir), "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").alias("y")).orderBy("wk").collect())
    l = b = None
    for r in wkly:
        y = r["y"]
        if l is None:
            l, b = y * 1_000_000, 0
            continue
        OFF = 1099511627776
        l_new = (2 * y * 1_000_000 + 8 * (l + b) + OFF * 10 + 5) // 10 - OFF
        b = ((l_new - l) + 9 * b + OFF * 10 + 5) // 10 - OFF
        l = l_new
    row = stats_holt_linear_smoothing(spark, str(sf_dir)).collect()[0]
    assert row["level"] == round(l / 1e6, 6)
    assert row["trend"] == round(b / 1e6, 6)
    assert row["forecast_h2"] == round((l + 2 * b) / 1e6, 6)


# ------------------------------------------------------- stats -----------

def test_durbin_watson_in_range(spark, sf_dir):
    from gmall_211027_flink_spark.operators.aggregates import (
        stats_durbin_watson)
    row = stats_durbin_watson(spark, str(sf_dir)).collect()[0]
    assert 0.0 <= row["dw"] <= 4.0
    assert abs(row["rho1_approx"] - (1 - row["dw"] / 2)) < 1e-9


def test_kl_divergence_nonnegative_and_self_zero(spark, sf_dir):
    from gmall_211027_flink_spark.operators.curation import (
        curation_source_kl_divergence)
    rows = curation_source_kl_divergence(spark, str(sf_dir)).collect()
    assert rows
    for r in rows:
        # Gibbs: KL >= 0 up to the 1e-9 term-rounding of the decimal sum
        assert r["kl_bits"] >= -1e-5


def test_silhouette_in_unit_interval(spark, sf_dir):
    from gmall_211027_flink_spark.operators.kmeans import (
        ml_silhouette_simplified)
    rows = ml_silhouette_simplified(spark, str(sf_dir)).collect()
    assert rows
    for r in rows:
        # assignment is the argmin, so simplified s is in [0, 1]
        assert 0.0 <= r["mean_silhouette"] <= 1.0
        assert r["n_boundary"] <= r["n_vecs"]


def test_grubbs_top1_is_global_max_deviation(spark, sf_dir):
    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.aggregates import (
        stats_grubbs_outlier)
    rows = stats_grubbs_outlier(spark, str(sf_dir)).collect()
    assert [r["rk"] for r in rows] == [1, 2, 3]
    assert rows[0]["g_score"] >= rows[1]["g_score"] >= rows[2]["g_score"]


# ------------------------------------------------------- decode meta -----

def test_decode_meta_dispatches_by_sniff_not_doc_id():
    """Corrupting the magic bytes must change the dispatch outcome —
    proving the decoder routes on content, not on doc_id % 4."""
    from gmall_211027_flink_spark.operators.multimodal import (
        sniff_container, synthesize_png_with_pixels)
    h = hashlib.md5(b"doc").hexdigest()
    payload = synthesize_png_with_pixels(0, h)
    assert sniff_container(payload) == "png"
    assert sniff_container(b"XX" + payload[2:]) == "unknown"


def test_decode_meta_digest_requires_real_decode(spark, sf_dir):
    """The emitted digest equals the digest of the REAL decoded pixels
    for a spot-checked PNG doc."""
    from gmall_211027_flink_spark.operators.multimodal import (
        decode_png_gray, multimodal_decode_meta, synthesize_png_with_pixels)
    out = multimodal_decode_meta(spark, str(sf_dir))
    row = out.filter(F.col("doc_id") % 4 == 0).orderBy("doc_id").first()
    doc = (spark.read.parquet(f"{sf_dir}/documents.parquet")
           .filter(F.col("doc_id") == row["doc_id"]).first())
    h = hashlib.md5(doc["text"].encode()).hexdigest()
    w, ht, gray = decode_png_gray(
        synthesize_png_with_pixels(row["doc_id"], h))
    flat = ",".join(str(int(v)) for v in np.asarray(gray).ravel())
    assert row["container"] == "png"
    assert (row["width"], row["height"]) == (w, ht)
    assert row["content_digest"] == hashlib.md5(flat.encode()).hexdigest()


# ------------------------------------------------------- naive bayes -----

def test_nb_posterior_cross_multiplication_is_exact():
    """The integer cross-multiplied decision equals the rational
    posterior comparison computed with Fractions."""
    from fractions import Fraction
    n1, n0 = 1250, 1230
    a1 = [600, 10, 900, 1200, 620]
    a0 = [580, 900, 880, 1190, 610]
    for fv in ((True,) * 5, (False,) * 5, (True, False, True, False, True)):
        p1 = Fraction(n1)
        p0 = Fraction(n0)
        for i, f in enumerate(fv):
            p1 *= Fraction((a1[i] + 1) if f else (n1 - a1[i] + 1), n1 + 2)
            p0 *= Fraction((a0[i] + 1) if f else (n0 - a0[i] + 1), n0 + 2)
        s1 = n1
        s0 = n0
        for i, f in enumerate(fv):
            s1 *= (a1[i] + 1) if f else (n1 - a1[i] + 1)
            s0 *= (a0[i] + 1) if f else (n0 - a0[i] + 1)
        s1 *= (n0 + 2) ** 5
        s0 *= (n1 + 2) ** 5
        assert (s1 > s0) == (p1 > p0)


# ------------------------------------------------------- two-hop ---------

def test_two_hop_excludes_direct_neighbors(spark, sf_dir):
    from gmall_211027_flink_spark.operators.graph import (
        graph_two_hop_neighborhood)
    rows = graph_two_hop_neighborhood(spark, str(sf_dir)).collect()
    assert rows
    for r in rows:
        assert r["n_two_hop"] >= 1
        assert r["degree"] >= 1


# ------------------------------------------------------- late batch ------

def test_calibration_bins_partition_the_test_half(spark, sf_dir):
    """Bin counts must sum to the NB confusion-matrix total (same
    scored frame, two readouts)."""
    from gmall_211027_flink_spark.operators.aggregates import (
        ml_calibration_bins, ml_naive_bayes_binary)
    bins = ml_calibration_bins(spark, str(sf_dir)).collect()
    conf = ml_naive_bayes_binary(spark, str(sf_dir)).collect()
    assert sum(r["n"] for r in bins) == sum(r["n"] for r in conf)
    for r in bins:
        assert 0.0 <= r["mean_pred"] <= 1.0
        assert 0.0 <= r["actual_rate"] <= 1.0
        assert r["n_positive"] <= r["n"]


def test_drawdown_is_peak_minus_trough(spark, sf_dir):
    from gmall_211027_flink_spark.operators.aggregates import (
        ads_demand_max_drawdown)
    row = ads_demand_max_drawdown(spark, str(sf_dir)).collect()[0]
    assert row["drawdown"] == row["peak_orders"] - row["trough_orders"]
    assert 0.0 <= row["drawdown_ratio"] <= 1.0


def test_running_balance_peak_bounds_final(spark, sf_dir):
    from gmall_211027_flink_spark.operators.aggregates import (
        dws_running_balance_per_part)
    rows = dws_running_balance_per_part(spark, str(sf_dir)).collect()
    assert len(rows) <= 20 and rows
    for r in rows:
        assert r["trough_balance"] <= r["final_balance"] <= r["peak_balance"]
        # movement >= |final|: every unit of net balance was moved
        assert r["total_movement"] >= abs(r["final_balance"])


def test_seasonal_effects_roughly_sum_to_zero(spark, sf_dir):
    """Centered-MA detrending makes DOW effects near-zero-sum (exact
    zero only for infinite series; bound by the edge effect)."""
    from gmall_211027_flink_spark.operators.aggregates import (
        stats_seasonal_decompose_dow)
    rows = stats_seasonal_decompose_dow(spark, str(sf_dir)).collect()
    assert len(rows) == 7
    mean_scale = sum(abs(r["seasonal_effect"]) for r in rows) / 7 + 1e-9
    assert abs(sum(r["seasonal_effect"] for r in rows)) < max(
        1.0, 2 * mean_scale)


def test_levene_stat_nonnegative(spark, sf_dir):
    from gmall_211027_flink_spark.operators.aggregates import (
        stats_levene_test)
    row = stats_levene_test(spark, str(sf_dir)).collect()[0]
    assert row["bf_stat"] >= 0.0
    assert row["n_groups"] == 5


def test_pacf_lag1_equals_acf_lag1(spark, sf_dir):
    """By construction phi_11 = r_1 — the DL recursion's base case
    must agree with the Ljung-Box ACF."""
    from gmall_211027_flink_spark.operators.aggregates import (
        stats_ljung_box, stats_pacf_durbin_levinson)
    acf = {r["lag_k"]: r["r_k"]
           for r in stats_ljung_box(spark, str(sf_dir)).collect()}
    pacf = {r["lag_k"]: r["pacf"]
            for r in stats_pacf_durbin_levinson(spark, str(sf_dir)).collect()}
    assert abs(pacf[1] - acf[1]) < 1e-6
    for v in pacf.values():
        assert -1.0 <= v <= 1.0


def test_jpeg_quant_mse_positive_and_bounded(spark, sf_dir):
    """Doubling the quant table must lose information (mse > 0 for at
    least one image) and can never exceed the 255^2 pixel bound."""
    from gmall_211027_flink_spark.operators.jpeg import (
        multimodal_jpeg_quant_mse)
    rows = multimodal_jpeg_quant_mse(spark, str(sf_dir)).collect()
    assert rows
    assert any(r["sse"] > 0 for r in rows)
    for r in rows:
        assert 0.0 <= r["mse"] <= 255.0 ** 2
        assert r["sse"] <= r["n_px"] * 255 ** 2


def test_stream_holt_equals_batch_fold(spark, sf_dir):
    """The ordered-slice streaming fold must reproduce the one-shot
    batch fold exactly (state carries (l, b) across commits)."""
    from gmall_211027_flink_spark.operators.aggregates import (
        stats_holt_linear_smoothing)
    from gmall_211027_flink_spark.streaming.windows import (
        stream_holt_maintenance)
    b = stats_holt_linear_smoothing(spark, str(sf_dir)).collect()[0]
    s = stream_holt_maintenance(spark, str(sf_dir)).collect()[0]
    assert b.asDict() == s.asDict()


def test_double_sweep_second_ecc_dominates(spark, sf_dir):
    """ecc_K(B) >= ecc_K(A): B is at distance ecc_K(A) from A, so the
    second sweep's bound can only improve — the double-sweep premise."""
    from gmall_211027_flink_spark.operators.graph import (
        BFS_ROUNDS, graph_diameter_double_sweep)
    row = graph_diameter_double_sweep(spark, str(sf_dir)).collect()[0]
    assert row["diameter_lower_bound"] >= row["ecc_a_bounded"]
    assert row["diameter_lower_bound"] <= BFS_ROUNDS
    assert row["n_reached_b"] >= 1
