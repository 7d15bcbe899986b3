"""Round-10 invariants: float-discipline hardening, new exact-integer
stats (CUSUM / Theil-Sen / Mann-Kendall / Spearman), RFM / PSI / LPA /
bucketed range join, WAV DFT centroid, trigram entropy."""

from __future__ import annotations

import math
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table


# ---------------------------------------------------------------------------
# pure-Python mirrors (engine-independent invariants)
# ---------------------------------------------------------------------------

def _cusum_brute(ys):
    n = len(ys)
    sy = sum(ys)
    pre = 0
    best = None
    for k, y in enumerate(ys, start=1):
        pre += y
        cus = n * pre - k * sy
        key = (abs(cus), k)
        if best is None or abs(cus) > best[0] or (
                abs(cus) == best[0] and k < best[1]):
            if best is None or abs(cus) > best[0]:
                best = (abs(cus), k, cus)
    return best


def test_cusum_scaled_is_shift_invariant():
    """n*prefix_k - k*Sy is invariant to y -> y + c (the reason the
    scaled integer form needs no mean subtraction)."""
    ys = [3, 7, 2, 9, 4, 4, 8, 1]
    n = len(ys)
    sy = sum(ys)
    for c in (0, 5, -3, 1000):
        ys2 = [y + c for y in ys]
        sy2 = sum(ys2)
        pre = pre2 = 0
        for k in range(1, n + 1):
            pre += ys[k - 1]
            pre2 += ys2[k - 1]
            assert n * pre - k * sy == n * pre2 - k * sy2


def test_cusum_is_zero_at_series_end():
    ys = [5, 1, 4, 4, 4, 9]
    n, sy = len(ys), sum(ys)
    assert n * sum(ys) - n * sy == 0


def test_theil_sen_quantization_is_half_up():
    """The (2*(dy*1e9 + OFF*dt) + dt) div (2*dt) - OFF trick equals
    round-half-up(dy*1e9 / dt) for negative and positive dy."""
    from gmall_211027_flink_spark.operators.aggregates import THEIL_OFF
    for dy in (-7, -3, -1, 0, 1, 2, 5, 123, -123):
        for dt in (1, 2, 3, 7, 52):
            q = ((2 * (dy * 10**9 + THEIL_OFF * dt) + dt)
                 // (2 * dt) - THEIL_OFF)
            exact = Fraction(dy * 10**9, dt)
            want = math.floor(exact + Fraction(1, 2))
            assert q == want, (dy, dt, q, want)


def test_mann_kendall_brute_force_small_series():
    ys = [4, 2, 7, 7, 3, 9, 9, 9, 1]
    n = len(ys)
    s = sum((ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n) for j in range(i + 1, n))
    # tie groups: 7 x2, 9 x3
    tie = sum(t * (t - 1) * (2 * t + 5) for t in (2, 3))
    var18 = n * (n - 1) * (2 * n + 5) - tie
    assert var18 % 1 == 0 and var18 > 0
    z = (s - 1) / math.sqrt(var18 / 18.0) if s > 0 else (
        (s + 1) / math.sqrt(var18 / 18.0) if s < 0 else 0.0)
    assert -5 < z < 5


def test_spearman_double_rank_equals_fraction_avg_ranks():
    """2*avgrank = 2*min_rank + tie_ct - 1; Pearson over the doubled
    integer ranks equals Spearman over Fraction average ranks."""
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    ys = [2, 7, 1, 8, 2, 8, 1, 8, 2, 8]

    def avg_ranks(vals):
        s = sorted(vals)
        return [Fraction(s.index(v) + 1 + s.index(v) + s.count(v), 2)
                for v in vals]

    def two_ranks(vals):
        s = sorted(vals)
        return [2 * (s.index(v) + 1) + s.count(v) - 1 for v in vals]

    for vals in (xs, ys):
        assert [2 * r for r in avg_ranks(vals)] == two_ranks(vals)

    def pearson(a, b):
        n = len(a)
        sx, sy = sum(a), sum(b)
        sxy = sum(p * q for p, q in zip(a, b))
        sxx = sum(p * p for p in a)
        syy = sum(q * q for q in b)
        num = Fraction(n * sxy - sx * sy)
        den2 = Fraction(n * sxx - sx * sx) * Fraction(n * syy - sy * sy)
        return num / Fraction(math.isqrt(den2.numerator * 10**24
                                         // den2.denominator), 10**12)

    rho_frac = pearson(avg_ranks(xs), avg_ranks(ys))
    rho_int = pearson(two_ranks(xs), two_ranks(ys))
    assert abs(float(rho_frac) - float(rho_int)) < 1e-9


def test_wav_dft_lut_is_unit_circle():
    from gmall_211027_flink_spark.operators.multimodal import (
        _DFT_COSQ, _DFT_SINQ, WAV_DFT_N)
    assert len(_DFT_COSQ) == len(_DFT_SINQ) == WAV_DFT_N
    for c, s in zip(_DFT_COSQ, _DFT_SINQ):
        # quantized unit circle: c^2 + s^2 within rounding of 1e12
        assert abs(c * c + s * s - 10**12) < 2_500_000


def test_wav_dft_pure_tone_dominates_its_bin():
    """A pure cos at bin k=4 must put (nearly) all power at k=4."""
    import numpy as np

    from gmall_211027_flink_spark.operators.multimodal import (
        _DFT_COSQ, _DFT_SINQ, WAV_DFT_BINS, WAV_DFT_N)
    il = np.arange(WAV_DFT_N)
    s = np.round(1000 * np.cos(2 * np.pi * 4 * il / WAV_DFT_N)).astype(
        np.int64)
    cosq = np.array(_DFT_COSQ)
    sinq = np.array(_DFT_SINQ)
    powers = {}
    for k in WAV_DFT_BINS:
        idx = (k * il) % WAV_DFT_N
        ck = int((s * cosq[idx]).sum())
        sk = int((s * sinq[idx]).sum())
        powers[k] = ck * ck + sk * sk
    assert max(powers, key=powers.get) == 4
    assert powers[4] > 100 * max(v for k, v in powers.items() if k != 4)


def test_yules_k_identity():
    """K = 1e4*(sum m^2 - N)/N^2 via the squared-count shortcut equals
    the textbook sum over V_m."""
    counts = [5, 3, 3, 2, 1, 1, 1, 1]          # per-word occurrence counts
    n = sum(counts)
    s2 = sum(m * m for m in counts)
    vm = {}
    for m in counts:
        vm[m] = vm.get(m, 0) + 1
    textbook = Fraction(10**4) * (sum(m * m * v for m, v in vm.items()) - n)
    shortcut = Fraction(10**4) * (s2 - n)
    assert textbook == shortcut


# ---------------------------------------------------------------------------
# Spark-level invariants (sf0.001)
# ---------------------------------------------------------------------------

def test_bucketed_range_join_plan_has_no_nested_loop(spark, sf_dir):
    from gmall_211027_flink_spark.operators.bucketing import executed_plan
    from gmall_211027_flink_spark.operators.joins import join_bucketed_range

    out = join_bucketed_range(spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bucketed_range_join_matches_naive(spark, sf_dir):
    """The bucket-expand plan must return exactly the naive range-join
    counts (the oracle checks cross-engine; this checks cross-PLAN)."""
    from gmall_211027_flink_spark.operators.joins import (
        RANGE_JOIN_WINDOW_US, join_bucketed_range)

    ev = load_table(spark, str(sf_dir), "events")
    err = (ev.filter(F.col("event_type") == "error")
           .select("event_id", F.unix_micros("ts").alias("eus")))
    clk = (ev.filter(F.col("event_type") == "click")
           .select(F.unix_micros("ts").alias("cus")))
    naive = (err.join(clk, (F.col("cus") >= F.col("eus")
                            - RANGE_JOIN_WINDOW_US)
                      & (F.col("cus") <= F.col("eus")
                         + RANGE_JOIN_WINDOW_US), "left")
             .groupBy("event_id").agg(F.count("cus").alias("n")))
    got = {r["event_id"]: r["n_nearby_clicks"]
           for r in join_bucketed_range(spark, str(sf_dir)).collect()}
    want = {r["event_id"]: r["n"] for r in naive.collect()}
    assert got == want


def test_rfm_segments_partition_all_customers(spark, sf_dir):
    from gmall_211027_flink_spark.plans.behavior import ads_rfm_segments

    rows = ads_rfm_segments(spark, str(sf_dir)).collect()
    n_cust = (load_table(spark, str(sf_dir), "orders")
              .select("o_custkey").distinct().count())
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_score"] <= 3
        assert 1 <= r["f_score"] <= 3
        assert 1 <= r["m_score"] <= 3


def test_lpa_degree_and_modularity_identities(spark, sf_dir):
    """sum_c d_sum = 2m (every edge endpoint counted once) and
    sum_c intra <= m."""
    from gmall_211027_flink_spark.operators.graph import (
        graph_lpa_modularity)

    rows = graph_lpa_modularity(spark, str(sf_dir)).collect()
    if not rows:
        pytest.skip("co-purchase graph empty at this SF")
    d_total = sum(r["d_sum"] for r in rows)
    intra = sum(r["intra_edges"] for r in rows)
    # d_total = 2m exactly; recover m and check the q_term identity
    assert d_total % 2 == 0
    m = d_total // 2
    assert intra <= m
    for r in rows:
        assert r["q_term_x4m2"] == 4 * m * r["intra_edges"] \
            - r["d_sum"] * r["d_sum"]


def test_psi_zero_for_identical_halves():
    """With identical smoothed bucket counts, every PSI term is 0 —
    the quantized-term sum must be exactly 0."""
    c1 = [10, 20, 30, 40]
    c2 = [10, 20, 30, 40]
    n1, n2 = sum(c1), sum(c2)
    terms = []
    for a, b in zip(c1, c2):
        p1, p2 = a / n1, b / n2
        terms.append(math.floor((p2 - p1) * math.log(p2 / p1)
                                * 10**9 + 0.5))
    assert sum(terms) == 0


def test_trigram_entropy_bounded_by_log_distinct(spark, sf_dir):
    from gmall_211027_flink_spark.operators.text import (
        text_char_trigram_entropy)

    for r in text_char_trigram_entropy(spark, str(sf_dir)).collect():
        assert 0.0 <= r["trigram_entropy"] \
            <= math.log2(r["distinct_trigrams"]) + 1e-6


def test_stream_cusum_matches_batch(spark, sf_dir):
    from gmall_211027_flink_spark.operators.aggregates import (
        stats_cusum_weekly_exact)
    from gmall_211027_flink_spark.streaming.windows import (
        stream_cusum_maintenance)

    batch = stats_cusum_weekly_exact(spark, str(sf_dir)).collect()
    stream = stream_cusum_maintenance(spark, str(sf_dir)).collect()
    assert [tuple(r) for r in batch] == [tuple(r) for r in stream]


def test_kcenter_plan_has_no_cartesian(spark, sf_dir):
    """Every k-center round is a broadcast(64-row center) equi-join on
    dim + a TakeOrdered — never an all-pairs product."""
    from gmall_211027_flink_spark.operators.bucketing import executed_plan
    from gmall_211027_flink_spark.operators.sampling import (
        sample_kcenter_coreset)

    out = sample_kcenter_coreset(spark, str(sf_dir))
    rows = out.collect()
    assert len(rows) == 8
    # selection distances are non-decreasing is NOT required (farthest-
    # first radii are non-increasing after round 1) — check that law:
    d = [r["sel_d2q"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(d, d[1:])), d
    plan = executed_plan(out)
    assert "CartesianProduct" not in plan, plan


def test_lpa_modularity_plan_is_bounded(spark, sf_dir):
    """3 unrolled LPA rounds: the executed plan must not contain a
    cartesian product and the per-round lineage is checkpoint-truncated
    (no geometric plan growth)."""
    from gmall_211027_flink_spark.operators.bucketing import executed_plan
    from gmall_211027_flink_spark.operators.graph import graph_lpa_modularity

    out = graph_lpa_modularity(spark, str(sf_dir))
    out.collect()
    plan = executed_plan(out)
    assert "CartesianProduct" not in plan, plan
