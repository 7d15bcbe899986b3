"""Property-based tests (hypothesis): operator equivalences that must
hold for ANY input, not just the synthetic tables — the salted plans,
the upsert sink, and the two as-of implementations each have a simpler
specification they must agree with.

Examples are deliberately small (Spark round-trip per example is ~1 s);
the value is in hypothesis exploring key collisions, ties, empty groups,
and single-row edge cases that fixed fixtures miss.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=5)
rows = st.lists(st.tuples(keys, st.integers(0, 100)), min_size=1, max_size=40)


@given(data=rows)
@SETTINGS
def test_salted_groupby_count_equals_plain(spark, data):
    from gmall_211027_flink_spark.operators.joins import salted_groupby_count
    df = spark.createDataFrame(data, "k int, v int")
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"]
              for r in salted_groupby_count(df, "k", salt_buckets=4).collect()}
    assert salted == plain


@given(data=st.lists(
    st.tuples(keys, st.integers(0, 50), st.integers(0, 9)),
    min_size=1, max_size=30))
@SETTINGS
def test_upsert_sink_is_last_wins_by_order_col(spark, tmp_path_factory, data):
    from gmall_211027_flink_spark.streaming.sinks import ParquetUpsertSink
    path = str(tmp_path_factory.mktemp("upsert") / "t")
    df = spark.createDataFrame(data, "k int, ts int, v int")
    # two batches split at the midpoint — replays across batches included
    mid = len(data) // 2
    sink = ParquetUpsertSink(path, ["k"], "ts")
    b1, b2 = data[:mid], data[mid:]
    if b1:
        sink.write_batch(spark.createDataFrame(b1, df.schema), 0)
    if b2:
        sink.write_batch(spark.createDataFrame(b2, df.schema), 1)
    got = {r["k"]: (r["ts"], r["v"]) for r in sink.read(spark).collect()}

    # spec (upsert-kafka semantics): WITHIN a batch the max-order_col row
    # wins; ACROSS batches the later batch unconditionally replaces the
    # key — batch order IS stream order, like a changelog topic
    expect: dict[int, tuple[int, int]] = {}
    for batch in (b1, b2):
        best: dict[int, tuple[int, int]] = {}
        for k, ts, v in batch:
            if k not in best or ts >= best[k][0]:
                best[k] = (ts, v)
        expect.update(best)
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0]


@given(data=st.lists(
    st.tuples(keys, st.integers(0, 1000),
              st.sampled_from(["view", "purchase"])),
    min_size=1, max_size=30, unique_by=lambda t: (t[0], t[1])))
@SETTINGS
def test_asof_window_form_matches_python_spec(spark, data):
    """The carry-forward window as-of join agrees with a direct Python
    computation of 'most recent strictly-earlier view per purchase'."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(k, ts, et, i) for i, (k, ts, et) in enumerate(data)],
        "user_id int, ts int, event_type string, event_id int")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    got = {
        r["event_id"]: r["prior_view"]
        for r in df.withColumn(
            "prior_view",
            F.last(F.when(F.col("event_type") == "view",
                          F.col("event_id")), ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase").collect()
    }

    expect = {}
    for k, ts, et, i in sorted(
            [(k, ts, et, i) for i, (k, ts, et) in enumerate(data)],
            key=lambda t: (t[0], t[1], t[3])):
        if et == "purchase":
            expect[i] = None
            for k2, ts2, et2, i2 in sorted(
                    [(kk, tt, ee, ii) for ii, (kk, tt, ee) in enumerate(data)],
                    key=lambda t: (t[1], t[3])):
                if k2 == k and et2 == "view" and (ts2, i2) < (ts, i):
                    expect[i] = i2
    assert got == expect


# --- band_join_binned ≡ naive theta band join -------------------------------

band_vals = st.lists(st.integers(0, 200), min_size=1, max_size=25)


@given(lv=band_vals, rv=band_vals,
       eps=st.sampled_from([0.5, 1.0, 2.5, 7.0]))
@SETTINGS
def test_band_join_binned_equals_theta(spark, lv, rv, eps):
    """The binned equi-join must produce exactly the naive theta join's
    pairs — bin boundaries may only decide WHERE a pair meets, never
    WHETHER. Integer-valued doubles land exactly on bin edges, which is
    the adversarial case for floor-based binning."""
    from gmall_211027_flink_spark.operators.joins import band_join_binned
    left = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(lv)], "lid int, lval double")
    right = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(rv)], "rid int, rval double")
    naive = {(r["lid"], r["rid"])
             for r in left.join(
                 right, F.abs(F.col("lval") - F.col("rval")) <= eps).collect()}
    binned = {(r["lid"], r["rid"])
              for r in band_join_binned(left, right, "lval", "rval", eps)
              .collect()}
    assert binned == naive


# --- hash-bucket split: deterministic, partition-invariant, append-stable ---

@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=40,
                    unique=True))
@SETTINGS
def test_assign_split_stable_under_repartition_and_append(spark, ids):
    from gmall_211027_flink_spark.operators.sampling import assign_split
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    base = {r["doc_id"]: r["split"]
            for r in assign_split(df, "doc_id").collect()}
    # repartitioning must not move any row between splits
    shuffled = {r["doc_id"]: r["split"]
                for r in assign_split(df.repartition(7), "doc_id").collect()}
    assert shuffled == base
    # appending new rows must not reassign existing ones
    appended = df.union(spark.createDataFrame(
        [(max(ids) + 1 + k,) for k in range(3)], "doc_id long"))
    grown = {r["doc_id"]: r["split"]
             for r in assign_split(appended, "doc_id").collect()}
    assert {k: grown[k] for k in base} == base


# --- pigeonhole fuzzy blocking: full recall vs naive levenshtein ------------

name_strat = st.text(alphabet="ab1", min_size=6, max_size=6)


@given(names=st.lists(name_strat, min_size=2, max_size=15, unique=True))
@SETTINGS
def test_fuzzy_parity_blocking_full_recall(spark, names):
    """Any two equal-length strings within edit distance 1 agree on one
    character-parity projection — the blocked candidate set must contain
    every naive levenshtein<=1 pair. Tiny alphabet maximizes near-miss
    density."""
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "k int, name string")
    import pyspark.sql.functions as FF
    lev = {(r["ak"], r["bk"]) for r in
           df.alias("a").join(df.alias("b"), FF.col("a.k") < FF.col("b.k"))
             .select(FF.col("a.k").alias("ak"), FF.col("b.k").alias("bk"),
                     FF.levenshtein("a.name", "b.name").alias("d"))
             .filter(FF.col("d") <= 1).collect()}
    seg = df.select(
        "k", "name",
        FF.regexp_replace(FF.col("name"), "(.).", "$1").alias("h1"),
        FF.regexp_replace(FF.expr("substring(name, 2)"), "(.).", "$1")
          .alias("h2"))
    cands = set()
    for h in ("h1", "h2"):
        a = seg.select(FF.col("k").alias("ak"), FF.col("name").alias("an"),
                       FF.col(h).alias("blk"))
        b = seg.select(FF.col("k").alias("bk"), FF.col("name").alias("bn"),
                       FF.col(h).alias("blk"))
        j = (a.join(b, "blk").filter(FF.col("ak") < FF.col("bk"))
             .withColumn("d", FF.levenshtein("an", "bn"))
             .filter(FF.col("d") <= 1))
        cands |= {(r["ak"], r["bk"]) for r in j.collect()}
    assert cands == lev, (sorted(lev - cands), names)


# word soup from a tiny vocab: maximizes shingle overlap, identical docs,
# and df>cap-style hot shingles within hypothesis's small examples
_words = st.lists(st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=0, max_size=12)


@given(docs=st.lists(_words, min_size=2, max_size=10))
@SETTINGS
def test_prefix_filtered_jaccard_equals_bruteforce_spec(
        spark, tmp_path_factory, docs):
    """The AllPairs/PPJoin prefix+positional filtering in
    dedup_ngram_jaccard must be a pure physical optimization: its output
    equals the quadratic all-pairs specification for ANY corpus —
    including all-identical docs (max clique), sub-3-word docs (empty
    shingle sets), and single hot shingles shared by every doc."""
    from gmall_211027_flink_spark.operators.dedup import (
        JACCARD_THRESHOLD, dedup_ngram_jaccard)

    d = tmp_path_factory.mktemp("pfx")
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(d / "documents.parquet"))

    # brute-force spec in plain Python
    shingles = []
    for _, text in rows:
        ws = text.split(" ")
        shingles.append({" ".join(ws[i:i + 3])
                         for i in range(max(len(ws) - 2, 0))})
    expected = {}
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            i = len(shingles[a] & shingles[b])
            if i == 0:
                continue
            jac = i / (len(shingles[a]) + len(shingles[b]) - i)
            if jac >= JACCARD_THRESHOLD:
                expected[(a, b)] = round(jac, 9)

    got = {(r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
           for r in dedup_ngram_jaccard(spark, str(d)).collect()}
    assert got == expected


@given(x=st.floats(min_value=0.001, max_value=0.999))
@settings(max_examples=200, deadline=None)
def test_threshold_fraction_floor_is_tight_lower_bound(x):
    """No Spark needed: the rational stand-in for JACCARD_THRESHOLD must
    (a) never exceed the double (else integer prefilters over-prune —
    ADVICE r3) and (b) be the TIGHTEST such fraction with denominator
    <= 1000 (else prefilters are looser than necessary)."""
    from fractions import Fraction

    from gmall_211027_flink_spark.operators.dedup import (
        _threshold_fraction_floor)

    n, d = _threshold_fraction_floor(x)
    fx = Fraction(x)
    best = Fraction(n, d)
    assert best <= fx
    for dd in range(1, 1001):
        assert Fraction((fx.numerator * dd) // fx.denominator, dd) <= best


scd2_events = st.lists(
    st.tuples(st.integers(0, 3),                 # pk
              st.integers(0, 20),                # ts offset (seconds)
              st.integers(0, 5),                 # seq
              st.sampled_from(["A", "B", "C"])),  # status
    min_size=1, max_size=24)


@given(events=scd2_events, cut1=st.integers(0, 20), cut2=st.integers(0, 20))
@SETTINGS
def test_scd2_incremental_merge_equals_batch(spark, events, cut1, cut2):
    """Folding scd2_merge_batch over ANY ts-ordered chunking of a
    changelog equals the one-shot batch recompute (streaming/scd2.py's
    core invariant). Chunk boundaries are arbitrary ts cuts, so chunks
    may be empty, split equal-status runs, or isolate single events."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F  # noqa: F811

    from gmall_211027_flink_spark.operators.windows import scd2_versions
    from gmall_211027_flink_spark.streaming.scd2 import scd2_merge_batch

    t0 = datetime(2024, 1, 1)
    rows = [(pk, t0 + timedelta(seconds=ts), seq, status)
            for pk, ts, seq, status in events]
    schema = "pk bigint, ts timestamp, seq int, status string"
    lo, hi = sorted([cut1, cut2])
    chunks = [
        [r for r in rows if r[1] < t0 + timedelta(seconds=lo)],
        [r for r in rows if t0 + timedelta(seconds=lo) <= r[1]
         < t0 + timedelta(seconds=hi)],
        [r for r in rows if r[1] >= t0 + timedelta(seconds=hi)],
    ]
    store = spark.createDataFrame(
        [], "pk bigint, status string, eff_from timestamp, "
            "eff_to timestamp, is_current int")
    for chunk in chunks:
        if not chunk:
            continue
        store = scd2_merge_batch(store, spark.createDataFrame(chunk, schema))
        store = spark.createDataFrame(store.collect(), store.schema)
    want = scd2_versions(spark.createDataFrame(rows, schema))
    fmt = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert fmt(store) == fmt(want)


inc_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(-50, 50)),
    min_size=1, max_size=30)


@given(rows=inc_rows, cut1=st.integers(0, 30), cut2=st.integers(0, 30))
@SETTINGS
def test_incremental_agg_fold_equals_batch(spark, tmp_path_factory,
                                           rows, cut1, cut2):
    """Any slicing of the input folded through IncrementalAggStore
    equals the one-shot batch aggregate (streaming/incremental.py's
    core invariant)."""
    from gmall_211027_flink_spark.streaming.incremental import (
        IncrementalAggStore)

    tmp = tmp_path_factory.mktemp("inc")
    lo, hi = sorted([cut1, cut2])
    chunks = [rows[:lo], rows[lo:hi], rows[hi:]]
    specs = {"ct": ("count", None), "s": ("sum", "v"),
             "mn": ("min", "v"), "mx": ("max", "v")}
    store = IncrementalAggStore(str(tmp / "s"), ["k"], specs)
    for i, ch in enumerate(chunks):
        if ch:
            store.write_batch(
                spark.createDataFrame(ch, "k string, v int"), i)
    got = sorted(tuple(r) for r in store.read(spark).collect())
    truth = spark.createDataFrame(rows, "k string, v int").groupBy("k").agg(
        F.count("*").alias("ct"), F.sum("v").alias("s"),
        F.min("v").alias("mn"), F.max("v").alias("mx"))
    assert got == sorted(tuple(r) for r in truth.collect())


words = st.sampled_from(["a", "b", "c", "d"])
docs_corpus = st.lists(
    st.lists(words, min_size=0, max_size=50), min_size=1, max_size=8)


@given(texts=docs_corpus)
@SETTINGS
def test_passage_dedup_matches_python_spec(spark, tmp_path_factory, texts):
    """dedup_passage_exact vs a direct Python spec: same keep/drop
    decisions and same cleaned-text fingerprints for ANY corpus,
    including empty docs, sub-window docs, and heavy cross-doc
    duplication (small alphabet forces repeated passages)."""
    import hashlib

    from gmall_211027_flink_spark.operators.dedup import (
        PARA_W, dedup_passage_exact)

    rows = [(i, " ".join(t), "en", "src", len(" ".join(t)))
            for i, t in enumerate(texts)]
    d = tmp_path_factory.mktemp("pd")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
     .coalesce(1).write.mode("overwrite")
     .parquet(str(d / "documents.parquet")))

    # python spec: split EXACTLY like the engine (split on ' ' keeps
    # empty strings, so an empty text is one empty word)
    seen = set()
    want = {}
    for doc_id, text, *_ in rows:
        w = text.split(" ")
        chunks = [" ".join(w[i * PARA_W:(i + 1) * PARA_W])
                  for i in range((len(w) + PARA_W - 1) // PARA_W)]
        kept = [c for c in chunks if (c not in seen, seen.add(c))[0]]
        want[doc_id] = (len(kept), len(chunks) - len(kept),
                        hashlib.md5(" ".join(kept).encode()).hexdigest())
    got = {r["doc_id"]: (r["kept_ct"], r["dropped_ct"], r["clean_fp"])
           for r in dedup_passage_exact(spark, str(d)).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Round-4 operators vs pure-Python specs.
# ---------------------------------------------------------------------------

_snap_texts = st.lists(
    st.tuples(st.integers(0, 30), st.text(alphabet="abc ", max_size=8)),
    min_size=0, max_size=25, unique_by=lambda t: t[0])


@given(old=_snap_texts, new=_snap_texts)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_snapshot_diff_matches_python_spec(spark, old, new):
    from pyspark.sql import functions as F

    from gmall_211027_flink_spark.operators.sampling import snapshot_diff

    schema = "doc_id long, text string"
    o = spark.createDataFrame(old or [], schema).withColumn(
        "h", F.md5("text"))
    n = spark.createDataFrame(new or [], schema).withColumn(
        "h", F.md5("text"))
    got = {r.k: r.status
           for r in snapshot_diff(o, n, "doc_id", "h").collect()}
    od, nd = dict(old), dict(new)
    want = {}
    for k in set(od) | set(nd):
        if k not in od:
            want[k] = "added"
        elif k not in nd:
            want[k] = "removed"
        elif od[k] != nd[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"
    assert got == want


_edges_strat = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(
        lambda t: t[0] != t[1]),
    min_size=1, max_size=20)


@given(raw=_edges_strat)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_iteration_matches_python_spec(spark, raw):
    """The DataFrame PageRank loop must equal a dict-based reference
    implementation of the same fixed-iteration recurrence."""
    from pyspark.sql import functions as F

    from gmall_211027_flink_spark.operators.graph import PR_DAMPING, PR_ITER

    sym = sorted({(u, v) for u, v in raw} | {(v, u) for u, v in raw})
    edges = spark.createDataFrame(sym, "u long, v long").localCheckpoint()
    deg = edges.groupBy("u").agg(F.count("*").alias("d"))
    n_nodes = deg.agg(F.count("*").cast("double").alias("n_nodes"))
    ranks = (deg.crossJoin(F.broadcast(n_nodes))
             .select(F.col("u").alias("node"),
                     (F.lit(1.0) / F.col("n_nodes")).alias("r")))
    for _ in range(PR_ITER):
        contrib = (edges.join(ranks, edges.u == ranks.node).join(deg, "u")
                   .select("v", (F.col("r") / F.col("d"))
                           .cast("decimal(28,14)").alias("c")))
        ranks = (contrib.groupBy(F.col("v").alias("node"))
                 .agg(F.sum("c").cast("double").alias("s"))
                 .crossJoin(F.broadcast(n_nodes))
                 .select("node", ((1 - PR_DAMPING) / F.col("n_nodes")
                                  + PR_DAMPING * F.col("s")).alias("r")))
    got = {r.node: r.r for r in ranks.collect()}

    # pure-python spec (decimal-quantized contributions like the plan)
    from decimal import Decimal

    nodes = sorted({u for u, _ in sym})
    out = {u: sum(1 for a, _ in sym if a == u) for u in nodes}
    nn = float(len(nodes))
    r = {u: 1.0 / nn for u in nodes}
    q = Decimal(1).scaleb(-14)
    for _ in range(PR_ITER):
        acc = {u: Decimal(0) for u in nodes}
        for u, v in sym:
            acc[v] += Decimal(r[u] / out[u]).quantize(q, rounding="ROUND_HALF_UP")
        r = {u: (1 - PR_DAMPING) / nn + PR_DAMPING * float(acc[u])
             for u in nodes}
    assert set(got) == set(r)
    for k in r:
        assert abs(got[k] - r[k]) < 1e-9, (k, got[k], r[k])


@given(data=st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 1000)),
    min_size=1, max_size=40),
    dim=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 9)),
                 min_size=1, max_size=8, unique_by=lambda t: t[0]),
    n_salts=st.integers(2, 6))
@SETTINGS
def test_salted_join_equals_plain_join(spark, data, dim, n_salts):
    """salted_join must be row-identical to the plain equi-join for any
    fact/dim/salt-width combination — including hot keys, keys missing
    from the dim, and single-row sides."""
    from gmall_211027_flink_spark.operators.joins import salted_join
    fact = spark.createDataFrame(data, "k int, rid int")
    d = spark.createDataFrame(dim, "dk int, attr int")
    got = sorted((r["rid"], r["attr"]) for r in salted_join(
        fact, d, "k", "dk", "rid", n_salts=n_salts).collect())
    want = sorted((r["rid"], r["attr"]) for r in fact.join(
        d, fact.k == d.dk).collect())
    assert got == want


@given(member=st.lists(st.integers(0, 1000), min_size=1, max_size=30,
                       unique=True))
@SETTINGS
def test_bloom_positions_have_no_false_negatives(spark, member):
    """Every member key must pass all k bloom probes — false negatives
    are impossible by construction for any key set."""
    from gmall_211027_flink_spark.operators.joins import BLOOM_K, BLOOM_M

    def pos(col, seed):
        return F.pmod(
            F.conv(F.substring(F.md5(F.concat_ws(
                ":", F.lit(seed), col.cast("string"))), 1, 15),
                16, 10).cast("bigint"), F.lit(BLOOM_M))

    dim = spark.createDataFrame([(k,) for k in member], "k bigint")
    bits = None
    for s in range(BLOOM_K):
        p = dim.select(pos(F.col("k"), s).alias("p"))
        bits = p if bits is None else bits.unionAll(p)
    bits = bits.distinct()
    surv = dim
    for s in range(BLOOM_K):
        pr = surv.withColumn("_p", pos(F.col("k"), s))
        surv = (pr.join(F.broadcast(bits), pr["_p"] == bits["p"],
                        "left_semi").drop("_p"))
    assert surv.count() == len(member)


@given(xs=st.lists(
    st.floats(min_value=0.0, max_value=1e6, allow_nan=False,
              allow_infinity=False),
    min_size=2, max_size=60))
@SETTINGS
def test_truncated_ewma_tracks_recursive_within_tail_mass(xs):
    """The 10-lag explicit-weight EWMA must agree with the infinite
    recursion to within the truncated tail mass (1-alpha)^LAGS of the
    value range — pure driver-side math, no Spark needed."""
    from gmall_211027_flink_spark.operators.aggregates import (
        _EWMA_W, EWMA_ALPHA, EWMA_LAGS)
    ws = [float(w) for w in _EWMA_W]
    rec = xs[0]
    for t, x in enumerate(xs):
        if t == 0:
            rec = x
        else:
            rec = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * rec
        lo = max(0, t - EWMA_LAGS + 1)
        window = xs[lo:t + 1][::-1]          # newest first
        num = sum(w * v for w, v in zip(ws, window))
        den = sum(ws[:len(window)])
        trunc = num / den
        bound = (1 - EWMA_ALPHA) ** min(t + 1, EWMA_LAGS) \
            * (max(xs) - min(xs) + 1e-9)
        assert abs(trunc - rec) <= bound + 1e-6


# -------------------------------------------------- KM survival fold ------

@given(data=st.lists(
    st.tuples(st.integers(0, 5),      # events at this time
              st.integers(0, 3)),     # censored at this time
    min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_km_integer_fold_tracks_exact_rational(data):
    """The scaled-BIGINT survival fold (stats_kaplan_meier_churn) must
    stay within the accumulated half-ulp quantization bound of the
    exact rational KM product, and be monotone non-increasing."""
    from fractions import Fraction

    total = sum(d + c for d, c in data) + 1   # keep n >= 1 at the end
    n = total
    acc = 10**9
    exact = Fraction(1)
    prev = 10**9
    steps = 0
    for d, c in data:
        if n <= 0:
            break
        d = min(d, n)
        factor = (2 * (n - d) * 10**9 + n) // (2 * n)       # half-up
        acc = (acc * factor + 500_000_000) // 10**9         # half-up
        exact *= Fraction(n - d, n)
        n -= d + c
        steps += 1
        assert acc <= prev                    # monotone non-increasing
        prev = acc
        # each step adds <= 1 quantum of rounding error (half-up twice
        # per step is still bounded by 1 quantum per step)
        bound = steps + 1
        assert abs(acc - exact * 10**9) <= bound, (acc, float(exact), data)
    assert 0 <= acc <= 10**9
