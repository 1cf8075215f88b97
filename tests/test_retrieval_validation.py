"""Retrieval (inverted index / BM25), HLL sketches, validation suite,
profiling, entropy, unicode normalization, and anomaly detection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from moz_datapipeline_spark.operators.retrieval import (
    bm25_topk,
    build_posting_store,
    conjunctive_search,
    posting_rows,
    search_posting_store,
)
from moz_datapipeline_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from moz_datapipeline_spark.operators.validation import (
    Check,
    equi_width_histogram,
    profile_columns,
    validate,
)


# ---------------------------------------------------------------- retrieval

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "cat cat cat"),
    (4, "nothing relevant here"),
    (5, None),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_posting_rows_tf_and_len(docs):
    rows = {
        (r.term, r.doc_id): (r.tf, r.doc_len)
        for r in posting_rows(docs).collect()
    }
    assert rows[("the", 1)] == (2, 6)
    assert rows[("cat", 3)] == (3, 3)
    assert ("the", 4) not in rows
    # null text contributes nothing
    assert not any(d == 5 for (_, d) in rows)


def test_conjunctive_search_requires_all_terms(docs):
    got = {r.doc_id for r in conjunctive_search(docs, ["cat", "sat"]).collect()}
    assert got == {1}
    # single term
    got1 = {r.doc_id for r in conjunctive_search(docs, ["cat"]).collect()}
    assert got1 == {1, 3}
    with pytest.raises(ValueError):
        conjunctive_search(docs, [])


def _bm25_reference(corpus, query, k1=1.2, b=0.75):
    """Plain-python BM25 for the tiny fixture."""
    toks = {d: t.lower().split() for d, t in corpus if t is not None}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for term in set(query):
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if tf:
                w = idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(t) / avgdl)
                )
                scores[d] = scores.get(d, 0.0) + w
    return scores


def test_bm25_matches_reference_formula(docs):
    got = {
        r.doc_id: r.score for r in bm25_topk(docs, ["cat", "sat"], k=10).collect()
    }
    want = _bm25_reference(DOCS, ["cat", "sat"])
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-6)


def test_bm25_repeated_query_terms_dedup(docs):
    once = bm25_topk(docs, ["cat"], k=10).collect()
    twice = bm25_topk(docs, ["cat", "cat"], k=10).collect()
    assert sorted((r.doc_id, r.score) for r in once) == sorted(
        (r.doc_id, r.score) for r in twice
    )


def test_posting_store_prunes_partitions(spark, docs, tmp_path):
    path = str(tmp_path / "pstore")
    build_posting_store(docs, path, num_buckets=8)
    out = search_posting_store(spark, path, ["cat"], num_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the tb filter must actually appear in the partition filters
    pf_line = plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    assert "tb" in pf_line
    got = {(r.term, r.doc_id): r.tf for r in out.collect()}
    assert got == {("cat", 1): 1, ("cat", 3): 3}


# ---------------------------------------------------------------- HLL

def test_hll_estimate_accuracy(spark):
    n = 5000
    df = spark.range(n).select(F.col("id").alias("k"))
    est = hll_distinct(df, "k", p=10).collect()[0].est_distinct
    # standard error ~1.04/sqrt(1024) ≈ 3.3%; allow 10%
    assert abs(est - n) / n < 0.10


def test_hll_merge_is_union_semantics(spark):
    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(500, 1500).select(F.col("id").alias("k"))
    ra, rb = hll_registers(a, "k"), hll_registers(b, "k")
    merged = hll_estimate(hll_merge(ra, rb))
    direct = hll_distinct(
        a.unionByName(b), "k"
    )
    assert merged.collect()[0].est_distinct == direct.collect()[0].est_distinct
    # idempotent: merging a sketch with itself changes nothing
    again = hll_estimate(hll_merge(ra, ra))
    solo = hll_estimate(ra)
    assert again.collect()[0].est_distinct == solo.collect()[0].est_distinct


def test_hll_rejects_small_p(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        hll_registers(df, "k", p=4)


# ---------------------------------------------------------------- validation

def test_validate_pass_and_fail(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (3, None, 2.0), (3, "c", 0.0)],
        "id long, name string, v double",
    )
    out = {
        (r.kind, r.column): (r.metric, r.passed)
        for r in validate(
            df,
            [
                Check("not_null", "name"),
                Check("unique", "id"),
                Check("complete", "name", threshold=0.5),
                Check("min", "v", threshold=0.0),
                Check("max", "v", threshold=10.0),
                Check("non_negative", "v"),
                Check("in_set", "name", allowed=("a", "b", "c")),
            ],
        ).collect()
    }
    assert out[("not_null", "name")] == (1.0, False)
    assert out[("unique", "id")] == (0.75, False)
    assert out[("complete", "name")] == (0.75, True)
    assert out[("min", "v")] == (-1.0, False)
    assert out[("max", "v")] == (5.0, True)
    assert out[("non_negative", "v")] == (1.0, False)
    # in_set counts NULL as non-member
    assert out[("in_set", "name")][1] is False

    with pytest.raises(ValueError):
        validate(df, [])
    with pytest.raises(ValueError):
        validate(df, [Check("bogus", "id")])


def test_validate_matches_ratio_over_non_null(spark):
    df = spark.createDataFrame(
        [("1-A",), ("2-B",), (None,), ("bad",)], "p string"
    )
    r = validate(df, [Check("matches", "p", threshold=0.6, pattern=r"^\d-")])
    row = r.collect()[0]
    # 2 of 3 non-null match
    assert row.metric == pytest.approx(2 / 3, abs=1e-6)
    assert row.passed


def test_profile_columns_shape(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, None, 1.5), (2, "y", None)],
        "id long, s string, v double",
    )
    prof = {r.column: r for r in profile_columns(df, ["id", "s", "v"]).collect()}
    assert prof["id"].n_distinct == 2 and prof["id"].n_nulls == 0
    assert prof["s"].n_nulls == 1 and prof["s"].min_val == "x"
    assert prof["v"].mean_val == pytest.approx(2.0)
    assert prof["s"].mean_val is None


def test_histogram_bins_and_degenerate(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    bins = {r.bin_id: r.n for r in equi_width_histogram(df, "x", 10).collect()}
    assert sum(bins.values()) == 100
    # max value closed into last bin
    assert bins[9] == 10 and bins[0] == 10
    # degenerate: all equal
    same = spark.createDataFrame([(1.0,), (1.0,)], "x double")
    d = equi_width_histogram(same, "x", 5).collect()
    assert len(d) == 1 and d[0].bin_id == 0 and d[0].n == 2


# ---------------------------------------------------------------- text extras

def test_char_entropy_known_values(spark):
    from moz_datapipeline_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "abca"), (2, "aaaa"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_chars_total, r.char_entropy) for r in char_entropy(df).collect()}
    assert got[1] == (4, 1.5)
    assert got[2] == (4, 0.0)  # -0.0 normalized by round
    assert got[3] == (0, 0.0)
    assert got[4] == (0, 0.0)


def test_normalize_unicode_composes_and_strips(spark):
    from moz_datapipeline_spark.operators.text import normalize_unicode

    df = spark.createDataFrame(
        [(1, "café  x\tz"), (2, "a\x00b\x07c"), (3, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text_norm for r in normalize_unicode(df).collect()}
    assert got[1] == "café x z"
    assert got[2] == "abc"
    assert got[3] is None


# ---------------------------------------------------------------- anomaly

def test_rolling_zscore_flags_planted_spike(spark):
    from datetime import datetime, timedelta

    from moz_datapipeline_spark.operators.temporal import (
        rolling_zscore_anomalies,
    )

    base = datetime(2024, 1, 1)
    rows = []
    for h in range(48):
        # steady signal with mild noise, one massive spike at h=40
        v = 100.0 + (h % 3) + (10_000.0 if h == 40 else 0.0)
        rows.append((h, base + timedelta(hours=h, minutes=5), "load", v))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = rolling_zscore_anomalies(df, window=24, threshold=3.0)
    flagged = [r for r in out.collect() if r.is_anomaly]
    assert len(flagged) == 1
    assert (flagged[0].bucket_epoch % 86400) // 3600 == 16  # h=40 -> day 2, 16:00
    # early buckets with <2 trailing points: no judgement
    early = [r for r in out.collect() if r.zscore is None]
    assert len(early) >= 1


# ------------------------------------------------------- more-like-this

def test_tfidf_cosine_topk_excludes_self_and_ranks(spark):
    from moz_datapipeline_spark.operators.retrieval import tfidf_cosine_topk

    df = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple banana cherry"),     # exact twin of 1
            (3, "apple banana distinct"),   # 2/3 overlap
            (4, "zebra yak xylophone"),     # disjoint
        ],
        "doc_id long, text string",
    )
    out = tfidf_cosine_topk(df, [1], k=3, max_df_ratio=1.0).collect()
    assert all(r.query_id == 1 and r.corpus_id != 1 for r in out)
    by_rank = sorted(out, key=lambda r: r.rank)
    assert by_rank[0].corpus_id == 2 and by_rank[0].cosine == pytest.approx(1.0)
    # disjoint doc shares no terms -> absent entirely
    assert all(r.corpus_id != 4 for r in out)


def test_tfidf_cosine_df_cap_drops_stopwords(spark):
    from moz_datapipeline_spark.operators.retrieval import tfidf_cosine_topk

    df = spark.createDataFrame(
        [
            (1, "the unique1 word1"),
            (2, "the unique1 word2"),
            (3, "the other thing"),
            (4, "the more stuff"),
        ],
        "doc_id long, text string",
    )
    # 'the' appears in 4/4 docs; cap 0.5 drops it, so doc 3/4 share
    # nothing with doc 1
    out = tfidf_cosine_topk(df, [1], k=4, max_df_ratio=0.5).collect()
    assert {r.corpus_id for r in out} == {2}


# --------------------------------------------------- equi-depth histogram

def test_equi_depth_histogram_balanced(spark):
    from moz_datapipeline_spark.operators.validation import (
        equi_depth_histogram,
    )

    df = spark.createDataFrame([(float(i),) for i in range(80)], "x double")
    bins = {r.bin_id: r for r in equi_depth_histogram(df, "x", 8).collect()}
    assert len(bins) == 8
    # perfectly divisible input -> 10 rows per bin
    assert all(bins[b].n == 10 for b in range(8))
    # bins tile the range in order
    assert bins[0].bin_lo == 0.0 and bins[7].bin_hi == 79.0
    with pytest.raises(ValueError):
        equi_depth_histogram(df, "x", 1)


# --------------------------------------------------- source overlap matrix

def test_source_overlap_matrix_jaccard(spark):
    from moz_datapipeline_spark.operators.corpus import source_overlap_matrix

    text_a = "one two three four five six"      # grams: 1-5, 2-6
    text_b = "one two three four five seven"    # grams: 1-5', 2-6'
    df = spark.createDataFrame(
        [
            (1, "A", text_a),
            (2, "B", text_a),                    # B identical to A
            (3, "C", text_b),                    # C shares gram "one..five"
            (4, "D", "short text"),              # no 5-grams
        ],
        "doc_id long, source string, text string",
    )
    out = {
        (r.source_a, r.source_b): r
        for r in source_overlap_matrix(df, n=5).collect()
    }
    assert out[("A", "B")].jaccard == pytest.approx(1.0)
    ac = out[("A", "C")]
    assert ac.shared == 1 and ac.jaccard == pytest.approx(1 / 3, abs=1e-6)
    assert not any("D" in k for k in out)


# --------------------------------------------------------- streaming HLL

def test_hll_ingest_stream_idempotent_restart(spark, tmp_path):
    """Streamed register appends + merge-on-read estimate; a replayed
    run with the same checkpoint adds nothing; compaction preserves
    the estimate while folding files."""
    import json as _json

    from moz_datapipeline_spark.streaming.stateful import (
        compact_hll_store,
        hll_ingest_stream,
        hll_store_estimate,
    )
    from moz_datapipeline_spark.operators.sketches import hll_distinct

    src = tmp_path / "in"
    src.mkdir()
    for b in range(3):
        with open(src / f"b{b}.json", "w") as f:
            for i in range(400):
                f.write(_json.dumps({"k": (b * 250 + i) % 900}) + "\n")

    stream = spark.readStream.schema("k long").json(str(src))
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    q = hll_ingest_stream(stream, store, ckpt, "k", p=10)
    q.awaitTermination(120)

    est = hll_store_estimate(spark, store, p=10).collect()[0].est_distinct
    batch = spark.read.json(str(src), schema="k long")
    want = hll_distinct(batch, "k", p=10).collect()[0].est_distinct
    assert est == want  # merge-on-read == one-shot sketch, exactly

    # restart with same checkpoint: availableNow sees no new files
    q2 = hll_ingest_stream(
        spark.readStream.schema("k long").json(str(src)), store, ckpt, "k", p=10
    )
    q2.awaitTermination(120)
    est2 = hll_store_estimate(spark, store, p=10).collect()[0].est_distinct
    assert est2 == est

    compact_hll_store(spark, store)
    est3 = hll_store_estimate(spark, store, p=10).collect()[0].est_distinct
    assert est3 == est


# ------------------------------------------------------ winsorize / robust

def test_winsorize_clips_tails(spark):
    from moz_datapipeline_spark.operators.validation import winsorize

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 100)] + [(10_000.0,)], "x double"
    )
    out = winsorize(df, "x", 0.05, 0.95)
    rows = out.collect()
    clipped = [r for r in rows if r.was_clipped]
    assert any(r.x == 10_000.0 for r in clipped)
    hi = max(r.x_wins for r in rows)
    lo = min(r.x_wins for r in rows)
    assert hi < 10_000.0 and lo > 1.0
    with pytest.raises(ValueError):
        winsorize(df, "x", 0.9, 0.1)


def test_robust_scale_median_zero_and_constant_group(spark):
    from moz_datapipeline_spark.operators.validation import robust_scale

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0),
         ("b", 7.0), ("b", 7.0)],
        "g string, x double",
    )
    out = {(r.g, r.x): r.x_scaled for r in robust_scale(df, "x", "g").collect()}
    # group a: median 3, IQR = 4 - 2 = 2
    assert out[("a", 3.0)] == 0.0
    assert out[("a", 5.0)] == pytest.approx(1.0)
    # constant group: IQR 0 -> 0.0 by convention
    assert out[("b", 7.0)] == 0.0


# ------------------------------------------------------- trigram LM

def test_lm_trigram_matches_python_reference(spark):
    import math

    from moz_datapipeline_spark.operators.lm import (
        lm_score_trigram,
        train_trigram_lm,
    )

    ref_texts = ["a b c a b c", "a b d"]
    eval_texts = [(1, "a b c"), (2, "a b x"), (3, "zz"), (4, None)]
    ref = spark.createDataFrame([(t,) for t in ref_texts], "text string")
    docs = spark.createDataFrame(eval_texts, "doc_id long, text string")
    tri, bi, uni, tot = train_trigram_lm(ref)
    got = {r.doc_id: r for r in lm_score_trigram(docs, tri, bi, uni, tot).collect()}

    # python reference
    def toks(s):
        return [w for w in s.split(" ") if w]

    tri_c, bi_c, uni_c = {}, {}, {}
    for t in ref_texts:
        ws = toks(t)
        for i in range(len(ws) - 2):
            tri_c[tuple(ws[i:i+3])] = tri_c.get(tuple(ws[i:i+3]), 0) + 1
        for i in range(len(ws) - 1):
            bi_c[tuple(ws[i:i+2])] = bi_c.get(tuple(ws[i:i+2]), 0) + 1
        for w in ws:
            uni_c[w] = uni_c.get(w, 0) + 1
    n_tok, v = sum(uni_c.values()), len(uni_c)

    def p(w1, w2, w3):
        t3 = tri_c.get((w1, w2, w3), 0) / bi_c[(w1, w2)] if (w1, w2) in bi_c else 0.0
        t2 = bi_c.get((w2, w3), 0) / uni_c[w2] if w2 in uni_c else 0.0
        t1 = (uni_c.get(w3, 0) + 0.1) / (n_tok + 0.1 * v)
        return 0.6 * t3 + 0.3 * t2 + 0.1 * t1

    # doc 1: "a b c" -> one trigram seen in training
    want_h1 = -math.log(p("a", "b", "c"))
    assert got[1].n_trigrams == 1
    assert got[1].cross_entropy == pytest.approx(want_h1, abs=1e-6)
    # doc 2 ends with OOV token x: unigram floor keeps p finite
    want_h2 = -math.log(p("a", "b", "x"))
    assert got[2].cross_entropy == pytest.approx(want_h2, abs=1e-6)
    assert got[2].cross_entropy > got[1].cross_entropy
    # short and NULL docs survive with NULL scores
    assert got[3].n_trigrams == 0 and got[3].cross_entropy is None
    assert got[4].n_trigrams == 0 and got[4].cross_entropy is None


def test_ngram_diversity_known_ratio(spark):
    from moz_datapipeline_spark.operators.corpus import ngram_diversity

    df = spark.createDataFrame(
        [
            (1, "A", "a b c a b c a b c"),  # trigram "a b c" repeats
            (2, "B", "p q r s t"),          # all distinct
            (3, "C", "xy"),                 # too short: no trigrams
        ],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in ngram_diversity(df, n=3).collect()}
    a = out["A"]
    assert a.total_ngrams == 7 and a.distinct_ngrams == 3
    assert a.diversity == pytest.approx(3 / 7, abs=1e-6)
    assert out["B"].diversity == 1.0
    assert "C" not in out


# --------------------------------------------------- paths / market basket

def test_top_event_paths_orders_within_session(spark):
    from datetime import datetime, timedelta

    from moz_datapipeline_spark.operators.analytics import top_event_paths

    base = datetime(2024, 1, 1)
    rows = []
    # user 1: view->click->purchase twice (separate sessions); user 2: view only
    for s in range(2):
        day = base + timedelta(days=s)
        rows += [
            (s * 10 + 1, day, 1, "view"),
            (s * 10 + 2, day + timedelta(minutes=5), 1, "click"),
            (s * 10 + 3, day + timedelta(minutes=10), 1, "purchase"),
        ]
    rows.append((99, base, 2, "view"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.path: r.n_sessions for r in top_event_paths(df, k=10).collect()}
    assert out == {"view > click > purchase": 2, "view": 1}


def test_copurchase_lift_values(spark):
    from moz_datapipeline_spark.operators.analytics import copurchase_lift

    # 4 baskets: {a,b} x3, {c} alone once -> pair (a,b) n=3, lift = 3*4/(3*3)
    rows = []
    for o in range(3):
        rows += [(o, 100), (o, 200)]
    rows.append((3, 300))
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = copurchase_lift(df, min_pair_count=2, k=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.n_pairs) == (100, 200, 3)
    assert r.lift == pytest.approx(3 * 4 / 9, abs=1e-6)


# ------------------------------------------------------------- KMV sketch

def test_kmv_exact_small_and_estimator_modes(spark):
    from moz_datapipeline_spark.operators.sketches import (
        kmv_distinct,
        kmv_registers,
    )

    small = spark.range(50).select(F.col("id").alias("u"))
    regs = kmv_registers(small, "u", k=64)
    r = kmv_distinct(regs, k=64).collect()[0]
    assert r.n_retained == 50 and r.est_distinct == 50.0  # exact mode

    big = spark.range(5000).select(F.col("id").alias("u"))
    r2 = kmv_distinct(kmv_registers(big, "u", k=256), k=256).collect()[0]
    assert r2.n_retained == 256
    # standard error ~1/sqrt(k) ≈ 6%; allow 20%
    assert abs(r2.est_distinct - 5000) / 5000 < 0.20


def test_kmv_merge_union_and_idempotent(spark):
    from moz_datapipeline_spark.operators.sketches import (
        kmv_distinct,
        kmv_merge,
        kmv_registers,
    )

    a = spark.range(0, 3000).select(F.col("id").alias("u"))
    b = spark.range(1500, 4500).select(F.col("id").alias("u"))
    ra, rb = kmv_registers(a, "u", k=128), kmv_registers(b, "u", k=128)
    merged = kmv_distinct(kmv_merge(ra, rb, k=128), k=128).collect()[0]
    direct = kmv_distinct(
        kmv_registers(a.unionByName(b), "u", k=128), k=128
    ).collect()[0]
    assert merged.est_distinct == direct.est_distinct  # exactly equal
    again = kmv_distinct(kmv_merge(ra, ra, k=128), k=128).collect()[0]
    solo = kmv_distinct(ra, k=128).collect()[0]
    assert again.est_distinct == solo.est_distinct


# ------------------------------------------------------------- SCD2 merge

def test_scd2_apply_versions_and_snapshots(spark):
    from pyspark.sql import functions as F2
    from moz_datapipeline_spark.operators.scd import (
        scd2_apply,
        scd2_as_of,
        scd2_current,
    )

    current = spark.createDataFrame(
        [(1, "gold", 0, None), (2, "silver", 0, None),
         (3, "bronze", 0, 50), (3, "silver", 50, None)],
        "k long, tier string, eff_start long, eff_end long",
    )
    updates = spark.createDataFrame(
        [(1, 100, "platinum"), (1, 200, "diamond"), (3, 150, "gold")],
        "k long, ts long, tier string",
    )
    dim = scd2_apply(current, updates, "k", ["tier"], ts_col="ts")
    rows = {(r.k, r.eff_start): (r.tier, r.eff_end) for r in dim.collect()}
    # key 1: open row closed at 100, then 100->200 platinum, open diamond
    assert rows[(1, 0)] == ("gold", 100)
    assert rows[(1, 100)] == ("platinum", 200)
    assert rows[(1, 200)] == ("diamond", None)
    # key 2 untouched
    assert rows[(2, 0)] == ("silver", None)
    # key 3: closed history passes through; open silver closes at 150
    assert rows[(3, 0)] == ("bronze", 50)
    assert rows[(3, 50)] == ("silver", 150)
    assert rows[(3, 150)] == ("gold", None)
    # exactly one open row per key
    opens = scd2_current(dim).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in opens)
    # time travel: at ts=120, key 1 is platinum
    snap = {r.k: r.tier for r in scd2_as_of(dim, 120).collect()}
    assert snap == {1: "platinum", 2: "silver", 3: "silver"}


def test_scd2_apply_rejects_duplicate_key_ts(spark):
    import pytest as _pytest

    from moz_datapipeline_spark.operators.scd import scd2_apply

    current = spark.createDataFrame(
        [(1, "a", 0, None)], "k long, v string, eff_start long, eff_end long"
    )
    dup = spark.createDataFrame(
        [(1, 10, "x"), (1, 10, "y")], "k long, ts long, v string"
    )
    out = scd2_apply(current, dup, "k", ["v"], ts_col="ts")
    with _pytest.raises(Exception, match="duplicate"):
        out.collect()


def test_validate_missing_fields_raise_descriptive_errors(spark):
    """ADVICE r7: absent threshold/pattern/allowed must fail fast with
    the check kind and missing field named, not a bare TypeError from
    float(None) or an opaque rlike failure."""
    import pytest

    from moz_datapipeline_spark.operators.validation import Check, validate

    df = spark.createDataFrame([(1,)], "c int")
    with pytest.raises(ValueError, match="'min' on 'c'.*threshold"):
        validate(df, [Check("min", "c")])
    with pytest.raises(ValueError, match="'matches' on 'c'.*pattern"):
        validate(df, [Check("matches", "c", threshold=0.5)])
    with pytest.raises(ValueError, match="'in_set' on 'c'.*allowed"):
        validate(df, [Check("in_set", "c")])
    with pytest.raises(ValueError, match="unknown kind 'bogus'"):
        validate(df, [Check("bogus", "c")])


def test_kmv_set_ops_accuracy_and_exact_underfull(spark):
    from moz_datapipeline_spark.operators.sketches import (
        kmv_registers,
        kmv_set_ops,
    )

    # exact mode: underfull sketches -> every estimate is exact
    a = spark.createDataFrame([(i,) for i in range(60)], "key int")
    b = spark.createDataFrame([(i,) for i in range(40, 100)], "key int")
    ra = kmv_registers(a, "key", k=256)
    rb = kmv_registers(b, "key", k=256)
    r = kmv_set_ops(ra, rb, k=256).collect()[0]
    assert (r.est_a, r.est_b, r.est_union, r.est_intersection) == (
        60.0, 60.0, 100.0, 20.0,
    )
    assert abs(r.jaccard - 0.2) < 1e-9
    assert abs(r.containment_a - 20.0 / 60.0) < 1e-6

    # estimator mode: 5000 vs 5000 with 2500 shared, k=512
    big_a = spark.createDataFrame([(i,) for i in range(5000)], "key int")
    big_b = spark.createDataFrame(
        [(i,) for i in range(2500, 7500)], "key int"
    )
    ra = kmv_registers(big_a, "key", k=512)
    rb = kmv_registers(big_b, "key", k=512)
    r = kmv_set_ops(ra, rb, k=512).collect()[0]
    assert abs(r.est_union - 7500) / 7500 < 0.15
    assert abs(r.est_intersection - 2500) / 2500 < 0.25
    assert abs(r.jaccard - 1 / 3) < 0.1


def test_kmv_set_ops_grouped_and_disjoint(spark):
    from moz_datapipeline_spark.operators.sketches import (
        kmv_registers,
        kmv_set_ops,
    )

    a = spark.createDataFrame(
        [("g1", i) for i in range(30)] + [("g2", i) for i in range(10)],
        "g string, key int",
    )
    b = spark.createDataFrame(
        [("g1", i + 1000) for i in range(30)]  # disjoint from a's g1
        + [("g3", i) for i in range(5)],       # group absent in a
        "g string, key int",
    )
    ra = kmv_registers(a, "key", group_cols=["g"], k=64)
    rb = kmv_registers(b, "key", group_cols=["g"], k=64)
    rows = {r.g: r for r in kmv_set_ops(ra, rb, ["g"], k=64).collect()}
    assert set(rows) == {"g1"}  # inner join drops g2/g3
    assert rows["g1"].est_intersection == 0.0
    assert rows["g1"].jaccard == 0.0
    assert rows["g1"].est_union == 60.0


def test_cms_ingest_stream_idempotent_restart(spark, tmp_path):
    """Streamed CMS appends + merge-on-read point queries; the batch-id
    max-fold makes a checkpoint replay a no-op even though CMS merge
    itself (sum) is not idempotent; compaction preserves estimates."""
    import json as _json

    from moz_datapipeline_spark.streaming.stateful import (
        cms_ingest_stream,
        cms_store_estimate,
        compact_cms_store,
    )

    src = tmp_path / "in"
    src.mkdir()
    # key frequency: key k appears (k+1) times per file, 3 files
    for b in range(3):
        with open(src / f"b{b}.json", "w") as f:
            for k in range(20):
                for _ in range(k + 1):
                    f.write(_json.dumps({"k": k}) + "\n")

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    q = cms_ingest_stream(
        spark.readStream.schema("k long").json(str(src)),
        store, ckpt, "k", depth=4, width=128,
    )
    q.awaitTermination(120)

    keys = spark.createDataFrame([(k,) for k in range(20)], "k long")
    est = {
        r.k: r.cms_estimate
        for r in cms_store_estimate(
            spark, store, keys, "k", depth=4, width=128
        ).collect()
    }
    # CMS never underestimates; with 20 keys in 128 buckets it is
    # almost surely exact, but only the one-sided bound is guaranteed
    for k in range(20):
        assert est[k] >= 3 * (k + 1)

    # restart with the same checkpoint: no new files -> nothing appends
    q2 = cms_ingest_stream(
        spark.readStream.schema("k long").json(str(src)),
        store, ckpt, "k", depth=4, width=128,
    )
    q2.awaitTermination(120)
    est2 = {
        r.k: r.cms_estimate
        for r in cms_store_estimate(
            spark, store, keys, "k", depth=4, width=128
        ).collect()
    }
    assert est2 == est

    # a simulated crash-replay of batch 0 appends byte-identical rows;
    # the (batch_id, cell) max-fold must swallow them
    b0 = spark.read.parquet(store).filter("batch_id = 0")
    b0.write.mode("append").parquet(store)
    est3 = {
        r.k: r.cms_estimate
        for r in cms_store_estimate(
            spark, store, keys, "k", depth=4, width=128
        ).collect()
    }
    assert est3 == est

    compact_cms_store(spark, store)
    est4 = {
        r.k: r.cms_estimate
        for r in cms_store_estimate(
            spark, store, keys, "k", depth=4, width=128
        ).collect()
    }
    assert est4 == est
    # unqueried key probes to 0 only if its buckets are empty; with a
    # loaded sketch the guarantee is just the one-sided bound
    ghost = cms_store_estimate(
        spark, store,
        spark.createDataFrame([(999,)], "k long"), "k", 4, 128,
    ).collect()[0]
    assert ghost.cms_estimate >= 0


def test_cms_estimate_empty_cell_is_zero(spark, tmp_path):
    """A never-written cell is a ZERO counter, not a missing
    observation: the estimate is min over ALL depth rows, so a probe
    key with even one empty cell must return 0 regardless of what its
    other cells collide with (per-cell coalesce before the min)."""
    from moz_datapipeline_spark.streaming.stateful import cms_store_estimate

    store = str(tmp_path / "store")
    # every bucket of row d=0 is loaded; rows d=1..3 are never written
    spark.createDataFrame(
        [(0, 0, b, 100) for b in range(16)],
        "batch_id long, d int, bucket bigint, c long",
    ).write.parquet(store)
    keys = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    est = cms_store_estimate(spark, store, keys, "k", depth=4, width=16)
    got = {r.k: r.cms_estimate for r in est.collect()}
    assert got == {1: 0, 2: 0, 3: 0}
