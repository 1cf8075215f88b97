"""Unit tests for the round-5 extension operators: PageRank, the Bloom
semi-join prefilter, the bigram-LM quality gate, and mixture resampling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from moz_datapipeline_spark.graph.pagerank import pagerank
from moz_datapipeline_spark.operators.bloom import (
    bloom_semi_join,
    build_bloom_bitmap,
)
from moz_datapipeline_spark.operators.corpus import mixture_resample
from moz_datapipeline_spark.operators.lm import lm_score, train_bigram_lm


def _numpy_pagerank(edges, iters, d=0.85, dangling=True):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        dangle = sum(r[idx[v]] for v in nodes if v not in out)
        for a, b in edges:
            nxt[idx[b]] += d * r[idx[a]] / out[a]
        if dangling:
            nxt += d * dangle / n
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_power_iteration(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, iters=4).collect()
    }
    want = _numpy_pagerank(edges, 4)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)
    # dangling case: node 3 has no out-edges, its mass redistributes
    edges2 = [(1, 2), (2, 3)]
    e2 = spark.createDataFrame(edges2, "src long, dst long")
    got2 = {
        r["node"]: r["rank"] for r in pagerank(e2, iters=3).collect()
    }
    want2 = _numpy_pagerank(edges2, 3)
    total = sum(got2.values())
    assert total == pytest.approx(1.0, rel=1e-12)
    for v in want2:
        assert got2[v] == pytest.approx(want2[v], rel=1e-12)


def test_pagerank_duplicate_edges_collapse(spark):
    e = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=2).collect()}
    want = _numpy_pagerank([(1, 2), (2, 1)], 2)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)


def test_pagerank_rejects_negative_iters(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(e, iters=-1)
    with pytest.raises(ValueError):
        pagerank(e, iters=2, seeds=[])


def _numpy_ppr(edges, iters, seeds, d=0.85, dangling=True):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    present = [s for s in seeds if s in idx]
    p = np.zeros(len(nodes))
    for s in present:
        p[idx[s]] = 1.0 / len(present)
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    r = p.copy()
    for _ in range(iters):
        nxt = (1.0 - d) * p
        dangle = sum(r[idx[v]] for v in nodes if v not in out)
        for a, b in edges:
            nxt[idx[b]] += d * r[idx[a]] / out[a]
        if dangling:
            nxt += d * dangle * p
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def test_personalized_pagerank_matches_power_iteration(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (3, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    # node 5 is dangling; seed 99 is absent and must be ignored
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, iters=4, seeds=[1, 4, 99]).collect()
    }
    want = _numpy_ppr(edges, 4, [1, 4, 99])
    assert set(got) == set(want)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-12)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)
    # mass concentrates near the seeds, not uniformly
    assert got[2] > got[5] * 0  # sanity: present
    uniform = _numpy_pagerank(edges, 4)
    assert got[1] > uniform[1]


def test_pagerank_eager_mode_matches_and_releases_cache(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    before = {
        r["node"]: r["rank"] for r in pagerank(e, iters=3).collect()
    }
    spark.catalog.clearCache()
    n_cached_0 = len(
        [r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()]
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, iters=3, eager=True).collect()
    }
    n_cached_1 = len(
        [r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()]
    )
    assert got == pytest.approx(before)
    # eager mode retains at most the final iteration's cache
    assert n_cached_1 - n_cached_0 <= 1


def test_triangle_counts_match_bruteforce(spark):
    from itertools import combinations

    from moz_datapipeline_spark.graph.triangles import triangle_counts

    # deterministic pseudo-random graph on 40 nodes, plus noise:
    # self loops, duplicates, and reversed duplicates must collapse
    edges = [((i * 7) % 40, (i * 13 + 3) % 40) for i in range(160)]
    # guarantee triangle-rich structure: a K5 clique plus a fan
    edges += list(combinations(range(5), 2))
    edges += [(20, 21), (21, 22), (20, 22), (20, 23), (22, 23)]
    noisy = edges + [(b, a) for a, b in edges[:50]] + [(5, 5), (9, 9)]
    adj = {frozenset(e) for e in edges if e[0] != e[1]}
    want: dict[int, int] = {}
    for tri in combinations(range(40), 3):
        u, v, w = tri
        if (
            frozenset((u, v)) in adj
            and frozenset((v, w)) in adj
            and frozenset((u, w)) in adj
        ):
            for n in tri:
                want[n] = want.get(n, 0) + 1
    e = spark.createDataFrame(noisy, "src long, dst long")
    got = {
        r["node"]: r["triangles"] for r in triangle_counts(e).collect()
    }
    assert got == want
    assert sum(want.values()) % 3 == 0 and sum(want.values()) > 0


def test_bloom_semi_join_equals_semi_join(spark):
    fact = spark.range(0, 2000).withColumnRenamed("id", "k")
    dim = (
        spark.range(0, 2000)
        .filter(F.col("id") % 7 == 0)
        .withColumnRenamed("id", "dk")
    )
    got = bloom_semi_join(fact, dim, "k", "dk", num_bits=1 << 12)
    want = fact.join(
        dim.select(F.col("dk").alias("k")), "k", "left_semi"
    )
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in want.collect()
    )


def test_bloom_semi_join_prebuilt_bitmap_is_plan_only(spark):
    fact = spark.range(0, 1000).withColumnRenamed("id", "k")
    dim = spark.range(0, 1000).filter(F.col("id") % 3 == 0).withColumnRenamed(
        "id", "k"
    )
    bm = build_bloom_bitmap(dim, "k", num_bits=1 << 12)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    got = bloom_semi_join(fact, dim, "k", num_bits=1 << 12, bitmap=bm)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # construction ran zero Spark jobs
    assert sorted(r["k"] for r in got.collect()) == list(range(0, 1000, 3))


def test_bloom_semi_join_rejects_mismatched_prebuilt_bitmap(spark):
    """A bitmap built with different num_bits would probe mod the wrong
    size and silently drop true matches — it must be rejected loudly."""
    fact = spark.range(0, 100).withColumnRenamed("id", "k")
    dim = spark.range(0, 100).filter(F.col("id") % 3 == 0).withColumnRenamed(
        "id", "k"
    )
    bm = build_bloom_bitmap(dim, "k", num_bits=1 << 12)
    with pytest.raises(ValueError, match="num_bits"):
        bloom_semi_join(fact, dim, "k", num_bits=1 << 10, bitmap=bm)


def test_personalized_pagerank_eager_raises_on_absent_seeds(spark):
    from moz_datapipeline_spark.graph.pagerank import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="seeds"):
        pagerank(edges, iters=1, seeds=[99, 100], eager=True)
    # lazy mode stays plan-only by contract (documented caller check)
    pagerank(edges, iters=1, seeds=[99], eager=False)


def test_bloom_semi_join_exact_under_heavy_false_positives(spark):
    # 64 bits for 100 keys: the bitmap saturates, nearly every probe
    # passes the Bloom stage — the exact join must still thin it.
    fact = spark.range(0, 500).withColumnRenamed("id", "k")
    dim = spark.range(0, 500).filter(F.col("id") % 5 == 0).withColumnRenamed(
        "id", "k"
    )
    got = bloom_semi_join(fact, dim, "k", num_bits=64, num_hashes=2)
    assert sorted(r["k"] for r in got.collect()) == list(range(0, 500, 5))


def test_bloom_bitmap_build_is_bounded_and_valid(spark):
    dim = spark.range(0, 1000).withColumnRenamed("id", "k")
    bm = build_bloom_bitmap(dim, "k", num_bits=1 << 10, num_hashes=3)
    assert len(bm) == (1 << 10) // 8
    with pytest.raises(ValueError):
        build_bloom_bitmap(dim, "k", num_bits=12)  # not a multiple of 8


def test_bloom_plan_filters_below_join(spark):
    fact = spark.range(0, 100).withColumnRenamed("id", "k")
    dim = spark.range(0, 10).withColumnRenamed("id", "k")
    out = bloom_semi_join(fact, dim, "k", num_bits=1 << 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the Arrow-batched membership test must sit in the plan (below the
    # exact join, which remains for correctness)
    assert "ArrowEvalPython" in plan
    assert "Join" in plan


def test_bigram_lm_hand_example(spark):
    # train: "a b a b" → bigrams ab, ba, ab → c(a,b)=2, c(b,a)=1
    # c_ctx(a)=2, c_ctx(b)=1, V=2
    ref = spark.createDataFrame([("a b a b",)], "text string")
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "z"), (3, "a q")],
        "doc_id long, text string",
    )
    bi, ctx, vocab = train_bigram_lm(ref)
    out = {
        r["doc_id"]: r
        for r in lm_score(
            docs, bi, ctx, vocab, add_k=0.5, buckets=(0.1, 0.6)
        ).collect()
    }
    # doc 1: p(b|a) = (2+0.5)/(2+0.5*2) = 2.5/3 → H = -ln(2.5/3)
    h1 = -np.log(2.5 / 3.0)
    assert out[1]["n_bigrams"] == 1
    assert out[1]["cross_entropy"] == pytest.approx(round(h1, 6))
    assert out[1]["lm_bucket"] == "middle"
    # doc 2: single token → no bigrams, NULL scores
    assert out[2]["n_bigrams"] == 0
    assert out[2]["cross_entropy"] is None
    assert out[2]["lm_bucket"] is None
    # doc 3: unseen bigram (a,q): p = (0+0.5)/(2+1) = 1/6
    h3 = -np.log(0.5 / 3.0)
    assert out[3]["cross_entropy"] == pytest.approx(round(h3, 6))
    assert out[3]["lm_bucket"] == "tail"


def test_lm_scores_rank_in_domain_text_lower(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.filter(F.col("lang") == "en")
    bi, ctx, vocab = train_bigram_lm(ref)
    out = lm_score(docs, bi, ctx, vocab).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    med = {
        r["lang"]: r["m"]
        for r in out.groupBy("lang")
        .agg(F.expr("percentile(cross_entropy, 0.5)").alias("m"))
        .collect()
    }
    # text from the training domain must score lower than every other
    assert med["en"] == min(med.values())


def test_mixture_resample_hits_target_proportions(spark):
    rows = (
        [(i, "a") for i in range(4000)]
        + [(i + 10000, "b") for i in range(1000)]
        + [(i + 20000, "c") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_resample(df, "source", {"a": 1.0, "b": 1.0})
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # c has no weight → dropped entirely
    assert "c" not in counts
    # scarce group b (1000 rows at weight 1.0) is kept whole;
    # a downsamples toward 1000 (hash-threshold, binomial tolerance)
    assert counts["b"] == 1000
    assert abs(counts["a"] - 1000) < 150
    # membership is deterministic across reruns
    again = {
        r["source"]: r["n"]
        for r in mixture_resample(df, "source", {"a": 1.0, "b": 1.0})
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert again == counts


def test_remove_duplicate_spans_hand_example(spark):
    from moz_datapipeline_spark.operators.corpus import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "x1 x2 common a b c tail1 tail2"),
            (2, "y1 common a b c y2 y3 y4"),
            (3, "unrelated words only here nothing shared"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, window=4, min_docs=2).collect()
    }
    # the shared 4-token window is "common a b c" — every covered
    # position in both docs goes away, the rest survives in order
    assert out[1]["text_clean"] == "x1 x2 tail1 tail2"
    assert out[1]["n_removed"] == 4
    assert out[2]["text_clean"] == "y1 y2 y3 y4"
    # untouched doc passes through byte-identical
    assert out[3]["n_removed"] == 0
    assert out[3]["text_clean"] == "unrelated words only here nothing shared"
    # shorter than the window: no windows, unchanged
    assert out[4]["n_removed"] == 0
    assert out[4]["text_clean"] == "tiny"

    with pytest.raises(ValueError):
        remove_duplicate_spans(docs, window=1)


def test_remove_duplicate_spans_overlapping_windows(spark):
    from moz_datapipeline_spark.operators.corpus import remove_duplicate_spans

    # two docs share a 5-token run; with window=4 the run yields two
    # overlapping flagged windows whose union covers all 5 positions
    docs = spark.createDataFrame(
        [(1, "p q r s t u"), (2, "a p q r s t")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, window=4, min_docs=2).collect()
    }
    assert out[1]["text_clean"] == "u"
    assert out[1]["n_removed"] == 5
    assert out[2]["text_clean"] == "a"


def test_remove_duplicate_spans_null_text_is_empty_doc(spark):
    from moz_datapipeline_spark.operators.corpus import remove_duplicate_spans

    docs = spark.createDataFrame(
        [(1, "common a b c pad1"), (2, "common a b c pad2"), (3, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, window=4, min_docs=2).collect()
    }
    assert out[3]["n_tokens"] == 0
    assert out[3]["n_removed"] == 0
    assert out[3]["text_clean"] == ""


@pytest.mark.deep
def test_remove_duplicate_spans_worst_case_is_linear(spark):
    """A boilerplate sled where EVERY window is flagged: runtime must
    scale ~linearly in doc length (the rebuild is O(tokens + spans·w)
    via array_except's hash set, not O(tokens·spans))."""
    import time

    from moz_datapipeline_spark.operators.corpus import remove_duplicate_spans

    def run(n_tokens: int) -> float:
        sled = " ".join(f"t{i % 7}" for i in range(n_tokens))
        docs = spark.createDataFrame(
            [(1, sled), (2, sled)], "doc_id long, text string"
        ).coalesce(1)
        t0 = time.monotonic()
        out = {
            r["doc_id"]: r
            for r in remove_duplicate_spans(
                docs, window=20, min_docs=2
            ).collect()
        }
        dt = time.monotonic() - t0
        assert out[1]["n_removed"] == n_tokens  # everything covered
        assert out[1]["text_clean"] == ""
        return dt

    run(1000)  # warm the JIT/codegen paths
    t_small, t_big = run(4000), run(40000)
    # quadratic would put the 10x doc at ~100x; allow generous noise,
    # and floor t_small at 0.5s so fixed Spark job overhead / GC pauses
    # on a loaded machine cannot flake a genuinely linear rebuild
    assert t_big < 25 * max(t_small, 0.5), (t_small, t_big)


def test_remove_duplicate_spans_hash_keys_agree(spark, sf_dir):
    from moz_datapipeline_spark.operators.corpus import remove_duplicate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lit = remove_duplicate_spans(docs, window=10).orderBy("doc_id").collect()
    fast = (
        remove_duplicate_spans(docs, window=10, hash_keys=True)
        .orderBy("doc_id")
        .collect()
    )
    assert [r.asDict() for r in lit] == [r.asDict() for r in fast]


def test_temperature_resample_flattens_toward_uniform(spark):
    from moz_datapipeline_spark.operators.corpus import temperature_resample

    rows = [(i, "big") for i in range(9000)] + [
        (i + 100000, "small") for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_resample(df, "source", 0.5)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # smallest group kept whole; big keeps ~ (1000/9000)^0.5 = 1/3
    assert counts["small"] == 1000
    assert abs(counts["big"] - 3000) < 200
    # alpha=1 keeps natural proportions (everything survives)
    full = temperature_resample(df, "source", 1.0).count()
    assert full == 10000
    import pytest as _pt

    with _pt.raises(ValueError):
        temperature_resample(df, "source", 1.5)


def test_mixture_resample_rejects_empty_targets(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        mixture_resample(df, "source", {"a": 0.0})


def test_mixture_resample_plan_is_filter_only(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)],
        "doc_id long, source string",
    )
    out = mixture_resample(df, "source", {"a": 0.5, "b": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    # selection is a broadcast join + filter: no sort, no window
    assert "Window" not in plan
    assert "Sort" not in plan.replace("SortMergeJoin", "")


def test_cms_heavy_hitters_properties(spark):
    from moz_datapipeline_spark.operators.analytics import cms_heavy_hitters

    # zipf-ish: key 0 appears 500x, key 1 250x, ..., long tail of 1s
    rows = []
    for key, n in [(0, 500), (1, 250), (2, 125), (3, 60), (4, 30)]:
        rows += [(key,)] * n
    rows += [(100 + i,) for i in range(400)]
    df = spark.createDataFrame(rows, "user_id long")
    out = cms_heavy_hitters(df, depth=4, width=64, k=5).collect()
    got = {r["user_id"]: r for r in out}
    assert set(got) == {0, 1, 2, 3, 4}
    for r in out:
        # one-sided error: the sketch may only overestimate
        assert r["never_underestimates"]
        assert r["cms_estimate"] >= r["exact_count"]
    assert got[0]["exact_count"] == 500
    # with 1365 increments over 4x64 buckets the top key's estimate
    # stays within the classic 2N/width bound
    assert got[0]["cms_estimate"] - 500 <= 2 * 1365 / 64

    import pytest as _pt

    with _pt.raises(ValueError):
        cms_heavy_hitters(df, depth=0)


def test_cms_hash_modes_share_structure(spark):
    from moz_datapipeline_spark.operators.analytics import cms_heavy_hitters

    df = spark.createDataFrame([(i % 7,) for i in range(700)], "user_id long")
    a = {
        r["user_id"]: r["exact_count"]
        for r in cms_heavy_hitters(df, k=7, portable=True).collect()
    }
    b = {
        r["user_id"]: r["exact_count"]
        for r in cms_heavy_hitters(df, k=7, portable=False).collect()
    }
    # exact side identical across hash modes; estimates may differ
    assert a == b == {i: 100 for i in range(7)}


def test_weighted_sample_favors_heavy_weights(spark):
    from moz_datapipeline_spark.operators.corpus import weighted_sample

    rows = [(i, 9.0 if i < 10 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    heavy_hits = light_hits = 0
    for s in range(12):
        got = {
            r["doc_id"]
            for r in weighted_sample(df, "w", 20, seed=f"t{s}").collect()
        }
        assert len(got) == 20
        heavy_hits += sum(1 for i in got if i < 10)
        light_hits += sum(1 for i in got if i >= 10)
    # heavy items are 10/100 of the pool but ~9x likelier per draw;
    # across 12 seeds they must be sampled far above their pool share
    assert heavy_hits / 12 > 5  # pool share alone would give 2
    # determinism: same seed, same sample
    a = sorted(
        r["doc_id"] for r in weighted_sample(df, "w", 20).collect()
    )
    b = sorted(
        r["doc_id"] for r in weighted_sample(df, "w", 20).collect()
    )
    assert a == b

    # non-positive and NULL weights are excluded
    df2 = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -4.0), (4, None)],
        "doc_id long, w double",
    )
    only = weighted_sample(df2, "w", 10).collect()
    assert [r["doc_id"] for r in only] == [1]

    import pytest as _pt

    with _pt.raises(ValueError):
        weighted_sample(df, "w", 0)


def test_weighted_sample_rank_is_group_limited(spark):
    from moz_datapipeline_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame(
        [(i, "g" + str(i % 3), 1.0 + i % 5) for i in range(300)],
        "doc_id long, g string, w double",
    )
    out = weighted_sample(df, "w", 5, group_col="g")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    counts = {
        r["g"]: r["n"]
        for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"g0": 5, "g1": 5, "g2": 5}
