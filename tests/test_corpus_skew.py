"""Skew-safety tests: cap_per_group's hash-prefix pre-filter and the
one-pass funnel rewrite stay exact while bounding per-task width."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from moz_datapipeline_spark.operators.analytics import funnel_stages
from moz_datapipeline_spark.operators.corpus import (
    _cap_candidates,
    cap_per_group,
)


def _skewed(spark, heavy_n=20_000, light_n=30, n_light_groups=8):
    rows = [(i, "mega.example") for i in range(heavy_n)]
    nid = heavy_n
    for g in range(n_light_groups):
        for _ in range(light_n):
            rows.append((nid, f"host{g}.example"))
            nid += 1
    return spark.createDataFrame(rows, "doc_id long, domain string")


def _naive(df, k):
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def test_cap_per_group_matches_naive_on_skew(spark):
    df = _skewed(spark)
    got = {
        tuple(r)
        for r in cap_per_group(df, "domain", 5).select(
            "doc_id", "domain", "sample_rank"
        ).collect()
    }
    want = {
        tuple(r)
        for r in _naive(df, 5).select(
            "doc_id", "domain", "sample_rank"
        ).collect()
    }
    assert got == want
    assert len(got) == 5 + 8 * 5


def test_cap_prefilter_bounds_heavy_group_width(spark):
    """The candidate set entering the exact rank must carry a bounded
    slice of the mega-group — not its full 100x-median width."""
    df = _skewed(spark)
    cand = _cap_candidates(df, "domain", 5, "doc_id", 8)
    per_group = {
        r["domain"]: r["n"]
        for r in cand.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    # light groups (30 rows < prune_factor*k = 40) pass through whole;
    # the heavy group is pruned to ~prune_factor*k = 40 expected
    # survivors (3x slack for hash noise)
    assert per_group["host0.example"] == 30
    assert per_group["mega.example"] <= 3 * 8 * 5
    assert per_group["mega.example"] >= 5


def test_cap_deficit_rescue_is_exact(spark):
    """Force the deficit path (prune_factor=0 => cutoff keeps ~nothing)
    and check the rescue restores the exact top-k."""
    df = _skewed(spark, heavy_n=2_000, light_n=50, n_light_groups=2)
    got = {
        tuple(r)
        for r in cap_per_group(df, "domain", 7, prune_factor=1).select(
            "doc_id", "domain", "sample_rank"
        ).collect()
    }
    want = {
        tuple(r)
        for r in _naive(df, 7).select(
            "doc_id", "domain", "sample_rank"
        ).collect()
    }
    assert got == want


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_funnel_one_pass_semantics(spark):
    # user 1: full ordered funnel; user 2: click before view (stops at
    # view); user 3: view only; user 4: click/purchase but no view
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        (2, 50, "click"), (2, 60, "view"), (2, 55, "purchase"),
        (3, 70, "view"),
        (4, 80, "click"), (4, 90, "purchase"),
        # user 5: simultaneous view+click (strictly-after => click at
        # the same ts does NOT count), later click does
        (5, 100, "view"), (5, 100, "click"), (5, 110, "click"),
    ]
    e = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    got = {
        (r["stage_idx"], r["stage"]): r["n_users"]
        for r in funnel_stages(e).collect()
    }
    assert got == {
        (1, "view"): 4,    # users 1,2,3,5
        (2, "click"): 2,   # users 1 (20>10), 5 (110>100)
        (3, "purchase"): 1,  # user 1 (30>20)
    }


def test_cap_plan_broadcasts_heavy_list_and_group_limits(spark):
    """Plan pins: the heavy-hitter count list must BROADCAST into the
    left join (never shuffle the corpus for it), and Spark's rank-limit
    pushdown (WindowGroupLimit partial) must stay adjacent to the final
    window — together with the hash-prefix prune these bound the
    mega-group sort width at any partition count."""
    df = _skewed(spark)
    plan = _plan(cap_per_group(df, "domain", 5))
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan


def test_funnel_single_scan_single_wide_exchange(spark, sf_dir):
    import re

    plan = _plan(entry_mod.q_funnel_conversion(spark, sf_dir))
    # formatted explain lists each node in the tree AND a details
    # section — count detail headers, which appear exactly once per node
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    # one wide shuffle (on user_id); the only other Exchange is the
    # single-row final count
    assert plan.count("Arguments: hashpartitioning") == 1


def test_remove_boilerplate_lines_order_and_counts(spark):
    from moz_datapipeline_spark.operators.corpus import (
        remove_boilerplate_lines,
    )

    footer = "SUBSCRIBE NOW"
    rows = [(i, f"intro {i}\n{footer}\nbody {i}") for i in range(12)]
    rows.append((99, footer))  # doc that is ONLY boilerplate
    rows.append((100, "unique one\nunique two"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(df, min_docs=10).collect()
    }
    assert out[3]["clean_text"] == "intro 3\nbody 3"  # order preserved
    assert out[3]["n_lines_kept"] == 2 and out[3]["n_lines_removed"] == 1
    assert out[99]["clean_text"] == "" and out[99]["n_lines_removed"] == 1
    assert out[100]["clean_text"] == "unique one\nunique two"
    assert out[100]["n_lines_removed"] == 0
    assert len(out) == 14  # every doc survives as a row


def test_prefix_bucket_candidates_caps_hot_buckets(spark):
    """A boilerplate-heavy corpus ('copyright all rights reserved …')
    shares one 4-word prefix bucket; the width cap drops that bucket
    with a loud stat instead of letting pair volume go quadratic."""
    from moz_datapipeline_spark.operators.dedup import (
        prefix_bucket_candidates,
    )

    boiler = [
        (i, f"copyright all rights reserved document {i} body text")
        for i in range(500)
    ]
    normal = [
        (1000, "genuinely unique preamble words here one"),
        (1001, "genuinely unique preamble words here two"),
        (2000, "another distinct opening follows after this"),
    ]
    df = spark.createDataFrame(
        boiler + normal, "doc_id long, text string"
    )
    stats = {}
    pairs = prefix_bucket_candidates(
        df, max_bucket_width=64, stats=stats
    ).collect()
    assert stats["dropped_buckets"] == 1
    assert stats["dropped_rows"] == 500
    # only the two 'genuinely unique …' docs still pair up: bounded,
    # not the 124,750 pairs the mega-bucket would have produced
    assert sorted((r.id_a, r.id_b) for r in pairs) == [(1000, 1001)]
    # raising the cap readmits the bucket
    wide = prefix_bucket_candidates(df, max_bucket_width=1000)
    assert wide.count() == 500 * 499 // 2 + 1


def test_shard_corpus_partitions_and_orders_deterministically(spark):
    from moz_datapipeline_spark.operators.corpus import shard_corpus

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(500)], "doc_id long, text string"
    )
    out = shard_corpus(df, n_shards=8, seed="e0").collect()
    # every row kept exactly once, shards in range, ranks dense per shard
    assert sorted(r.doc_id for r in out) == list(range(500))
    by_shard = {}
    for r in out:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.shard_rank)
    for ranks in by_shard.values():
        assert sorted(ranks) == list(range(len(ranks)))
    # balanced in expectation: no shard is pathologically empty/full
    sizes = [len(v) for v in by_shard.values()]
    assert len(sizes) == 8 and min(sizes) > 20
    # deterministic across reruns and partitionings
    again = shard_corpus(df.repartition(13), n_shards=8, seed="e0").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    # a new seed is a genuine reshuffle
    e1 = {r.doc_id: (r.shard, r.shard_rank)
          for r in shard_corpus(df, 8, seed="e1").collect()}
    e0 = {r.doc_id: (r.shard, r.shard_rank) for r in out}
    assert sum(1 for i in e0 if e0[i] != e1[i]) > 400


def test_split_corpus_group_level_and_deterministic(spark):
    from moz_datapipeline_spark.operators.corpus import split_corpus

    df = spark.createDataFrame(
        [(i, f"d{i % 40}") for i in range(2000)],
        "doc_id long, source string",
    )
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_corpus(df, fr).collect()
    counts = {}
    for r in out:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > 1400 and counts["train"] < 1800

    # group-level: every doc of a source lands in ONE split
    grouped = split_corpus(df, fr, by_col="source").collect()
    per_source = {}
    for r in grouped:
        per_source.setdefault(r.source, set()).add(r.split)
    assert all(len(s) == 1 for s in per_source.values())

    # deterministic across partitionings; new seed re-splits
    again = split_corpus(df.repartition(17), fr).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    reseeded = split_corpus(df, fr, seed="other").collect()
    assert sorted(map(tuple, reseeded)) != sorted(map(tuple, out))

    # invalid fractions fail loudly
    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        split_corpus(df, {"a": 0.5})


def test_budget_resample_water_filling_exact(spark):
    import pytest
    from pyspark.sql import functions as F

    from moz_datapipeline_spark.operators.corpus import budget_resample

    rows, i = [], 0
    for g, n in (("a", 100), ("b", 1000), ("c", 10)):
        for _ in range(n):
            rows.append((i, g, 10)); i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    w = {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}

    out = budget_resample(df, "source", w, 3000, "n_tok")
    rates = {r.source: r.r for r in out.groupBy("source").agg(
        F.first("sample_rate").alias("r")).collect()}
    # a (1000 tok) and c (100 tok) can't fill their 1000-token share →
    # kept whole; λ solves 1100 + λ/3 = 3000 → λ = 5700, b = 0.19
    assert rates["a"] == 1.0 and rates["c"] == 1.0
    assert abs(rates["b"] - 0.19) < 1e-12
    kept = out.agg(F.sum("n_tok")).first()[0]
    assert abs(kept - 3000) < 300  # LLN sampling noise

    # budget >= total mass keeps everything at rate 1
    full = budget_resample(df, "source", w, 10**9, "n_tok")
    assert full.count() == 1110
    assert full.select("sample_rate").distinct().collect()[0][0] == 1.0

    # unweighted groups drop; invalid inputs raise
    only_a = budget_resample(df, "source", {"a": 1.0}, 500, "n_tok")
    assert only_a.select("source").distinct().collect()[0][0] == "a"
    with pytest.raises(ValueError, match="positive weight"):
        budget_resample(df, "source", {"a": 0.0}, 10, "n_tok")
    with pytest.raises(ValueError, match="token_budget"):
        budget_resample(df, "source", w, 0, "n_tok")

    # deterministic across partitionings
    again = budget_resample(df.repartition(13), "source", w, 3000, "n_tok")
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, out.collect()))


def test_diff_corpus_statuses_and_normalization(spark):
    from moz_datapipeline_spark.operators.corpus import diff_corpus

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will be removed"),
         (4, "  Formatting   ONLY  "), (5, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same text"), (2, "changed now"),
         (4, "formatting only"), (5, None), (6, "brand new")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in diff_corpus(old, new).collect()}
    # formatting-only churn (4) and NULL-stable (5) are NOT reported
    assert got == {2: "changed", 3: "removed", 6: "added"}


def test_corpus_report_nulls_and_modal_tiebreak(spark):
    from moz_datapipeline_spark.operators.corpus import corpus_report

    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, None, "pt"), (3, "d e", "pt"),
         (4, "f", "en")],
        "doc_id long, text string, lang string",
    )
    got = {r.metric: r.value for r in corpus_report(df).collect()}
    assert got["n_docs"] == 4 and got["n_null_text"] == 1
    assert got["total_tokens"] == 6 and got["total_chars"] == 9
    assert got["distinct_langs"] == 2
    # en and pt tie at 2 docs; lexicographic tiebreak picks en -> 0.5
    assert got["top_lang_share"] == 0.5
    assert got["avg_tokens"] == 1.5
