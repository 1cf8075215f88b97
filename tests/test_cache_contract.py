"""Cache-lifetime contract: operators that persist intermediates must,
in ``eager=True`` mode, release them and leave AT MOST the returned
frame cached — the bounded-footprint contract ``graph.pagerank`` set.

The observable is Spark's storage registry (materialized cached RDDs):
after the operator returns, the only new entry is the result; after the
caller unpersists the result, the registry is back to its baseline.
Long-running drivers (streaming ingest, multi-day sessions) depend on
this — a session-lifetime cache per operator call is a slow leak.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _cached_rdd_count(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _docs(spark, n=60):
    rows = [
        (i, " ".join(f"w{i % 7}tok{t}" for t in range(10))) for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _embs(spark, n=60):
    rows = [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _simhash_sigs(spark, n=60):
    from moz_datapipeline_spark.operators.dedup import simhash

    return simhash(_docs(spark, n))


class TestEagerReleasesIntermediates:
    def test_minhash_lsh_candidates(self, spark):
        from moz_datapipeline_spark.operators.dedup import (
            minhash_lsh_candidates,
            minhash_signatures,
        )

        base = _cached_rdd_count(spark)
        sigs = minhash_signatures(_docs(spark))
        out = minhash_lsh_candidates(sigs, eager=True)
        out.count()
        assert _cached_rdd_count(spark) <= base + 1
        out.unpersist(blocking=True)
        assert _cached_rdd_count(spark) <= base

    def test_semantic_dedup(self, spark):
        from moz_datapipeline_spark.operators.similarity import semantic_dedup

        base = _cached_rdd_count(spark)
        out = semantic_dedup(_embs(spark), threshold=0.999, k=4, eager=True)
        out.count()
        assert _cached_rdd_count(spark) <= base + 1
        out.unpersist(blocking=True)
        assert _cached_rdd_count(spark) <= base

    def test_negative_sample(self, spark):
        from moz_datapipeline_spark.operators.corpus import negative_sample

        base = _cached_rdd_count(spark)
        out = negative_sample(_docs(spark), k=2, eager=True)
        assert out.count() == 60 * 2
        assert _cached_rdd_count(spark) <= base + 1
        out.unpersist(blocking=True)
        assert _cached_rdd_count(spark) <= base

    def test_embedding_near_dup(self, spark):
        from moz_datapipeline_spark.operators.similarity import (
            embedding_near_dup,
        )

        base = _cached_rdd_count(spark)
        out = embedding_near_dup(
            _embs(spark), threshold=0.99, dim=8, eager=True
        )
        out.count()
        assert _cached_rdd_count(spark) <= base + 1
        out.unpersist(blocking=True)
        assert _cached_rdd_count(spark) <= base

    def test_simhash_candidates(self, spark):
        from moz_datapipeline_spark.operators.dedup import (
            simhash,
            simhash_candidates,
        )

        base = _cached_rdd_count(spark)
        out = simhash_candidates(_simhash_sigs(spark), eager=True)
        out.count()
        assert _cached_rdd_count(spark) <= base + 1
        out.unpersist(blocking=True)
        assert _cached_rdd_count(spark) <= base

    def test_eager_matches_lazy_results(self, spark):
        """eager is a lifetime knob, never a semantics knob."""
        from moz_datapipeline_spark.operators.corpus import negative_sample
        from moz_datapipeline_spark.operators.dedup import (
            minhash_lsh_candidates,
            minhash_signatures,
        )

        d = _docs(spark)
        lazy = sorted(
            map(tuple, minhash_lsh_candidates(minhash_signatures(d)).collect())
        )
        eager = minhash_lsh_candidates(minhash_signatures(d), eager=True)
        assert sorted(map(tuple, eager.collect())) == lazy
        eager.unpersist(blocking=True)

        lazy_ns = sorted(map(tuple, negative_sample(d, k=2).collect()))
        eager_ns = negative_sample(d, k=2, eager=True)
        assert sorted(map(tuple, eager_ns.collect())) == lazy_ns
        eager_ns.unpersist(blocking=True)


class TestRangeOpsEagerRelease:
    """ADVICE r7: global_rank / peak_concurrency / pareto_frontier_2d
    pinned their range-partitioned intermediates for the app lifetime.
    eager=True must release them, leaving at most the returned frame."""

    def _nums(self, spark, n=500):
        return spark.createDataFrame(
            [(i, float((i * 37) % 101)) for i in range(n)],
            "id long, x double",
        )

    def test_global_rank(self, spark):
        from moz_datapipeline_spark.operators.ranges import global_rank

        base = _cached_rdd_count(spark)
        out = global_rank(self._nums(spark), "x", ["id"], eager=True)
        out.count()
        assert _cached_rdd_count(spark) <= base + 1
        out.unpersist(blocking=True)
        assert _cached_rdd_count(spark) <= base

    def test_peak_concurrency(self, spark):
        from moz_datapipeline_spark.operators.ranges import peak_concurrency

        iv = spark.createDataFrame(
            [(i % 5, float(i), float(i + 3)) for i in range(200)],
            "g int, start double, end double",
        )
        base = _cached_rdd_count(spark)
        out = peak_concurrency(
            iv, "start", "end", group_cols=["g"], eager=True
        )
        out.count()
        assert _cached_rdd_count(spark) <= base + 1
        out.unpersist(blocking=True)
        assert _cached_rdd_count(spark) <= base

    def test_pareto_frontier(self, spark):
        from moz_datapipeline_spark.operators.ranges import (
            pareto_frontier_2d,
        )

        df = spark.createDataFrame(
            [(float(i % 20), float((i * 13) % 17)) for i in range(300)],
            "x double, y double",
        )
        base = _cached_rdd_count(spark)
        out = pareto_frontier_2d(df, "x", "y", eager=True)
        out.count()
        assert _cached_rdd_count(spark) <= base + 1
        out.unpersist(blocking=True)
        assert _cached_rdd_count(spark) <= base

    def test_eager_matches_lazy(self, spark):
        from moz_datapipeline_spark.operators.ranges import global_rank

        d = self._nums(spark, 200)
        lazy = sorted(map(tuple, global_rank(d, "x", ["id"]).collect()))
        eager = global_rank(d, "x", ["id"], eager=True)
        assert sorted(map(tuple, eager.collect())) == lazy
        eager.unpersist(blocking=True)

    def _scored(self, spark, n=400):
        return spark.createDataFrame(
            [
                (i, float((i * 37) % 101) / 101.0, int((i * 7) % 3 == 0))
                for i in range(n)
            ],
            "id long, score double, label int",
        )

    def test_roc_auc(self, spark):
        from moz_datapipeline_spark.operators.analytics import roc_auc

        base = _cached_rdd_count(spark)
        out = roc_auc(self._scored(spark), "score", "label", eager=True)
        got = out.collect()
        assert _cached_rdd_count(spark) <= base + 1
        out.unpersist(blocking=True)
        assert _cached_rdd_count(spark) <= base
        lazy = roc_auc(self._scored(spark), "score", "label").collect()
        assert got == lazy

    def test_decile_lift(self, spark):
        from moz_datapipeline_spark.operators.analytics import decile_lift

        base = _cached_rdd_count(spark)
        out = decile_lift(
            self._scored(spark), "score", "label", tiebreak_cols=["id"],
            eager=True,
        )
        out.count()
        assert _cached_rdd_count(spark) <= base + 1
        lazy = decile_lift(
            self._scored(spark), "score", "label", tiebreak_cols=["id"]
        )
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, lazy.collect())
        )
        out.unpersist(blocking=True)


class TestLpaLazyNeverPersists:
    """ADVICE r7 (revised): lazy-mode label_propagation used to pin
    rounds+1 frames forever.  The restructured rounds consume each
    labels frame exactly once, so only the TWO static frames (edge
    list + vote-less set) persist in lazy mode — and eager mode
    releases both, leaving at most the returned frame."""

    def test_lazy_pins_only_the_two_statics(self, spark):
        from moz_datapipeline_spark.graph.lpa import label_propagation

        e = spark.createDataFrame(
            [(i, (i + 1) % 30) for i in range(30)] + [(2, 17), (5, 23)],
            "src long, dst long",
        )
        base = _cached_rdd_count(spark)
        out = label_propagation(e, rounds=3)
        out.count()
        # bounded: the statics, NEVER rounds+1 frames
        assert _cached_rdd_count(spark) <= base + 2

    def test_eager_releases_everything(self, spark):
        from moz_datapipeline_spark.graph.lpa import label_propagation

        e = spark.createDataFrame(
            [(i, (i + 1) % 30) for i in range(30)], "src long, dst long"
        )
        base = _cached_rdd_count(spark)
        out = label_propagation(e, rounds=2, eager=True)
        out.count()
        assert _cached_rdd_count(spark) <= base + 1
        # r13: the eager result is a severed localCheckpoint (a caller
        # can't be relied on to unpersist, and the bench exempts these
        # blocks); release it the severed way
        from moz_datapipeline_spark.iterate import sever_release

        sever_release(out)
        assert _cached_rdd_count(spark) <= base


class TestBenchLeakAssert:
    """bench.clear_storage must FAIL LOUD on a leaked persist() while
    silently cleaning legitimate localCheckpoint remnants (r12 verdict:
    the old in-bench assert unpersisted everything first, so it could
    never trip)."""

    def test_leaked_persist_trips_the_assert(self, spark):
        leak = spark.range(100).persist()
        leak.count()  # materialize so it enters the storage registry
        import bench

        with pytest.raises(AssertionError, match="leaked into the bench"):
            bench.clear_storage(spark, "scratch")
        # cleanup ran even though the assert fired
        assert _cached_rdd_count(spark) == 0

    def test_local_checkpoint_remnant_is_cleaned_not_failed(self, spark):
        from moz_datapipeline_spark.iterate import checkpoint_sever

        remnant = checkpoint_sever(spark.range(100))
        remnant.count()
        import bench

        bench.clear_storage(spark, "scratch")  # must NOT raise
        assert _cached_rdd_count(spark) == 0
