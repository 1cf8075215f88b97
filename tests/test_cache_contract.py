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
