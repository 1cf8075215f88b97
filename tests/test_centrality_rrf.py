"""Round-8 batch 3: correlation matrix, RRF fusion, harmonic
centrality."""

from __future__ import annotations

import collections
import itertools
import math

import pytest


class TestCorrelationMatrix:
    def test_matches_reference(self, spark):
        from moz_datapipeline_spark.operators.validation import (
            correlation_matrix,
        )

        rows = [
            (float(i), 2.0 * i + 1.0, float((i * 7) % 11), 5.0)
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "a double, b double, c double, d double")
        got = {
            (r.col_x, r.col_y): r
            for r in correlation_matrix(df, ["a", "b", "c", "d"]).collect()
        }
        assert set(got) == {
            ("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "c"), ("b", "d"), ("c", "d"),
        }

        def corr(xs, ys):
            n = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxx = sum(x * x for x in xs)
            syy = sum(y * y for y in ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            dx, dy = n * sxx - sx * sx, n * syy - sy * sy
            if dx <= 0 or dy <= 0:
                return None
            return (n * sxy - sx * sy) / math.sqrt(dx * dy)

        cols = list(zip(*rows))
        names = ["a", "b", "c", "d"]
        for i, j in itertools.combinations(range(4), 2):
            want = corr(cols[i], cols[j])
            have = got[(names[i], names[j])].corr
            if want is None:
                assert have is None
            else:
                assert abs(have - want) < 1e-6
        # perfect linearity and constant-column conventions
        assert abs(got[("a", "b")].corr - 1.0) < 1e-9
        assert got[("a", "d")].corr is None
        assert all(r.n_rows == 50 for r in got.values())

    def test_listwise_deletion_and_arity(self, spark):
        from moz_datapipeline_spark.operators.validation import (
            correlation_matrix,
        )

        df = spark.createDataFrame(
            [(1.0, 2.0, None), (2.0, 4.0, 1.0), (3.0, 6.0, 2.0),
             (4.0, 8.0, 3.0)],
            "a double, b double, c double",
        )
        rows = correlation_matrix(df, ["a", "b", "c"]).collect()
        assert all(r.n_rows == 3 for r in rows)  # NULL row dropped everywhere
        with pytest.raises(ValueError, match="two columns"):
            correlation_matrix(df, ["a"])


class TestRrfFuse:
    def test_known_fusion(self, spark):
        from moz_datapipeline_spark.operators.retrieval import rrf_fuse

        r1 = spark.createDataFrame(
            [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long"
        )
        r2 = spark.createDataFrame(
            [(12, 1), (10, 2), (13, 3)], "doc_id long, rank long"
        )
        got = {
            r.doc_id: r for r in rrf_fuse([r1, r2], k=60).collect()
        }
        assert abs(got[10].rrf_score - round(1 / 61 + 1 / 62, 6)) < 1e-9
        assert abs(got[12].rrf_score - round(1 / 63 + 1 / 61, 6)) < 1e-9
        assert got[11].n_rankings == 1 and got[13].n_rankings == 1
        # doc in both rankings outranks any single-ranking doc here
        top = rrf_fuse([r1, r2], k=60, topk=1).collect()
        assert [r.doc_id for r in top] == [10]

    def test_grouped_and_validation(self, spark):
        from moz_datapipeline_spark.operators.retrieval import rrf_fuse

        r1 = spark.createDataFrame(
            [("q1", 1, 1), ("q2", 2, 1)], "q string, doc_id long, rank long"
        )
        r2 = spark.createDataFrame(
            [("q1", 1, 2), ("q2", 3, 1)], "q string, doc_id long, rank long"
        )
        rows = rrf_fuse([r1, r2], group_cols=["q"]).collect()
        byq = collections.defaultdict(dict)
        for r in rows:
            byq[r.q][r.doc_id] = r
        assert byq["q1"][1].n_rankings == 2
        assert byq["q2"][2].n_rankings == 1
        with pytest.raises(ValueError, match="ranking"):
            rrf_fuse([])
        with pytest.raises(ValueError, match="k must"):
            rrf_fuse([r1], k=0)


class TestHarmonicCentrality:
    def _ref(self, edges, sources, max_hops):
        adj = collections.defaultdict(set)
        nodes = set()
        for a, b in edges:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
            nodes.update((a, b))
        dists = {}
        for s in sources:
            seen = {s: 0}
            frontier = {s}
            for depth in range(1, max_hops + 1):
                frontier = {
                    w for u in frontier for w in adj[u] if w not in seen
                }
                for w in frontier:
                    seen[w] = depth
            dists[s] = seen
        out = {}
        for v in nodes:
            ds = [
                dists[s][v]
                for s in sources
                if v in dists[s] and dists[s][v] > 0
            ]
            out[v] = (round(sum(1.0 / d for d in ds), 6), len(ds))
        return out

    def test_matches_bfs_reference(self, spark):
        from moz_datapipeline_spark.graph.centrality import (
            harmonic_centrality,
        )

        edges = [
            (0, 1), (1, 2), (2, 3), (3, 4), (4, 5),  # path
            (2, 6), (6, 7),                           # branch
            (8, 9),                                   # separate component
        ]
        e = spark.createDataFrame(edges, "src long, dst long")
        out = harmonic_centrality(e, sources=[0, 6], max_hops=4)
        got = {r.node: (r.harmonic, r.n_reached) for r in out.collect()}
        out.unpersist(blocking=True)
        want = self._ref(edges, [0, 6], 4)
        assert got == want
        # disconnected component is present with zero score
        assert got[8] == (0.0, 0)

    def test_cache_contract(self, spark):
        from moz_datapipeline_spark.graph.centrality import (
            harmonic_centrality,
        )

        base = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
        e = spark.createDataFrame(
            [(i, i + 1) for i in range(50)], "src long, dst long"
        )
        out = harmonic_centrality(e, sources=[0, 25], max_hops=3)
        assert (
            len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
            <= base + 1
        )
        out.unpersist(blocking=True)
        assert (
            len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) <= base
        )

    def test_validation(self, spark):
        from moz_datapipeline_spark.graph.centrality import (
            harmonic_centrality,
        )

        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        with pytest.raises(ValueError, match="source"):
            harmonic_centrality(e, sources=[])
        with pytest.raises(ValueError, match="max_hops"):
            harmonic_centrality(e, sources=[0], max_hops=0)
