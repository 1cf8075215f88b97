"""Link-prediction scores (graph/linkpred.py)."""

from __future__ import annotations

import itertools
import math


def _ref_scores(edges, cap=None):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    out = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        if b in adj[a]:
            continue
        commons = adj[a] & adj[b]
        if cap is not None:
            commons = {z for z in commons if deg[z] <= cap}
        if not commons:
            continue
        cn = len(commons)
        aa = sum(1.0 / math.log(deg[z]) for z in commons)
        out[(a, b)] = (
            cn,
            round(cn / (deg[a] + deg[b] - cn), 6),
            round(aa, 6),
            deg[a] * deg[b],
        )
    return out


_EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0),
    (1, 6), (6, 7), (7, 1), (3, 6), (2, 6), (0, 6),
]


def test_matches_bruteforce(spark):
    from moz_datapipeline_spark.graph.linkpred import link_prediction_scores

    e = spark.createDataFrame(
        _EDGES + [(1, 1), (0, 1)], "src long, dst long"
    )
    got = {
        (r.node_a, r.node_b): (
            r.common_neighbors,
            r.jaccard,
            r.adamic_adar,
            r.preferential_attachment,
        )
        for r in link_prediction_scores(e).collect()
    }
    assert got == _ref_scores(_EDGES)


def test_wedge_degree_cap_drops_hub_centers(spark):
    from moz_datapipeline_spark.graph.linkpred import link_prediction_scores

    # a hub connected to everyone plus a sparse ring
    hub_edges = [(100, i) for i in range(10)]
    ring = [(i, (i + 1) % 10) for i in range(10)]
    e = spark.createDataFrame(hub_edges + ring, "src long, dst long")
    stats: dict = {}
    got = {
        (r.node_a, r.node_b): r.common_neighbors
        for r in link_prediction_scores(
            e, max_wedge_degree=5, stats=stats
        ).collect()
    }
    want = _ref_scores(hub_edges + ring, cap=5)
    assert got == {k: v[0] for k, v in want.items()}
    assert stats["dropped_centers"] == 1  # only the hub exceeds 5
    # but degrees in denominators stay exact: spot-check one pair
    full = _ref_scores(hub_edges + ring, cap=5)
    r = [
        x
        for x in link_prediction_scores(
            e, max_wedge_degree=5
        ).collect()
        if (x.node_a, x.node_b) == (0, 2)
    ][0]
    assert (r.common_neighbors, r.jaccard, r.adamic_adar,
            r.preferential_attachment) == full[(0, 2)]


def test_existing_edges_excluded(spark):
    from moz_datapipeline_spark.graph.linkpred import link_prediction_scores

    # triangle: every 2-hop pair is already an edge -> empty result
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    assert link_prediction_scores(e).count() == 0


def test_default_cap_drops_mega_hub(spark):
    """The DEFAULT max_wedge_degree=1000 must drop a planted mega-hub
    without being asked: one degree-d hub emits d^2 wedge rows, so the
    quadratic path has to be an explicit opt-in (max_wedge_degree=None),
    never the silent default."""
    from moz_datapipeline_spark.graph.linkpred import link_prediction_scores

    hub = [(10_000, i) for i in range(1100)]  # degree 1100 > default 1000
    ring = [(i, (i + 1) % 8) for i in range(8)]
    e = spark.createDataFrame(hub + ring, "src long, dst long")
    stats: dict = {}
    got = {
        (r.node_a, r.node_b): r.common_neighbors
        for r in link_prediction_scores(e, stats=stats).collect()
    }
    assert stats["dropped_centers"] == 1  # the hub — by DEFAULT
    # a pair whose ONLY common neighbor is the hub never materializes,
    # so the wedge volume is bounded by the ring (8 centers of deg <= 3)
    assert (500, 700) not in got
    want = _ref_scores(hub + ring, cap=1000)
    assert got == {k: v[0] for k, v in want.items()}
