"""HITS hubs & authorities (graph/hits.py)."""

from __future__ import annotations

import collections

import pytest

from moz_datapipeline_spark.graph.hits import hits


def _ref_hits(edges, iters):
    e = sorted(set(edges))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    hub = {v: 1.0 for v in nodes}
    auth = {}
    for _ in range(iters):
        auth = collections.defaultdict(float)
        for a, b in e:
            auth[b] += hub[a]
        hub = collections.defaultdict(float)
        for a, b in e:
            hub[a] += auth[b]
    h = {v: hub.get(v, 0.0) for v in nodes}
    a = {v: auth.get(v, 0.0) for v in nodes}
    th, ta = sum(h.values()), sum(a.values())
    return (
        {v: (x / th if th > 0 else 0.0) for v, x in h.items()},
        {v: (x / ta if ta > 0 else 0.0) for v, x in a.items()},
    )


_EDGES = [
    (0, 3), (1, 3), (2, 3),      # 3 is the authority
    (0, 4), (1, 4),
    (3, 5), (5, 0),              # back-links + a cycle
    (0, 3),                      # duplicate must collapse
]


def test_matches_python_reference(spark):
    e = spark.createDataFrame(_EDGES, "src long, dst long")
    for iters in (1, 2, 4):
        want_h, want_a = _ref_hits(_EDGES, iters)
        got = {r.node: r for r in hits(e, iters=iters).collect()}
        assert set(got) == set(want_h)
        for v in want_h:
            assert abs(got[v].hub - want_h[v]) < 1e-12, (iters, v)
            assert abs(got[v].authority - want_a[v]) < 1e-12, (iters, v)


def test_hub_authority_split(spark):
    # star: center points at 5 leaves -> center is pure hub,
    # leaves pure (equal) authorities
    e = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    got = {r.node: r for r in hits(e, iters=3).collect()}
    assert abs(got[0].hub - 1.0) < 1e-12
    assert got[0].authority == 0.0
    for i in range(1, 6):
        assert got[i].hub == 0.0
        assert abs(got[i].authority - 0.2) < 1e-12


def test_rejects_zero_iters(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="iters"):
        hits(e, iters=0)
