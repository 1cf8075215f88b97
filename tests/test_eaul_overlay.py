"""Multi-edge EAUL closed-form overlay vs brute-force recompute.

The reference normally splits ways to 2-node segments
(script-preparation/preparation.sh:248 --split-ways 1), but eaul.js
itself is defined over arbitrary ways; the overlay path must be exact
for ways owning several edges. These tests pin
``EaulContext.scenario_pair_costs`` against a full masked
weight-override ``pair_costs`` recompute on (a) the reference fixture
re-grouped into multi-edge ways and (b) seeded random graphs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from moz_datapipeline_spark.graph.eaul import EaulContext
from moz_datapipeline_spark.graph.kernel import pair_costs

ZERO10 = [0.0] * 10

# reference topology, but routes 2 and 3 each modeled as ONE way
# owning 3 edges (way R2 = segments 4+5+6, way R3 = segments 7+8+9)
MULTI_EDGES = [
    # (way_id, src, dst, len_km, ruc)
    ("1", "2", "3", 1.0, 1.25),
    ("2", "3", "5", 1.0, 1.25),
    ("3", "5", "7", 1.0, 1.25),
    ("R2", "3", "9", 1.0, 0.75),
    ("R2", "9", "11", 2.0, 0.75),
    ("R2", "11", "7", 1.0, 0.75),
    ("R3", "3", "14", 1.0, 0.8),
    ("R3", "14", "16", 2.0, 0.8),
    ("R3", "16", "7", 1.0, 0.8),
    ("10", "19", "5", 0.5, 0.8),
]

OD_NODES = ["2", "7", "19"]
TRAFFIC = {(0, 1): 73000.0, (0, 2): 73000.0, (1, 2): 73000.0}


def edges_pdf(rows) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "way_id": [w[0] for w in rows],
            "src": [w[1] for w in rows],
            "dst": [w[2] for w in rows],
            "weight": [w[3] * w[4] for w in rows],
            "len_part": [w[3] for w in rows],
            "ruc": [w[4] for w in rows],
        }
    )


def way_props_pdf(rows) -> pd.DataFrame:
    ids = sorted({w[0] for w in rows})
    lengths = {i: sum(w[3] for w in rows if w[0] == i) for i in ids}
    return pd.DataFrame(
        {
            "way_id": ids,
            "length_km": [lengths[i] for i in ids],
            "surface": ["unpaved"] * len(ids),
            "depths": [list(ZERO10) for _ in ids],
            "lengths": [list(ZERO10) for _ in ids],
        }
    )


def brute(ctx: EaulContext, way: str, new_ruc: float, removed: set) -> np.ndarray:
    weight = ctx.g.weight.copy()
    sel = ctx.g.way_id == way
    weight[sel] = new_ruc * ctx.len_part[sel]
    mask = ~np.isin(ctx.g.way_id, list(removed)) if removed else None
    mat = pair_costs(ctx.g, ctx.od_nodes, edge_mask=mask, weight_override=weight)
    return mat[ctx.iu, ctx.ju]


@pytest.mark.parametrize("removed", [set(), {"2", "3"}, {"2", "3", "10"}])
@pytest.mark.parametrize("way,new_ruc", [("R2", 0.23), ("R3", 0.23), ("R3", 0.5)])
def test_fixture_multi_edge_decrease(way, new_ruc, removed):
    ctx = EaulContext(
        edges_pdf(MULTI_EDGES), way_props_pdf(MULTI_EDGES), OD_NODES, TRAFFIC
    )
    got = ctx.scenario_pair_costs(way, new_ruc, removed)
    want = brute(ctx, way, new_ruc, removed)
    finite = np.isfinite(want)
    assert np.array_equal(np.isfinite(got), finite)
    np.testing.assert_allclose(got[finite], want[finite], rtol=1e-12)


def test_fixture_multi_edge_addition():
    """Way flooded out of the cached period graph, re-added by the
    upgrade's drainage: exercises branch (A) — edge addition overlay."""
    ctx = EaulContext(
        edges_pdf(MULTI_EDGES), way_props_pdf(MULTI_EDGES), OD_NODES, TRAFFIC
    )
    removed = {"2", "3"}
    # seed the cache with the graph where R3 is ALSO gone, as the
    # baseline flood phase would have for an impassable R3
    ctx._od_dists(frozenset(removed | {"R3"}))
    got = ctx.scenario_pair_costs("R3", 0.23, removed)
    want = brute(ctx, "R3", 0.23, removed)
    finite = np.isfinite(want)
    assert np.array_equal(np.isfinite(got), finite)
    np.testing.assert_allclose(got[finite], want[finite], rtol=1e-12)
    # and it must NOT have run a full per-scenario recompute: only the
    # seeded key + (maybe) the removed key itself are in the OD cache
    assert set(ctx._dist_cache) <= {frozenset(removed | {"R3"}), frozenset(removed)}


def _random_case(rng: np.random.Generator):
    n_nodes = int(rng.integers(12, 30))
    n_edges = int(rng.integers(n_nodes, n_nodes * 2))
    src = rng.integers(0, n_nodes, n_edges)
    dst = (src + 1 + rng.integers(0, n_nodes - 1, n_edges)) % n_nodes
    n_ways = max(2, n_edges // 3)
    way = rng.integers(0, n_ways, n_edges)
    ruc = rng.uniform(0.5, 2.0, n_edges)
    # edges of one way share a ruc (way-level attribute)
    way_ruc = rng.uniform(0.5, 2.0, n_ways)
    ruc = way_ruc[way]
    length = rng.uniform(0.5, 3.0, n_edges)
    rows = [
        (f"w{way[i]}", f"n{src[i]}", f"n{dst[i]}", float(length[i]), float(ruc[i]))
        for i in range(n_edges)
    ]
    od = [f"n{i}" for i in rng.choice(n_nodes, size=4, replace=False)]
    present = sorted({r[1] for r in rows} | {r[2] for r in rows})
    od = [o for o in od if o in present]
    if len(od) < 2:
        return None
    traffic = {
        (i, j): 1000.0 for i in range(len(od)) for j in range(i + 1, len(od))
    }
    return rows, od, traffic, way_ruc


def test_randomized_overlay_matches_bruteforce():
    rng = np.random.default_rng(20260813)
    checked = 0
    while checked < 25:
        case = _random_case(rng)
        if case is None:
            continue
        rows, od, traffic, way_ruc = case
        ctx = EaulContext(edges_pdf(rows), way_props_pdf(rows), od, traffic)
        counts = pd.Series(ctx.g.way_id).value_counts()
        multi = [w for w in counts.index if counts[w] > 1]
        if not multi:
            continue
        way = multi[int(rng.integers(0, len(multi)))]
        old_ruc = float(way_ruc[int(way[1:])])
        new_ruc = old_ruc * float(rng.uniform(0.1, 0.99))
        all_ways = list(counts.index)
        k = int(rng.integers(0, max(1, len(all_ways) // 3)))
        removed = set(
            w for w in rng.choice(all_ways, size=k, replace=False) if w != way
        )
        got = ctx.scenario_pair_costs(way, new_ruc, removed)
        want = brute(ctx, way, new_ruc, removed)
        finite = np.isfinite(want)
        assert np.array_equal(np.isfinite(got), finite), (rows, way, removed)
        np.testing.assert_allclose(got[finite], want[finite], rtol=1e-9)
        checked += 1
