"""Golden test: the reference's 10-segment road-network fixture.

Re-creates the synthetic network of /root/reference/tests/fixtures/
(topology + RUC/length/flood data documented in tests/README.md) and
asserts the prose expectations of tests/README.md:24-61:

- route totals A→B: 3.75 (1-2-3), 4.25 (1-4-5-6), 4.45 (1-7-8-9)
- segments 2,3 die at return periods 500/1000; segment 5 at 1000
- A↔C and B↔C become unroutable at 500/1000 → excluded from EAUL
- upgrades on 1 and 10 don't change EAUL; on 2/3 raise it; on 7/8/9
  eliminate it (new best route is never flooded)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from moz_datapipeline_spark.graph.criticality import criticality_scores
from moz_datapipeline_spark.graph.eaul import EaulContext, eaul_scores
from moz_datapipeline_spark.graph.kernel import build_graph, pair_costs

# (name, src, dst, length_km, ruc) — tests/README.md:7-18 + roadnetwork.osm topology
WAYS = [
    ("1", "2", "3", 1.0, 1.25),
    ("2", "3", "5", 1.0, 1.25),
    ("3", "5", "7", 1.0, 1.25),
    ("4", "3", "9", 1.0, 0.75),
    ("5", "9", "11", 2.0, 0.75),
    ("6", "11", "7", 1.0, 0.75),
    ("7", "3", "14", 1.0, 0.8),
    ("8", "14", "16", 2.0, 0.8),
    ("9", "16", "7", 1.0, 0.8),
    ("10", "19", "5", 0.5, 0.8),
]

ZERO10 = [0.0] * 10


def edges_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "way_id": [w[0] for w in WAYS],
            "src": [w[1] for w in WAYS],
            "dst": [w[2] for w in WAYS],
            "weight": [w[3] * w[4] for w in WAYS],
            "len_part": [w[3] for w in WAYS],
            "ruc": [w[4] for w in WAYS],
        }
    )


def way_props_pdf() -> pd.DataFrame:
    def depths(name):
        if name in ("2", "3"):
            return ZERO10[:8] + [20.0, 20.0]
        if name == "5":
            return ZERO10[:9] + [20.0]
        return list(ZERO10)

    def lengths(name):
        if name in ("2", "3"):
            return ZERO10[:8] + [50.0, 100.0]
        if name == "5":
            return ZERO10[:9] + [100.0]
        return list(ZERO10)

    return pd.DataFrame(
        {
            "way_id": [w[0] for w in WAYS],
            "length_km": [w[3] for w in WAYS],
            "surface": ["unpaved"] * len(WAYS),
            "depths": [depths(w[0]) for w in WAYS],
            "lengths": [lengths(w[0]) for w in WAYS],
        }
    )


OD_NODES = ["2", "7", "19"]  # A, B, C
TRAFFIC = {(0, 1): 73000.0, (0, 2): 73000.0, (1, 2): 73000.0}  # (100+100)*365


def test_benchmark_route_costs():
    g = build_graph(edges_pdf())
    idx = {n: i for i, n in enumerate(g.node_ids)}
    od = np.array([idx[n] for n in OD_NODES])
    mat = pair_costs(g, od)
    assert mat[0, 1] == pytest.approx(3.75)  # A-B via 1-2-3
    assert mat[0, 2] == pytest.approx(2.90)  # A-C via 1-2-10
    assert mat[1, 2] == pytest.approx(1.65)  # B-C via 3-10

    # remove ways 2,3 (return period 500): A-B falls back to route 2
    mask = ~np.isin(g.way_id, ["2", "3"])
    mat500 = pair_costs(g, od, edge_mask=mask)
    assert mat500[0, 1] == pytest.approx(4.25)
    assert np.isinf(mat500[0, 2]) and np.isinf(mat500[1, 2])  # C unreachable

    # remove ways 2,3,5 (period 1000): only route 3 remains
    mask = ~np.isin(g.way_id, ["2", "3", "5"])
    mat1000 = pair_costs(g, od, edge_mask=mask)
    assert mat1000[0, 1] == pytest.approx(4.45)


def test_criticality_scores(spark):
    scored = criticality_scores(spark, edges_pdf(), OD_NODES).toPandas()
    s = scored.set_index("way_id")["score"]
    # ways 1 and 10 isolate an OD point -> 2 unroutable pairs each -> top score
    assert s["1"] == pytest.approx(60.0)
    assert s["10"] == pytest.approx(60.0)
    # ways 2,3 force costly detours on 2 pairs -> full time score (40%)
    assert s["2"] == pytest.approx(40.0)
    assert s["3"] == pytest.approx(40.0)
    # redundant segments: no impact
    for w in ("4", "5", "6", "7", "8", "9"):
        assert s[w] == pytest.approx(0.0), w
    st = scored.set_index("way_id")
    assert st.loc["1", "unroutable_pairs"] == 2
    assert st.loc["2", "impacted_pairs"] == 2


def test_eaul_baseline_hand_computed():
    ctx = EaulContext(edges_pdf(), way_props_pdf(), OD_NODES, TRAFFIC)
    baseline, excluded = ctx.eaul(None, None, 0.7, None, None)
    # Hand derivation (tests/README.md:24-61 semantics):
    # period 500: r = 90 days (ways 2,3: 0.5 km flooded × 4320/24),
    #   dU = (4.25-3.75)·73000 = 36500 → U₈ = 3,285,000
    # period 1000: r = 360 (way 5: 2 km × 180), dU = (4.45-3.75)·73000
    #   = 51100 → U₉ = 18,396,000
    # EAUL = ½·[(1/250−1/500)·U₈ + (1/500−1/1000)·(U₈+U₉)]
    #      = ½·(6570 + 21681) = 14,125.5
    assert baseline == pytest.approx(14125.5)
    # A-C and B-C excluded (unroutable at 500/1000)
    assert excluded.tolist() == [False, True, True]


def test_eaul_upgrade_expectations(spark):
    res = eaul_scores(
        spark, edges_pdf(), way_props_pdf(), OD_NODES, TRAFFIC
    ).toPandas()
    baseline = res[res.upgrade_id == "baseline"]["eaul"].iloc[0]
    asphalt = res[res.upgrade_id == "upgrade-rehab-asphalt"].set_index("way_id")[
        "eaul"
    ]
    # no impact: way 1 is shared by every route; way 10 is a dead-end spur
    assert asphalt["1"] == pytest.approx(baseline)
    assert asphalt["10"] == pytest.approx(baseline)
    # upgrading 2 or 3 raises EAUL above baseline (README "Notes on EAUL")
    assert asphalt["2"] > baseline
    assert asphalt["3"] > baseline
    # upgrades on 7/8/9 are the most significant (route 3 never floods):
    # 8 (2 km) makes route 3 cheapest outright -> EAUL collapses to 0;
    # 7/9 (1 km) make it the best route under flood -> large reduction
    assert asphalt["8"] == pytest.approx(0.0)
    assert asphalt["7"] == pytest.approx(asphalt["9"])
    assert asphalt["7"] < 0.25 * baseline
    reductions = (baseline - asphalt).sort_values(ascending=False)
    assert set(reductions.index[:3]) == {"7", "8", "9"}
