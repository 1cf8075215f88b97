"""OSRM-parity edge-projection OD snapping (criticality.js:132-177):
off-network points route from the foot of the perpendicular onto the
nearest segment, partial-edge traversal costs included, and a point
whose nearest segment is the excluded way becomes unroutable (the
reference's issue #7 null case)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from moz_datapipeline_spark.graph.kernel import (
    build_graph,
    pair_costs,
    snap_to_edges,
    split_edges_at_points,
)

# unit square: 4 ways, each of weight 2.0 (= its planar length)
SQUARE_COORDS = {
    "A": (0.0, 0.0),
    "B": (2.0, 0.0),
    "C": (2.0, 2.0),
    "D": (0.0, 2.0),
}


def square_edges() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "way_id": ["w1", "w2", "w3", "w4"],
            "src": ["A", "B", "C", "D"],
            "dst": ["B", "C", "D", "A"],
            "weight": [2.0, 2.0, 2.0, 2.0],
            "len_part": [2.0, 2.0, 2.0, 2.0],
        }
    )


def test_snap_to_edges_projection_parameters():
    pts = np.array([[0.5, -0.3], [2.3, 1.5], [-1.0, -1.0]])
    e, t = snap_to_edges(pts, square_edges(), SQUARE_COORDS)
    # (0.5,-0.3) -> foot (0.5, 0) on A-B, t = 0.25
    assert e[0] == 0 and t[0] == pytest.approx(0.25)
    # (2.3, 1.5) -> foot (2, 1.5) on B-C, t = 0.75
    assert e[1] == 1 and t[1] == pytest.approx(0.75)
    # beyond corner A: clamps to an endpoint (t = 0 on A-B)
    assert t[2] in (0.0, 1.0)


def test_phantom_pair_costs_hand_computed():
    """P on w1 (t=0.25), Q on w2 (t=0.75): shortest route goes
    P -> B (1.5) -> Q (1.5) = 3.0, beating the long way round
    (0.5 + 2 + 2 + 0.5 = 5.0).  Partial-edge costs are the whole
    point of edge snapping — node snap would give d(A,B)=2 or 0."""
    aug, od_ids, coords = split_edges_at_points(
        square_edges(), np.array([[0.5, -0.3], [2.3, 1.5]]), SQUARE_COORDS
    )
    # each split keeps its way_id and conserves total weight
    assert set(aug["way_id"]) == {"w1", "w2", "w3", "w4"}
    assert aug.groupby("way_id")["weight"].sum().tolist() == pytest.approx(
        [2.0, 2.0, 2.0, 2.0]
    )
    g = build_graph(aug)
    idx = {n: i for i, n in enumerate(g.node_ids)}
    od = np.array([idx[od_ids[0]], idx[od_ids[1]]])
    mat = pair_costs(g, od)
    assert mat[0, 1] == pytest.approx(3.0)
    # phantom coordinates sit at the foot points
    assert coords[od_ids[0]] == pytest.approx((0.5, 0.0))
    assert coords[od_ids[1]] == pytest.approx((2.0, 1.5))


def test_same_edge_two_points_direct_cost():
    """Two points on one edge chain-split it; their cost is the
    along-edge distance, not a detour through a junction."""
    aug, od_ids, _ = split_edges_at_points(
        square_edges(), np.array([[0.5, -0.1], [1.5, -0.1]]), SQUARE_COORDS
    )
    g = build_graph(aug)
    idx = {n: i for i, n in enumerate(g.node_ids)}
    od = np.array([idx[od_ids[0]], idx[od_ids[1]]])
    assert pair_costs(g, od)[0, 1] == pytest.approx(1.0)


def test_masked_snapped_way_is_unroutable():
    """OSRM null semantics: when the nearest segment to a point is the
    ignored way, every route through that point is unroutable
    (criticality.js:148-165) — the phantom's half-edges carry the
    way_id, so the way mask isolates it."""
    aug, od_ids, _ = split_edges_at_points(
        square_edges(), np.array([[0.5, -0.3], [2.3, 1.5]]), SQUARE_COORDS
    )
    g = build_graph(aug)
    idx = {n: i for i, n in enumerate(g.node_ids)}
    od = np.array([idx[od_ids[0]], idx[od_ids[1]]])
    mat = pair_costs(g, od, edge_mask=(g.way_id != "w1"))
    assert np.isinf(mat[0, 1])


def test_endpoint_projection_reuses_node():
    """A point projecting exactly onto a junction snaps to the node
    itself — no zero-weight stub edges."""
    aug, od_ids, _ = split_edges_at_points(
        square_edges(), np.array([[-1.0, -1.0], [2.5, 2.5]]), SQUARE_COORDS
    )
    assert od_ids[0] in ("A", "B", "D")  # clamp lands on corner A's node
    assert od_ids[1] in ("B", "C", "D")
    assert len(aug) == 4  # untouched edge list


def test_criticality_scores_edge_snap(spark):
    """criticality accepts snap='edge': removing the way a point
    snapped to yields an unroutable pair (score 60 via the 0.6
    unroutable weight), untouched ways prune to zero."""
    from moz_datapipeline_spark.graph.criticality import criticality_scores

    scored = criticality_scores(
        spark,
        square_edges(),
        od_points_lonlat=np.array([[0.5, -0.3], [2.3, 1.5]]),
        node_coords=SQUARE_COORDS,
        snap="edge",
    ).toPandas()
    s = scored.set_index("way_id")
    assert s.loc["w1", "unroutable_pairs"] == 1
    assert s.loc["w2", "unroutable_pairs"] == 1
    assert s.loc["w1", "score"] == pytest.approx(60.0)
    assert s.loc["w2", "score"] == pytest.approx(60.0)
    # w3/w4 sit on no OD shortest path -> pruned zero rows
    assert s.loc["w3", "score"] == pytest.approx(0.0)
    assert s.loc["w4", "score"] == pytest.approx(0.0)


def test_criticality_scores_node_snap_points(spark):
    """snap='node' approximates with the nearest junction (A and C):
    same machinery, junction endpoints."""
    from moz_datapipeline_spark.graph.criticality import criticality_scores

    scored = criticality_scores(
        spark,
        square_edges(),
        od_points_lonlat=np.array([[0.1, -0.3], [2.3, 1.9]]),
        node_coords=SQUARE_COORDS,
        snap="node",
    ).toPandas()
    s = scored.set_index("way_id")
    # A->C: two equal-cost routes (w1+w2 / w4+w3); removing any one way
    # leaves the other route -> nothing unroutable anywhere
    assert (s["unroutable_pairs"] == 0).all()


def test_eaul_scores_edge_snap_endpoint_equivalence(spark):
    """eaul accepts snap='edge'; OD points placed exactly on the
    fixture's OD junctions reuse those nodes, so the EAUL table equals
    the node-id run row for row."""
    from tests.test_routing_fixture import (
        OD_NODES,
        TRAFFIC,
        edges_pdf,
        way_props_pdf,
    )

    from moz_datapipeline_spark.graph.eaul import eaul_scores

    # synthetic layout: nodes on a line, distinct x per node id
    node_ids = sorted(
        set(edges_pdf()["src"]) | set(edges_pdf()["dst"]), key=int
    )
    coords = {n: (float(n), 0.0) for n in node_ids}
    od_pts = np.array([coords[n] for n in OD_NODES])

    base = (
        eaul_scores(spark, edges_pdf(), way_props_pdf(), OD_NODES, TRAFFIC)
        .toPandas()
        .set_index(["way_id", "upgrade_id"])["eaul"]
        .sort_index()
    )
    snapped = (
        eaul_scores(
            spark,
            edges_pdf(),
            way_props_pdf(),
            traffic_yearly=TRAFFIC,
            od_points_lonlat=od_pts,
            node_coords=coords,
            snap="edge",
        )
        .toPandas()
        .set_index(["way_id", "upgrade_id"])["eaul"]
        .sort_index()
    )
    pd.testing.assert_series_equal(base, snapped)
