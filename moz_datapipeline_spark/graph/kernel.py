"""Numpy Dijkstra routing kernel.

Replaces OSRM (contraction hierarchies, scripts/criticality/criticality.sh:6-11)
with a plain binary-heap Dijkstra over a CSR adjacency. The reference's
cost model (scripts/utils/moz.lua:64-83) makes travel cost proportional
to RUC × length, so edge weight = RUC · length_km and a route's cost is
its total RUC — matching the hand-computed fixture totals
(tests/README.md:24-38: routes 3.75 / 4.25 / 4.45).

Scale stance: a national road graph is ~10⁵ nodes (tiny); what explodes
is the scenario count (ways × upgrades × flood periods). So the graph is
broadcast once, immutable, and each scenario applies a boolean edge mask
— never a rebuild (the reference rebuilds OSRM per scenario, its main
cost driver, script-eaul/eaul.js:506-549).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np
import pandas as pd

INF = float("inf")


@dataclass
class Graph:
    """Immutable edge-list graph; nodes are dense ints [0, n)."""

    n_nodes: int
    node_ids: list[str]  # dense index -> original node id
    # parallel edge arrays (undirected: one entry per way segment)
    src: np.ndarray  # int32
    dst: np.ndarray  # int32
    weight: np.ndarray  # float64
    way_id: np.ndarray  # object (str) — owning way per edge


def build_graph(edges: pd.DataFrame) -> Graph:
    """edges: columns (way_id, src, dst, weight) with string node ids."""
    nodes = pd.unique(pd.concat([edges["src"], edges["dst"]], ignore_index=True))
    idx = {n: i for i, n in enumerate(nodes)}
    return Graph(
        n_nodes=len(nodes),
        node_ids=list(nodes),
        src=edges["src"].map(idx).to_numpy(dtype=np.int32),
        dst=edges["dst"].map(idx).to_numpy(dtype=np.int32),
        weight=edges["weight"].to_numpy(dtype=np.float64),
        way_id=edges["way_id"].to_numpy(dtype=object),
    )


def _csr(
    g: Graph, edge_mask: np.ndarray | None, weight_override: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build a CSR adjacency (both directions) from masked edge arrays."""
    w = g.weight if weight_override is None else weight_override
    if edge_mask is not None:
        s, d, w = g.src[edge_mask], g.dst[edge_mask], w[edge_mask]
    else:
        s, d = g.src, g.dst
    # undirected: duplicate reversed
    all_src = np.concatenate([s, d])
    all_dst = np.concatenate([d, s])
    all_w = np.concatenate([w, w])
    order = np.argsort(all_src, kind="stable")
    all_src, all_dst, all_w = all_src[order], all_dst[order], all_w[order]
    indptr = np.zeros(g.n_nodes + 1, dtype=np.int64)
    np.add.at(indptr, all_src + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, all_dst, all_w


def dijkstra(
    indptr: np.ndarray, indices: np.ndarray, weights: np.ndarray, source: int, n: int
) -> np.ndarray:
    """Single-source shortest path; returns dist array (inf = unreachable)."""
    dist = np.full(n, INF)
    dist[source] = 0.0
    heap = [(0.0, source)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist[u]:
            continue
        for k in range(indptr[u], indptr[u + 1]):
            v = indices[k]
            nd = d + weights[k]
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


def pair_costs(
    g: Graph,
    od_nodes: np.ndarray,
    edge_mask: np.ndarray | None = None,
    weight_override: np.ndarray | None = None,
) -> np.ndarray:
    """Upper-triangle OD pair costs.

    Returns a dense (n_od, n_od) matrix of route costs; entry is inf when
    unroutable. Pair cost = max(ab, ba) per the reference
    (criticality.js:144-171) — symmetric here because the graph is
    undirected, kept for parity of semantics.
    """
    indptr, indices, weights = _csr(g, edge_mask, weight_override)
    n_od = len(od_nodes)
    mat = np.full((n_od, n_od), INF)
    for i, s in enumerate(od_nodes):
        dist = dijkstra(indptr, indices, weights, int(s), g.n_nodes)
        mat[i, :] = dist[od_nodes]
    # symmetrize with max (OSRM asymmetry semantics)
    return np.maximum(mat, mat.T)


def snap_to_nodes(
    g: Graph, points_lonlat: np.ndarray, node_coords: dict[str, tuple[float, float]]
) -> np.ndarray:
    """Snap lon/lat points to the nearest graph node (planar argmin).

    Stands in for OSRM's snap-to-nearest-edge; adequate when OD points
    coincide with network nodes (true for the reference's fixtures and
    OD zone centroids).
    """
    coords = np.array([node_coords[n] for n in g.node_ids])  # (n, 2) lon/lat
    out = np.empty(len(points_lonlat), dtype=np.int32)
    for i, (lon, lat) in enumerate(points_lonlat):
        d2 = (coords[:, 0] - lon) ** 2 + (coords[:, 1] - lat) ** 2
        out[i] = int(np.argmin(d2))
    return out
