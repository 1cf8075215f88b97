"""GNN-style neighborhood feature aggregation over an edge list.

The message-passing primitive every graph-ML pipeline needs before any
model sees the data: for each node, statistics of its neighbors'
features (and, composed once more, of its neighbors' neighborhoods).
One hop is one equi join + one hash aggregate — Σ deg(v) rows through
the exchange, never |V|²; two hops compose the FIRST hop's |V|-row
output, so the second hop costs the same join again, not a fan-out.

Reference parity: extension surface; the join idiom follows
``graph/linkpred.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def neighbor_feature_aggregate(
    edges: DataFrame,
    features: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    feature_col: str = "feature",
    hops: int = 1,
    symmetrize: bool = True,
) -> DataFrame:
    """Per-node neighbor-feature statistics: ``(node, n_neighbors,
    mean_f, min_f, max_f)`` — at ``hops=2`` the feature aggregated is
    the neighbor's OWN 1-hop mean (mean-of-means, the standard 2-layer
    mean-aggregator composition), recomputed over the 1-hop output so
    the cost stays one |E|-row join per hop.

    Self-loops drop; duplicate edges collapse (a neighbor counts
    once); nodes with no feature row still aggregate for their
    neighbors as NULLs (excluded from mean/min/max, the SQL
    convention) and ``n_neighbors`` counts edges, not feature
    presence.  Nodes with no neighbors do not appear (aggregate over
    an empty set — left-join the node table downstream if every node
    needs a row).
    """
    if hops not in (1, 2):
        raise ValueError("neighbor_feature_aggregate: hops must be 1 or 2")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if symmetrize:
        e = e.unionByName(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
    e = e.filter(F.col("_s") != F.col("_d")).distinct()

    def one_hop(feats: DataFrame, fcol: str) -> DataFrame:
        f = feats.select(
            F.col(node_col).alias("_d"),
            F.col(fcol).cast("double").alias("_f"),
        )
        return (
            e.join(f, "_d", "left")
            .groupBy(F.col("_s").alias(node_col))
            .agg(
                F.count(F.lit(1)).alias("n_neighbors"),
                F.avg("_f").alias("mean_f"),
                F.min("_f").alias("min_f"),
                F.max("_f").alias("max_f"),
            )
        )

    first = one_hop(features, feature_col)
    if hops == 1:
        return first
    return one_hop(first, "mean_f")
