"""Distributed triangle counting via degree-ordered edge orientation.

Triangle counts are the workhorse local-clustering signal (spam/link-
farm detection on web graphs, community cohesion), and the naive
3-way self-join explodes on high-degree hubs: a degree-d node
contributes d² wedges.  The standard fix — orient every undirected
edge from the endpoint with the SMALLER (degree, id) to the larger,
then only build wedges out of each node's oriented neighbours — caps
any node's oriented out-degree at O(√|E|), so wedge volume is
O(|E|^1.5) worst case and far less on real degree distributions,
independent of hub size.

Plan shape (all equi joins and hash aggregations, AQE-skew-safe):

1. canonicalize to distinct undirected edges (one shuffle);
2. degree count (hash agg);
3. attach each endpoint's total-order key ``deg·2^32 + id`` (two
   broadcast-or-shuffle joins against the small degree table) and
   orient;
4. wedges: self-join oriented edges on the tail with an inequality on
   the head keys so each unordered pair appears exactly once;
5. closure: join wedges against oriented edges on (head1, head2) —
   the closing edge is oriented the same way because the key order is
   total, so one equi join finds it;
6. per-node counts: explode each triangle's three corners, hash agg.

Reference parity: extension operator (the reference's graph stage
routes, it does not mine structure); the orient-then-join idiom is the
same shuffle-bounding trick as the dedup band buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: id must fit below this for the (degree, id) key packing
_ID_SPACE = 1 << 32


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation: ``(node, triangles)``, nodes
    in no triangle omitted.  Input is treated as undirected; self
    loops and parallel/reverse duplicates are collapsed first.  Node
    ids must be non-negative and < 2^32 (they pack into the
    degree-order key)."""
    a, b = F.col(src), F.col(dst)
    und = (
        edges.filter(a != b)
        .select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    key = (F.col("d") * F.lit(_ID_SPACE) + F.col("n")).alias("k")
    keyed = deg.select("n", key)
    with_keys = (
        und.join(keyed.withColumnsRenamed({"n": "a", "k": "ka"}), "a")
        .join(keyed.withColumnsRenamed({"n": "b", "k": "kb"}), "b")
    )
    ori = with_keys.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a"))
        .otherwise(F.col("b"))
        .alias("u"),
        F.when(F.col("ka") < F.col("kb"), F.col("b"))
        .otherwise(F.col("a"))
        .alias("v"),
        F.least("ka", "kb").alias("ku"),
        F.greatest("ka", "kb").alias("kv"),
    )
    e1 = ori.select("u", F.col("v").alias("x"), F.col("kv").alias("kx"))
    e2 = ori.select("u", F.col("v").alias("y"), F.col("kv").alias("ky"))
    wedges = e1.join(e2, "u").filter(F.col("kx") < F.col("ky"))
    closed = wedges.join(
        ori.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
    )
    corners = (
        closed.select(F.col("u").alias("node"))
        .unionByName(closed.select(F.col("x").alias("node")))
        .unionByName(closed.select(F.col("y").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("triangles")
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node: ``(node, degree,
    triangles, coefficient)`` with ``coefficient = 2·T / (d·(d−1))``
    — the fraction of a node's neighbour pairs that are themselves
    connected.  The per-node cohesion readout on top of
    ``triangle_counts``: link farms score near 0, tight communities
    near 1.  Degree-1 nodes have no neighbour pair → NULL coefficient
    (not a fake 0); nodes in no triangle get coefficient 0.

    Plan: the degree hash-agg + the full ``triangle_counts`` pipeline
    (degree-ordered orientation bounds the wedge join), then one left
    join of the degree table onto the triangle counts — both
    node-sized, not edge-sized.  Integer arithmetic until the final
    division: engine-exact.
    """
    a, b = F.col(src), F.col(dst)
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_counts(und, "a", "b")
    joined = deg.join(tri, "node", "left").withColumn(
        "triangles", F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
    )
    dd = F.col("degree").cast("double")
    coef = F.when(
        F.col("degree") > 1,
        2.0 * F.col("triangles").cast("double") / (dd * (dd - 1.0)),
    )
    return joined.select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        "triangles",
        F.round(coef, 6).alias("coefficient"),
    )
