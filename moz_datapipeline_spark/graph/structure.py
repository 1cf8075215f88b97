"""Whole-graph structure summaries: degree assortativity, reciprocity.

One-row diagnostics a graph pipeline runs before trusting anything
downstream — assortativity says whether hubs attach to hubs (positive,
social-like) or to leaves (negative, web/biology-like, and the shape
that makes hub-removal attacks effective); reciprocity says how
two-way a directed graph actually is (bot-follow graphs score low,
conversation graphs high).

Scale shape: both fold through hash aggregates and equi joins only —
degree tables are node-sized, the edge pass is one shuffle, and every
final statistic is exact integer arithmetic until a single division
(engine-portable, hash-stable).

Reference parity: extension operators (the reference's graph stage
routes; it does not measure structure) — same family as
``graph.triangles`` / ``graph.aggregate``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Newman degree assortativity of the UNDIRECTED graph, one row
    ``(n_edges, assortativity)``: the Pearson correlation of endpoint
    degrees over the edge list, each undirected edge contributing both
    orientations (the standard symmetrization — otherwise r depends on
    which endpoint landed in ``src``).

    Plan: canonicalize to distinct undirected edges (one shuffle), one
    node-sized degree hash-agg, two joins to attach endpoint degrees,
    then ONE sums fold — Σx, Σx², Σxy over integer degrees are exact,
    so r is bit-stable across engines and partitionings.  Self loops
    drop (they carry no mixing information).
    """
    a, b = F.col(src), F.col(dst)
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("double").alias("d"))
    )
    both = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    pairs = (
        both.join(deg.withColumnsRenamed({"n": "a", "d": "dx"}), "a")
        .join(deg.withColumnsRenamed({"n": "b", "d": "dy"}), "b")
    )
    folded = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("_m2"),
        F.sum("dx").alias("_sx"),
        F.sum(F.col("dx") * F.col("dx")).alias("_sxx"),
        F.sum(F.col("dx") * F.col("dy")).alias("_sxy"),
    )
    # symmetrized list: marginals of x and y are identical
    m = F.col("_m2").cast("double")
    cov = F.col("_sxy") - F.col("_sx") * F.col("_sx") / m
    var = F.col("_sxx") - F.col("_sx") * F.col("_sx") / m
    r = F.when((F.col("_m2") > 0) & (var > 0), cov / var)
    return folded.select(
        (F.col("_m2") / 2).cast("long").alias("n_edges"),
        F.round(r, 6).alias("assortativity"),
    )


def reciprocity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Directed-graph reciprocity, one row ``(n_edges, n_reciprocated,
    reciprocity)``: the fraction of distinct directed edges (self
    loops excluded) whose reverse edge also exists.

    Plan: one distinct pass, then a self semi-join on the swapped key
    — an equi join on (dst, src), never a cartesian; counts stay
    integers to the final division.  An empty graph yields NULL.
    """
    a, b = F.col(src), F.col(dst)
    e = (
        edges.filter(a != b)
        .select(a.alias("u"), b.alias("v"))
        .distinct()
    )
    rev = e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    recip = e.join(rev, ["u", "v"], "left_semi")
    folded = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")).crossJoin(
        recip.agg(
            F.count(F.lit(1)).cast("long").alias("n_reciprocated")
        )
    )
    frac = F.when(
        F.col("n_edges") > 0,
        F.col("n_reciprocated").cast("double")
        / F.col("n_edges").cast("double"),
    )
    return folded.select(
        "n_edges", "n_reciprocated", F.round(frac, 6).alias("reciprocity")
    )


def degree_distribution(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree histogram of the undirected graph plus a power-law tail
    readout: one row per occupied degree ``(degree, n_nodes, alpha)``
    — ``alpha`` the Hill / maximum-likelihood exponent
    ``1 + N / Σ ln(d)`` over all degrees (d_min = 1, whose ln is 0),
    repeated on every row (fold-level constant beside the histogram,
    the ``calibration_curve`` convention).  The first look at any new
    graph: a straight log-log tail with α in [2, 3] is organic; a
    bulge is a bot farm.

    Plan: canonical distinct-edge pass, node-sized degree aggregate,
    a degree-sized histogram aggregate, one 1-row fold broadcast back
    — nothing after the first shuffle is edge-sized.
    """
    a, b = F.col(src), F.col(dst)
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    hist = deg.groupBy(F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    fold = deg.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.log(F.col("d").cast("double"))).alias("_sl"),
    )
    staged = hist.crossJoin(F.broadcast(fold))
    alpha = F.when(
        F.col("_sl") > 0,
        1.0 + F.col("_n").cast("double") / F.col("_sl"),
    )
    return staged.select(
        F.col("degree").cast("long").alias("degree"),
        "n_nodes",
        F.round(alpha, 6).alias("alpha"),
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "community",
) -> DataFrame:
    """Newman modularity of a community assignment, per community:
    ``(community, n_nodes, internal_edges, degree_sum, contribution)``
    with ``Q = Σ contribution = Σ_c [ L_c/m − (D_c/2m)² ]`` — the
    standard partition-quality score (how many intra-community edges
    the labeling captures beyond the degree-preserving random
    expectation).  The acceptance gate for any community detection
    output (``graph.lpa``) and the stop criterion for agglomerative
    schemes.

    ``edges`` must be the engine's symmetric directed convention (both
    (u,v) and (v,u) present, as built for PageRank/k-core): the
    symmetric count is 2m, per-row out-degree is the undirected
    degree, and internal symmetric pairs count L_c twice — the
    arithmetic below folds those factors exactly.  Unlabeled
    endpoints drop their edges (surfaced in ``n_nodes`` vs the input
    frame, never silently miscounted as a community).

    Plan shape: two node-keyed equi joins tag each edge end with its
    community (shuffle on node key, the same key both joins — one
    exchange reused), then community-sized hash aggregates; the
    2m/degree totals ride a single-row broadcast cross join.  No
    global window, no driver collect; community rollup is
    |communities|-sized.
    """
    lab = labels.select(
        F.col(node_col).alias("_n"), F.col(label_col).alias("_c")
    )
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    tagged = (
        e.join(lab.withColumnRenamed("_c", "_cs"), e["_s"] == lab["_n"])
        .drop("_n")
        .join(
            lab.withColumnRenamed("_c", "_cd").withColumnRenamed(
                "_n", "_n2"
            ),
            F.col("_d") == F.col("_n2"),
        )
        .drop("_n2")
    )
    per_node_deg = tagged.groupBy("_s", "_cs").agg(
        F.count(F.lit(1)).alias("_deg")
    )
    per_comm = per_node_deg.groupBy(F.col("_cs").alias("community")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("_deg").alias("degree_sum"),
    )
    internal = (
        tagged.filter(F.col("_cs") == F.col("_cd"))
        .groupBy(F.col("_cs").alias("community"))
        .agg((F.count(F.lit(1)) / 2).cast("long").alias("internal_edges"))
    )
    totals = e.agg(F.count(F.lit(1)).alias("_two_m"))
    joined = (
        per_comm.join(internal, "community", "left")
        .na.fill({"internal_edges": 0})
        .crossJoin(F.broadcast(totals))
    )
    m = F.col("_two_m").cast("double") / 2.0
    contrib = (
        F.col("internal_edges").cast("double") / m
        - (F.col("degree_sum").cast("double") / (2.0 * m)) ** 2
    )
    return joined.select(
        "community",
        "n_nodes",
        "internal_edges",
        "degree_sum",
        F.round(contrib, 6).alias("contribution"),
    )
