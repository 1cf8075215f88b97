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

from pyspark.sql import DataFrame, Window
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


def greedy_modularity_move(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "community",
) -> DataFrame:
    """One synchronous round of greedy modularity ascent (the Louvain
    local-move phase): ``(node, old_community, new_community, gain)``
    — every node simultaneously picks the neighboring community (or
    stays) that maximizes its modularity gain, evaluated against the
    CURRENT labeling.  Iterate with ``modularity`` as the acceptance
    gate to get a deterministic Louvain phase 1; one round alone is
    the standard "refine seed communities" step after LPA.

    The gain of node u joining community c (u removed from its own
    community first) is the standard local-move objective

        G(c) = k_{u→c}/m − k_u · tot'_c / (2m²)

    with ``tot'_c`` the community degree total EXCLUDING u when
    c = u's current community — so "stay" is scored by the same
    formula and a node moves only on a strictly positive edge.  Ties
    break to the smaller community id; the synchronous update makes
    the round deterministic and engine-replayable (classic sequential
    Louvain is visit-order-dependent — unusable as an oracle-checked
    distributed operator).

    ``edges`` uses the engine's symmetric directed convention (both
    directions present; no self-loops).  Unlabeled endpoints drop
    their edges, as in ``modularity``.

    Plan shape (re-planned r13, guide §2.3/§2.4): two node-keyed
    label joins tag each edge, ONE (node, neighbor-community) cell
    aggregate counts k_{u→c}, ONE node rollup collapses each node's
    candidate list to an array (k_u rides the same exchange, and the
    "stay" candidate is appended EXCHANGE-LOCALLY instead of the old
    left-join + anti-join + union over three aggregate lineages); the
    community totals are a community-sized aggregate off that rollup,
    and the winner is a ``min_by`` hash aggregate — no window sort,
    no self-joins of aggregate lineage.  No driver collect; every
    frame is node- or candidate-sized.
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
    cell = tagged.groupBy(
        F.col("_s").alias("_u"),
        F.col("_cs").alias("_a"),
        F.col("_cd").alias("_cand"),
    ).agg(F.count(F.lit(1)).alias("_kuc"))
    node = cell.groupBy("_u", "_a").agg(
        F.sum("_kuc").alias("_ku"),
        F.collect_list(F.struct("_cand", "_kuc")).alias("_cs"),
    )
    # "stay" is scored by the same formula: append the node's own
    # community with k_{u→a} = 0 when no neighbor shares it (array
    # lambda — the old plan paid a left join + a left_anti + a union
    # re-reading two aggregate lineages for exactly this)
    has_stay = F.exists(
        F.col("_cs"), lambda x: x["_cand"] == F.col("_a")
    )
    with_stay = F.when(has_stay, F.col("_cs")).otherwise(
        F.array_append(
            F.col("_cs"),
            F.struct(
                F.col("_a").alias("_cand"),
                F.lit(0).cast("long").alias("_kuc"),
            ),
        )
    )
    tot = node.groupBy(F.col("_a").alias("_tc")).agg(
        F.sum("_ku").alias("_tot")
    )
    two_m = e.agg(F.count(F.lit(1)).cast("double").alias("_two_m"))
    cand_rows = node.select(
        "_u",
        "_a",
        "_ku",
        F.explode(with_stay).alias("_x"),
    ).select(
        "_u",
        "_a",
        "_ku",
        F.col("_x")["_cand"].alias("_cand"),
        F.col("_x")["_kuc"].alias("_kuc"),
    )
    scored = cand_rows.join(
        tot, cand_rows["_cand"] == tot["_tc"]
    ).crossJoin(F.broadcast(two_m))
    m = F.col("_two_m") / 2.0
    totp = F.col("_tot").cast("double") - F.when(
        F.col("_cand") == F.col("_a"), F.col("_ku").cast("double")
    ).otherwise(F.lit(0.0))
    gain = F.col("_kuc").cast("double") / m - F.col(
        "_ku"
    ).cast("double") * totp / (2.0 * m * m)
    # winner = (gain DESC, candidate ASC): min_by over the negated
    # gain — a map-side-combinable hash aggregate instead of a
    # per-node window sort
    win = F.min_by(
        F.struct("_a", "_cand", "_gain"),
        F.struct(F.negate(F.col("_gain")), F.col("_cand")),
    )
    return (
        scored.withColumn("_gain", gain)
        .groupBy("_u")
        .agg(win.alias("_w"))
        .select(
            F.col("_u").alias("node"),
            F.col("_w")["_a"].alias("old_community"),
            F.col("_w")["_cand"].alias("new_community"),
            F.round(F.col("_w")["_gain"], 6).alias("gain"),
        )
    )
