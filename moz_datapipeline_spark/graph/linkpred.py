"""Neighborhood-based link prediction scores over an undirected edge
list: common neighbors, Jaccard, Adamic–Adar, preferential attachment.

Link scores are the standard "which nodes SHOULD be connected?"
primitives — recommendation candidates, knowledge-graph completion,
and (in a corpus pipeline) "these two domains share most of their
citation neighborhood" signals.  They complement the membership-style
graph operators here (``pagerank`` scores nodes, ``lpa``/
``components`` partition them; this scores ABSENT edges).

Scale shape: every score is a fold over WEDGES (paths a—z—b).  The
adjacency is collapsed to one sorted neighbor array per center (one
groupBy exchange) and the C(deg z, 2) wedge pairs are generated
EXCHANGE-LOCALLY with streaming Generates — Σ C(deg z, 2) rows and no
wedge self-join, never |V|² pairs.  That sum is dominated by hubs,
which is exactly why ``max_wedge_degree`` exists: capping the center
degree drops hub wedges (a 10⁶-degree hub contributes 10¹² wedges
and near-zero Adamic–Adar weight each — the classic skew trade), and
the dropped-center count is surfaced loudly through ``stats``.
Degrees are always computed on the FULL graph before the cap, so
Jaccard/PA denominators stay exact.

Reference parity: extension surface (the reference has no link
prediction); the array-combination idiom matches
``operators/relational.frequent_itemsets``'s round-12 re-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    symmetrize: bool = True,
    max_wedge_degree: int | None = 1000,
    stats: dict | None = None,
) -> DataFrame:
    """Score every non-adjacent 2-hop pair: ``(node_a < node_b,
    common_neighbors, jaccard, adamic_adar, preferential_attachment)``.

    - ``common_neighbors`` = |N(a) ∩ N(b)| (wedge count through
      uncapped-or-allowed centers);
    - ``jaccard`` = cn / (deg a + deg b − cn);
    - ``adamic_adar`` = Σ_z 1/ln(deg z) over the common neighbors;
    - ``preferential_attachment`` = deg a · deg b.

    Self-loops are dropped and duplicate edges collapse;
    ``symmetrize=False`` trusts the input to be symmetric already.
    Pairs already connected by an edge are EXCLUDED (they need no
    prediction) via an anti join.  A center needs degree ≥ 2 to form
    a wedge, and ln(deg z) ≥ ln 2 > 0 there — no ANSI division
    hazard.  ``stats``, when a dict, receives ``dropped_centers``
    (nodes over ``max_wedge_degree`` — one tiny aggregate job; omit
    ``stats`` and plan construction stays job-free).

    ``max_wedge_degree`` DEFAULTS to 1000: one uncapped hub of degree
    d emits C(d,2) wedge rows (a 10⁶-degree hub → ~5·10¹¹ rows), so
    the quadratic path must be an explicit choice — pass ``None`` to
    disable the cap on graphs known to be hub-free.  Capped centers
    lower-bound ``common_neighbors``/``adamic_adar`` for pairs routed
    through them; degrees (hence ``jaccard`` denominators and
    ``preferential_attachment``) are always exact.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if symmetrize:
        e = e.unionByName(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
    e = e.filter(F.col("_s") != F.col("_d")).distinct()

    # ONE groupBy collapses each center to its sorted neighbor array
    # (e is distinct, so collect_list is already set-valued); degrees
    # fall out as size(_ns) from the SAME exchange (ReusedExchange —
    # the old plan paid a separate count aggregate plus an e⨝deg join
    # to put _dz on every edge row).
    nbrs = e.groupBy(F.col("_s").alias("_z")).agg(
        F.sort_array(F.collect_list("_d")).alias("_ns")
    )
    deg = nbrs.select(
        F.col("_z").alias("_node"), F.size("_ns").cast("long").alias("_deg")
    )
    centers = nbrs.filter(F.size("_ns") >= 2)
    if max_wedge_degree is not None:
        if stats is not None:
            stats["dropped_centers"] = (
                deg.filter(F.col("_deg") > int(max_wedge_degree)).count()
            )
        centers = centers.filter(
            F.size("_ns") <= int(max_wedge_degree)
        )

    # Wedge pairs are generated EXCHANGE-LOCALLY from the sorted
    # array: posexplode picks _a, a second explode slices the strictly
    # later elements as _b — exactly the C(k,2) pairs with _a < _b the
    # old self-join produced from k² probe rows, with no wedge
    # exchange at all.  Two STREAMING Generates (not one flattened
    # combination array) keep peak allocation O(k) per center, so an
    # uncapped hub degrades like the old join (many rows) rather than
    # materializing C(k,2) structs in one buffer.
    wedges = (
        centers.select(
            (
                F.lit(1.0) / F.log(F.size("_ns").cast("double"))
            ).alias("_w"),
            "_ns",
            F.posexplode("_ns").alias("_i", "_a"),
        )
        .select(
            "_w",
            "_a",
            F.explode(
                F.slice(
                    F.col("_ns"),
                    F.col("_i") + F.lit(2),
                    F.size("_ns"),
                )
            ).alias("_b"),
        )
        .groupBy("_a", "_b")
        .agg(
            F.count(F.lit(1)).alias("_cn"),
            F.sum("_w").alias("_aa"),
        )
    )
    adj = e.filter(F.col("_s") < F.col("_d")).select(
        F.col("_s").alias("_a"), F.col("_d").alias("_b")
    )
    cand = wedges.join(adj, ["_a", "_b"], "anti")
    scored = (
        cand.join(
            deg.select(F.col("_node").alias("_a"), F.col("_deg").alias("_da")),
            "_a",
        )
        .join(
            deg.select(F.col("_node").alias("_b"), F.col("_deg").alias("_db")),
            "_b",
        )
        .select(
            F.col("_a").alias("node_a"),
            F.col("_b").alias("node_b"),
            F.col("_cn").cast("long").alias("common_neighbors"),
            F.round(
                F.col("_cn").cast("double")
                / (F.col("_da") + F.col("_db") - F.col("_cn")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
            F.round(F.col("_aa"), 6).alias("adamic_adar"),
            (F.col("_da") * F.col("_db"))
            .cast("long")
            .alias("preferential_attachment"),
        )
    )
    return scored
