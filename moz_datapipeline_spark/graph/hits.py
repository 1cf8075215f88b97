"""HITS (Kleinberg hubs & authorities) over a directed edge list.

PageRank scores a page by WHO points at it transitively; HITS splits
the signal in two — a good HUB points at good authorities, a good
AUTHORITY is pointed at by good hubs.  In a corpus pipeline the split
matters for link-farm hygiene: farms inflate their own authority but
score as hubs pointing nowhere respectable, so authority-minus-hub
asymmetry is a cheap spam feature next to ``graph/pagerank.py``.

Iteration shape (mutual recursion, fixed ``iters`` like ``pagerank``):

    auth(v) = Σ_{u→v} hub(u)        hub(u) = Σ_{u→v} auth(v)

Each half-step is ONE equi join (edges ⨝ scores on the source side of
the sum) plus one hash aggregate — O(|E|) rows per iteration, all
hash-partitioned, the identical cost envelope as a PageRank iteration.

Normalization happens ONCE, at the end (L1: scores sum to 1 per
vector).  Power iteration is scale-invariant, so intermediate
normalization — which would force either a persist per iteration (the
cache-leak pattern round 7 flagged in LPA) or an exponential lazy
plan (each normalize reads its frame twice) — buys nothing for a
fixed small ``iters``.  Skipping it keeps the whole lazy plan LINEAR
in ``iters`` with NO persist: every iteration's frame is consumed
exactly once by the next.  Magnitude bound: scores grow like
``max_degree^iters``; doubles overflow past ~1e308, so the documented
envelope is ``iters · log10(max_degree) < 300`` — a 10⁶-degree hub
supports 50 iterations, far beyond the 3–5 anyone runs.

Reference parity: extension surface (the reference has no link
analysis); iteration idiom mirrors graph/pagerank.py, single-consume
restructuring mirrors graph/lpa.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Return ``(node, hub, authority)`` after ``iters`` full
    hub→authority→hub rounds, L1-normalized at the end.

    Duplicate edges collapse to one (multiplicity is not a semantics
    this operator carries — pre-weight the edge list and use
    ``pagerank`` if it should be); self-loops are kept (a page may
    cite itself; Kleinberg's formulation does not exclude them).
    Every node appearing on either side gets a row: a node with no
    in-edges has authority 0, no out-edges hub 0.  An empty vector
    (all zeros — possible only on a graph with no edges at all after
    dedup) normalizes to all zeros rather than dividing by zero.
    """
    if iters < 1:
        raise ValueError("hits: iters must be >= 1")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct()
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    # hub vector, un-normalized; consumed exactly once per iteration
    hub = nodes.withColumn("score", F.lit(1.0))
    auth = None
    for _ in range(iters):
        auth = (
            e.join(hub, e["_s"] == hub["node"])
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum("score").alias("score"))
        )
        hub = (
            e.join(auth, e["_d"] == auth["node"])
            .groupBy(F.col("_s").alias("node"))
            .agg(F.sum("score").alias("score"))
        )
    # zero-fill nodes that fell out of either vector (no in/out edges),
    # then one L1 normalization per vector
    hub_full = nodes.join(
        hub.withColumnRenamed("score", "_h"), "node", "left"
    ).select("node", F.coalesce("_h", F.lit(0.0)).alias("_h"))
    auth_full = nodes.join(
        auth.withColumnRenamed("score", "_a"), "node", "left"
    ).select("node", F.coalesce("_a", F.lit(0.0)).alias("_a"))
    joined = hub_full.join(auth_full, "node")
    tot = joined.agg(
        F.sum("_h").alias("_th"), F.sum("_a").alias("_ta")
    )
    return joined.crossJoin(F.broadcast(tot)).select(
        "node",
        F.when(F.col("_th") > 0, F.col("_h") / F.col("_th"))
        .otherwise(F.lit(0.0))
        .alias("hub"),
        F.when(F.col("_ta") > 0, F.col("_a") / F.col("_ta"))
        .otherwise(F.lit(0.0))
        .alias("authority"),
    )
