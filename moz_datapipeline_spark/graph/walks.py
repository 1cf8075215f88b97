"""Deterministic random-walk sampling over an edge list.

The walk-corpus generator for graph-embedding pipelines (DeepWalk /
node2vec p=q=1): emit fixed-length walks whose next hop at each step
is a HASH-ADDRESSED choice among the current node's neighbors — no
RNG state, so the walk corpus is reproducible across runs, partitions,
and engines (the ``stable_sample`` md5 convention), and every step is
a plain equi join Catalyst can plan (no Python in the loop).

Reference parity: the reference pipeline (developmentseed/
moz-datapipeline) stops at routing-graph analytics; this extends the
engine for the embedding-prep lifecycle the way ``operators.embed``
does.

Scale posture: the neighbor index is one hash aggregate + one
group-bounded window over the EDGE list; each step is an equi join on
(node, pick) against that index — k steps = k shuffles of the walk
frontier (|nodes|·walks_per_node rows), never the edges.  Walks at
dead ends (out-degree 0) stop early and keep their prefix, documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _neighbor_index(edges: DataFrame) -> DataFrame:
    """(src, idx, dst, degree): each node's DISTINCT neighbors under a
    deterministic 0-based index (dst ascending)."""
    uniq = edges.select("src", "dst").distinct()
    w = Window.partitionBy("src").orderBy("dst")
    return uniq.select(
        "src",
        (F.row_number().over(w) - 1).alias("idx"),
        "dst",
        F.count(F.lit(1))
        .over(
            Window.partitionBy("src").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("degree"),
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    seed: str = "walk",
) -> DataFrame:
    """Emit ``(walk_id, start, step, node)`` rows: ``walks_per_node``
    hash-addressed walks of up to ``walk_len`` hops from every source
    node.  Step 0 is the start node; step t picks neighbor
    ``md5(seed:walk_id:t) mod degree`` of the step-t−1 node —
    deterministic, engine-portable, and uniform over neighbors.
    Dead-end nodes end their walk early (the emitted prefix stays).

    The walk corpus is the standard skip-gram input for DeepWalk-style
    node embeddings; pair it with ``operators/embed`` downstream.
    """
    if walk_len < 1:
        raise ValueError("random_walks: walk_len must be >= 1")
    if walks_per_node < 1:
        raise ValueError("random_walks: walks_per_node must be >= 1")
    idx = _neighbor_index(edges)
    starts = (
        idx.select("src")
        .distinct()
        .withColumn(
            "_w",
            F.explode(
                F.sequence(F.lit(0), F.lit(int(walks_per_node) - 1))
            ),
        )
        .select(
            F.concat(
                F.col("src").cast("string"),
                F.lit("#"),
                F.col("_w").cast("string"),
            ).alias("walk_id"),
            F.col("src").alias("start"),
            F.col("src").alias("node"),
        )
    )
    out = starts.select(
        "walk_id", "start", F.lit(0).alias("step"), "node"
    )
    frontier = starts
    for t in range(1, int(walk_len) + 1):
        # fresh attribute ids per hop: the index joins against its
        # own lineage (frontier came from it), so re-alias every
        # column to keep the self-join unambiguous
        it = idx.select(
            F.col("src").alias("_hs"),
            F.col("idx").alias("_hi"),
            F.col("dst").alias("_hd"),
            F.col("degree").alias("_hg"),
        )
        pick = F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(seed),
                            F.lit(":"),
                            F.col("walk_id"),
                            F.lit(":"),
                            F.lit(str(t)),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.col("_hg"),
        )
        hopped = (
            frontier.join(it, frontier["node"] == it["_hs"])
            .filter(F.col("_hi") == pick)
            .select(
                "walk_id",
                "start",
                F.col("_hd").alias("node"),
            )
        )
        out = out.unionByName(
            hopped.select(
                "walk_id", "start", F.lit(t).alias("step"), "node"
            )
        )
        frontier = hopped
    return out
