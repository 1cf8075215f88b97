"""k-core decomposition by bounded-round peeling.

The k-core is the maximal subgraph where every node keeps degree ≥ k —
the standard graph-density filter (community pruning, spam-farm
detection, feature engineering on interaction graphs).  The classic
algorithm peels nodes below the threshold until a fixpoint; peel depth
is data-dependent, so this engine exposes the ROUND-BOUNDED form:
``rounds`` peels composed as one lazy DAG (the PageRank unrolling
idiom — no driver actions, no lineage checkpoints needed at small
round counts), which is also what makes the operator exactly
SQL-replayable (the ``kcore`` query's oracle unrolls the same rounds
as DuckDB CTEs).

Convergence contract: a graph whose peel cascade is deeper than
``rounds`` returns the partially-peeled supergraph of the true k-core
(never too little — peeling only removes).  ``early_stop=True`` adds
one cheap count per round and exits at the fixpoint, trading driver
actions for exactness on deep cascades; the lazy default matches the
oracle.

Scale: each round is one map-side-combined degree aggregation plus two
semi joins on node id — all narrow-key shuffles, cost proportional to
the SURVIVING edge set, which only shrinks.

Reference parity: extension operator; sibling of
``graph/triangles.py`` (same symmetric-edge-list input convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kcore"]


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
    early_stop: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """(node, degree) of the ``rounds``-bounded k-core of a SYMMETRIC
    (src, dst) edge list (pass both directions, as for
    ``graph/pagerank``).  Duplicate edges are collapsed first —
    multiplicity is not degree."""
    if k < 1:
        raise ValueError("kcore: k must be >= 1")
    if rounds < 1:
        raise ValueError("kcore: rounds must be >= 1")
    e = edges.select("src", "dst").distinct()
    executed = 0
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
        keep = deg.filter(F.col("_deg") >= k).select("src")
        e_next = e.join(keep, "src", "left_semi").join(
            keep.select(F.col("src").alias("dst")), "dst", "left_semi"
        )
        if early_stop:
            e_next = e_next.cache()
            before, after = e.count(), e_next.count()
            if executed:  # previous round's cache hands over
                e.unpersist()
            e = e_next
            executed += 1
            if before == after:
                break
        else:
            e = e_next
            executed += 1
    if stats is not None:
        stats["rounds_executed"] = executed
    out = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    if early_stop:
        # eager-release contract (the PageRank pattern): the result
        # becomes the one persisted frame; the edge cache is freed
        out = out.persist()
        out.count()
        e.unpersist()
    return out
