"""Connected components over candidate-pair edges — dedup clustering.

Near-dup detection yields pairs (exact/minhash/simhash/embedding); to
drop duplicates you need clusters: each component keeps one
representative. This is the large-/small-star alternation (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14): each
iteration is two joins + aggregations, state is a (node, min-neighbor)
mapping, convergence in O(log n) rounds — no driver-side union-find,
so it scales to billions of edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id_a, id_b) pair edges → (id, component) with component = min id.

    Iterates min-label propagation to a fixed point. Each round is one
    shuffle on the node id; the frontier shrinks geometrically. The
    fixed-point check is a cheap count of changed labels.
    """
    edges = (
        pairs.select(
            F.col(a_col).alias("u"), F.col(b_col).alias("v")
        )
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
    )
    # initial label: own id
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    edges = edges.cache()

    for _ in range(max_iterations):
        # propagate: each node adopts min(own, neighbors' labels)
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["id"])
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("component").alias("_nmin"))
        )
        new_label = F.least(
            F.col("component"), F.coalesce(F.col("_nmin"), F.col("component"))
        )
        # carry the changed flag inline — saves a labels⨝updated join per round
        updated = labels.join(neighbor_min, "id", "left").select(
            "id",
            new_label.alias("component"),
            (new_label != F.col("component")).alias("_changed"),
        )
        # materialize the new labels so the next round doesn't re-derive
        # the whole lineage (iterative algorithms grow plans exponentially)
        updated = updated.localCheckpoint(eager=True)
        changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_keep_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Filter ``df`` to one representative (min id) per duplicate cluster.

    Rows not in any pair are kept as-is (they are their own cluster).
    """
    comp = connected_components(pairs)
    keep = comp.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    in_pairs = comp.select(F.col("id").alias(id_col))
    untouched = df.join(in_pairs, id_col, "left_anti")
    # no broadcast hint: cluster count is data-dependent; AQE picks the
    # strategy from runtime sizes
    survivors = df.join(keep, id_col, "inner")
    return untouched.unionByName(survivors)
