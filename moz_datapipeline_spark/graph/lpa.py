"""Synchronous label-propagation community detection (LPA) over an
undirected edge list.

Community structure is a standard corpus-curation signal: pages/domains
cluster into link communities, and a training-data pipeline caps or
reweights whole communities rather than individual pages (the same
"score by global graph structure, then gate" shape as the reference's
criticality stage — scripts/criticality/index.js — and this package's
``graph/pagerank.py``).  LPA is the cheap workhorse: near-linear per
round, no objective function, no parameters beyond the round count.

Semantics (deterministic — reproducibility beats the textbook's random
tie-breaks for pipeline use):

- labels initialize to the node id;
- one synchronous round relabels EVERY node to the most frequent label
  among its neighbors, breaking count ties by the SMALLEST label;
- ``rounds`` is a fixed parameter, not a convergence loop — like
  ``pagerank``, the rounds unroll into one lazy plan with no driver
  action inside the loop.  (Synchronous LPA can oscillate on bipartite
  structures; a fixed round count makes that a documented property
  instead of a hang.)

Plan per round — all hash-partitioned on the node id, AQE-skew-safe:

1. edges ⨝ labels on ``src`` (the label of each neighbor),
2. hash-aggregate count per (dst, label) — map-side partials collapse
   the duplicate-neighbor fan-in before the exchange,
3. per-node argmax: a window max over ``node`` (reuses the exchange
   the aggregate just produced) + min-label filter.

Work per round is O(|E|) rows through one join and one aggregate —
the identical cost envelope as a PageRank iteration, so the measured
PageRank rehearsals (3 M edges / 22 s per iteration block in
``scale_check.py``) transfer.  ``eager=True`` materializes each round
and unpersists its predecessor, bounding the cache footprint to one
round (the contract ``tests/test_cache_contract.py`` pins for the
other iterative operators).

Reference parity: extension surface (the reference has no community
stage); the iteration idiom mirrors graph/pagerank.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from moz_datapipeline_spark.iterate import checkpoint_sever, sever_release


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    symmetrize: bool = True,
    eager: bool = False,
) -> DataFrame:
    """Return ``(node, label)`` after ``rounds`` synchronous LPA rounds.

    ``symmetrize=True`` (default) unions the reversed edges so the
    propagation is undirected regardless of the input's orientation;
    pass ``False`` when the edge list is already symmetric to skip the
    union.  Self-loops are dropped (a node voting for its own label
    just dampens convergence).  Duplicate edges collapse to one vote —
    multigraph multiplicity is not a semantics this operator carries.

    Isolated nodes cannot appear (the node set derives from the edge
    list); callers tracking singletons should union them back with
    ``label = node`` afterwards.

    Cache contract (the r7 leak fix, revised after measuring): the
    restructured rounds consume the previous labels frame exactly
    ONCE (vote-less nodes are a static precomputed set), so the
    per-round frames never need pinning in EITHER mode; only the two
    STATIC frames — the deduped edge list and the vote-less set,
    each referenced every round — are materialized, via
    ``checkpoint_sever`` (r13: exempt localCheckpoint blocks, not a
    leakable persist).  ``eager=True`` severs the result too and
    releases both statics — at most ONE severed frame survives the
    call (pinned by ``tests/test_cache_contract``).  ``eager=False``
    keeps the rounds as one lazy plan over the severed statics
    (re-deriving an expensive edge build once per round per
    appearance measured ~9× slower).
    """
    if rounds < 0:
        raise ValueError("label_propagation: rounds must be >= 0")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if symmetrize:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    # sever, don't persist: every round and the result plan read the
    # deduped edge list — a persist() could never be released by the
    # operator (strict bench leak assert); severed localCheckpoint
    # blocks are the sanctioned exemption
    e = checkpoint_sever(
        e.filter(F.col("src") != F.col("dst")).distinct()
    )

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # Vote-less nodes are a STATIC set — a node with no in-edge never
    # receives a vote in any round, so its label stays its init value
    # (= node id) forever.  Computing that set once lets each round
    # consume the previous labels frame exactly ONCE (winners cover
    # precisely the distinct-dst set), keeping the plan linear in
    # ``rounds`` with no per-round pinning.
    voteless = checkpoint_sever(
        nodes.join(
            e.select(F.col("dst").alias("node")).distinct(),
            "node",
            "anti",
        ).withColumn("label", F.col("node"))
    )

    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(rounds):
        votes = (
            e.join(labels, e["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        # argmax by (count desc, label asc) as ONE hash aggregate:
        # min over struct(-count, label) orders lexicographically —
        # the negated COUNT (always ≥ 1, no overflow edge) gives
        # count-descending, the raw label breaks ties ascending.
        # Saves the window sort + second aggregate per round.
        winners = votes.groupBy("node").agg(
            F.min(
                F.struct(
                    (-F.col("_cnt")).alias("nc"),
                    F.col("label").alias("l"),
                )
            ).alias("_w")
        ).select("node", F.col("_w.l").alias("label"))
        labels = winners.unionByName(voteless)
    result = labels.select("node", "label")
    if eager:
        # sever, not persist: the caller never unpersists a returned
        # frame in the bench; severed blocks are the exempt kind
        result = checkpoint_sever(result)
        sever_release(e)
        sever_release(voteless)
    return result
