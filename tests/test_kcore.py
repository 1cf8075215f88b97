"""k-core: textbook graphs, cascade depth, early-stop fixpoint,
cache hygiene."""

import pytest
from pyspark.sql import functions as F

from moz_datapipeline_spark.graph.kcore import kcore


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.unionByName(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def test_kcore_triangle_with_pendant(spark):
    # triangle 1-2-3 plus pendant 4: 2-core = the triangle
    e = _sym(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    out = {r.node: r.degree for r in kcore(e, k=2, rounds=4).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_cascade_needs_rounds(spark):
    # chain 1-2-3-4-5 under k=2 peels one endpoint pair per round and
    # ends empty; one round only strips the outermost nodes
    chain = _sym(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert kcore(chain, k=2, rounds=4).count() == 0
    partial = {r.node for r in kcore(chain, k=2, rounds=1).collect()}
    assert partial == {2, 3, 4}  # bounded-round supergraph contract


def test_kcore_early_stop_fixpoint_and_stats(spark):
    e = _sym(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    stats = {}
    out = kcore(e, k=2, rounds=10, early_stop=True, stats=stats)
    got = {r.node: r.degree for r in out.collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    assert stats["rounds_executed"] < 10  # stopped at the fixpoint
    assert stats["surviving_edges"] == 6  # the triangle, both directions

    # duplicate edges are collapsed, not double-counted
    dup = e.unionByName(e)
    assert {r.node: r.degree
            for r in kcore(dup, k=2, rounds=4).collect()} == {1: 2, 2: 2, 3: 2}

    with pytest.raises(ValueError, match="k must be"):
        kcore(e, k=0)
    with pytest.raises(ValueError, match="rounds"):
        kcore(e, k=2, rounds=0)
