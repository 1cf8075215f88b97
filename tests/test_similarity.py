"""Similarity-search quality checks: approximate methods vs the exact
brute-force baseline on the real embeddings table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_bruteforce_topk_self_excluded(spark, emb):
    from moz_datapipeline_spark.operators.similarity import cosine_topk_bruteforce

    out = cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 3), k=5).toPandas()
    assert set(out["query_id"]) == {0, 1, 2}
    assert (out.groupby("query_id").size() == 5).all()
    assert not ((out["query_id"] == out["corpus_id"]).any())
    # scores sorted by rank within each query
    for _, g in out.groupby("query_id"):
        s = g.sort_values("rank")["cosine"].tolist()
        assert s == sorted(s, reverse=True)


def test_ivf_recall_vs_exact(spark, emb):
    from moz_datapipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )

    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(emb, queries, k=3).toPandas()
    approx = ivf_topk(emb, queries, n_centroids=8, nprobe=4, k=3).toPandas()
    exact_pairs = set(zip(exact.query_id, exact.corpus_id))
    approx_pairs = set(zip(approx.query_id, approx.corpus_id))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # nprobe/n_centroids = 1/2 of the lists probed → high recall expected
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # every approx hit must carry the true cosine (scores not approximated)
    merged = approx.merge(exact, on=["query_id", "corpus_id"], suffixes=("_a", "_e"))
    assert (abs(merged.cosine_a - merged.cosine_e) < 1e-9).all()


def test_lsh_topk_runs(spark, emb):
    from moz_datapipeline_spark.operators.similarity import lsh_bucket_topk

    out = lsh_bucket_topk(
        emb, emb.filter(F.col("vec_id") < 5), dim=64, k=3, n_planes=4
    ).toPandas()
    # buckets with 4 planes are coarse (16) — every query should find neighbors
    assert set(out["query_id"]) == {0, 1, 2, 3, 4}
