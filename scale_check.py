#!/usr/bin/env python
"""Scale rehearsal: the dedup pipeline on a synthetic 50k-document corpus.

The driver's scale factors top out at 5k documents; this script
amplifies sf0.1 ×10 with deterministic mutations (so real near-dup
structure exists), then times the full near-dup path:

    minhash signatures → LSH candidates → exact Jaccard verify →
    connected components → representative filter

Run: python scale_check.py  (writes nothing outside /tmp; one JSON line)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from moz_datapipeline_spark.operators.components import (
    connected_components,
    dedup_keep_representatives,
)
from moz_datapipeline_spark.operators.dedup import (
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from moz_datapipeline_spark.session import get_spark


def amplified_corpus(spark, base_path: str, copies: int = 10):
    """×copies corpus: copy 0 is pristine; other copies mutate the text
    deterministically (drop the k-th word) so near-dups are real."""
    base = spark.read.parquet(base_path)
    n = base.count()
    parts = []
    for c in range(copies):
        mutated = base.select(
            (F.col("doc_id") + c * n).alias("doc_id"),
            F.when(F.lit(c) == 0, F.col("text")).otherwise(
                # drop word (c mod 7): a small, deterministic edit
                F.array_join(
                    F.filter(
                        F.split("text", r"\s+"),
                        lambda w, i: i != F.lit(c % 7),
                    ),
                    " ",
                )
            ).alias("text"),
        )
        parts.append(mutated)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(32)


def main() -> None:
    spark = get_spark(app_name="dedup_scale_check")
    docs = amplified_corpus(spark, "/root/testdata/sf0.1/documents.parquet")
    n_docs = docs.count()

    t0 = time.perf_counter()
    sigs = minhash_signatures(docs, num_hashes=32)
    cands = minhash_lsh_candidates(sigs, bands=8).cache()
    n_cands = cands.count()
    t_lsh = time.perf_counter() - t0

    t0 = time.perf_counter()
    verified = ngram_jaccard_pairs(docs, cands, threshold=0.8).cache()
    n_verified = verified.count()
    t_verify = time.perf_counter() - t0

    t0 = time.perf_counter()
    comp = connected_components(verified.select("id_a", "id_b"))
    n_clusters = comp.select("component").distinct().count()
    survivors = dedup_keep_representatives(docs, verified.select("id_a", "id_b"))
    n_kept = survivors.count()
    t_cluster = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "lsh_candidates": n_cands,
                "verified_pairs": n_verified,
                "clusters": n_clusters,
                "docs_kept": n_kept,
                "removed_ratio": round(1 - n_kept / n_docs, 4),
                "t_lsh_sec": round(t_lsh, 2),
                "t_verify_sec": round(t_verify, 2),
                "t_cluster_sec": round(t_cluster, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
