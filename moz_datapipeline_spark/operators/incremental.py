"""Incremental near-dup ingestion: dedup a NEW batch against an
append-only MinHash signature store.

The batch dedup path (``operators.dedup`` + ``operators.components``)
assumes the whole corpus is in hand.  A production training pipeline
ingests continuously, and re-running LSH over 100 TB per daily batch is
the one thing the bucketed design exists to avoid.  This module keeps a
parquet SIGNATURE store — (doc_id, signature, num_hashes, bands), a few
hundred bytes per document instead of its text — and admits a new batch
in one pass:

1. signatures of the new batch (one hash-agg, ``minhash_signatures``);
2. LSH candidates new↔store and new↔new via the shared
   ``band_hashes`` bucketing (equi joins, AQE-skew-safe);
3. candidate verification with the MinHash Jaccard ESTIMATE (fraction
   of agreeing signature positions) — the store holds no text, so the
   estimator is the verification, the standard trade of
   signature-store dedup (vs exact shingle Jaccard in the batch path);
4. new docs that match the store are dropped; within-batch duplicate
   groups keep their smallest id (exact: connected components over the
   verified pairs, O(log batch) rounds);
5. survivors' signatures APPEND to the store with the same
   (name, type) schema-drift guard as ``graph.resume``.

Store reads are signature-only, the joins are bucketed equi joins, and
nothing driver-side ever holds a corpus: the steady-state cost of a
batch is O(batch + matched buckets), independent of corpus size.

Reference parity: extension surface (the reference has no ingestion
loop); the checkpoint idiom mirrors its restartable S3 runs
(scripts/*/README "restart from partial results"), re-expressed as a
parquet store + anti-join skip like ``graph/resume.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moz_datapipeline_spark.operators.components import connected_components
from moz_datapipeline_spark.operators.dedup import (
    band_hashes,
    minhash_signatures,
)


def _estimate(col_a, col_b):
    """MinHash Jaccard estimate: fraction of agreeing positions."""
    return F.aggregate(
        F.zip_with(col_a, col_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.size(col_a)


def bootstrap_signature_store(
    spark: SparkSession,
    docs: DataFrame,
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_k: int = 3,
    bands: int = 8,
    portable_hash: bool = False,
) -> None:
    """Seed the store from an ALREADY-DEDUPED corpus: materialize its
    signatures without re-running any dedup (the migration path when an
    existing curated corpus becomes the prior for incremental ingest).
    Parameters ride along per row so later ``incremental_dedup`` calls
    are checked against them."""
    sigs = minhash_signatures(
        docs, text_col, id_col, num_hashes, shingle_k, portable_hash
    )
    sigs.select(
        id_col,
        "signature",
        F.lit(num_hashes).alias("num_hashes"),
        F.lit(bands).alias("bands"),
    ).write.mode("append").parquet(store_dir)


def incremental_dedup(
    spark: SparkSession,
    new_docs: DataFrame,
    store_dir: str | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    shingle_k: int = 3,
    portable_hash: bool = False,
) -> DataFrame:
    """Admit ``new_docs`` against the signature store at ``store_dir``;
    return the surviving rows (all original columns) and append their
    signatures to the store.

    ``store_dir=None`` runs the within-batch stage only (no
    persistence) — useful for tests and one-shot runs.  Empty-text
    documents produce no shingles, always survive, and are not stored
    (they cannot collide with anything).  Re-ingesting an already-
    admitted batch yields zero survivors: each document now matches its
    own stored signature — the idempotence a restartable ingest needs.

    The store carries its parameters per row; a read that disagrees
    with the call's ``num_hashes``/``bands`` raises instead of silently
    bucketing differently (same determinism contract as the
    ``graph.resume`` schema guard).
    """
    from pyspark.errors import AnalysisException

    sigs = minhash_signatures(
        new_docs, text_col, id_col, num_hashes, shingle_k, portable_hash
    ).cache()
    banded_new = band_hashes(sigs, bands, id_col, portable_hash)

    stored = None
    if store_dir is not None:
        try:
            stored = spark.read.parquet(store_dir)
        except AnalysisException:
            stored = None  # cold start
    if stored is not None:
        want = {"num_hashes": num_hashes, "bands": bands}
        have = (
            stored.select("num_hashes", "bands").distinct().collect()
        )
        got = [(r.num_hashes, r.bands) for r in have]
        if got != [(num_hashes, bands)]:
            raise ValueError(
                f"signature store {store_dir} was written with parameters "
                f"{got}, call asked for {tuple(want.values())}; matching "
                "buckets require identical parameters — rebuild the store "
                "or match the call"
            )

    # --- new ↔ store: any estimate >= threshold drops the new doc
    dup_vs_store = None
    if stored is not None:
        banded_old = band_hashes(
            stored.select(id_col, "signature"), bands, id_col, portable_hash
        )
        cand = (
            banded_new.alias("n")
            .join(
                banded_old.alias("o"),
                (F.col("n.band_idx") == F.col("o.band_idx"))
                & (F.col("n.band_hash") == F.col("o.band_hash")),
            )
            .select(
                F.col(f"n.{id_col}").alias("new_id"),
                F.col(f"o.{id_col}").alias("old_id"),
            )
            .distinct()
        )
        dup_vs_store = (
            cand.join(
                sigs.select(
                    F.col(id_col).alias("new_id"),
                    F.col("signature").alias("_sn"),
                ),
                "new_id",
            )
            .join(
                stored.select(
                    F.col(id_col).alias("old_id"),
                    F.col("signature").alias("_so"),
                ),
                "old_id",
            )
            .filter(_estimate(F.col("_sn"), F.col("_so")) >= threshold)
            .select("new_id")
            .distinct()
        )

    # --- new ↔ new: exact grouping, keep the smallest id per component
    a, b = banded_new.alias("a"), banded_new.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
        .join(
            sigs.select(F.col(id_col).alias("id_a"), F.col("signature").alias("_sa")),
            "id_a",
        )
        .join(
            sigs.select(F.col(id_col).alias("id_b"), F.col("signature").alias("_sb")),
            "id_b",
        )
        .filter(_estimate(F.col("_sa"), F.col("_sb")) >= threshold)
        .select("id_a", "id_b")
    )
    # component label IS the minimum id, so non-representatives are
    # exactly the rows whose label differs from their own id
    comp = connected_components(pairs)
    batch_losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )

    survivors = new_docs.join(batch_losers, id_col, "left_anti")
    if dup_vs_store is not None:
        survivors = survivors.join(
            dup_vs_store.withColumnRenamed("new_id", id_col),
            id_col,
            "left_anti",
        )

    if store_dir is not None:
        to_store = (
            survivors.select(id_col)
            .join(sigs, id_col)
            .select(
                id_col,
                "signature",
                F.lit(num_hashes).alias("num_hashes"),
                F.lit(bands).alias("bands"),
            )
        )
        if stored is not None:
            have_schema = sorted(
                (f.name, f.dataType.simpleString()) for f in stored.schema
            )
            want_schema = sorted(
                (f.name, f.dataType.simpleString()) for f in to_store.schema
            )
            if have_schema != want_schema:
                raise ValueError(
                    f"signature store {store_dir} schema {have_schema} does "
                    f"not match writer schema {want_schema}; delete the "
                    "directory or fix the writer"
                )
        to_store.write.mode("append").parquet(store_dir)
    return survivors
