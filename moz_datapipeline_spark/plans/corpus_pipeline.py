"""End-to-end corpus curation plan: raw documents → training shards.

The C4/RefinedWeb/CCNet-shaped chain, composed entirely from this
engine's existing operators via the named-stage :class:`Pipeline`
runner (``plans/pipeline.py``), so one call gives a user the whole
"crawl in, training mix out" path the individual queries demonstrate
piecewise:

    quality gate → exact dedup → benchmark decontamination
                 → per-domain cap → deterministic shards

Every stage is a lazy ``DataFrame → DataFrame`` function: Catalyst
sees the WHOLE chain as one plan (filters fold into the scan; the
stages introduce exactly four shuffles — dedup hash-agg, decontam
count fold + id semi join, cap rank, shard window — none of them
corpus² and none driver-side).  With ``checkpoint_dir`` the runner
materializes stage outputs to parquet and ``resume=True`` skips
completed stages — the engine's version of the reference's per-stage
.tmp files (SURVEY §3) for a multi-day 100 TB curation run.

Determinism end to end: every selection (dedup survivor, cap
membership, shard order) is content-/id-addressed, so the same corpus
gives byte-identical shards on any cluster size — which is also what
makes the full chain DuckDB-replayable as one CTE pipeline
(``curation_pipeline`` query in ``__spark_entry__.py``).

Reference parity: the reference's pipeline composition is three bash
scripts over files (SURVEY §3); the stages themselves are this
engine's extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.corpus import (
    cap_per_group,
    decontaminate,
    shard_corpus,
    tokens,
)
from ..operators.dedup import exact_dedup
from .pipeline import Pipeline

__all__ = ["curate_corpus"]


def curate_corpus(
    spark: SparkSession,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    domain_col: str = "source",
    min_tokens: int = 30,
    distinct_num: int = 7,
    distinct_den: int = 20,
    keep_lang: str = "en",
    benchmark_pred: Column | None = None,
    contam_n: int = 8,
    contam_num: int = 1,
    contam_den: int = 20,
    max_per_domain: int = 50,
    n_shards: int = 4,
    seed: str = "curate",
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """Run the full curation chain; returns one row per surviving
    document: ``(id, domain, shard, shard_rank)``, ready for
    ``write_partitioned(out, path, ["shard"])`` or the WARC sink.

    ``benchmark_pred`` marks the held-out eval slice for
    decontamination (default: ``id % 97 == 0`` — a deterministic
    pseudo eval set for demos; production passes the real eval-set
    membership).  Benchmark rows are excluded from the output — they
    are eval data, never training data.
    """
    if benchmark_pred is None:
        benchmark_pred = F.col(id_col) % 97 == 0

    def quality(d: DataFrame) -> DataFrame:
        nt = F.size(tokens(text_col))
        nd = F.size(F.array_distinct(tokens(text_col)))
        return d.filter(
            (nt >= min_tokens)
            & (nd * distinct_den >= nt * distinct_num)
            & (F.col(lang_col) == keep_lang)
        )

    def dedup(d: DataFrame) -> DataFrame:
        keep = exact_dedup(d, text_col=text_col, id_col=id_col).select(
            F.col("keep_id").alias(id_col)
        )
        return d.join(keep, id_col, "left_semi")

    def decontam(d: DataFrame) -> DataFrame:
        clean = decontaminate(
            d,
            benchmark_pred,
            id_col=id_col,
            text_col=text_col,
            n=contam_n,
            threshold_num=contam_num,
            threshold_den=contam_den,
        ).filter(~F.col("contaminated")).select(id_col)
        return d.join(clean, id_col, "left_semi")

    def cap(d: DataFrame) -> DataFrame:
        return cap_per_group(
            d, domain_col, k=max_per_domain, id_col=id_col
        ).drop("sample_rank")

    def shard(d: DataFrame) -> DataFrame:
        return shard_corpus(
            d, n_shards=n_shards, seed=seed, id_col=id_col
        ).select(id_col, domain_col, "shard", "shard_rank")

    pipe = (
        Pipeline(spark, checkpoint_dir=checkpoint_dir)
        .source("raw", df)
        .stage("quality", quality, ["raw"])
        .stage("dedup", dedup, ["quality"])
        .stage("decontam", decontam, ["dedup"])
        .stage("cap", cap, ["decontam"])
        .stage("shard", shard, ["cap"], materialize=bool(checkpoint_dir))
    )
    return pipe.run(resume=resume)["shard"]
