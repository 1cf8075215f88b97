"""Batched embedding generation: the bridge between raw text and every
similarity/dedup operator that consumes an ``embedding`` column.

A real LLM-data pipeline gets embeddings from a MODEL, not from
parquet.  ``embed`` is the model-agnostic kernel: an Arrow-batched
``mapInPandas`` that feeds the encoder fixed-size batches of strings on
the executors — the one place in this engine where arbitrary Python
(a torch/onnx/API encoder) is the intended payload, so the plumbing
(schema, batch shape, partition granularity) is what this module makes
real and tested.

``encoder_fn`` contract: ``list[str] -> sequence of len(texts) vectors``
(any of: list of lists, numpy (n, d) array).  It is pickled to the
executors, called once per ``batch_size`` texts, and must be pure
(same text → same vector) for restarts/retries to be exact.  Heavy
model state should be constructed lazily INSIDE the function on first
call (the standard Spark pattern — e.g. a module-level cache keyed by
model name), never captured in the closure.

``hashing_ngram_encoder`` is the deterministic, dependency-free default
— md5-hashed word unigrams folded into ``dim`` count buckets, then
L2-normalized.  It exists so the full text → embed → semantic-dedup
path runs (and is ORACLE-CHECKED: the same arithmetic replays in
DuckDB SQL) without any model runtime in the container; swap in a real
encoder in production.

Reference parity: extension surface (the reference has no ML stage);
the batched-UDF shape follows the public pandas-UDF inference pattern
(SNIPPETS.md [1]-[3], SURVEY.md §7.1).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from moz_datapipeline_spark.localresult import literal_frame


def hashing_ngram_encoder(
    dim: int = 16,
) -> Callable[[Sequence[str]], "list[list[float]]"]:
    """Deterministic stub encoder: md5-hash each whitespace word into
    one of ``dim`` buckets, count, L2-normalize.  Matches the engine's
    portable-hash convention (first 15 md5 hex digits as a big int) so
    a SQL oracle can replay it bit-for-bit; empty/whitespace-only text
    embeds to the zero vector."""

    def encode(texts: Sequence[str]) -> list[list[float]]:
        out = []
        for t in texts:
            counts = [0.0] * dim
            norm = " ".join((t or "").lower().strip().split())
            if norm:
                for w in norm.split(" "):
                    h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
                    counts[h % dim] += 1.0
            s = sum(c * c for c in counts) ** 0.5
            out.append([c / s for c in counts] if s > 0 else counts)
        return out

    return encode


def linear_probe_score(
    df: DataFrame,
    weights: Sequence[float],
    bias: float = 0.0,
    vec_col: str = "embedding",
    out_col: str = "probe_score",
) -> DataFrame:
    """Quality-classifier scoring: ``sigmoid(w·v + b)`` over an
    embedding column, as a pure column expression (zero UDF — the
    weights are literals folded into codegen, so scoring a 100 TB
    corpus is one narrow map stage).

    This is the standard linear-probe / fastText-style corpus gate: a
    tiny logistic head trained offline on labeled quality examples,
    applied at scale over ``embed``'s output (or any precomputed
    embedding column).  Training the head is out of scope — it is a
    few thousand labels in sklearn; serving it is the 100 TB problem
    and lives here.
    """
    w = F.array(*[F.lit(float(x)) for x in weights])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), w, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn(
        out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-(dot + F.lit(float(bias)))))
    )


def embed(
    df: DataFrame,
    encoder_fn: Callable[[Sequence[str]], Iterable],
    text_col: str = "text",
    out_col: str = "embedding",
    batch_size: int = 256,
) -> DataFrame:
    """Append ``out_col: array<double>`` — ``encoder_fn`` applied to
    ``text_col`` in batches of ``batch_size`` on the executors.

    Plan shape: one ``mapInPandas`` pass, no shuffle — embedding N docs
    is embarrassingly parallel, so throughput scales with executors and
    the only tuning knob that matters is ``batch_size`` (big enough to
    saturate the encoder's vectorization/GPU, small enough that a batch
    of texts + vectors fits the worker heap).  Arrow record batches are
    re-chunked to exactly ``batch_size`` texts per encoder call, so the
    encoder sees fixed batch shapes regardless of
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.

    All input columns pass through unchanged; NULL text is passed to
    the encoder as ``""`` (so encoders need not be NULL-aware).
    """
    if batch_size < 1:
        raise ValueError("embed: batch_size must be >= 1")
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, `{out_col}` array<double>"

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs: list[list[float]] = []
            texts = pdf[text_col].fillna("").tolist()
            for i in range(0, len(texts), batch_size):
                got = encoder_fn(texts[i : i + batch_size])
                vecs.extend(
                    [list(map(float, v)) for v in got]
                )
            if len(vecs) != len(texts):
                raise ValueError(
                    f"embed: encoder returned {len(vecs)} vectors for "
                    f"{len(texts)} texts — encoder_fn must be 1:1"
                )
            yield pdf.assign(**{out_col: pd.Series(vecs, index=pdf.index)})

    return df.mapInPandas(kernel, schema)


def embedding_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Centroid drift between two embedding snapshots, one row
    ``(n_a, n_b, centroid_cosine, centroid_l2)`` — the embedding-space
    counterpart of ``distribution_distance``: a new encoder version or
    a shifted corpus moves the centroid long before per-pair checks
    notice.  Cosine near 1 and a small L2 say the spaces still align.

    Plan: one posexplode → per-(side, dim) hash aggregate (map-side
    combined, dim-sized exchange), a dim-sized join, one fold.
    Nothing after the first aggregate is row-sized.  Empty sides yield
    NULL metrics.
    """

    def _dim_means(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select(
                F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                    "dim", "_v"
                )
            )
            .groupBy("dim")
            .agg(
                F.sum("_v").alias(f"_s_{side}"),
                F.count(F.lit(1)).alias(f"_n_{side}"),
            )
        )

    na = df_a.filter(F.col(vec_col).isNotNull()).count()
    nb = df_b.filter(F.col(vec_col).isNotNull()).count()
    if na == 0 or nb == 0:
        from pyspark.sql import Row

        spark = df_a.sparkSession
        return literal_frame(spark, 
            [Row(n_a=na, n_b=nb, centroid_cosine=None, centroid_l2=None)],
            "n_a long, n_b long, centroid_cosine double, centroid_l2 double",
        )
    ma = _dim_means(df_a, "a")
    mb = _dim_means(df_b, "b")
    joined = ma.join(mb, "dim", "full_outer").select(
        F.coalesce(
            F.col("_s_a") / F.col("_n_a").cast("double"), F.lit(0.0)
        ).alias("_ma"),
        F.coalesce(
            F.col("_s_b") / F.col("_n_b").cast("double"), F.lit(0.0)
        ).alias("_mb"),
    )
    folded = joined.agg(
        F.sum(F.col("_ma") * F.col("_mb")).alias("_dot"),
        F.sum(F.col("_ma") * F.col("_ma")).alias("_aa"),
        F.sum(F.col("_mb") * F.col("_mb")).alias("_bb"),
        F.sum(
            (F.col("_ma") - F.col("_mb")) * (F.col("_ma") - F.col("_mb"))
        ).alias("_d2"),
    )
    cos = F.when(
        (F.col("_aa") > 0) & (F.col("_bb") > 0),
        F.col("_dot") / (F.sqrt(F.col("_aa")) * F.sqrt(F.col("_bb"))),
    )
    return folded.select(
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
        F.round(cos, 6).alias("centroid_cosine"),
        F.round(F.sqrt(F.col("_d2")), 6).alias("centroid_l2"),
    )
