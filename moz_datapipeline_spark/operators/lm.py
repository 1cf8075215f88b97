"""N-gram language-model perplexity scoring (CCNet-style quality gate).

Production corpus pipelines score every candidate document against a
language model trained on a trusted reference corpus and keep/weight by
perplexity bucket (CCNet's KenLM head/middle/tail split).  This is that
operator with a bigram model the engine can train ON-CLUSTER in two
hash aggregations — no external model artifact, fully deterministic,
and every step (tokenise, bigram, count, smooth, score) is expressible
in ANSI SQL so the whole pipeline carries a value oracle.

Model: add-k smoothed conditional bigrams over whitespace tokens (the
engine's canonical tokenisation, same as ``corpus.tokens``):

    p(w2 | w1) = (c(w1,w2) + k) / (c_ctx(w1) + k·V)

where ``c_ctx`` sums bigram counts by left token (so the distribution
is proper by construction) and ``V`` is the training vocabulary size.
A document's score is the cross-entropy H = -mean log p over its
bigrams (nats/token) and perplexity e^H; documents shorter than two
tokens score NULL with ``n_bigrams = 0``.

Plan shape (all JVM-side, zero Python UDFs):

- train: one explode + two hash aggregations over the reference slice;
  vocabulary is a 1-row aggregate cross-joined in (never collected);
- score: one explode of evaluation bigrams, a left join to bigram
  counts on (w1, w2) and to context counts on w1 — both equi-key,
  AQE-skew-safe, broadcast when the model is small — then one per-doc
  aggregation with map-side partials, and a left join back to the doc
  list so short documents survive with NULL scores.

Scale: model size is O(distinct bigrams) — for a 100 TB corpus scored
against a bounded reference (the CCNet design), the counts tables are
the small sides and broadcast; the eval side stays one scan + one
shuffle per join key.

Reference parity: extension surface; the score-then-band idiom mirrors
the reference's severity banding over EAUL scores
(scripts/criticality/index.js score→class mapping).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from moz_datapipeline_spark.operators.corpus import tokens


def _bigrams(t: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs (JVM-side).

    ``t`` MUST be a bound column holding the token array, not the
    tokenisation expression itself: ``element_at`` inside the lambda
    evaluates its array argument once per element, so an unbound
    ``split(...)`` there turns a linear pass into O(len²) per row
    (measured 2.7 s → 0.5 s at sf0.1 for the scoring explode)."""
    return F.transform(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda w, i: F.struct(
            w.alias("w1"), F.element_at(t, i + 2).alias("w2")
        ),
    )


def _bigram_pairs(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """Explode a document frame to one row per adjacent token pair."""
    with_t = df.select(*id_cols, tokens(text_col).alias("_t"))
    return with_t.select(
        *id_cols, F.explode(_bigrams(F.col("_t"))).alias("bg")
    ).select(
        *id_cols, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def train_bigram_lm(
    ref: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train on a reference corpus: returns ``(bigram_counts,
    context_counts, vocab)`` — (w1, w2, c_bi), (w1, c_ctx), and a
    1-row frame with ``v`` (vocabulary size, never collected)."""
    bi = (
        _bigram_pairs(ref, [], text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_bi"))
    )
    ctx = bi.groupBy("w1").agg(F.sum("c_bi").alias("c_ctx"))
    vocab = (
        ref.select(F.explode(tokens(text_col)).alias("w"))
        .agg(F.count_distinct("w").cast("double").alias("v"))
    )
    return bi, ctx, vocab


def lm_score(
    docs: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.1,
    buckets: tuple[float, float] = (4.5, 6.0),
    broadcast_model: bool = True,
) -> DataFrame:
    """Score documents against a trained bigram LM.

    Returns ``(id, n_bigrams, cross_entropy, perplexity, lm_bucket)``,
    rounded to 6 dp; ``lm_bucket`` is the CCNet head/middle/tail split
    at the ``buckets`` cross-entropy thresholds (NULL for docs with no
    bigrams)."""
    lo, hi = buckets
    bi = F.broadcast(bigram_counts) if broadcast_model else bigram_counts
    ctx = F.broadcast(context_counts) if broadcast_model else context_counts

    exploded = _bigram_pairs(docs, [id_col], text_col)
    k = float(add_k)
    logp = F.log(
        (F.coalesce(F.col("c_bi"), F.lit(0)) + F.lit(k))
        / (F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(k) * F.col("v"))
    )
    scored = (
        exploded.join(bi, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.avg(logp)).alias("_h"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, [id_col], "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round("_h", 6).alias("cross_entropy"),
            F.round(F.exp("_h"), 6).alias("perplexity"),
            F.when(F.col("_h").isNull(), F.lit(None).cast("string"))
            .when(F.col("_h") < lo, F.lit("head"))
            .when(F.col("_h") < hi, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("lm_bucket"),
        )
    )


def _trigram_rows(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """One row per adjacent token triple (JVM-side; bound-array rule
    as in ``_bigrams`` — element_at lambdas must reference a bound
    column or the pass goes quadratic)."""
    with_t = df.select(*id_cols, tokens(text_col).alias("_t"))
    t = F.col("_t")
    tris = F.transform(
        F.slice(t, 1, F.greatest(F.size(t) - 2, F.lit(0))),
        lambda w, i: F.struct(
            w.alias("w1"),
            F.element_at(t, i + 2).alias("w2"),
            F.element_at(t, i + 3).alias("w3"),
        ),
    )
    return with_t.select(
        *id_cols, F.explode(tris).alias("tg")
    ).select(
        *id_cols,
        F.col("tg.w1").alias("w1"),
        F.col("tg.w2").alias("w2"),
        F.col("tg.w3").alias("w3"),
    )


def train_trigram_lm(
    ref: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Interpolated-trigram model state: ``(tri_counts(w1,w2,w3,c3),
    bigram_counts(w1,w2,c2), unigram_counts(w,c1), totals(n_tokens,
    v))`` — three hash aggregations plus a 1-row totals frame, all
    map-side-combined, nothing collected.  Model size is O(distinct
    n-grams) of the (bounded, CCNet-style) reference corpus — the
    broadcast small side at scoring time."""
    tri = (
        _trigram_rows(ref, [], text_col)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    bi = (
        _bigram_pairs(ref, [], text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    uni = (
        ref.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    totals = uni.agg(
        F.sum("c1").cast("double").alias("n_tokens"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    return tri, bi, uni, totals


def lm_score_trigram(
    docs: DataFrame,
    tri_counts: DataFrame,
    bigram_counts: DataFrame,
    unigram_counts: DataFrame,
    totals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
    add_k: float = 0.1,
    broadcast_model: bool = True,
) -> DataFrame:
    """Jelinek–Mercer interpolated trigram cross-entropy:

        p(w3|w1,w2) = λ3·c(w1w2w3)/c(w1w2)
                    + λ2·c(w2w3)/c(w2)
                    + λ1·(c(w3)+k)/(N+kV)

    Unseen higher-order contexts contribute 0 to their term (the
    interpolation backbone); the add-k unigram floor keeps p > 0 for
    out-of-vocabulary tokens, so log p is always finite.  Returns
    ``(id, n_trigrams, cross_entropy, perplexity)`` with docs shorter
    than 3 tokens surviving as NULL scores.

    Plan: one explode of evaluation trigrams, four broadcast left
    equi joins against the model tables + the 1-row totals, one
    per-doc aggregation — same shape as the bigram ``lm_score``, one
    extra join.
    """
    l3, l2, l1 = (float(x) for x in lambdas)
    k = float(add_k)
    maybe_b = F.broadcast if broadcast_model else (lambda d: d)
    tri = maybe_b(tri_counts)
    bi2 = maybe_b(bigram_counts)
    uni = maybe_b(unigram_counts)

    ev = _trigram_rows(docs, [id_col], text_col)
    joined = (
        ev.join(tri, ["w1", "w2", "w3"], "left")
        .join(bi2.withColumnRenamed("c2", "_c_ctx2"), ["w1", "w2"], "left")
        .join(
            bi2.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("c2").alias("_c_bi23"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c1").alias("_c_w2")),
            ["w2"],
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w3"), F.col("c1").alias("_c_w3")),
            ["w3"],
            "left",
        )
        .join(F.broadcast(totals))
    )
    p = (
        F.lit(l3)
        * F.coalesce(
            F.col("c3").cast("double") / F.col("_c_ctx2"), F.lit(0.0)
        )
        + F.lit(l2)
        * F.coalesce(
            F.col("_c_bi23").cast("double") / F.col("_c_w2"), F.lit(0.0)
        )
        + F.lit(l1)
        * (F.coalesce(F.col("_c_w3"), F.lit(0)).cast("double") + F.lit(k))
        / (F.col("n_tokens") + F.lit(k) * F.col("v"))
    )
    per_doc = (
        joined.select(id_col, (-F.log(p)).alias("_nll"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.avg("_nll").alias("_h"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, [id_col], "left")
        .select(
            id_col,
            F.coalesce(F.col("n_trigrams"), F.lit(0)).alias("n_trigrams"),
            F.round(F.col("_h"), 6).alias("cross_entropy"),
            F.round(F.exp(F.col("_h")), 6).alias("perplexity"),
        )
    )


def train_kneser_ney(
    ref: DataFrame, text_col: str = "text"
) -> dict[str, DataFrame]:
    """Interpolated Kneser–Ney trigram state, ALL derived from one
    distinct-trigram count table (Chen & Goodman 1999 — the smoothing
    that wins every n-gram shootout, and the reason KenLM exists):

    - ``tri``   (w1, w2, w3, c3) — trigram counts;
    - ``ctx``   (w1, w2, c_ctx, t12) — context mass Σ_w3 c3 and the
      distinct-continuation count N1+(w1w2•) that funds the discount;
    - ``cont23``(w2, w3, n1p) — continuation counts N1+(•w2w3): HOW
      MANY contexts a bigram completes, not how often (the KN
      insight: "San Francisco" makes "Francisco" frequent but it only
      ever follows "San");
    - ``mid``   (w2, mid2, t2) — N1+(•w2•) and N1+(w2•);
    - ``cont3`` (w3, n1p3) — N1+(•w3);
    - ``totals`` 1-row (b = N1+(••) distinct bigrams, v = vocabulary).

    Five hash aggregations off one trigram explode — map-side
    combined, nothing collected; every table is O(distinct n-grams)
    of the bounded reference corpus (broadcast small sides at
    scoring).  Context mass uses Σ_w3 c3 (interior bigrams), the
    standard self-consistent simplification: the model's discounted
    mass and its backoff weight then refer to the same denominator.
    """
    tri = (
        _trigram_rows(ref, [], text_col)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    ctx = tri.groupBy("w1", "w2").agg(
        F.sum("c3").alias("c_ctx"),
        F.count(F.lit(1)).alias("t12"),
    )
    cont23 = tri.groupBy("w2", "w3").agg(
        F.countDistinct("w1").alias("n1p")
    )
    mid = tri.groupBy("w2").agg(
        F.count(F.lit(1)).alias("mid2"),
        F.countDistinct("w3").alias("t2"),
    )
    cont3 = cont23.groupBy("w3").agg(
        F.count(F.lit(1)).alias("n1p3")
    )
    uni = ref.select(F.explode(tokens(text_col)).alias("w")).distinct()
    totals = cont23.agg(
        F.count(F.lit(1)).cast("double").alias("b")
    ).crossJoin(uni.agg(F.count(F.lit(1)).cast("double").alias("v")))
    return {
        "tri": tri,
        "ctx": ctx,
        "cont23": cont23,
        "mid": mid,
        "cont3": cont3,
        "totals": totals,
    }


def lm_score_kneser_ney(
    docs: DataFrame,
    model: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    add_k: float = 0.1,
    broadcast_model: bool = True,
) -> DataFrame:
    """Interpolated Kneser–Ney cross-entropy per document:

        p(w3|w1w2) = max(c3 − D, 0)/c_ctx + D·t12/c_ctx · p(w3|w2)
        p(w3|w2)   = max(N1+(•w2w3) − D, 0)/N1+(•w2•)
                     + D·N1+(w2•)/N1+(•w2•) · p(w3)
        p(w3)      = (N1+(•w3) + k) / (N1+(••) + k·(V + 1))

    Unseen trigram context → clean backoff to the bigram level;
    unseen w2 → unigram level; unseen w3 → the add-``k`` continuation
    floor keeps log p finite (the +1 in the denominator reserves the
    OOV slot).  Returns ``(id, n_trigrams, cross_entropy,
    perplexity)``; docs under 3 tokens survive with NULL scores.

    Plan: one evaluation-trigram explode, five broadcast left equi
    joins + the 1-row totals, one per-doc aggregation — the
    ``lm_score_trigram`` shape with continuation tables instead of
    raw lower-order counts.
    """
    D = float(discount)
    if not (0.0 < D < 1.0):
        raise ValueError("lm_score_kneser_ney: discount must be in (0,1)")
    k = float(add_k)
    maybe_b = F.broadcast if broadcast_model else (lambda d: d)

    ev = _trigram_rows(docs, [id_col], text_col)
    joined = (
        ev.join(maybe_b(model["tri"]), ["w1", "w2", "w3"], "left")
        .join(maybe_b(model["ctx"]), ["w1", "w2"], "left")
        .join(maybe_b(model["cont23"]), ["w2", "w3"], "left")
        .join(maybe_b(model["mid"]), ["w2"], "left")
        .join(maybe_b(model["cont3"]), ["w3"], "left")
        .join(F.broadcast(model["totals"]))
    )
    p_uni = (
        F.coalesce(F.col("n1p3"), F.lit(0)).cast("double") + F.lit(k)
    ) / (F.col("b") + F.lit(k) * (F.col("v") + F.lit(1.0)))
    mid2 = F.col("mid2").cast("double")
    p_bi = F.when(
        mid2.isNotNull(),
        F.greatest(
            F.coalesce(F.col("n1p"), F.lit(0)).cast("double") - F.lit(D),
            F.lit(0.0),
        )
        / mid2
        + F.lit(D) * F.col("t2").cast("double") / mid2 * p_uni,
    ).otherwise(p_uni)
    cctx = F.col("c_ctx").cast("double")
    p_tri = F.when(
        cctx.isNotNull(),
        F.greatest(
            F.coalesce(F.col("c3"), F.lit(0)).cast("double") - F.lit(D),
            F.lit(0.0),
        )
        / cctx
        + F.lit(D) * F.col("t12").cast("double") / cctx * p_bi,
    ).otherwise(p_bi)
    per_doc = (
        joined.select(id_col, (-F.log(p_tri)).alias("_nll"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.avg("_nll").alias("_h"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, [id_col], "left")
        .select(
            id_col,
            F.coalesce(F.col("n_trigrams"), F.lit(0)).alias("n_trigrams"),
            F.round(F.col("_h"), 6).alias("cross_entropy"),
            F.round(F.exp(F.col("_h")), 6).alias("perplexity"),
        )
    )
