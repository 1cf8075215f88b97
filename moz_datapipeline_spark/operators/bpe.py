"""On-cluster BPE tokenizer induction (byte-pair-encoding merges).

Training a tokenizer is the one corpus-scale job that precedes every
other token-based stage of an LLM pipeline, and it reduces to exactly
the shape Spark is good at: ONE corpus-wide hash aggregation builds
the (word, freq) table, after which every merge round runs on that
table — whose size is the corpus VOCABULARY (≈ millions of rows at
100 TB), not the corpus.  The classic BPE algorithm (Sennrich et al.
2016, public) is then: repeatedly count adjacent symbol pairs
weighted by word frequency, take the most frequent pair, fuse it
everywhere.

Determinism and oracle-replayability drive the representation: a
word's symbol sequence is kept as a delimited STRING
(``||s1||s2||…||``) rather than an array, because then "fuse pair
(A,B) everywhere, greedy left-to-right, non-overlapping" is exactly
one plain substring replace of ``|A||B|`` with ``|AB|`` — an
operation with identical semantics in Spark (``F.replace``) and ANSI
SQL (``replace``), which is what lets the ``bpe_merges`` query replay
every round bit-for-bit in DuckDB.  The doubled delimiter is what
makes overlapping runs resolve greedily: in ``||a||a||a||`` the
pattern ``|a||a|`` matches once, consumes its boundary, and leaves
``aa, a`` — the same result as the textbook left-to-right scan.

Scale: pair counting each round is an explode of the vocab table's
symbol bigrams (rows ≈ Σ word-length, shrinking as merges fuse
symbols) into a map-side-combined sum — one narrow shuffle per round;
the argmax collects ONE row to the driver (the merge decision is
inherently global and tiny, like k-means centroids in
``similarity.kmeans_assign``).  The per-round replace is a narrow
projection.  Rounds are bounded by ``n_merges`` (vocab size budget),
never by corpus size.

Reference parity: extension operator (the reference has no ML/token
stage); public-algorithm source: Sennrich, Haddow, Birch (ACL 2016),
"Neural Machine Translation of Rare Words with Subword Units".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus import tokens

__all__ = ["bpe_word_table", "bpe_train", "bpe_segment"]


def bpe_word_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq, sym) — the corpus reduced to its weighted
    vocabulary, each word exploded into the ``||``-delimited
    character-symbol string the merge rounds operate on.  This is the
    ONLY corpus-wide pass of BPE training.  Words containing the
    delimiter character ``|`` are dropped (they would forge symbol
    boundaries); at web scale that is a measure-zero cleanup."""
    words = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .filter(~F.col("word").contains("|"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    return words.withColumn(
        "sym",
        F.concat(
            F.regexp_replace(F.col("word"), r"(.)", r"||$1"), F.lit("||")
        ),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the current symbol strings:
    explode each word's bigrams, weight by word freq, one
    map-side-combined sum."""
    toks = F.filter(
        F.split(F.col("sym"), r"\|\|"), lambda x: x != ""
    )
    # guard single-symbol words: Spark's sequence(1, 0) is DESCENDING
    # [1, 0], not empty, and would index past the array
    prs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("a"),
                F.element_at(toks, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        vocab.select(F.col("freq"), F.explode(prs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    ``[(merge_rank, left, right, pair_count), …]`` in learned order.

    Ties break on (count DESC, left ASC, right ASC) — byte-stable
    across cluster sizes and reruns.  Stops early if no pair occurs
    twice (nothing left worth fusing).  The returned list IS the
    tokenizer artifact; feed it to :func:`bpe_segment`.
    """
    if n_merges < 1:
        raise ValueError("bpe_train: n_merges must be >= 1")
    vocab = bpe_word_table(docs, text_col=text_col).cache()
    merges: list[tuple[int, str, str, int]] = []
    prev = None
    try:
        for r in range(n_merges):
            # this ONE action per round materializes vocab's cache as a
            # side effect (its lineage is one narrow replace over the
            # still-cached previous round), so prev can only be
            # released NOW — an eager count+unpersist per round would
            # double the job count for nothing
            best = (
                _pair_counts(vocab)
                .orderBy(
                    F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
                )
                .first()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if best is None or best.cnt < 2:
                break
            merges.append((r, best.a, best.b, int(best.cnt)))
            pat = F.lit(f"|{best.a}||{best.b}|")
            rep = F.lit(f"|{best.a}{best.b}|")
            nxt = vocab.withColumn(
                "sym", F.replace(F.col("sym"), pat, rep)
            ).cache()
            prev, vocab = vocab, nxt
    finally:
        vocab.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned merges to a corpus: per word, chars → delimited
    symbols → the merge replaces in learned order → token array,
    then concatenated back per document.  Pure column expressions — a
    chain of ``len(merges)`` narrow substring replaces, no shuffle, no
    UDF; serving the tokenizer at 100 TB is one map stage."""
    return docs.select(
        F.col(id_col),
        F.flatten(
            F.transform(
                tokens(text_col),
                lambda w: F.filter(
                    F.split(_apply_merges(w, merges), r"\|\|"),
                    lambda x: x != "",
                ),
            )
        ).alias("bpe_tokens"),
    )


def _apply_merges(word_col, merges):
    sym = F.concat(
        F.regexp_replace(word_col, r"(.)", r"||$1"), F.lit("||")
    )
    for _, a, b, _ in merges:
        sym = F.replace(sym, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
    return sym
