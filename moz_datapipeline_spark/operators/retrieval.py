"""Full-text retrieval operators: inverted index, conjunctive search,
and BM25 ranking over a document corpus.

The reference engine ships no text-retrieval surface (its tables are
road/flood indicators); this module is part of the LLM-data-pipeline
extension set, where retrieval earns its keep twice: quality
inspection ("show me the top docs for this query") and targeted
curation (pull all docs mentioning a benchmark phrase before
decontamination).

Scale design (100 TB corpus):

- The index is ROWS, not arrays.  A term's posting list materialized
  as one array cell is a skew bomb — a stopword's list holds a large
  fraction of the corpus and one row would carry gigabytes.  Posting
  ROWS ``(term, doc_id, tf)`` shuffle-balance like any other table and
  aggregate with map-side partial combine.
- ``build_posting_store`` persists the index Hive-partitioned by a
  term-hash bucket so a query-time lookup prunes its scan to the
  handful of partitions holding the query's terms (the same
  build-once-probe-many layout as the IVF index store in
  ``operators/similarity.py``); ``PartitionFilters`` in the probe plan
  is asserted in ``tests/test_retrieval.py``.
- Query-time plans prune FIRST: tokens are filtered to the query's
  terms (a tiny ``isin`` literal list, codegen'd) before any shuffle,
  so the aggregate sees only candidate docs — the 100 TB difference
  between shuffling every (doc, term) pair and shuffling only the
  postings of the few queried terms.
- Per-doc length and the corpus aggregates (N, avgdl) BM25 needs are
  one extra 1-row aggregate broadcast back with a cross join — no
  second scan of the corpus (doc length is computed per row in the
  same projection that tokenizes).
- Everything is JVM column expressions; the global top-k is
  ``orderBy().limit(k)``, which Spark plans as TakeOrderedAndProject —
  per-partition partial top-k with an O(k·partitions) driver merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _terms(text_col: Column | str) -> Column:
    """Lower-cased whitespace terms with empties dropped (JVM-side)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def posting_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The inverted index as rows: ``(term, doc_id, tf, doc_len)``.

    One explode + one hash aggregate (map-side partial combine).
    ``doc_len`` (the document's total term count) rides along from the
    tokenizing projection so BM25 needs no second corpus scan.
    """
    from .spread import spread_small_scan

    df = spread_small_scan(df, id_col)
    toks = _terms(text_col)
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).cast("long").alias("doc_len"),
            F.explode(toks).alias("term"),
        )
        .groupBy("term", "doc_id", "doc_len")
        .agg(F.count("*").alias("tf"))
    )


def index_stats(postings: DataFrame) -> DataFrame:
    """Per-term corpus statistics from posting rows:
    ``(term, df_count, total_tf)``.  One hash aggregate; the output is
    |vocabulary| rows — small enough to broadcast in every realistic
    corpus (vocab grows ~ Heaps' law, sublinear in corpus size)."""
    return postings.groupBy("term").agg(
        F.count("*").alias("df_count"),
        F.sum("tf").alias("total_tf"),
    )


def conjunctive_search(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Docs containing ALL of ``terms``: ``(doc_id, n_matched)`` with
    ``n_matched == len(terms)`` guaranteed.

    Plan: tokenize → keep only query terms (literal ``isin``, pushed
    into the scan's generated code) → distinct (doc, term) → count per
    doc → ``HAVING count = |terms|``.  The shuffle carries only the
    queried terms' postings, never the whole index.
    """
    if not terms:
        raise ValueError("conjunctive_search: terms must be non-empty")
    want = sorted({t.lower() for t in terms})
    toks = _terms(text_col)
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(want))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("n_matched"))
        .filter(F.col("n_matched") == len(want))
    )


def bm25_topk(
    df: DataFrame,
    query: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25
    (Robertson–Sparck Jones idf with the +1 floor, as in Lucene):

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        s(d, t) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Returns ``(doc_id, score, n_terms_matched)`` ordered by score desc,
    doc_id asc (deterministic tiebreak), rounded to 6 dp so the DuckDB
    oracle's float arithmetic agrees bit-for-bit after rounding.

    Plan shape: one corpus scan → explode filtered to query terms →
    (doc, term) tf aggregate (only candidate docs survive) → per-term
    df from that SAME small aggregate → broadcast both the 1-row
    corpus stats (N, avgdl — computed in one extra tiny aggregate over
    doc lengths, not a rescan of text) and the |query|-row idf table →
    score sum per doc → TakeOrderedAndProject.  Repeated terms in
    ``query`` are deduplicated (bag-of-words, set semantics — matching
    Lucene's default of summing each distinct term once).
    """
    if not query:
        raise ValueError("bm25_topk: query must be non-empty")
    want = sorted({t.lower() for t in query})
    toks = _terms(text_col)

    # N = indexed documents: NULL-text rows are not in the index and
    # must not inflate the idf denominator.
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("doc_len"),
        toks.alias("_toks"),
    )
    # corpus stats: N docs + average doc length, one tiny aggregate
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )

    tf = (
        base.select("doc_id", "doc_len", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(want))
        .groupBy("doc_id", "doc_len", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_count"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df_count") + 0.5)
                / (F.col("df_count") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("doc_len") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("w"), 6).alias("score"),
            F.count("*").alias("n_terms_matched"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def build_posting_store(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> None:
    """Persist the inverted index Hive-partitioned by
    ``tb = pmod(xxhash64(term), num_buckets)`` for build-once,
    probe-many retrieval.

    A term lookup reads only its bucket's partition directory —
    ``search_posting_store`` filters on the derived ``tb`` literal set
    and Spark prunes the scan (``PartitionFilters`` in the probe plan,
    asserted in tests).  Within a partition, rows are sorted by
    ``(term, doc_id)`` so min/max parquet row-group stats on ``term``
    prune further.  ``num_buckets`` bounds small-file count (one file
    per bucket per write) while keeping each bucket ~1/num_buckets of
    the index.
    """
    postings = posting_rows(df, id_col, text_col)
    (
        postings.withColumn(
            "tb", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int")
        )
        .repartition("tb")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .partitionBy("tb")
        .parquet(path)
    )


def search_posting_store(
    spark: SparkSession,
    path: str,
    terms: list[str],
    num_buckets: int = 64,
) -> DataFrame:
    """Posting rows for ``terms`` out of a ``build_posting_store``
    layout: ``(term, doc_id, tf, doc_len)``.

    The bucket ids of the query terms are computed DRIVER-side (a
    handful of hashes) and applied as a partition filter, so the scan
    touches only |distinct buckets| partitions regardless of index
    size; the residual ``term`` filter lands on sorted row groups.
    ``num_buckets`` must match the build (it is part of the layout,
    like IVF's list count).
    """
    if not terms:
        raise ValueError("search_posting_store: terms must be non-empty")
    want = sorted({t.lower() for t in terms})
    spark_buckets = (
        spark.createDataFrame([(t,) for t in want], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int").alias("tb"))
        .distinct()
    )
    # driver-side: |query| hashes, not a corpus job
    buckets = sorted({r.tb for r in spark_buckets.collect()})
    scan = spark.read.parquet(path).filter(F.col("tb").isin(buckets))
    return scan.filter(F.col("term").isin(want)).select(
        "term", "doc_id", "tf", "doc_len"
    )


def tfidf_cosine_topk(
    df: DataFrame,
    query_ids,
    k: int = 10,
    max_df_ratio: float = 0.25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """"More like this": top-``k`` most similar documents per query
    document under tf-idf cosine, candidates generated through the
    inverted index — never an all-pairs join.

    Returns ``(query_id, corpus_id, cosine, rank)`` with
    ``rank`` 1..k by (cosine desc, corpus_id asc); the query doc
    itself is excluded.

    Scale design: pair volume through a term join is Σ df(t)² — a
    stopword ("the") alone would pair most of the corpus with itself.
    ``max_df_ratio`` drops terms with df > ratio·N from BOTH the
    weights and the norms (the classic stopword cap: such terms carry
    near-zero idf anyway, so the ranking loss is tiny and the plan is
    honest about it — the cap is the difference between Σ df² over
    informative terms and N² at 100 TB).  Weights are
    w = tf · ln(N/df) with per-doc L2 norms over the KEPT terms, so
    dropped terms are invisible to the geometry, not a bias.  The
    per-query rank exchange is bounded map-side by the partial top-k
    kernel (``similarity._partition_topk``).
    """
    from moz_datapipeline_spark.operators.similarity import _partition_topk

    postings = posting_rows(df, id_col, text_col)
    n_docs = df.filter(F.col(text_col).isNotNull()).count()
    max_df = int(max_df_ratio * n_docs)
    dfreq = (
        postings.groupBy("term")
        .agg(F.count("*").alias("df_count"))
        .filter(F.col("df_count") <= max_df)
    )
    w = (
        postings.join(dfreq, "term")
        .select(
            "term",
            "doc_id",
            (
                F.col("tf")
                * F.log(F.lit(float(n_docs)) / F.col("df_count"))
            ).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    qids = list(query_ids)
    qw = w.filter(F.col("doc_id").isin(qids)).select(
        F.col("doc_id").alias("query_id"), "term", F.col("w").alias("wq")
    )
    dots = (
        qw.join(w, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("corpus_id"))
        .agg(F.sum(F.col("wq") * F.col("w")).alias("dot"))
    )
    qn = norms.select(
        F.col("doc_id").alias("query_id"), F.col("norm").alias("qnorm")
    )
    scored = (
        dots.join(F.broadcast(qn.filter(F.col("query_id").isin(qids))), "query_id")
        .join(norms.withColumnRenamed("doc_id", "corpus_id"), "corpus_id")
        .select(
            "query_id",
            "corpus_id",
            F.round(
                F.col("dot") / (F.col("qnorm") * F.col("norm")), 6
            ).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    pruned = _partition_topk(
        scored, ["query_id"], "cosine", "corpus_id", k, ascending=False
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    group_cols: list[str] | None = None,
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N rankings:
    ``score(d) = Σ_r 1/(k + rank_r(d))`` over the rankings that
    contain ``d`` — the standard score-free way to combine lexical
    (BM25) and semantic (ANN) retrieval, or any ranking with a prior.
    Returns ``(*group_cols, doc_col, rrf_score, n_rankings)`` ordered
    within group by score desc (ties by doc id).

    Rank is taken from ``rank_col`` AS GIVEN (1-based); RRF is
    deliberately blind to the underlying scores, which is what makes
    it robust to incomparable score scales.  ``group_cols`` fuses per
    query when the rankings carry a query key.

    Plan: one union + one hash aggregate over lists that are already
    top-k sized — the fusion itself can never be the scale problem;
    ``topk`` adds a WindowGroupLimit rank prune (heap of ``topk`` per
    partition below the exchange) for the per-group cut.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if k < 1:
        raise ValueError("rrf_fuse: k must be >= 1")
    group_cols = group_cols or []
    parts = [
        r.select(
            *group_cols,
            F.col(doc_col).alias("_doc"),
            F.col(rank_col).cast("long").alias("_rk"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (
        u.groupBy(*group_cols, "_doc")
        .agg(
            F.round(
                F.sum(
                    F.lit(1.0) / (F.lit(float(k)) + F.col("_rk"))
                ),
                6,
            ).alias("rrf_score"),
            F.count(F.lit(1)).cast("long").alias("n_rankings"),
        )
        .withColumnRenamed("_doc", doc_col)
    )
    if topk is not None:
        from pyspark.sql import Window

        part = group_cols if group_cols else [F.lit(1)]
        win = Window.partitionBy(*part).orderBy(
            F.col("rrf_score").desc(), F.col(doc_col).asc()
        )
        fused = (
            fused.withColumn("_r", F.row_number().over(win))
            .filter(F.col("_r") <= int(topk))
            .drop("_r")
        )
    return fused


def dirichlet_lm_topk(
    df: DataFrame,
    query: list[str],
    k: int = 10,
    mu: float = 2000.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet-prior smoothing
    (Zhai & Lafferty 2001) — the probabilistic counterpart to
    ``bm25_topk``, and the stronger baseline on short queries:

        score(d) = Σ_t  log( (tf_td + μ·P(t|C)) / (dl_d + μ) )

    with ``P(t|C) = cf_t / |C|`` (corpus term frequency over total
    corpus tokens).  Returns ``(doc_id, score, n_terms_matched)``
    ordered by score desc, doc_id asc, rounded to 6 dp (the oracle-
    hash convention).  Query terms with zero corpus frequency are
    dropped (their factor would be −∞ for every document alike).

    CANDIDATE SEMANTICS: only documents matching ≥ 1 query term are
    scored — for unmatched docs every tf is 0 and the score collapses
    to Σ log(μ·P(t|C)/(dl+μ)), maximized by the SHORTEST document;
    surfacing those is noise, so the standard practical cut applies
    (document the choice rather than scan everything).  Matched docs
    still get the smoothed factor for their MISSING terms — computed
    from dl alone, no second corpus pass.

    Plan shape mirrors ``bm25_topk``: one scan → explode filtered to
    query terms → (doc, term) tf aggregate → per-term corpus
    frequency from a second tiny aggregate over the SAME filtered
    explode → broadcast (|q| rows + 1-row corpus stats) → per-doc sum
    with the missing-term correction as arithmetic over dl →
    TakeOrderedAndProject top-k.
    """
    if not query:
        raise ValueError("dirichlet_lm_topk: query must be non-empty")
    want = sorted({t.lower() for t in query})
    toks = _terms(text_col)
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("doc_len"),
        toks.alias("_toks"),
    )
    stats = base.agg(
        F.sum("doc_len").cast("double").alias("c_len")
    )
    hits = base.select(
        "doc_id", "doc_len", F.explode("_toks").alias("term")
    ).filter(F.col("term").isin(want))
    tf = hits.groupBy("doc_id", "doc_len", "term").agg(
        F.count("*").alias("tf")
    )
    cf = hits.groupBy("term").agg(
        F.count("*").cast("double").alias("cf")
    )
    # matched-term factor MINUS the smoothed-only factor the missing-
    # term correction will re-add: log(tf + mu*p) - log(mu*p)
    mu_l = F.lit(float(mu))
    p_c = F.col("cf") / F.col("c_len")
    per_term = (
        tf.join(F.broadcast(cf), "term")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            "doc_len",
            (
                F.log(F.col("tf") + mu_l * p_c) - F.log(mu_l * p_c)
            ).alias("_gain"),
        )
    )
    # Σ_t log(mu*p_t) is a query constant; Σ_t -log(dl+mu) is |q| terms
    q_const = cf.join(F.broadcast(stats)).agg(
        F.sum(F.log(mu_l * p_c)).alias("_qc"),
        F.count(F.lit(1)).cast("double").alias("_nq"),
    )
    return (
        per_term.groupBy("doc_id", "doc_len")
        .agg(
            F.sum("_gain").alias("_g"),
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        )
        .join(F.broadcast(q_const))
        .select(
            "doc_id",
            F.round(
                F.col("_g")
                + F.col("_qc")
                - F.col("_nq")
                * F.log(F.col("doc_len").cast("double") + mu_l),
                6,
            ).alias("score"),
            "n_terms_matched",
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
