"""Model- and retrieval-evaluation operators.

The training-data engine's read-back instruments: once a model (or a
retrieval index) is trained on the corpus this engine curated, these
operators grade it at corpus scale — thresholded classification
readouts, probability calibration, and ranked-retrieval metrics
(NDCG / MRR / precision / recall @ k).

Scale posture shared by the family: every metric folds through
hash aggregates and PER-QUERY (or per-bin) windows — partitioned
shuffles, never a global sort; the only broadcast frames are 1-row
totals.  Rank-based global metrics (AUC, lift) live in
``operators.analytics`` and ride the two-phase distributed rank.

Reference parity: the reference pipeline (developmentseed/
moz-datapipeline) stops at indicator aggregation; this family extends
the engine for the LLM-data-pipeline lifecycle the way
``operators.dedup`` / ``operators.corpus`` do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def classification_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Thresholded binary-classification readout, one row ``(tp, fp,
    fn, tn, accuracy, precision, recall, f1, balanced_accuracy, mcc)``
    — predictions are ``score >= threshold``.  MCC (the Matthews /
    phi coefficient) and balanced accuracy are the two readouts that
    survive class imbalance, where plain accuracy rewards predicting
    the majority class.

    ONE conditional-sum hash aggregate (map-side combined): four
    integer cell counts, ratios derived in the same row (cell products
    in double — at 10¹¹ rows the 4-way product overflows int64).
    Degenerate denominators (no predicted positives, no actual
    positives, an all-one-class frame) yield NULL for the affected
    ratios rather than a fake 0.  NULL scores or labels drop.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.filter(s.isNotNull() & y.isNotNull())
    pred = (s >= F.lit(float(threshold))).cast("int")
    folded = base.agg(
        F.coalesce(F.sum(pred * y), F.lit(0)).cast("long").alias("tp"),
        F.coalesce(F.sum(pred * (1 - y)), F.lit(0)).cast("long").alias("fp"),
        F.coalesce(F.sum((1 - pred) * y), F.lit(0)).cast("long").alias("fn"),
        F.coalesce(F.sum((1 - pred) * (1 - y)), F.lit(0))
        .cast("long")
        .alias("tn"),
    )
    tp = F.col("tp").cast("double")
    total = (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")).cast(
        "double"
    )
    prec = F.when(F.col("tp") + F.col("fp") > 0, tp / (tp + F.col("fp")))
    rec = F.when(F.col("tp") + F.col("fn") > 0, tp / (tp + F.col("fn")))
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
        2.0 * prec * rec / (prec + rec),
    )
    acc = F.when(total > 0, (tp + F.col("tn")) / total)
    tnr = F.when(
        F.col("tn") + F.col("fp") > 0,
        F.col("tn").cast("double") / (F.col("tn") + F.col("fp")).cast(
            "double"
        ),
    )
    bal = F.when(
        rec.isNotNull() & tnr.isNotNull(), (rec + tnr) / 2.0
    )
    tpd, fpd = tp, F.col("fp").cast("double")
    fnd, tnd = F.col("fn").cast("double"), F.col("tn").cast("double")
    mcc_den = F.sqrt(
        (tpd + fpd) * (tpd + fnd) * (tnd + fpd) * (tnd + fnd)
    )
    mcc = F.when(
        mcc_den > 0, (tpd * tnd - fpd * fnd) / mcc_den
    )
    return folded.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(acc, 6).alias("accuracy"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
        F.round(bal, 6).alias("balanced_accuracy"),
        F.round(mcc, 6).alias("mcc"),
    )


def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability curve + expected calibration error: one row per
    occupied equal-width score bin ``(bin, n, mean_score, pos_rate,
    abs_gap, ece, brier)`` — ``ece`` and ``brier`` are the SAME value
    on every row (fold-level constants carried alongside the curve so
    one frame answers both "where is it miscalibrated" and "how much
    overall").

    - bins are equal-width over [0, 1] (``floor(score·n_bins)``,
      clamped BOTH ends: score = 1.0 lands in the last bin, scores
      outside [0, 1] — negatives, raw logits — clamp into the edge
      bins instead of minting out-of-range bin ids that silently skew
      ECE) — the standard reliability-diagram convention,
      deterministic across engines (no quantile estimation inside the
      metric being validated);
    - ECE = Σ_b (n_b/N)·|mean_score_b − pos_rate_b|;
    - Brier = mean (score − label)².

    Plan: one hash aggregate to the ≤ ``n_bins`` rollup, a 1-row
    totals broadcast, and a window over the bin rollup for the ECE
    fold — everything after the first aggregate is bins-sized.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.filter(s.isNotNull() & y.isNotNull()).select(
        s.alias("_s"), y.alias("_y")
    )
    q = int(n_bins)
    b = F.greatest(
        F.least(F.floor(F.col("_s") * q), F.lit(q - 1)), F.lit(0)
    ).cast("int")
    per = base.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_s").alias("_ssum"),
        F.sum("_y").cast("long").alias("_pos"),
        F.sum(
            (F.col("_s") - F.col("_y").cast("double"))
            * (F.col("_s") - F.col("_y").cast("double"))
        ).alias("_sqerr"),
    )
    tot = per.agg(
        F.sum("n").alias("_nt"), F.sum("_sqerr").alias("_sqt")
    )
    staged = per.crossJoin(F.broadcast(tot))
    mean_s = F.col("_ssum") / F.col("n").cast("double")
    rate = F.col("_pos").cast("double") / F.col("n").cast("double")
    gap = F.abs(mean_s - rate)
    w = Window.partitionBy()  # ≤ n_bins rows: bins-sized, never data
    ece = F.sum(gap * F.col("n").cast("double")).over(w) / F.col(
        "_nt"
    ).cast("double")
    brier = F.col("_sqt") / F.col("_nt").cast("double")
    return staged.select(
        "bin",
        "n",
        F.round(mean_s, 6).alias("mean_score"),
        F.round(rate, 6).alias("pos_rate"),
        F.round(gap, 6).alias("abs_gap"),
        F.round(ece, 6).alias("ece"),
        F.round(brier, 6).alias("brier"),
    )


def retrieval_eval(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """Ranked-retrieval metrics per query: ``(query_id, n_rel,
    n_retrieved, precision_k, recall_k, mrr_k, ndcg_k)`` — the
    standard eval harness over a RUN (``query, doc, score``) and QRELS
    (``query, doc, rel``; graded relevance, 0/NULL = irrelevant).

    - rank = row_number per query over (score DESC, doc ASC) — the
      doc-id tiebreak makes every metric partition-layout-independent;
    - P@k / R@k count rel > 0 docs in the top k;
    - MRR@k = 1/rank of the first relevant doc (0 when none);
    - NDCG@k uses the classic ``rel / log2(rank+1)`` gain against the
      ideal ordering OF THE QRELS (rel DESC, doc ASC), so a perfect
      ranking scores exactly 1.

    Plan: a left join of run onto qrels on (query, doc) — hash
    exchange on the pair key; two per-query windows (rank the run,
    rank the ideal) — partitioned by query, never global; one
    per-query fold.  Queries with no relevant documents emit NULL
    ndcg (0/0) and zero recall denominators are NULL, not fake zeros.
    """
    kk = int(k)
    q = F.col(query_col)
    d = F.col(doc_col)
    r = (
        run.select(
            q.alias("_q"), d.alias("_d"), F.col(score_col).alias("_s")
        )
        .join(
            qrels.select(
                q.alias("_q"),
                d.alias("_d"),
                F.col(rel_col).cast("double").alias("_rel"),
            ),
            ["_q", "_d"],
            "left",
        )
        .withColumn("_rel", F.coalesce(F.col("_rel"), F.lit(0.0)))
    )
    wq = Window.partitionBy("_q").orderBy(
        F.col("_s").desc(), F.col("_d").asc()
    )
    topk = r.withColumn("_rank", F.row_number().over(wq)).filter(
        F.col("_rank") <= kk
    )
    gain = F.col("_rel") / F.log2(F.col("_rank").cast("double") + 1.0)
    hits = (F.col("_rel") > 0).cast("int")
    per = topk.groupBy(F.col("_q").alias(query_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_retrieved"),
        F.sum(hits).cast("long").alias("_hits"),
        F.sum(gain).alias("_dcg"),
        F.min(F.when(F.col("_rel") > 0, F.col("_rank"))).alias("_first"),
    )
    wi = Window.partitionBy("_q").orderBy(
        F.col("_rel").desc(), F.col("_d").asc()
    )
    ideal = (
        qrels.select(
            q.alias("_q"),
            d.alias("_d"),
            F.col(rel_col).cast("double").alias("_rel"),
        )
        .filter(F.col("_rel") > 0)
        .withColumn("_rank", F.row_number().over(wi))
    )
    ideal_agg = ideal.groupBy(F.col("_q").alias(query_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_rel"),
        F.sum(
            F.when(
                F.col("_rank") <= kk,
                F.col("_rel") / F.log2(F.col("_rank").cast("double") + 1.0),
            )
        ).alias("_idcg"),
    )
    staged = per.join(ideal_agg, query_col, "left")
    prec = F.col("_hits").cast("double") / F.lit(float(kk))
    rec = F.when(
        F.col("n_rel") > 0,
        F.col("_hits").cast("double") / F.col("n_rel").cast("double"),
    )
    mrr = F.coalesce(
        1.0 / F.col("_first").cast("double"), F.lit(0.0)
    )
    ndcg = F.when(F.col("_idcg") > 0, F.col("_dcg") / F.col("_idcg"))
    return staged.select(
        query_col,
        F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
        "n_retrieved",
        F.round(prec, 6).alias("precision_k"),
        F.round(rec, 6).alias("recall_k"),
        F.round(mrr, 6).alias("mrr_k"),
        F.round(ndcg, 6).alias("ndcg_k"),
    )


def log_loss(
    df: DataFrame,
    score_col: str,
    label_col: str,
    eps: float = 1e-15,
) -> DataFrame:
    """Binary cross-entropy, one row ``(n, log_loss)`` — the proper
    scoring rule: −mean(y·ln p + (1−y)·ln(1−p)) with probabilities
    clipped into [eps, 1−eps] (the sklearn convention, so a confident
    wrong 0/1 prediction costs ~34.5 nats instead of ∞).

    ONE hash aggregate; clipping is a JVM ``least/greatest`` pair.
    NULL scores/labels drop.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.filter(s.isNotNull() & y.isNotNull())
    p = F.least(F.greatest(s, F.lit(float(eps))), F.lit(1.0 - float(eps)))
    term = y.cast("double") * F.log(p) + (1.0 - y.cast("double")) * F.log(
        1.0 - p
    )
    folded = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(term).alias("_t"),
    )
    return folded.select(
        "n",
        F.round(
            F.when(F.col("n") > 0, -F.col("_t") / F.col("n").cast("double")),
            6,
        ).alias("log_loss"),
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Full precision–recall curve: one row PER DISTINCT SCORE
    ``(score, tp, fp, precision, recall, f1)`` — the operating points
    of the classifier ``predict positive when s >= score``, evaluated
    at every achievable threshold (the curve ``classification_report``
    samples one point of).

    Scale shape (the ``roc_auc`` idiom): one hash aggregate to the
    per-distinct-score rollup ``(np, nn)``, then an INCLUSIVE
    cumulative (tp, fp) in DESCENDING score order via the two-phase
    distributed prefix sum — range partition, local running sums,
    broadcast exclusive bases — never a global window over the
    row-sized rollup.  Integer counts to the final divisions.
    """
    y = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    per = (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(s.alias("score"))
        .agg(
            F.sum(y).alias("_np"),
            (F.count(F.lit(1)) - F.sum(y)).alias("_nn"),
        )
    )
    ranged = per.repartitionByRange(F.col("score").desc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    lw = (
        Window.partitionBy("_pid")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn(
        "_tp_local", F.sum("_np").over(lw)
    ).withColumn("_fp_local", F.sum("_nn").over(lw)).cache()
    bases = (
        local.groupBy("_pid")
        .agg(
            F.sum("_np").alias("_tnp"),
            F.sum("_nn").alias("_tnn"),
        )
        .withColumn(
            "_btp",
            F.coalesce(
                F.sum("_tnp").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "_bfp",
            F.coalesce(
                F.sum("_tnn").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .withColumn("_pos", F.sum("_tnp").over(Window.partitionBy()))
        .select("_pid", "_btp", "_bfp", "_pos")
    )
    staged = local.join(F.broadcast(bases), "_pid").select(
        "score",
        (F.col("_tp_local") + F.col("_btp")).cast("long").alias("tp"),
        (F.col("_fp_local") + F.col("_bfp")).cast("long").alias("fp"),
        F.col("_pos").cast("long").alias("_p"),
    )
    prec = F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast(
        "double"
    )
    rec = F.when(
        F.col("_p") > 0, F.col("tp").cast("double") / F.col("_p").cast("double")
    )
    f1 = F.when(
        rec.isNotNull() & (prec + rec > 0), 2.0 * prec * rec / (prec + rec)
    )
    return staged.select(
        "score",
        "tp",
        "fp",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def rbo_overlap(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
    p: float = 0.9,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Rank-biased overlap between two rankings per query, truncated
    at depth ``k``: ``(query_id, n_common, rbo)`` with

        RBO@k = (1−p) · Σ_{d=1..k} p^{d−1} · |A_d ∩ B_d| / d

    (Webber et al.'s top-weighted agreement; p = 0.9 ≈ the top 10
    ranks carry ~86% of the weight).  The A/B readout for ranker
    rollouts: Kendall/Spearman treat depth 1 and depth 1000 alike,
    RBO weights the top, where users look.

    Plan: rank each run per query (partitioned windows, doc tiebreak),
    keep top ``k``; an inner join on (query, doc) gives each common
    doc its ``max(rank_a, rank_b)`` — the first depth it counts at —
    so ``|A_d ∩ B_d|`` is a prefix count over a ≤ k-row per-query
    rollup, and the weighted fold is exact powers of ``p``.  Queries
    with NO common docs in the top k emit rbo = 0 via a left anchor
    on the union of queries.
    """
    kk = int(k)
    pp = float(p)

    def _topk(run: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy("_q").orderBy(
            F.col("_s").desc(), F.col("_d").asc()
        )
        return (
            run.select(
                F.col(query_col).alias("_q"),
                F.col(doc_col).alias("_d"),
                F.col(score_col).alias("_s"),
            )
            .withColumn(out, F.row_number().over(w))
            .filter(F.col(out) <= kk)
            .select("_q", "_d", out)
        )
    a = _topk(run_a, "_ra")
    b = _topk(run_b, "_rb")
    common = a.join(b, ["_q", "_d"]).select(
        "_q", F.greatest("_ra", "_rb").alias("_first_depth")
    )
    per_depth = common.groupBy("_q", "_first_depth").agg(
        F.count(F.lit(1)).alias("_c")
    )
    # weight of a doc first common at depth f:
    # (1-p) * sum_{d=f..k} p^(d-1)/d  — exact literal per f (k tiny)
    weights = {
        f: (1.0 - pp)
        * sum(pp ** (d - 1) / d for d in range(f, kk + 1))
        for f in range(1, kk + 1)
    }
    wmap = F.create_map(
        *[c for f, w in weights.items() for c in (F.lit(f), F.lit(w))]
    )
    scored = per_depth.groupBy("_q").agg(
        F.sum("_c").cast("long").alias("n_common"),
        F.sum(
            F.col("_c").cast("double")
            * F.element_at(wmap, F.col("_first_depth").cast("int"))
        ).alias("_rbo"),
    )
    queries = (
        a.select("_q").unionByName(b.select("_q")).distinct()
    )
    out = queries.join(scored, "_q", "left")
    return out.select(
        F.col("_q").alias(query_col),
        F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias(
            "n_common"
        ),
        F.round(F.coalesce(F.col("_rbo"), F.lit(0.0)), 6).alias("rbo"),
    )
