"""Slowly-changing-dimension (Type 2) merge: apply a batch of
timestamped attribute updates to a versioned dimension, closing open
rows and appending effective-dated versions.

The reference pipeline overwrites indicator columns in place
(``scripts/merge-indicators.js``); a warehouse keeping HISTORY needs
the SCD2 shape instead — every key's attribute timeline as
``[eff_start, eff_end)`` half-open intervals, exactly one open row
(``eff_end NULL``) per live key.

Scale design: one window over the UPDATE BATCH per key (batch rows
per key are few — CDC semantics), one equi join update-keys ↔ open
rows (broadcast when the batch is small, AQE-skew-safe otherwise),
and a union — the dimension's closed history is never rewritten, so
the operator's cost scales with the batch + open-row count, not the
full history.  Deterministic: ``(key, ts)`` must be unique in the
batch (enforced), so the version chain is total-ordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    start_col: str = "eff_start",
    end_col: str = "eff_end",
    ts_col: str = "ts",
) -> DataFrame:
    """Apply ``updates`` (``key, ts, *attr_cols``) to the versioned
    ``current`` (``key, *attr_cols, eff_start, eff_end``), returning
    the new full dimension:

    - the open row (``eff_end NULL``) of every updated key closes at
      that key's FIRST update timestamp;
    - each update becomes a version effective ``[its ts, next update's
      ts)``, the last one open;
    - rows of untouched keys and already-closed history pass through
      unchanged.

    Raises at plan-execution time on duplicate ``(key, ts)`` pairs in
    the batch (the chain would be ambiguous).  Assumes CDC-ordered
    input: update timestamps after the open row's ``eff_start``
    (out-of-order updates would need a full-history rebuild, a
    different operator).
    """
    if not attr_cols:
        raise ValueError("scd2_apply: attr_cols must be non-empty")

    w = Window.partitionBy(key_col).orderBy(ts_col)
    upd = (
        updates.select(key_col, ts_col, *attr_cols)
        .withColumn("_next_ts", F.lead(ts_col).over(w))
        .withColumn("_dup", F.count(F.lit(1)).over(
            Window.partitionBy(key_col, ts_col)
        ))
    )
    # duplicate (key, ts) makes the version chain ambiguous — fail loud
    # inside the plan (no extra job): poison the start column with an
    # ANSI error via a guarded expression
    guarded_start = F.when(
        F.col("_dup") == 1, F.col(ts_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("scd2_apply: duplicate (key, ts) update for key="),
                F.col(key_col).cast("string"),
            )
        )
    )
    new_rows = upd.select(
        F.col(key_col),
        *[F.col(c) for c in attr_cols],
        guarded_start.alias(start_col),
        F.col("_next_ts").alias(end_col),
    )

    firsts = (
        updates.groupBy(key_col).agg(F.min(ts_col).alias("_first_ts"))
    )
    is_open = F.col(end_col).isNull()
    cur = current.select(key_col, *attr_cols, start_col, end_col)
    closed_now = (
        cur.filter(is_open)
        .join(F.broadcast(firsts), key_col)
        .select(
            F.col(key_col),
            *[F.col(c) for c in attr_cols],
            F.col(start_col),
            F.col("_first_ts").alias(end_col),
        )
    )
    untouched = cur.join(
        F.broadcast(firsts.select(key_col)), key_col, "left_anti"
    ).unionByName(
        # closed history of updated keys passes through too
        cur.filter(~is_open).join(F.broadcast(firsts.select(key_col)), key_col, "left_semi")
    )
    return untouched.unionByName(closed_now).unionByName(new_rows)


def scd2_current(dim: DataFrame, end_col: str = "eff_end") -> DataFrame:
    """The live snapshot: open rows only."""
    return dim.filter(F.col(end_col).isNull())


def scd2_as_of(
    dim: DataFrame,
    ts,
    start_col: str = "eff_start",
    end_col: str = "eff_end",
) -> DataFrame:
    """Point-in-time snapshot: rows whose ``[eff_start, eff_end)``
    interval covers ``ts`` — the time-travel read over the versioned
    dimension (pure filter; partition/cluster the dimension by
    ``eff_start`` and the scan prunes)."""
    t = F.lit(ts)
    return dim.filter(
        (F.col(start_col) <= t)
        & (F.col(end_col).isNull() | (F.col(end_col) > t))
    )


def cdc_apply(
    snapshot: DataFrame,
    oplog: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a change-data-capture oplog to a base snapshot:
    rows are the post-log state — for every key, the HIGHEST-``seq``
    operation wins (last-writer-wins); a winning ``D`` removes the
    key, a winning ``I``/``U`` replaces the row, untouched snapshot
    rows pass through.  The lakehouse MERGE as ONE relational plan —
    no per-batch loop, no mutable table: replaying a day of CDC
    against a 100 TB snapshot is a single anti-join + union.

    Ops are ``I``/``U``/``D`` (anything else raises loudly up front);
    ``seq`` must be totally ordered per key (duplicate (key, seq)
    raises — an ambiguous log has no deterministic winner).  The
    oplog's payload columns must match the snapshot's.

    Plan: one ``max_by``-style winner fold over the OPLOG (hash
    aggregate on key, map-side combined — the log, usually ≪ the
    snapshot, is the only thing shuffled twice); one LEFT ANTI join
    of the snapshot against touched keys (broadcast when the day's
    keys fit, AQE decides); union with the surviving upserts.  The
    snapshot itself is scanned once and never sorted.
    """
    if not key_cols:
        raise ValueError("cdc_apply: key_cols must be non-empty")
    payload = [c for c in snapshot.columns]
    missing = [c for c in payload if c not in oplog.columns]
    if missing:
        raise ValueError(
            f"cdc_apply: oplog lacks snapshot columns {missing}"
        )
    bad_op = (
        oplog.filter(~F.col(op_col).isin("I", "U", "D"))
        .limit(1)
        .count()
    )
    if bad_op:
        raise ValueError("cdc_apply: ops must be one of I/U/D")
    dup = (
        oplog.groupBy(*key_cols, seq_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "cdc_apply: duplicate (key, seq) in the oplog — no "
            "deterministic winner"
        )
    winner = oplog.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(F.col(op_col).alias("_op"), *payload),
            F.col(seq_col),
        ).alias("_w")
    )
    touched = winner.select(*key_cols)
    kept = snapshot.join(touched, key_cols, "left_anti")
    upserts = (
        winner.filter(F.col("_w._op") != "D")
        .select(*[F.col(f"_w.{c}").alias(c) for c in payload])
    )
    return kept.unionByName(upserts)
