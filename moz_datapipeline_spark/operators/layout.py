"""Multi-dimensional data layout: Z-order (Morton) clustering.

Lakehouse maintenance for selective multi-column scans: a table
range-partitioned (and min/max-indexed) on ONE column prunes on that
column only; interleaving the bits of several quantized columns into
one Z-key makes rows that are close in EVERY dimension land in the
same file, so parquet min/max stats prune on ALL of them at once.
This is the OPTIMIZE ZORDER BY of Delta/Iceberg re-expressed as plain
DataFrame operators — the write-side companion to
``relational.compaction_plan`` (which fixes file SIZES; this fixes
file CONTENTS).

Everything is a deterministic column expression (quantize = equal-
width bins from a broadcast min/max; interleave = a generated
shift-or tree), so the key replays bit-identically in any engine and
oracles directly.  Scale: one 2·k-moment aggregate for the bounds,
then a pure projection and ONE range exchange — no UDFs, no windows,
no driver data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    bounds: dict[str, tuple[float, float]],
    bits: int = 12,
) -> Column:
    """Z-order (Morton) key expression over the columns of ``bounds``
    (``{col: (min, max)}``, in ITERATION ORDER — column j takes bit
    positions ``j, j+k, j+2k, ...``).  Each column is quantized to
    ``bits`` equal-width bins between its bounds (values at/above max
    clamp to the top bin, at/below min to 0, NULL to 0 — documented:
    NULLs cluster with the minimum); the quantized integers are bit-
    interleaved into one non-negative long.

    ``bits × len(bounds)`` must be ≤ 62 (the key must fit a long).
    Pure expression — no shuffle, no data pass; callers that need
    data-driven bounds compute them first (``zorder_layout`` does).
    """
    cols = list(bounds)
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_key: bounds must name >= 1 column")
    if bits < 1 or bits * k > 62:
        raise ValueError(
            f"zorder_key: bits*columns = {bits * k} must be in [1, 62]"
        )
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo, hi = (float(bounds[c][0]), float(bounds[c][1]))
        if hi > lo:
            q = F.floor(
                (F.col(c).cast("double") - F.lit(lo))
                / F.lit(hi - lo)
                * F.lit(float(1 << bits))
            ).cast("long")
            q = F.least(F.greatest(q, F.lit(0)), F.lit(top))
        else:  # degenerate bounds: single bin
            q = F.lit(0).cast("long")
        q = F.coalesce(q, F.lit(0).cast("long"))
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(q, b).bitwiseAND(F.lit(1)),
                    b * k + j,
                )
            )
    return z


def zorder_layout(
    df: DataFrame,
    columns: Sequence[str],
    bits: int = 12,
    num_partitions: int | None = None,
    key_col: str = "zorder_key",
) -> DataFrame:
    """Cluster ``df`` for multi-column scan pruning: compute data-
    driven per-column bounds (ONE min/max aggregate, broadcast back
    as literals), attach the Z-key as ``key_col``, and range-
    repartition on it so each output file covers a compact Z-range —
    write the result and parquet min/max stats prune on every listed
    column.  ``num_partitions`` defaults to the session shuffle
    parallelism.

    Two data passes total (bounds + the range exchange's sampling/
    write); both scale linearly and shuffle once.  Deterministic keys
    — re-running on the same data yields the same layout.
    """
    cols = list(columns)
    if not cols:
        raise ValueError("zorder_layout: columns must be non-empty")
    row = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
            )
        ]
    ).collect()[0]
    bounds = {}
    for c in cols:
        lo, hi = row[f"_lo_{c}"], row[f"_hi_{c}"]
        if lo is None:  # all-NULL column: single bin
            lo, hi = 0.0, 0.0
        bounds[c] = (float(lo), float(hi))
    keyed = df.withColumn(key_col, zorder_key(bounds, bits=bits))
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    return keyed.repartitionByRange(int(n), F.col(key_col))
