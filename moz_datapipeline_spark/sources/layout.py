"""Physical data layout for scan pruning and shuffle-free joins.

At 100 TB the fastest shuffle is the one the layout already did:

- **Bucketed tables** hash-partition rows into a fixed number of files
  per partition at WRITE time; two tables bucketed on the same key and
  count then join with NO exchange on either side — the join becomes a
  per-bucket merge, the Spark-native equivalent of the co-located join
  every warehouse engine builds around.  Worth it for fact tables that
  are joined on the same key by many downstream queries (the reference
  re-joins its ways table by way_id in nearly every script —
  scripts/criticality/criticality.sh, scripts/eaul/*).
- **Z-order clustering** sorts rows along an interleaved-bit
  space-filling curve over two dimensions, so parquet row-group
  min/max stats become selective for BOTH columns at once: a range
  predicate on either dimension prunes most row groups.  The curve
  value is plain integer arithmetic (bit interleave), computed
  JVM-side and replayable in ANSI SQL.

Reference parity: extension surface — the reference leans on external
tooling for layout (tippecanoe tiling, S3 object naming); here layout
is a first-class operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and by default
    sorted) by ``key``.  Joins between tables bucketed on the same key
    with the same bucket count skip the exchange on both sides
    (pinned by ``test_layout``)."""
    if num_buckets < 1:
        raise ValueError("write_bucketed: num_buckets must be >= 1")
    w = df.write.format("parquet").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").saveAsTable(table)


def zorder_value(*cols: str, bits: int = 21) -> Column:
    """Interleaved-bit Z-curve value of n ≥ 2 non-negative int columns
    (column i occupies bit positions n·k + i): pure codegen integer
    arithmetic, identical expression in ANSI SQL for the oracle.  The
    two-column case lands x in the even positions and y in the odd —
    byte-identical to the historical 2-D form.  ``len(cols) * bits``
    must stay ≤ 63 to fit a signed 64-bit long (the default 21 bits
    supports up to 3 columns; pass a smaller ``bits`` for more).

    ``cols`` are column NAMES — they are backtick-quoted before being
    spliced into the SQL (names with spaces, dots, or dashes resolve
    as the column, not as an expression).  The variable bit-shift
    inside the fold exists only in the SQL surface, so the expression
    is built with ``F.expr`` rather than the Column DSL."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_value: need at least 2 columns")
    if bits < 1:
        raise ValueError("zorder_value: bits must be >= 1")
    if n * bits > 63:
        raise ValueError(
            f"zorder_value: {n} columns x {bits} bits = {n * bits} result "
            "bits > 63; lower bits (or split the curve) to stay in a "
            "signed 64-bit long"
        )

    def _q(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    terms = "".join(
        f" + (((CAST({_q(c)} AS BIGINT) >> k) & 1) << ({n}*k+{i}))"
        for i, c in enumerate(cols)
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, k) -> acc{terms})"
    )


def zorder_layout(
    df: DataFrame,
    *cols: str,
    bits: int = 21,
    num_partitions: int | None = None,
    z_col: str = "zvalue",
) -> DataFrame:
    """Cluster ``df`` along the Z-curve of ``cols``: range-partition on
    the curve value, sort within partitions, keep the curve value in
    ``z_col`` so writers can drop or persist it.  Row content is
    unchanged — this is purely physical order."""
    with_z = df.withColumn(z_col, zorder_value(*cols, bits=bits))
    parts = [num_partitions] if num_partitions else []
    return with_z.repartitionByRange(*parts, z_col).sortWithinPartitions(
        z_col
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-style directory partitioning: one directory level per
    partition column.  A filter on a partition column prunes entire
    directories at PLANNING time (`PartitionFilters` in the scan) —
    the scan never lists, opens, or reads the excluded partitions,
    which is the first-order I/O lever for time- or tenant-sliced
    100 TB datasets."""
    if not partition_cols:
        raise ValueError("write_partitioned: need at least one partition column")
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
