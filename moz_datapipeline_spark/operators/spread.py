"""Input-parallelism guard for CPU-heavy narrow stages.

Spark parallelizes a scan by input SPLIT: a large parquet file splits
at ``spark.sql.files.maxPartitionBytes``, but a corpus that arrives as
a few small files (one file per export batch is common) yields a few
tasks no matter how wide the cluster — and every downstream NARROW
stage (shingle builds, tokenization, hashing, per-row HOF folds)
inherits that width.  The shuffle-bearing operators here recover at
their first exchange; the expensive part is everything BEFORE it.

``spread_small_scan`` fixes exactly that case and nothing else: when
the frame has fewer partitions than half the cluster's parallelism it
hash-repartitions on the row key (cost: one shuffle of the small
input — by construction only taken when the input IS small); at real
scale the scan already has thousands of splits and the call is a
no-op, so it can never introduce a full-corpus shuffle of raw text.

``df.rdd.getNumPartitions()`` analyzes the plan but runs no job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_small_scan(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-repartition ``df`` on ``key_col`` to cluster width IFF it
    currently has fewer partitions than half the default parallelism;
    identity otherwise."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target, F.col(key_col))
    return df
