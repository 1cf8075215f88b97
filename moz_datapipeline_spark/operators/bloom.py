"""Bloom-filter prefilter for selective semi joins.

At 100 TB the expensive part of ``fact SEMI JOIN dim`` with a
non-broadcastable ``dim`` is shuffling every fact row to its join
partition, only for most of them to miss.  The standard fix (Spark's own
runtime-bloom-filter rewrite applies it when statistics let it) is a
row-level Bloom membership test pushed to the fact SCAN, dropping the
misses before the exchange.  This operator is the explicit form:

1. the filter is BUILT distributed — each dim key sets ``num_hashes``
   bit positions (JVM-side ``xxhash64`` with per-hash salt), and only
   the DISTINCT positions are aggregated back, so the driver transfer
   is bounded by ``num_bits`` (128 KiB at the default 2^20) no matter
   how large ``dim`` is;
2. the bitmap broadcasts once; the membership test is a vectorized
   Arrow-batched pandas UDF over bit positions already computed
   JVM-side (numpy gather + AND — no per-row Python);
3. survivors (true matches + Bloom false positives) go through the
   EXACT semi join, so the result is bit-identical to
   ``fact.join(dim, key, "left_semi")`` — the Bloom stage only thins
   the exchange.

Reference parity: the prefilter-then-exact idiom is the reference's own
bridge-snap design (scripts/prep-bridge/prep-bridge.js:91-106 — cheap
key prefilter, exact check on survivors), re-expressed as a join-volume
optimisation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _bit_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """``num_hashes`` independent bit positions for one key, JVM-side."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)).cast("long")
        for i in range(num_hashes)
    ]


def build_bloom_bitmap(
    dim: DataFrame,
    key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> bytes:
    """Distributed Bloom build: aggregate the distinct set bit
    positions (≤ ``num_bits`` rows regardless of |dim|) and pack them
    into a bitmap on the driver."""
    if num_bits <= 0 or num_bits % 8:
        raise ValueError("num_bits must be a positive multiple of 8")
    pos = (
        dim.select(
            F.explode(
                F.array(*_bit_positions(F.col(key), num_bits, num_hashes))
            ).alias("bit")
        )
        .distinct()
        .toPandas()["bit"]
        .to_numpy()
    )
    bits = np.zeros(num_bits // 8, dtype=np.uint8)
    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits.tobytes()


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    bitmap: bytes | None = None,
) -> DataFrame:
    """``fact SEMI JOIN dim`` with a Bloom prefilter ahead of the
    exchange.  Result equals ``fact.join(dim, key, "left_semi")``
    exactly; the Bloom stage is invisible to semantics.

    NOT lazy: the bitmap build runs Spark jobs at CALL time (one scan
    of ``dim`` here, plus a second inside the exact semi join when the
    result is executed) — unlike the rest of this package, which only
    constructs plans.  Callers assembling plans speculatively should
    either call this at execution time or pass ``bitmap=`` with a
    prebuilt ``build_bloom_bitmap`` result, which makes this function
    plan-only.  A prebuilt bitmap MUST have been built with the same
    ``num_bits`` AND ``num_hashes`` as this call: probe positions are
    computed mod ``num_bits``, so a size mismatch would silently turn
    into false negatives (dropped true matches) — the length is
    checked here; ``num_hashes`` cannot be recovered from the bytes, so
    it is on the caller."""
    dim_key = dim_key or fact_key
    if bitmap is None:
        bitmap = build_bloom_bitmap(dim, dim_key, num_bits, num_hashes)
    elif len(bitmap) * 8 != num_bits:
        raise ValueError(
            f"prebuilt bitmap covers {len(bitmap) * 8} bits but the call "
            f"asked for num_bits={num_bits}; probing mod the wrong size "
            "produces silent Bloom false negatives — pass the num_bits "
            "(and num_hashes) the bitmap was built with"
        )
    bc = fact.sparkSession.sparkContext.broadcast(bitmap)

    @pandas_udf("boolean")
    def _might_contain(*pos_cols: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        ok = np.ones(len(pos_cols[0]), dtype=bool)
        for p in pos_cols:
            idx = p.to_numpy()
            ok &= (bits[idx >> 3] >> (idx & 7) & 1).astype(bool)
        return pd.Series(ok)

    pos = _bit_positions(F.col(fact_key), num_bits, num_hashes)
    survivors = fact.filter(_might_contain(*pos))
    return survivors.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )
