"""Deduplication operators for training-data pipelines.

Designed for 100 TB document corpora: every method is
candidate-generation → pair-verify, never an all-pairs cross join.

- ``exact_dedup``        — hash-groupBy on normalized content; one
  shuffle on a 16-byte key, keeps min(doc_id) deterministically.
- ``minhash_signatures`` / ``minhash_lsh_dedup`` — shingle → minhash →
  band-bucket join. Permutations are the classic ``(a·h + b) mod p``
  family over xxhash64 shingle hashes — fully deterministic, computed
  with array HOFs (no UDF).
- ``simhash``            — 64-bit simhash over token hashes via bit-vote
  aggregation in array space.
- ``ngram_jaccard_pairs`` — verify candidate pairs with exact token/
  shingle Jaccard using array_intersect/array_union sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 31-bit Mersenne prime: keeps a*h+b < 2^62, safe under ANSI long arithmetic
_MERSENNE_P = (1 << 31) - 1


def _normalized(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One survivor per distinct normalized text: (content_hash, keep_id, n_dups)."""
    h = F.md5(_normalized(F.col(text_col)))
    return (
        df.select(h.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def shingles(text: Column | str, k: int = 3) -> Column:
    """Array of k-token shingle strings (whitespace tokens, lowercased)."""
    t = F.col(text) if isinstance(text, str) else text
    toks = F.split(_normalized(t), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
    )).otherwise(F.array(F.array_join(toks, " ")))


def _minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family."""
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (_MERSENNE_P - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MERSENNE_P
        params.append((a, b))
    return params


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, signature array<long>) — min over shingles of (a·h+b) mod p per hash.

    All array HOFs: the shingle array never leaves the JVM and the row
    stays narrow (id + num_hashes longs) into the LSH shuffle.
    """
    sh = shingles(text_col, shingle_k)
    base = df.select(
        F.col(id_col),
        # reduce the 64-bit shingle hash into [0, p) so a*h+b stays < 2^62
        F.transform(
            sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_P))
        ).alias("_h"),
    )

    def _perm(a: int, b: int):
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE_P))

    sig_cols = []
    for i, (a, b) in enumerate(_minhash_params(num_hashes)):
        sig_cols.append(
            F.array_min(F.transform(F.col("_h"), _perm(a, b))).alias(f"mh_{i}")
        )
    return base.select(id_col, F.array(*sig_cols).alias("signature"))


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signature, hash each band, bucket-join → candidate pairs.

    The join is an equi join on (band_idx, band_hash) — co-located by
    the shuffle, skew-split by AQE. Output: (id_a < id_b) pairs.
    """
    num_hashes = bands  # rows per band derived from signature length at runtime
    banded = sigs.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col("signature"),
                                b * (F.size(F.col("signature")) / bands).cast("int") + 1,
                                (F.size(F.col("signature")) / bands).cast("int"),
                            ),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Verify candidate pairs with exact shingle Jaccard; keep >= threshold."""
    sh = df.select(
        F.col(id_col), F.array_distinct(shingles(text_col, shingle_k)).alias("_sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sa"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_sb"))
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sa", "_sb"))
            / F.size(F.array_union("_sa", "_sb")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit simhash: per-token hash bit-votes folded in array space.

    For each bit position i the vote is (#tokens with bit set) −
    (#tokens with bit clear); the signature sets bit i when the vote is
    positive. Each position is a filter/size over the token-hash array —
    64 JVM-side HOFs per row, no Python.

    Near-dups differ in few bits; pair detection buckets on bit-chunks
    (4×16-bit chunks ⇒ Hamming ≤ 3 guaranteed candidate recall).
    """
    toks = F.array_distinct(F.split(_normalized(F.col(text_col)), " "))
    th = F.transform(toks, lambda t: F.xxhash64(t))
    base = df.select(F.col(id_col), th.alias("_th"), F.size(th).alias("_n"))

    def _bit_vote(i: int):
        # shiftright amount must be a Python int; i is loop-bound here
        set_count = F.size(
            F.filter(
                F.col("_th"),
                lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1,
            )
        )
        return set_count * 2 - F.col("_n")

    sig = F.lit(0).cast("long")
    for i in range(bits):
        mask = (1 << i) if i < 63 else -(1 << 63)
        sig = sig.bitwiseOR(
            F.when(_bit_vote(i) > 0, F.lit(mask).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return base.select(F.col(id_col), sig.alias("simhash"))


def simhash_candidates(sig_df: DataFrame, id_col: str = "doc_id", chunks: int = 4) -> DataFrame:
    """Bucket simhashes by 16-bit chunks; pairs sharing any chunk are candidates."""
    width = 64 // chunks
    mask = (1 << width) - 1
    exploded = sig_df.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
                    for i in range(chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("_sa"),
            F.col("b.simhash").alias("_sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return pairs.withColumn("hamming", hamming).drop("_sa", "_sb")
