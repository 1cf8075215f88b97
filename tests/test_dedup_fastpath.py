"""The xxhash64 fast path must be a drop-in for the portable md5 path.

The md5 hashing exists only so DuckDB oracles can replay the pipelines;
production flips ``portable_hash=False`` for ~2× less hash CPU. Hash
choice changes WHICH pairs surface as candidates, never the verification
semantics — so on a corpus of strong near-dups (where both paths' recall
is ~1) the VERIFIED pair sets must coincide exactly.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def corpus(spark):
    base = [
        " ".join(f"tok{i}_{j}" for j in range(30)) for i in range(40)
    ]
    rows = []
    for i, text in enumerate(base):
        rows.append((i, text))
        # strong near-dup: drop one middle word
        toks = text.split()
        rows.append((1000 + i, " ".join(toks[:15] + toks[16:])))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _verified_minhash(corpus, portable):
    from moz_datapipeline_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    sigs = minhash_signatures(corpus, portable_hash=portable)
    cands = minhash_lsh_candidates(sigs, portable_hash=portable)
    out = ngram_jaccard_pairs(corpus, cands, threshold=0.8).toPandas()
    return set(zip(out.id_a, out.id_b))


def test_minhash_fast_path_matches_portable(spark, corpus):
    slow = _verified_minhash(corpus, True)
    fast = _verified_minhash(corpus, False)
    truth = {(i, 1000 + i) for i in range(40)}
    assert truth <= slow
    assert fast == slow


def test_simhash_fast_path_matches_portable(spark):
    """Simhash votes over DISTINCT tokens, so duplicates that preserve
    the token set (drop a repeated word, reorder) have Hamming 0 — the
    regime the chunk-bucket recall guarantee covers. Both hash paths
    must find all such pairs."""
    from moz_datapipeline_spark.operators.dedup import (
        simhash,
        simhash_candidates,
    )

    rows = []
    for i in range(40):
        toks = [f"tok{i}_{j}" for j in range(30)]
        rows.append((i, " ".join(toks + [toks[5]])))      # tok5 twice
        rows.append((1000 + i, " ".join(toks)))           # repeat dropped
    corpus = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(portable):
        sig = simhash(corpus, portable_hash=portable)
        out = simhash_candidates(sig).toPandas()
        return set(
            zip(out[out.hamming <= 3].id_a, out[out.hamming <= 3].id_b)
        )

    truth = {(i, 1000 + i) for i in range(40)}
    slow, fast = pairs(True), pairs(False)
    assert truth <= slow
    assert truth <= fast
