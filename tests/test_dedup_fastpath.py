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


def test_ngram_containment_detects_excerpt(spark):
    """A short quote fully inside a long page: Jaccard is tiny but
    one-sided containment is 1.0 — the asymmetric detector must flag
    it, and report near-identity as both-sided."""
    from moz_datapipeline_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    page = " ".join(f"w{i}" for i in range(200)) + " " + quote + " " + " ".join(
        f"z{i}" for i in range(200)
    )
    docs = spark.createDataFrame(
        [(1, page), (2, quote), (3, quote + " extra")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
        for r in ngram_containment_pairs(
            docs, cands, shingle_k=3, threshold=0.9
        ).collect()
    }
    # quote (doc 2, the "a" side is id 1=page): containment_b = 1.0
    assert (1, 2) in got
    ca, cb = got[(1, 2)]
    assert cb == 1.0 and ca < 0.1
    # near-identical docs 2 and 3: both sides high
    ca23, cb23 = got[(2, 3)]
    assert ca23 == 1.0 and cb23 >= 0.85
    # Jaccard at the same threshold misses the excerpt pair
    jac = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs, cands, shingle_k=3, threshold=0.9
        ).collect()
    }
    assert (1, 2) not in jac
