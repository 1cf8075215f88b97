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


class TestSetSimilarityJoin:
    """Exact AllPairs/prefix-filter Jaccard join (dedup.set_similarity_join)."""

    def _brute(self, rows, t):
        import itertools
        import re

        sets = {
            i: set(re.sub(r"\s+", " ", s.lower().strip()).split(" ")) - {""}
            for i, s in rows
        }
        out = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            uni = len(sa | sb)
            if inter >= t * uni:
                out[(a, b)] = (inter, uni)
        return out

    def test_matches_bruteforce(self, spark):
        from moz_datapipeline_spark.operators.dedup import set_similarity_join

        words = [f"w{i}" for i in range(30)]
        rows = []
        for i in range(60):
            base = [words[(i * 7 + j) % 30] for j in range(8)]
            rows.append((i, " ".join(base)))
        # planted near-dups: doc 100+i shares 7 of 8 tokens with doc i
        for i in range(10):
            base = [words[(i * 7 + j) % 30] for j in range(7)] + ["extra"]
            rows.append((100 + i, " ".join(base)))
        rows.append((500, ""))          # empty doc drops out
        rows.append((501, "   "))       # whitespace-only too
        df = spark.createDataFrame(rows, "doc_id long, text string")

        for t in (0.5, 0.7, 0.9, 1.0):
            got = {
                (r.id_a, r.id_b): (r.intersection, r.union_size)
                for r in set_similarity_join(df, t).collect()
            }
            assert got == self._brute(rows, t), f"threshold {t}"

    def test_exact_duplicates_at_threshold_one(self, spark):
        from moz_datapipeline_spark.operators.dedup import set_similarity_join

        df = spark.createDataFrame(
            [(1, "a b c"), (2, "c  B a".lower()), (3, "a b d")],
            "doc_id long, text string",
        )
        got = set_similarity_join(df, 1.0).collect()
        assert [(r.id_a, r.id_b, r.jaccard) for r in got] == [(1, 2, 1.0)]

    def test_rejects_bad_threshold(self, spark):
        import pytest

        from moz_datapipeline_spark.operators.dedup import set_similarity_join

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="threshold"):
            set_similarity_join(df, 0.0)
        with pytest.raises(ValueError, match="threshold"):
            set_similarity_join(df, 1.5)

    def test_shingle_mode_matches_bruteforce(self, spark):
        import itertools
        import re

        from moz_datapipeline_spark.operators.dedup import set_similarity_join

        words = [f"w{i}" for i in range(12)]
        rows = []
        for i in range(25):
            toks = [words[(i * 5 + j) % 12] for j in range(9)]
            rows.append((i, " ".join(toks)))
        for i in range(6):  # near-dup with one word swapped
            toks = [words[(i * 5 + j) % 12] for j in range(9)]
            toks[4] = "swapped"
            rows.append((200 + i, " ".join(toks)))
        rows.append((300, "a b"))  # shorter than k -> single-shingle doc
        df = spark.createDataFrame(rows, "doc_id long, text string")

        def sets_of(s, k=3):
            t = re.sub(r"\s+", " ", s.lower().strip()).split(" ")
            if len(t) >= k:
                els = {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}
            else:
                els = {" ".join(t)}
            return els - {""}

        t = 0.6
        sets = {i: sets_of(s) for i, s in rows}
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            uni = len(sa | sb)
            if inter >= t * uni:
                want[(a, b)] = (inter, uni)
        got = {
            (r.id_a, r.id_b): (r.intersection, r.union_size)
            for r in set_similarity_join(df, t, shingle_k=3).collect()
        }
        assert got == want
