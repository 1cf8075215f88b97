"""PMI collocation mining (operators/corpus.pmi_collocations)."""

from __future__ import annotations

import collections
import math

from moz_datapipeline_spark.operators.corpus import pmi_collocations


def _ref_pmi(texts, min_count, lowercase=True):
    uni = collections.Counter()
    pairs = collections.Counter()
    for s in texts:
        if s is None:
            continue
        t = [w for w in (s.lower() if lowercase else s).split(" ") if w]
        uni.update(t)
        pairs.update(zip(t, t[1:]))
    nu = float(sum(uni.values()))
    nb = float(sum(pairs.values()))
    out = {}
    for (a, b), c in pairs.items():
        if c >= min_count:
            out[(a, b)] = math.log(
                (c / nb) / ((uni[a] / nu) * (uni[b] / nu))
            )
    return out


def test_pmi_matches_reference_counts(spark):
    texts = [
        "hong kong is far from new york",
        "new york and Hong Kong",
        "hong kong hong kong",
        "the the the the",
        None,
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r.w1, r.w2): (r.pair_count, r.pmi)
        for r in pmi_collocations(df, min_count=2).collect()
    }
    want = _ref_pmi(texts, 2)
    assert set(got) == set(want)
    for k, pmi in want.items():
        assert abs(got[k][1] - pmi) < 1e-9
    # "hong kong" appears 4x (lowercased); "the the" 3x
    assert got[("hong", "kong")][0] == 4
    assert got[("the", "the")][0] == 3
    # a perfectly predictive pair has higher PMI than a self-pair of a
    # frequent word
    assert got[("hong", "kong")][1] > got[("the", "the")][1]


def test_pmi_min_count_prunes_before_join(spark):
    df = spark.createDataFrame(
        [("a b",), ("a b",), ("c d",)], "text string"
    )
    rows = pmi_collocations(df, min_count=2).collect()
    assert [(r.w1, r.w2, r.pair_count) for r in rows] == [("a", "b", 2)]
