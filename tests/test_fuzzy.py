"""Fuzzy join: match semantics, normalization, stop-gram cap, plan."""

import pytest

from moz_datapipeline_spark.operators.fuzzy import fuzzy_join


def test_fuzzy_join_matches_and_misses(spark):
    L = spark.createDataFrame(
        [(1, "Acme Corporation"), (2, "Globex  LLC"), (3, "Initech")],
        "id long, name string",
    )
    R = spark.createDataFrame(
        [(10, "acme corporatien"),   # 1 substitution + case/space noise
         (11, "Globex LLC"),         # whitespace-only difference
         (12, "Umbrella Co"),        # unrelated
         (13, "Initach"),            # 1 substitution
         (14, "Initech Industries")],  # shares grams, far by length
        "rid long, rname string",
    )
    out = {(r.left_id, r.right_id): r.distance
           for r in fuzzy_join(L, R, "name", "rname", "id", "rid",
                               max_distance=2).collect()}
    assert out == {(1, 10): 1, (2, 11): 0, (3, 13): 1}


def test_fuzzy_join_stop_gram_cap_drops_hot_buckets(spark):
    # 60 left × 60 right all share the 'common prefix ' grams; with a
    # low df cap those grams die and only the discriminating tails pair
    L = spark.createDataFrame(
        [(i, f"common prefix item{i:03d}") for i in range(60)],
        "id long, name string",
    )
    R = spark.createDataFrame(
        [(1000 + i, f"common prefix item{i:03d}x") for i in range(60)],
        "rid long, rname string",
    )
    out = fuzzy_join(L, R, "name", "rname", "id", "rid",
                     max_distance=1, max_gram_df=30)
    got = {(r.left_id, r.right_id) for r in out.collect()}
    assert got == {(i, 1000 + i) for i in range(60)}


def test_fuzzy_join_short_string_fallback_and_guards(spark):
    L = spark.createDataFrame([(1, "ab")], "id long, name string")
    R = spark.createDataFrame([(2, "ab"), (3, "zz")],
                              "rid long, rname string")
    out = {(r.left_id, r.right_id)
           for r in fuzzy_join(L, R, "name", "rname", "id", "rid",
                               max_distance=0).collect()}
    assert out == {(1, 2)}  # exact short strings survive the fallback
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy_join(L, R, "name", "rname", "id", "rid", max_distance=-1)
    with pytest.raises(ValueError, match="gram"):
        fuzzy_join(L, R, "name", "rname", "id", "rid", gram=1)


def test_fuzzy_join_is_udf_free(spark):
    L = spark.createDataFrame([(1, "abcdef")], "id long, name string")
    plan = (
        fuzzy_join(L, L, "name", "name", "id", "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_golden_record_survivorship_rules(spark):
    import pytest as _pytest

    from moz_datapipeline_spark.operators.fuzzy import golden_record

    rows = [
        # cluster 1: latest non-null name at ts=3 is None -> falls
        # back to ts=2's "Acme Corp"; mode city ties NYC/SF -> NYC
        (1, 1, "ACME", "NYC", 10.0),
        (1, 2, "Acme Corp", "SF", 20.0),
        (1, 3, None, "NYC", 5.0),
        (1, 3, None, "SF", None),
        # cluster 2: single row
        (2, 9, "Solo", "LA", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "cid int, ts int, name string, city string, amount double"
    )
    out = {
        r.cluster: r
        for r in golden_record(
            df,
            "cid",
            ts_col="ts",
            latest=["name"],
            mode=["city"],
            min_of=["amount"],
            max_of=["ts"],
        ).collect()
    }
    g1 = out[1]
    assert g1.n_members == 4
    assert g1.name == "Acme Corp"  # newest NON-NULL, not ts=3's null
    assert g1.city == "NYC"  # 2-2 tie -> smallest value
    assert g1.amount == 5.0
    assert g1.ts == 3
    g2 = out[2]
    assert (g2.name, g2.city, g2.amount, g2.n_members) == (
        "Solo", "LA", 1.0, 1
    )

    with _pytest.raises(ValueError, match="ts_col"):
        golden_record(df, "cid", latest=["name"])
    with _pytest.raises(ValueError, match="twice"):
        golden_record(
            df, "cid", ts_col="ts", min_of=["amount"], max_of=["amount"]
        )


def test_golden_record_latest_ties_break_by_value(spark):
    from moz_datapipeline_spark.operators.fuzzy import golden_record

    df = spark.createDataFrame(
        [(1, 5, "a"), (1, 5, "z"), (1, 4, "m")],
        "cid int, ts int, v string",
    )
    rows = set()
    for _ in range(3):
        r = golden_record(
            df.repartition(6), "cid", ts_col="ts", latest=["v"]
        ).collect()[0]
        rows.add(r.v)
    assert rows == {"z"}  # same ts -> larger value, every run


def test_sorted_neighborhood_window_semantics(spark):
    import pytest as _pytest

    from moz_datapipeline_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(["ann", "anna", "bob", "bobby", "carl"])],
        "id long, name string",
    )
    out = sorted_neighborhood_pairs(df, "name", "id", window=2).collect()
    pairs = sorted((r.id_a, r.id_b) for r in out)
    # sorted order: ann(0) anna(1) bob(2) bobby(3) carl(4)
    assert pairs == [
        (0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)
    ]
    assert all(r.rank_a < r.rank_b for r in out)
    # exactly window pairs per row except the tail
    with _pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "name", "id", window=0)
