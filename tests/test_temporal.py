"""As-of join edge semantics."""

from __future__ import annotations


def test_asof_backward_inclusive(spark):
    from moz_datapipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "k", 100, "a"), (2, "k", 200, "b"), (3, "k", 50, "c")],
        "id int, key string, ts long, payload string",
    )
    right = spark.createDataFrame(
        [("k", 100, 1.0), ("k", 150, 2.0), ("k", 999, 9.0)],
        "key string, ts long, v double",
    )
    out = (
        asof_join(left, right, key="key", ts="ts", right_value_cols=["v"])
        .toPandas()
        .set_index("id")
    )
    # ts=100 matches the right row AT 100 (inclusive)
    assert out.loc[1, "v_right"] == 1.0 and out.loc[1, "ts_right"] == 100
    # ts=200: latest at-or-before is 150
    assert out.loc[2, "v_right"] == 2.0
    # ts=50: nothing before → nulls
    assert out.loc[3, "v_right"] != out.loc[3, "v_right"] or out.loc[3, "v_right"] is None


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof (backward,
    inclusive) — the de-facto reference semantics."""
    import numpy as np
    import pandas as pd

    from moz_datapipeline_spark.operators.temporal import asof_join

    rng = np.random.RandomState(11)
    left_pd = pd.DataFrame(
        {
            "id": range(200),
            "key": [f"k{int(x)}" for x in rng.randint(0, 5, 200)],
            "ts": rng.randint(0, 10_000, 200).astype("int64"),
            "payload": ["p"] * 200,
        }
    )
    right_pd = pd.DataFrame(
        {
            "key": [f"k{int(x)}" for x in rng.randint(0, 5, 300)],
            "ts": rng.randint(0, 10_000, 300).astype("int64"),
            "v": rng.rand(300),
        }
    ).drop_duplicates(["key", "ts"])  # unique (key, ts): no tie ambiguity

    got = (
        asof_join(
            spark.createDataFrame(left_pd),
            spark.createDataFrame(right_pd),
            key="key",
            ts="ts",
            right_value_cols=["v"],
        )
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left_pd.sort_values("ts"),
        right_pd.sort_values("ts"),
        on="ts",
        by="key",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("id").reset_index(drop=True)
    a = got["v_right"].to_numpy()
    b = want["v"].to_numpy()
    both_nan = np.isnan(a) & np.isnan(b)
    assert bool(np.all(np.isclose(a, b) | both_nan))


def test_asof_null_in_matched_row_is_carried(spark):
    """If the MATCHED (latest) right row holds a NULL value, that NULL is
    carried — not an older non-null value (merge_asof semantics; carrying
    columns independently with ignorenulls would get this wrong)."""
    from moz_datapipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "k", 300, "x")], "id int, key string, ts long, payload string"
    )
    right = spark.createDataFrame(
        [("k", 100, 1.0), ("k", 200, None)], "key string, ts long, v double"
    )
    row = asof_join(
        left, right, key="key", ts="ts", right_value_cols=["v"]
    ).collect()[0]
    assert row["v_right"] is None          # the ts=200 row's NULL, not 1.0
    assert row["ts_right"] == 200          # ...and ts comes from the same row


def test_asof_duplicate_right_ts_deterministic(spark):
    """Duplicate right timestamps on a key resolve to the greatest carried
    struct — stable across partition layouts and repeated runs."""
    from moz_datapipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "k", 500, "x")], "id int, key string, ts long, payload string"
    )
    right = spark.createDataFrame(
        [("k", 100, 1.0), ("k", 100, 7.0), ("k", 100, 3.0)],
        "key string, ts long, v double",
    )
    vals = set()
    for _ in range(3):
        row = asof_join(
            left, right.repartition(8), key="key", ts="ts",
            right_value_cols=["v"],
        ).collect()[0]
        vals.add(row["v_right"])
    assert vals == {7.0}


def test_asof_keys_isolated(spark):
    from moz_datapipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "a", 100, "x"), (2, "b", 100, "y")],
        "id int, key string, ts long, payload string",
    )
    right = spark.createDataFrame(
        [("a", 10, 5.0)], "key string, ts long, v double"
    )
    out = asof_join(left, right, key="key", ts="ts", right_value_cols=["v"])
    rows = {r["id"]: r["v_right"] for r in out.collect()}
    assert rows[1] == 5.0
    assert rows[2] is None  # other key never sees a's rows


def test_ewma_smooth_matches_recursion(spark):
    from datetime import datetime, timedelta

    import pytest as _pytest

    from moz_datapipeline_spark.operators.temporal import ewma_smooth

    base = datetime(2024, 3, 1)
    rows = [
        (i, base + timedelta(hours=i), "m", float(v))
        for i, v in enumerate([10.0, 20.0, 30.0, 40.0])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = sorted(ewma_smooth(df, alpha=0.5).collect(), key=lambda r: r.bucket_epoch)
    # s: 10, 15, 22.5, 31.25
    assert [r.ewma for r in out] == [10.0, 15.0, 22.5, 31.25]
    with _pytest.raises(ValueError):
        ewma_smooth(df, alpha=0.0)
