"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row counts, column
sets, and values (order-insensitive, float-tolerant).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


QUERIES = sorted(entry_mod.queries().keys())

# Optional sharding for parallel local runs: SPARK_GRAFT_PARITY_SHARD="i/n"
# selects every n-th query starting at i. Unset (the default, and the
# driver's configuration) runs the full set.
_shard = __import__("os").environ.get("SPARK_GRAFT_PARITY_SHARD")
if _shard:
    _i, _n = (int(x) for x in _shard.split("/"))
    QUERIES = QUERIES[_i::_n]


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, sf_dir)
    spdf = sdf.toPandas()
    assert spdf is not None

    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        # rows-only check, mirroring the driver's weaker path
        assert spdf.shape[0] >= 0
        return

    con = _duck(sf_dir)
    odf = con.execute(oracle).fetchdf()

    assert spdf.shape[0] == odf.shape[0], (
        f"{name}: row count {spdf.shape[0]} vs oracle {odf.shape[0]}"
    )
    assert sorted(spdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(spdf.columns)} vs {sorted(odf.columns)}"
    )
    a, b = _normalize(spdf), _normalize(odf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            av, bv = a[c].to_numpy(), b[c].astype("float64").to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            close = np.isclose(av, bv, rtol=1e-9, atol=1e-12)
            assert bool(np.all(close | both_nan)), (
                f"{name}.{c}: max abs diff "
                f"{np.nanmax(np.abs(av - bv))}"
            )
        else:
            assert a[c].astype(str).tolist() == b[c].astype(str).tolist(), (
                f"{name}.{c}: value mismatch"
            )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
