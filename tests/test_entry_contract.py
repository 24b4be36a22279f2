"""Replicates the driver's correctness gate locally: every queries()
entry runs in Spark AND its oracle_sql() runs in DuckDB on the same
parquet; row counts, column names, and values must match."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
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
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(
            df[c].dropna().iloc[0] if df[c].notna().any() else None, object
        ):
            # Decimal -> float for comparison
            import decimal

            if df[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
                df[c] = df[c].astype(float)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLED = sorted(set(E.queries()) & set(E.oracle_sql()))
ROWS_ONLY = sorted(set(E.queries()) - set(E.oracle_sql()))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    got = normalize(E.queries()[name](spark, SF_DIR).toPandas())
    want = normalize(duck.sql(E.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        got.columns,
        want.columns,
    )
    assert len(got) == len(want), (name, len(got), len(want))
    for c in got.columns:
        g, w = got[c], want[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(
            w.dtype, np.floating
        ):
            assert np.allclose(
                g.astype(float), w.astype(float), atol=1e-9, equal_nan=True
            ), f"{name}.{c}: max diff {np.abs(g.astype(float) - w.astype(float)).max()}"
        else:
            assert g.astype(str).tolist() == w.astype(str).tolist(), (
                f"{name}.{c} differs"
            )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = E.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.limit(5).count() > 0
