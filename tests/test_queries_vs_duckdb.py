"""Replicates the driver's correctness gate locally: run every queries()
entry at sf0.01 and hash-compare against its oracle_sql() via DuckDB
(columns sorted by name, rows sorted by all columns, values compared)."""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.isfile(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


@pytest.fixture(scope="module")
def registry(ray_session):
    return entrymod.queries(), entrymod.oracle_sql()


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


SQL_CHECKED = sorted(
    k for k in entrymod.oracle_sql()
)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(registry, con, name):
    qs, sqls = registry
    got = _canon(_to_pandas(qs[name](SF_DIR)))
    want = _canon(con.sql(sqls[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name} columns: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows: {len(got)} vs {len(want)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            np.testing.assert_allclose(
                a.astype(float), b.astype(float), rtol=0, atol=1e-9,
                err_msg=f"{name}.{c}"
            )
        else:
            same = (a == b)
            assert same.all(), (
                f"{name}.{c}: {int((~same).sum())} mismatches; "
                f"first at {np.nonzero(~same)[0][:3]}"
            )


@pytest.mark.parametrize("name", sorted(set(entrymod.queries()) - set(SQL_CHECKED)))
def test_rows_only_queries_run(registry, name):
    qs, _ = registry
    df = _to_pandas(qs[name](SF_DIR))
    assert len(df) > 0, f"{name} returned no rows"
