"""Replicates the driver's correctness gate: run every queries() entry and
hash-compare against its oracle_sql() via DuckDB (columns sorted by name,
rows sorted by all columns, values compared).

The bulk of the matrix runs at sf0.001 (the SQL's pinned sf0.01 synth path
is rewritten to the sf0.001 one — both sides still see identical bytes); a
few representative queries re-run at the driver's real sf0.01 config so the
exact gate configuration stays covered without a 10-minute suite.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SMALL_SF = "/root/testdata/sf0.001"
DRIVER_SF = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _connect(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isfile(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


@pytest.fixture(scope="module")
def con_small():
    return _connect(SMALL_SF)


@pytest.fixture(scope="module")
def con_driver():
    return _connect(DRIVER_SF)


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


def _compare(name, got, want):
    got, want = _canon(got), _canon(want)
    assert list(got.columns) == list(want.columns), (
        f"{name} columns: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows: {len(got)} vs {len(want)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        # Mirror the driver's dtype-sensitive hash gate: an engine integer
        # column against a DuckDB float/object (e.g. HUGEINT sum) column is a
        # failure even when values match (round-1 events_rollup_w4 escape).
        kinds = {a.dtype.kind, b.dtype.kind}
        assert not (kinds & {"i", "u"} and kinds & {"f", "O"}), (
            f"{name}.{c}: dtype kind mismatch {a.dtype} vs {b.dtype} "
            "(oracle SQL likely missing a CAST)"
        )
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            np.testing.assert_allclose(a.astype(float), b.astype(float),
                                       rtol=0, atol=1e-9, err_msg=f"{name}.{c}")
        else:
            same = a == b
            assert same.all(), (
                f"{name}.{c}: {int((~same).sum())} mismatches at "
                f"{np.nonzero(~same)[0][:3]}"
            )


SQL_CHECKED = sorted(entrymod.oracle_sql())
DRIVER_SPOT = ["rollup_t3", "source_stats", "epn_full", "ngram_jaccard"]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle_small(registry, con_small, name):
    qs, sqls = registry
    got = _to_pandas(qs[name](SMALL_SF))
    sql = sqls[name].replace("/tmp/graft_synth/sf0.01/", "/tmp/graft_synth/sf0.001/")
    want = con_small.sql(sql).df()
    _compare(name, got, want)


@pytest.mark.parametrize("name", DRIVER_SPOT)
def test_query_matches_oracle_driver_sf(registry, con_driver, name):
    qs, sqls = registry
    got = _to_pandas(qs[name](DRIVER_SF))
    want = con_driver.sql(sqls[name]).df()
    _compare(name, got, want)


@pytest.mark.parametrize("name", sorted(set(entrymod.queries()) - set(SQL_CHECKED)))
def test_rows_only_queries_run(registry, name):
    qs, _ = registry
    df = _to_pandas(qs[name](SMALL_SF))
    assert len(df) > 0, f"{name} returned no rows"
