"""Driver-contract registry consistency."""

import __ray_entry__ as m


def test_registry_shape():
    qs = m.queries()
    sqls = m.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 30
    assert len(sqls) >= 20
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in sqls.items():
        assert isinstance(sql, str) and sql.strip().upper().startswith(("SELECT", "WITH")), name


def test_every_oracle_sql_plans_in_duckdb():
    """EXPLAIN every registered oracle against the testdata views — catches
    SQL bitrot (renamed columns, typos) without running the queries."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf}/{t}.parquet')"
        )
    # core-engine oracles read the synth sequences parquet directly; make
    # sure it exists (queries() materializes it idempotently)
    m.queries()
    for name, sql in m.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"oracle SQL for {name!r} fails to plan: {e}")


def test_registry_has_no_duplicate_names_across_modules():
    from wavelet_decomposition_ray.pipelines.data_queries import DATA_QUERIES
    from wavelet_decomposition_ray.pipelines.queries import CORE_QUERIES

    dup = set(CORE_QUERIES) & set(DATA_QUERIES)
    assert not dup, f"query names defined in both modules: {dup}"
