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
