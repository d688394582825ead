"""Parsed OGR-SQL entry point (gdal_ray/sql.py) vs DuckDB on the testdata."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _run_both(sql, con, ray_session):
    from gdal_ray.sql import execute_sql

    got = execute_sql(sql, SF).to_pandas().reset_index(drop=True)
    want = con.sql(sql).df().reset_index(drop=True)
    assert [c.lower() for c in got.columns] == [c.lower() for c in want.columns]
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(np.asarray(w).dtype, np.number):
            assert np.allclose(np.asarray(g, dtype=np.float64),
                               np.asarray(w, dtype=np.float64), rtol=1e-12), c
        else:
            assert (g.astype(str) == w.astype(str)).all(), c
    return got


QUERIES = [
    "SELECT p_brand, COUNT(*) AS n, AVG(p_size) AS a FROM part "
    "WHERE p_type LIKE '%DAR%' AND p_size BETWEEN 5 AND 40 "
    "GROUP BY p_brand ORDER BY p_brand",
    "SELECT o_orderkey, o_totalprice * 2 + 1 AS dbl FROM orders "
    "WHERE o_totalprice > 100000 ORDER BY dbl DESC, o_orderkey ASC LIMIT 7",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem "
    "ORDER BY l_returnflag, l_linestatus",
    "SELECT COUNT(*) AS n, AVG(c_acctbal) AS avg_bal, MIN(c_custkey) AS mn "
    "FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')",
    "SELECT n_name FROM nation WHERE n_regionkey = 2 AND NOT n_name LIKE 'A%' "
    "ORDER BY n_name",
    "SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 3 "
    "ORDER BY s_suppkey LIMIT 5",
    "SELECT r_name FROM region WHERE r_name IS NOT NULL ORDER BY r_name",
    # hidden ORDER BY column (not in the select list)
    "SELECT c_name FROM customer WHERE c_custkey <= 20 ORDER BY c_acctbal DESC",
]


@pytest.mark.parametrize("sql", QUERIES)
def test_sql_matches_duckdb(sql, con, ray_session):
    _run_both(sql, con, ray_session)


STRFN_QUERIES = [
    "SELECT UPPER(n_name) AS u, LENGTH(n_name) AS l FROM nation ORDER BY u",
    "SELECT CONCAT(r_name, '-', CAST(r_regionkey AS VARCHAR)) AS tag "
    "FROM region ORDER BY tag",
    "SELECT SUBSTR(c_name, 1, 8) AS pre FROM customer "
    "WHERE c_custkey <= 10 ORDER BY pre",
    "SELECT CAST(o_orderkey AS FLOAT) AS p FROM orders "
    "WHERE o_orderkey <= 32 ORDER BY p",
]


@pytest.mark.parametrize("sql", STRFN_QUERIES)
def test_sql_string_functions(sql, con, ray_session):
    _run_both(sql, con, ray_session)


def test_select_star(con, ray_session):
    got = _run_both("SELECT * FROM region ORDER BY r_regionkey", con, ray_session)
    assert list(got.columns) == ["r_regionkey", "r_name"]


JOIN_QUERIES = [
    "SELECT n_name, r_name FROM nation LEFT JOIN region "
    "ON nation.n_regionkey = region.r_regionkey ORDER BY n_name",
    "SELECT r_name, COUNT(*) AS n FROM nation LEFT JOIN region "
    "ON nation.n_regionkey = region.r_regionkey GROUP BY r_name ORDER BY r_name",
    "SELECT c_name, n_name FROM customer LEFT JOIN nation "
    "ON customer.c_nationkey = nation.n_nationkey "
    "WHERE customer.c_custkey <= 25 ORDER BY c_name",
]


@pytest.mark.parametrize("sql", JOIN_QUERIES)
def test_sql_join_matches_duckdb(sql, con, ray_session):
    _run_both(sql, con, ray_session)


def test_parser_rejects_unsupported(ray_session):
    from gdal_ray.sql import SQLError, execute_sql

    for bad, msg in [
        ("SELECT a FROM nowhere", "unknown table"),
        ("SELECT n_name FROM nation JOIN region ON bad", "JOIN condition"),
        ("SELECT COUNT(*) FROM nation HAVING 1", "HAVING"),
        ("SELECT missing_col FROM nation", "unknown column"),
    ]:
        with pytest.raises(SQLError, match=msg):
            execute_sql(bad, SF).to_pandas()


def test_cast_float_to_int_truncates_like_ogr(ray_session):
    """OGR's swq CAST(float AS integer) is a C truncation, not a round
    (unlike DuckDB, which rounds) — pin the OGR semantics."""
    from gdal_ray.sql import execute_sql

    got = execute_sql(
        "SELECT CAST(o_totalprice AS INTEGER) AS p FROM orders "
        "WHERE o_orderkey <= 6 ORDER BY p", SF
    ).to_pandas()
    import pyarrow.parquet as pq
    df = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]).to_pandas()
    want = sorted(int(v) for v in df[df["o_orderkey"] <= 6]["o_totalprice"])
    assert got["p"].tolist() == want
