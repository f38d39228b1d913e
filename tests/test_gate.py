"""SQL security gate + result envelope tests — mirrors the reference's
12-case security suite (mofdbsql_database/mofdb_test/test.py:354-457,
SURVEY.md §5) plus the LIMIT-override and code 0/-1/-9999 envelope
semantics."""

import pytest

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.envelope import ERROR, NO_RESULTS, OK
from mr_dice_spark.gate import SqlSecurityError, fetch_sql, validate_sql_security


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    Catalog(spark, sf_dir).register_views()


# -- allowed ---------------------------------------------------------------

def test_plain_select_allowed():
    assert validate_sql_security("SELECT 1").startswith("SELECT")


def test_cte_allowed():
    sql = "WITH t AS (SELECT 1 AS x) SELECT * FROM t"
    assert validate_sql_security(sql) == sql


def test_keywords_inside_strings_ok():
    # 'drop' only inside a literal must not trip the denylist
    sql = "SELECT 'please do not drop tables' AS note"
    assert validate_sql_security(sql) == sql


def test_trailing_semicolon_stripped():
    assert validate_sql_security("SELECT 1;") == "SELECT 1"


# -- blocked ---------------------------------------------------------------

@pytest.mark.parametrize(
    "sql",
    [
        "INSERT INTO orders VALUES (1)",
        "UPDATE orders SET o_totalprice = 0",
        "DELETE FROM orders",
        "DROP TABLE orders",
        "CREATE TABLE x AS SELECT 1",
        "ALTER TABLE orders ADD COLUMN y INT",
        "TRUNCATE TABLE orders",
        "SELECT 1; DROP TABLE orders",          # multi-statement
        "SELECT 1; -- sneak\nDELETE FROM orders",
        "WITH t AS (SELECT 1) INSERT INTO orders SELECT * FROM t",
        "MERGE INTO orders USING orders ON 1=1",
        "GRANT ALL ON orders TO public",
    ],
)
def test_mutations_blocked(sql):
    with pytest.raises(SqlSecurityError):
        validate_sql_security(sql)


def test_comment_evasion_blocked():
    with pytest.raises(SqlSecurityError):
        validate_sql_security("/* x */ DROP /* y */ TABLE orders")


# -- envelope + LIMIT override --------------------------------------------

def test_fetch_sql_ok_and_limit_override(spark):
    # statement asks for 1000 rows; the caller's n_results wins
    res = fetch_sql(spark, "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 1000",
                    n_results=7)
    assert res.code == OK and res.n_found == 7 and len(res.cleaned) == 7


def test_fetch_sql_zero_rows_code(spark):
    res = fetch_sql(spark, "SELECT * FROM orders WHERE o_orderkey < 0")
    assert res.code == NO_RESULTS


def test_fetch_sql_rejected_code(spark):
    res = fetch_sql(spark, "DROP TABLE orders")
    assert res.code == ERROR and "rejected" in res.message


def test_fetch_sql_bad_query_is_error_not_raise(spark):
    res = fetch_sql(spark, "SELECT * FROM table_that_does_not_exist")
    assert res.code == ERROR


def test_fetch_sql_command_plan_blocked(spark):
    # keyword scan can't catch SET; the parsed-plan check must
    res = fetch_sql(spark, "SET spark.sql.shuffle.partitions=1")
    assert res.code == ERROR
