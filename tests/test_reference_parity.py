"""Golden-query parity with the reference's real-DB integration suite:
the SAME SQL strings over the SAME seed data, with each reference
assertion reproduced (/root/reference/tests/test_query_executor_realDB.py
:175-384).  The reference ships these queries to MySQL; here Catalyst
executes them via ``spark.sql`` — identical text, identical answers."""

from decimal import Decimal

import pytest

from universal_parquet_exporter_spark.fixtures.users_orders import register_users_orders


@pytest.fixture(scope="module", autouse=True)
def tables(spark):
    return register_users_orders(spark)


def _rows(spark, q):
    df = spark.sql(q)
    return [r.asDict() for r in df.collect()]


def test_simple_select_limit(spark):
    # test_execute_simple_select_query (:175-194)
    rows = _rows(spark, "SELECT id, name, email FROM users ORDER BY id LIMIT 2")
    assert len(rows) == 2
    for row in rows:
        assert isinstance(row["id"], int)
        assert isinstance(row["name"], str)
        assert isinstance(row["email"], str)


def test_where_clause(spark):
    # test_execute_query_with_where_clause (:196-207)
    rows = _rows(spark, "SELECT name, age FROM users WHERE age > 25 ORDER BY age")
    assert len(rows) > 0
    assert all(r["age"] > 25 for r in rows)
    ages = [r["age"] for r in rows]
    assert ages == sorted(ages)


def test_join_query(spark):
    # test_execute_join_query (:209-233)
    rows = _rows(
        spark,
        "SELECT u.name, o.product_name, o.quantity, o.price "
        "FROM users u JOIN orders o ON u.id = o.user_id "
        "ORDER BY u.name, o.product_name",
    )
    assert len(rows) == 8  # all seeded orders join a user
    for r in rows:
        assert isinstance(r["quantity"], int)
        assert isinstance(r["price"], Decimal)


def test_aggregate_query(spark):
    # test_execute_aggregate_query (:235-255)
    rows = _rows(
        spark,
        "SELECT COUNT(*) as total_users, AVG(age) as avg_age, "
        "MIN(age) as min_age, MAX(age) as max_age FROM users",
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["total_users"] == 7
    assert r["min_age"] == 25 and r["max_age"] == 35  # NULL age skipped
    assert r["avg_age"] == pytest.approx(180 / 6)


def test_empty_result(spark):
    # test_execute_empty_result_query (:257-264)
    rows = _rows(spark, "SELECT * FROM users WHERE age > 100")
    assert rows == []


def test_invalid_query_raises(spark):
    # test_execute_invalid_query (:266-271): error surfaces as exception
    with pytest.raises(Exception):
        spark.sql("SELECT nonexistent_column FROM users").collect()


def test_special_characters(spark):
    # test_execute_query_with_special_characters (:273-297)
    rows = _rows(spark, "SELECT name, email FROM users WHERE name LIKE '%&%'")
    assert len(rows) == 1
    assert "&" in rows[0]["name"]


def test_null_round_trip(spark):
    # test_execute_query_with_null_values (:299-323)
    rows = _rows(spark, "SELECT name, email, age FROM users WHERE name = 'Test User NULL'")
    assert len(rows) == 1
    assert rows[0]["age"] is None


def test_order_by_desc_monotonic(spark):
    # test_execute_order_by_query (:325-340)
    rows = _rows(spark, "SELECT name, age FROM users WHERE age IS NOT NULL ORDER BY age DESC")
    ages = [r["age"] for r in rows]
    assert ages == sorted(ages, reverse=True)


def test_group_by_left_join(spark):
    # test_execute_group_by_query (:342-362)
    rows = _rows(
        spark,
        "SELECT u.name, COUNT(o.id) as order_count, SUM(o.price) as total_spent "
        "FROM users u LEFT JOIN orders o ON u.id = o.user_id "
        "GROUP BY u.id, u.name ORDER BY u.name",
    )
    assert len(rows) == 7
    by_name = {r["name"]: r for r in rows}
    assert by_name["John Doe"]["order_count"] == 2
    assert by_name["John Doe"]["total_spent"] == Decimal("1025.49")
    # users without orders: COUNT(o.id)=0, SUM NULL (reference: "can be None")
    assert by_name["Test User NULL"]["order_count"] == 0
    assert by_name["Test User NULL"]["total_spent"] is None


def test_limit_offset_row_identity(spark):
    # test_execute_limit_offset_query (:364-384)
    rows = _rows(spark, "SELECT id, name, email FROM users ORDER BY id LIMIT 1 OFFSET 1")
    assert len(rows) == 1
    assert rows[0]["id"] == 2
