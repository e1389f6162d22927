"""Mirror of the reference's mock-based unit suite
(``/root/reference/tests/test_query_executor.py:16-181`` — dict-shaping
for select / aggregate / group-by / join / limit-offset / order-by /
null / special-chars / where / empty / error cases, and
``tests/test_parquet_writer.py`` write-path behaviors) against the
compat facade.  The reference stubs a DB cursor; here the same semantic
assertions run through Catalyst on the reference's own seed rows
(``fixtures/users_orders.py``), which is strictly stronger."""

import os

import pandas as pd
import pytest

from universal_parquet_exporter_spark.compat import ParquetWriter, QueryExecutor
from universal_parquet_exporter_spark.fixtures.users_orders import register_users_orders


@pytest.fixture(scope="module")
def executor(spark):
    register_users_orders(spark)
    return QueryExecutor(spark)


def test_select_returns_list_of_dicts(executor):
    result = executor.execute_query("SELECT name, age FROM users ORDER BY id")
    assert isinstance(result, list) and all(isinstance(r, dict) for r in result)
    assert list(result[0].keys()) == ["name", "age"]
    assert result[0]["name"] == "John Doe" and result[0]["age"] == 30


def test_aggregate_alias_becomes_key(executor):
    result = executor.execute_query("SELECT COUNT(*) AS count FROM users")
    assert result == [{"count": 7}]


def test_group_by_shapes(executor):
    result = executor.execute_query(
        "SELECT user_id, COUNT(*) AS n FROM orders GROUP BY user_id ORDER BY user_id"
    )
    assert all(set(r.keys()) == {"user_id", "n"} for r in result)
    assert sum(r["n"] for r in result) == 8


def test_join_rows(executor):
    result = executor.execute_query(
        "SELECT u.name, o.product_name FROM users u JOIN orders o ON u.id = o.user_id "
        "ORDER BY u.name, o.product_name"
    )
    assert len(result) == 8
    assert {"name", "product_name"} == set(result[0].keys())


def test_limit_offset(executor):
    all_rows = executor.execute_query("SELECT id FROM users ORDER BY id")
    page = executor.execute_query("SELECT id FROM users ORDER BY id LIMIT 1 OFFSET 1")
    assert page == [all_rows[1]]


def test_order_by_desc(executor):
    result = executor.execute_query("SELECT age FROM users WHERE age IS NOT NULL ORDER BY age DESC")
    ages = [r["age"] for r in result]
    assert ages == sorted(ages, reverse=True)


def test_null_values_round_trip(executor):
    result = executor.execute_query("SELECT name, age FROM users WHERE age IS NULL")
    assert result and all(r["age"] is None for r in result)


def test_special_characters_preserved(executor):
    result = executor.execute_query("SELECT name FROM users WHERE name LIKE '%&%'")
    assert result == [{"name": "Test User & Co."}]


def test_where_filters(executor):
    result = executor.execute_query("SELECT name FROM users WHERE age > 25")
    assert {r["name"] for r in result} == {
        "John Doe", "Bob Johnson", "Alice Brown", "Charlie Wilson", "Test User & Co.",
    }


def test_empty_result_is_empty_list(executor):
    assert executor.execute_query("SELECT * FROM users WHERE age > 100") == []


def test_invalid_sql_raises(executor):
    with pytest.raises(Exception):
        executor.execute_query("SELECT definitely_missing_column FROM users")


def test_writer_roundtrip(tmp_path):
    data = [
        {"id": 1, "name": "John", "price": 19.99},
        {"id": 2, "name": "O'Connor & Sons", "price": None},
    ]
    path = os.path.join(str(tmp_path), "out.parquet")
    ParquetWriter().write_to_parquet(data, path)
    back = pd.read_parquet(path)
    assert back.shape == (2, 3)
    assert back["name"].tolist() == ["John", "O'Connor & Sons"]
    assert pd.isna(back["price"][1])


def test_writer_rejects_empty():
    with pytest.raises(ValueError):
        ParquetWriter().write_to_parquet([], "/tmp/never.parquet")


def test_executor_feeds_writer(executor, tmp_path):
    """The reference's end-to-end path: query → dict rows → parquet file."""
    rows = executor.execute_query(
        "SELECT u.name, COUNT(o.id) AS orders FROM users u "
        "LEFT JOIN orders o ON u.id = o.user_id GROUP BY u.name"
    )
    path = os.path.join(str(tmp_path), "summary.parquet")
    ParquetWriter().write_to_parquet(rows, path)
    back = pd.read_parquet(path)
    assert len(back) == 7 and set(back.columns) == {"name", "orders"}
