"""The reference's own test schema + seed rows as deterministic Spark
fixtures (``/root/reference/tests/test_query_executor_realDB.py:80-143``:
CREATE TABLE users/orders + the 5 seeded users and 8 orders;
``:273-297`` adds the special-characters row and ``:299-323`` the
NULL-age row).  `created_at`/`order_date` are fixed instants instead of
the reference's CURRENT_TIMESTAMP defaults so everything stays
reproducible."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_T0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

USERS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("name", StringType(), False),
        StructField("email", StringType(), False),
        StructField("age", IntegerType(), True),
        StructField("created_at", TimestampType(), False),
    ]
)

ORDERS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("product_name", StringType(), False),
        StructField("quantity", IntegerType(), False),
        StructField("price", DecimalType(10, 2), False),
        StructField("order_date", TimestampType(), False),
    ]
)

# seed rows: test_query_executor_realDB.py:113-119 (users), :124-133
# (orders), :276-279 (special chars), :302-305 (NULL age)
USERS_ROWS = [
    (1, "John Doe", "john.doe@example.com", 30, _T0),
    (2, "Jane Smith", "jane.smith@example.com", 25, _T0),
    (3, "Bob Johnson", "bob.johnson@example.com", 35, _T0),
    (4, "Alice Brown", "alice.brown@example.com", 28, _T0),
    (5, "Charlie Wilson", "charlie.wilson@example.com", 32, _T0),
    (6, "Test User & Co.", "test+special@example.com", 30, _T0),
    (7, "Test User NULL", "test_null@example.com", None, _T0),
]

ORDERS_ROWS = [
    (1, 1, "Laptop", 1, Decimal("999.99")),
    (2, 1, "Mouse", 2, Decimal("25.50")),
    (3, 2, "Keyboard", 1, Decimal("75.00")),
    (4, 2, "Monitor", 1, Decimal("299.99")),
    (5, 3, "Tablet", 1, Decimal("499.99")),
    (6, 4, "Headphones", 1, Decimal("199.99")),
    (7, 4, "Webcam", 1, Decimal("89.99")),
    (8, 5, "Smartphone", 1, Decimal("699.99")),
]


def users_orders(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """(users, orders) DataFrames with the reference's seed data."""
    users = spark.createDataFrame(USERS_ROWS, USERS_SCHEMA)
    orders = spark.createDataFrame(
        [(i, u, p, q, pr, _T0 + datetime.timedelta(days=n)) for n, (i, u, p, q, pr) in enumerate(ORDERS_ROWS)],
        ORDERS_SCHEMA,
    )
    return users, orders


def register_users_orders(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    users, orders = users_orders(spark)
    users.createOrReplaceTempView("users")
    orders.createOrReplaceTempView("orders")
    return users, orders
