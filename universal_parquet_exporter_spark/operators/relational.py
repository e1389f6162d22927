"""The reference's delegated-SQL query surface (SURVEY.md §2B) as
idiomatic DataFrame programs over the TESTDATA tables.

The reference executes these constructs by shipping SQL text to
MySQL/SQL Server (``/root/reference/src/query/query_executor.py:20``); its
examples and tests are the corpus.  Here each construct is a Catalyst
logical plan: filters/projections push into the parquet scan, small
dimensions broadcast, aggregates run partial+final, top-k plans
TakeOrderedAndProject — no custom planner work required (SURVEY.md §4.2).

Every function takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names/aliases match the DuckDB oracle in ``__spark_entry__``.
Floating aggregates are rounded so cross-engine summation order cannot
flip the value hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# Cross-engine-exact aggregation of 2-decimal valued doubles: floating sums
# depend on addition order, so two engines can disagree by 1 ulp and flip a
# round() at a boundary.  Summing integer *cents* is exact and identical
# everywhere; the final division is a single double op on identical inputs.


def _cents(col) -> "F.Column":
    return F.round(col * 100, 0).cast("long")


def money_sum(col, scale: int = 2):
    return F.round(F.coalesce(F.sum(_cents(col)), F.lit(0)) / 100.0, scale)


def money_avg(col, scale: int = 2):
    # integer half-up rounding — round((sum_cents·f)/n) = ⌊(2·sum·f+n)/(2n)⌋ —
    # so no engine-dependent float rounding can flip a .5-tie
    n = F.count(col)
    f = 10 ** (scale - 2)
    unit = float(10**scale)
    q = F.floor((2 * F.sum(_cents(col)) * f + n) / (2 * n))
    return F.when(n > 0, q / unit).otherwise(F.lit(0.0))


# --- projection / filters (reference examples/basic_integration_example.py:98,126;
#     tests/test_query_executor_realDB.py:198,289) ---------------------------


def q_projection_alias(spark, sf_dir):
    """SELECT with column projection + aliases (basic_integration:98,
    advanced_integration:160 ``u.id as user_id``)."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )


def q_filter_compare(spark, sf_dir):
    """Comparison filter (basic_integration:126 ``o.price > 100.00``)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000.0)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price"))
    )


def q_filter_eq(spark, sf_dir):
    """Equality filter (realDB:315, sqlserver_advanced:280)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderstatus")
    )


def q_filter_between(spark, sf_dir):
    """BETWEEN (advanced_integration:201-202 ``age BETWEEN 25 AND 30``)."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal").between(1000.0, 3000.0))
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


def q_filter_like(spark, sf_dir):
    """LIKE filter (realDB:289 ``name LIKE '%&%'``)."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_name")
    )


def q_filter_in(spark, sf_dir):
    """IN-list predicate (sqlserver_basic:144 ``index_id IN (0, 1)``)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber").isin(1, 2))
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
    )


def q_filter_empty(spark, sf_dir):
    """Predicate yielding zero rows (realDB:257-264 ``age > 100``) — the
    engine must return an empty-but-schema'd result (the reference writer
    would raise, parquet_writer.py:10-11)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 1_000_000.0)
        .select("l_orderkey", "l_quantity")
    )


def q_null_check(spark, sf_dir):
    """IS NULL over LEFT-JOIN-produced nulls (advanced_integration:211 +
    its LEFT JOIN at :171): customers with no orders."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .select("c_custkey", "c_name")
    )


# --- joins (basic_integration:122-128; advanced_integration:158-174;
#     sqlserver_advanced:166-176,234-235) ------------------------------------


def q_join_inner(spark, sf_dir):
    """Inner equi-join (basic_integration:125, realDB:209-233)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "inner")
        .filter(F.col("o_totalprice") > 200000.0)
        .select("c_custkey", "c_name", "o_orderkey", F.round("o_totalprice", 2).alias("total_price"))
    )


def q_join_left_agg(spark, sf_dir):
    """The flagship: LEFT JOIN + grouped agg + COALESCE defaults — the
    user_order_summary pattern (advanced_integration:158-174)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            money_sum(F.col("o_totalprice")).alias("total_spent"),
            money_avg(F.col("o_totalprice")).alias("avg_order_value"),
        )
    )


def q_join_compound(spark, sf_dir):
    """Compound-condition join: equi + residual IN (sqlserver_basic:144,
    sqlserver_advanced:234-235)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        lineitem.join(
            orders,
            (lineitem.l_orderkey == orders.o_orderkey) & lineitem.l_linenumber.isin(1, 2),
            "inner",
        )
        .select("o_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
    )


def q_join_semi_distinct(spark, sf_dir):
    """SELECT DISTINCT u.* via join — semi-join in effect
    (basic_integration:122-128 'customers having a qualifying order')."""
    customer = _t(spark, sf_dir, "customer")
    qualifying = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    # idiomatic Spark: left_semi avoids the dedup shuffle a join+DISTINCT needs
    return customer.join(
        qualifying, customer.c_custkey == qualifying.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_join_chain(spark, sf_dir):
    """Multi-table join chain (sqlserver_advanced:172-176, 3 joins)."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .join(customer, nation.n_nationkey == customer.c_nationkey)
        .join(orders, customer.c_custkey == orders.o_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            money_sum(F.col("o_totalprice")).alias("revenue"),
        )
    )


# --- aggregations (realDB:235-255,342-362; advanced_integration:158-213,
#     240-258) ---------------------------------------------------------------


def q_agg_global(spark, sf_dir):
    """Global aggregate without GROUP BY (realDB:235-255)."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("cnt"),
        money_avg(F.col("l_quantity"), 4).alias("avg_qty"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        money_sum(F.col("l_extendedprice")).alias("sum_price"),
    )


def q_agg_grouped(spark, sf_dir):
    """Grouped aggregate with COUNT/SUM/AVG/MIN/MAX (realDB:342-362;
    TPC-H Q1 shape over lineitem)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_avg(F.col("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_agg_count_distinct(spark, sf_dir):
    """COUNT(DISTINCT …) (advanced_integration:188,205)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("distinct_customers"),
            F.count("*").alias("order_count"),
        )
    )


def q_agg_case_group(spark, sf_dir):
    """Aggregate over a derived CASE group key — the age-bucket pattern
    (advanced_integration:199-213)."""
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("balance_bucket", bucket)
        .groupBy("balance_bucket")
        .agg(
            F.count("*").alias("customers"),
            money_avg(F.col("c_acctbal")).alias("avg_balance"),
        )
    )


def q_agg_having(spark, sf_dir):
    """HAVING (advanced_integration:258 ``HAVING COUNT(o.id) > 0``)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("order_count"),
            money_sum(F.col("o_totalprice")).alias("total_spent"),
        )
        .filter(F.col("order_count") > 3)
    )


def q_scalar_funcs(spark, sf_dir):
    """Scalar-function cluster: DATEDIFF over MIN/MAX timestamps, COALESCE,
    CASE (advanced_integration:240-258 customer-segment query)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.date_diff(F.max("o_orderdate"), F.min("o_orderdate")).alias("span_days"),
            money_sum(F.col("o_totalprice")).alias("revenue"),
            F.count("*").alias("n"),
        )
        .withColumn(
            "tier",
            F.when(F.col("revenue") > 1e7, "hot").when(F.col("revenue") > 1e6, "warm").otherwise("cold"),
        )
    )


def q_cte(spark, sf_dir):
    """CTE (sqlserver_advanced:163-190 ``WITH object_stats AS …``) via
    spark.sql on registered views."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH order_stats AS (
            SELECT o_custkey, count(*) AS cnt, sum(o_totalprice) AS spend
            FROM orders GROUP BY o_custkey
        )
        SELECT c.c_mktsegment AS segment,
               count(*) AS customers,
               round(avg(os.cnt), 4) AS avg_orders,
               round(sum(os.spend), 2) AS revenue
        FROM customer c JOIN order_stats os ON c.c_custkey = os.o_custkey
        GROUP BY c.c_mktsegment
        """
    )


# --- windows (advanced_integration:229; sqlserver_advanced:185-186) ---------


def q_window_rank_global(spark, sf_dir):
    """RANK over a global ORDER BY (advanced_integration:229)."""
    w = Window.orderBy(F.desc("o_totalprice"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("price_rank", F.rank().over(w))
        .filter(F.col("price_rank") <= 50)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"), "price_rank")
    )


def q_window_rownum(spark, sf_dir):
    """ROW_NUMBER over a global order (sqlserver_advanced:185) with a
    unique tie-break so results are deterministic."""
    w = Window.orderBy(F.desc("value"), F.asc("event_id"))
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .select("event_id", "event_type", F.round("value", 2).alias("value"), "rn")
    )


def q_window_rank_partitioned(spark, sf_dir):
    """RANK with PARTITION BY (sqlserver_advanced:186)."""
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rank_in_priority", F.rank().over(w))
        .filter(F.col("rank_in_priority") <= 10)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "rank_in_priority",
        )
    )


# --- sorts / limits / top-k / distinct (realDB:177,215,366;
#     sqlserver_advanced:219,241; basic_integration:123) ---------------------


def q_sort_multi(spark, sf_dir):
    """Multi-key ORDER BY (realDB:215, sqlserver_basic:80)."""
    return (
        _t(spark, sf_dir, "nation")
        .orderBy(F.desc("n_regionkey"), F.asc("n_name"))
        .select("n_nationkey", "n_name", "n_regionkey")
    )


def q_limit_offset(spark, sf_dir):
    """LIMIT + OFFSET (realDB:366, test_query_executor.py:81) over a
    unique sort key for determinism."""
    return (
        _t(spark, sf_dir, "customer")
        .orderBy("c_custkey")
        .offset(3)
        .limit(5)
        .select("c_custkey", "c_name")
    )


def q_topk(spark, sf_dir):
    """TOP-k after sort (sqlserver_advanced:219 ``TOP 20 … ORDER BY``) —
    Catalyst plans TakeOrderedAndProject, no full sort."""
    return (
        _t(spark, sf_dir, "lineitem")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(20)
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
    )


def q_distinct(spark, sf_dir):
    """DISTINCT projection (basic_integration:123)."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


def q_events_agg(spark, sf_dir):
    """Timestamp MIN/MAX + numeric aggregates per group over the events
    stream table (exercises TimestampType aggregation — realDB:99 +
    advanced_integration:168-169)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            money_sum(F.col("value")).alias("sum_value"),
            # µs epoch ints: identical across engines regardless of how each
            # stringifies timestamps
            # timestampdiff on TIMESTAMP_NTZ is session-tz-independent
            # (a cast to TIMESTAMP would shift by the driver session's tz)
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', min(ts))"
            ).alias("first_ts_us"),
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', max(ts))"
            ).alias("last_ts_us"),
        )
    )
