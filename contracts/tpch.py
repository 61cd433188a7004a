"""TPC-H classics (q1-q22) and derived partsupp analytics."""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from contracts.base import (
    _r6,
    qround,
    read_table,
)



# ---------------------------------------------------------- TPC-H classics
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family relational coverage — TPC-H Q1 pricing summary."""
    li = read_table(spark, sf_dir, "lineitem")
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return _r6(
        out,
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "avg_qty",
        "avg_price",
        "avg_disc",
    )


O_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       floor((sum(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS sum_qty,
       floor((sum(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS sum_base_price,
       floor((sum(l_extendedprice * (1 - l_discount))) * 1000000.0 + 0.5) / 1000000.0 AS sum_disc_price,
       floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 1000000.0 + 0.5) / 1000000.0 AS sum_charge,
       floor((avg(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS avg_qty,
       floor((avg(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price,
       floor((avg(l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + top-k — TPC-H Q3 shipping priority. nation/region-class
    frames only would be hinted here; customer is sf-proportional so the
    join is unhinted and AQE decides broadcast vs shuffle by size."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    out = (
        li.filter(F.col("l_shipdate") > F.lit("1995-03-15"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit("1995-03-15")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )
    return _r6(out, "revenue")


O_TPCH_Q3 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       floor((sum(l_extendedprice * (1 - l_discount))) * 1000000.0 + 0.5) / 1000000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy filter+agg — TPC-H Q6 forecast revenue change."""
    li = read_table(spark, sf_dir, "lineitem")
    out = li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01"))
        & (F.col("l_shipdate") < F.lit("1995-01-01"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    return _r6(out, "revenue")


O_TPCH_Q6 = """
SELECT floor((sum(l_extendedprice * l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join breadth — TPC-H Q5 local-supplier revenue. nation and
    region (bounded dims) are hinted broadcast; customer and supplier are
    sf-proportional, left unhinted for AQE to size at runtime; lineitem
    (the fact) shuffles once for the orders join."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    out = (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    return _r6(out, "revenue")


O_TPCH_Q5 = """
SELECT n_name, floor((sum(l_extendedprice * (1 - l_discount))) * 1000000.0 + 0.5) / 1000000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-agg join — TPC-H Q14 promo revenue share. The part
    join is unhinted: part grows with scale factor, so the planner (AQE /
    autoBroadcastJoinThreshold) picks broadcast only while it fits."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    promo = F.when(
        F.col("p_type").startswith("PROMO"),
        F.col("l_extendedprice") * (1 - F.col("l_discount")),
    ).otherwise(F.lit(0.0))
    out = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01"))
            & (F.col("l_shipdate") < F.lit("1995-10-01"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                100.0
                * F.sum(promo)
                / F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("promo_revenue")
        )
    )
    return _r6(out, "promo_revenue")


O_TPCH_Q14 = """
SELECT floor((100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount))) * 1000000.0 + 0.5) / 1000000.0 AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided nation-pair volume by ship year — TPC-H Q7: both nation
    dims hinted broadcast under different roles; customer/supplier joins
    unhinted (sf-proportional — AQE sizes them)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    out = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    return _r6(out, "revenue")


O_TPCH_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       floor((sum(l_extendedprice * (1 - l_discount))) * 1000000.0 + 0.5) / 1000000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1, 2, 3
"""


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share — TPC-H Q8: conditional-sum ratio per year
    over a six-table join. Only the bounded dims (nation x2, region) are
    hinted; part/customer/supplier grow with sf and stay unhinted."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    part = read_table(spark, sf_dir, "part")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    out = (
        li.join(
            part.filter(F.col("p_type") == "STANDARD"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol)
            ).alias("mkt_share")
        )
    )
    return _r6(out, "mkt_share")


O_TPCH_Q8 = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       floor((sum(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount))) * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA'
  AND p_type = 'STANDARD'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue top 20 — TPC-H Q10 (join + agg + top-k)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    out = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1995-10-01"))
                & (F.col("o_orderdate") < F.lit("1996-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
    return _r6(out, "revenue", "c_acctbal")


O_TPCH_Q10 = """
SELECT c_custkey, c_name, floor((c_acctbal) * 1000000.0 + 0.5) / 1000000.0 AS c_acctbal, n_name,
       floor((sum(l_extendedprice * (1 - l_discount))) * 1000000.0 + 0.5) / 1000000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution — TPC-H Q13 (left outer join +
    double aggregation)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


O_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue — TPC-H Q17. The correlated scalar
    subquery (0.2 * per-part avg quantity) decorrelates into one
    aggregation joined back — the plan Catalyst itself would produce, made
    explicit."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_limit")
    )
    out = (
        li.join(
            part.filter(F.col("p_brand") == "Brand#1"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(per_part, F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg((F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )
    return _r6(out, "avg_yearly")


O_TPCH_Q17 = """
SELECT floor((sum(l_extendedprice) / 7.0) * 1000000.0 + 0.5) / 1000000.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders — TPC-H Q18 (having-filtered semi-join feeding
    a join + top-k)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_key"))
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    out = (
        li.join(big, F.col("l_orderkey") == F.col("big_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )
    return _r6(out, "o_totalprice", "total_qty")


O_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       floor((o_totalprice) * 1000000.0 + 0.5) / 1000000.0 AS o_totalprice,
       floor((sum(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS total_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250
)
GROUP BY 1, 2, 3, 4, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive-predicate revenue — TPC-H Q19 adapted to this schema's
    part attributes (brand/size bands OR'd with quantity ranges; the
    reference query's container/shipmode fields are absent)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity").between(10, 40))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(20, 50))
            & (F.col("l_quantity").between(20, 50))
        )
    )
    out = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    return _r6(out, "revenue")


O_TPCH_Q19 = """
SELECT floor((sum(l_extendedprice * (1 - l_discount))) * 1000000.0 + 0.5) / 1000000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking — TPC-H Q4 adapted: the reference's
    l_commitdate/l_receiptdate are absent from this schema, so a "late"
    line is l_shipdate > o_orderdate + 90 days. The EXISTS becomes a
    left-semi join whose condition references the outer o_orderdate."""
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    with_late_line = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        with_late_line.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


O_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority split — TPC-H Q12 adapted: l_shipmode/receipt
    dates are absent, so the split runs over l_returnflag with the
    shipdate-year window; the conditional counts keep Q12's shape."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


O_TPCH_Q12 = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('R','A')
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier — TPC-H Q15 (revenue view + scalar-subquery max).
    The quarter revenue agg is computed once; the max is a one-row
    broadcast joined back (both engines select their own argmax, so FP
    sum-order differences cannot desynchronize the row choice)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("_mx"))
    sup = read_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(best), F.col("total_revenue") == F.col("_mx"))
        .join(sup, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            qround("total_revenue", 6).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


O_TPCH_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, floor((total_revenue) * 1000000.0 + 0.5) / 1000000.0 AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting — TPC-H Q21 adapted ("late" =
    l_shipdate > o_orderdate + 90 days, no commit/receipt dates in this
    schema; no nation filter — only 100 suppliers). The EXISTS becomes a
    left-semi join, the NOT EXISTS a left-anti join whose late-condition
    reuses the outer order's o_orderdate (same order key, same date)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    l1 = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(late)
    others = li.select(
        F.col("l_orderkey").alias("_ok2"),
        F.col("l_suppkey").alias("_sk2"),
        F.col("l_shipdate").alias("_sd2"),
    ).cache()  # probed twice (semi + anti): scan lineitem once, not thrice
    waited = (
        l1.join(
            others,
            (F.col("_ok2") == F.col("l_orderkey"))
            & (F.col("_sk2") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            others,
            (F.col("_ok2") == F.col("l_orderkey"))
            & (F.col("_sk2") != F.col("l_suppkey"))
            & (F.col("_sd2") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
            "left_anti",
        )
    )
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waited.join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


O_TPCH_Q21 = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity — TPC-H Q22 adapted: this schema has no
    c_phone, so "country code" is c_custkey % 10 (odd codes selected),
    and since every customer here has orders, the anti-join is on URGENT
    orders (a customer-with-orders density-invariant ~13% hit rate at any
    sf). Keeps Q22's shape: scalar-subquery average threshold + anti-join
    on orders."""
    cust = read_table(spark, sf_dir, "customer")
    pool = cust.filter((F.col("c_custkey") % 10).isin(1, 3, 5, 7, 9)).select(
        (F.col("c_custkey") % 10).alias("cntrycode"), "c_acctbal", "c_custkey"
    )
    thresh = pool.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        pool.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            qround(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


O_TPCH_Q22 = """
WITH pool AS (
  SELECT c_custkey % 10 AS cntrycode, c_acctbal, c_custkey
  FROM customer WHERE c_custkey % 10 IN (1,3,5,7,9)
)
SELECT cntrycode, count(*) AS numcust, floor((sum(c_acctbal)) * 1000000.0 + 0.5) / 1000000.0 AS totacctbal
FROM pool
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM pool WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY cntrycode
ORDER BY cntrycode
"""


# --------------------------------------------------- derived partsupp
# The driver's testdata ships no partsupp table; Q2/Q9/Q11/Q16/Q20 need
# one. It is DERIVED deterministically from part x supplier-count with
# identical integer arithmetic in Spark and in the DuckDB oracle, so both
# engines query the exact same synthetic relation (4 suppliers per part).
def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part").select("p_partkey")
    ns = (
        read_table(spark, sf_dir, "supplier")
        .agg((F.max("s_suppkey") + 1).alias("_n_supp"))
    )
    i = F.col("i")
    pk = F.col("p_partkey")
    return (
        part.join(F.broadcast(ns))
        .select(pk, F.explode(F.array(*[F.lit(x) for x in range(4)])).alias("i"), "_n_supp")
        .select(
            pk.alias("ps_partkey"),
            ((pk * 7 + i * 13) % F.col("_n_supp")).alias("ps_suppkey"),
            ((pk * 13 + i * 7) % 9999 + 1).alias("ps_availqty"),
            (((pk * 31 + i * 17) % 10000).cast("double") / 10.0 + 1.0).alias(
                "ps_supplycost"
            ),
        )
    )


_PS_SQL = """
ns AS (SELECT max(s_suppkey) + 1 AS n FROM supplier),
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 7 + t.i * 13) % ns.n AS ps_suppkey,
         (p_partkey * 13 + t.i * 7) % 9999 + 1 AS ps_availqty,
         CAST((p_partkey * 31 + t.i * 17) % 10000 AS DOUBLE) / 10.0 + 1.0
           AS ps_supplycost
  FROM part, ns, (SELECT unnest([0, 1, 2, 3]) AS i) t
)
"""


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier — TPC-H Q2 over the derived partsupp: the
    correlated min-subquery decorrelates into a per-part min joined back;
    nation/region hinted broadcast, the sf-proportional eu_sup/part sides
    unhinted (AQE broadcasts them only while they fit)."""
    ps = _partsupp(spark, sf_dir)
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    sup = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    reg = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_sup = (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_ps = ps.join(
        eu_sup, F.col("ps_suppkey") == F.col("s_suppkey")
    )
    # decorrelated per-part min as a PARTITIONED window over the single
    # eu_ps derivation (a separate groupBy+join-back would re-derive the
    # whole eu_ps subtree — part/supplier scanned twice). The part filter
    # only prunes parts, never a part's supplier rows, so the post-join
    # window min equals the pre-join per-part min.
    w_min = Window.partitionBy("ps_partkey")
    return (
        eu_ps.join(part, F.col("ps_partkey") == F.col("p_partkey"))
        .withColumn("_mc", F.min("ps_supplycost").over(w_min))
        .filter(F.col("ps_supplycost") == F.col("_mc"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


O_TPCH_Q2 = f"""
WITH {_PS_SQL},
eu_sup AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
eu_ps AS (
  SELECT * FROM partsupp JOIN eu_sup ON ps_suppkey = s_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
FROM eu_ps JOIN part ON ps_partkey = p_partkey
WHERE p_size = 15 AND p_type = 'ECONOMY'
  AND ps_supplycost = (
    SELECT min(ps_supplycost) FROM eu_ps e2 WHERE e2.ps_partkey = eu_ps.ps_partkey
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit — TPC-H Q9 over the derived partsupp (avg
    profit per line instead of sum: engine-identical to 1e-6 where a
    100k-term sum is not). One lineitem shuffle; nation hinted broadcast,
    the sf-proportional part/partsupp/supplier joins unhinted."""
    li = read_table(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            qround(F.avg(amount), 6).alias("avg_profit"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


O_TPCH_Q9 = f"""
WITH {_PS_SQL}
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       count(*) AS n_lines,
       floor((avg(l_extendedprice * (1 - l_discount)
                 - ps_supplycost * l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS avg_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock — TPC-H Q11: per-part inventory value in one
    nation, kept where above a fraction of the nation total (scalar
    subquery threshold; per-part sums are 4 terms, FP-safe)."""
    ps = _partsupp(spark, sf_dir)
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    in_nation = ps.join(
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    ).cache()  # referenced twice (per-part sums + nation total): one derivation
    val = F.col("ps_supplycost") * F.col("ps_availqty")
    per_part = in_nation.groupBy("ps_partkey").agg(F.sum(val).alias("value"))
    total = in_nation.agg((F.sum(val) * 0.001).alias("_thr"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("_thr"))
        .select("ps_partkey", qround("value", 6).alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


O_TPCH_Q11 = f"""
WITH {_PS_SQL},
in_nation AS (
  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
SELECT ps_partkey, floor((sum(v)) * 1000000.0 + 0.5) / 1000000.0 AS value
FROM in_nation
GROUP BY ps_partkey
HAVING sum(v) > (SELECT sum(v) * 0.001 FROM in_nation)
ORDER BY value DESC, ps_partkey
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship — TPC-H Q16: brand/type/size supplier
    counts, excluding "complaint" suppliers (adapted: negative acctbal —
    this schema has no s_comment). NOT IN becomes a left-anti join."""
    ps = _partsupp(spark, sf_dir)
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 11, 15, 21, 28)
    )
    bad = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(part, F.col("ps_partkey") == F.col("p_partkey"))
        .join(bad, F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


O_TPCH_Q16 = f"""
WITH {_PS_SQL}
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 11, 15, 21, 28)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential promotion — TPC-H Q20: suppliers in one nation holding
    excess stock of a part family (availqty > half the 1997 shipped
    quantity for that part-supp). The correlated agg subquery
    decorrelates into a per-(part,supp) aggregate left-joined back;
    quantities are integral doubles, so the comparison is engine-exact."""
    ps = _partsupp(spark, sf_dir)
    blue_parts = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%blue%"))
        .select("p_partkey")
    )
    shipped = (
        read_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .groupBy(
            F.col("l_partkey").alias("_pk"), F.col("l_suppkey").alias("_sk")
        )
        .agg(F.sum("l_quantity").alias("_qty"))
    )
    excess = (
        ps.join(blue_parts, F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("_pk"))
            & (F.col("ps_suppkey") == F.col("_sk")),
            "left",
        )
        .filter(F.col("ps_availqty") > 0.5 * F.coalesce(F.col("_qty"), F.lit(0.0)))
        .select("ps_suppkey")
        .distinct()
    )
    sup = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


O_TPCH_Q20 = f"""
WITH {_PS_SQL},
shipped AS (
  SELECT l_partkey AS pk, l_suppkey AS sk, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1, 2
),
excess AS (
  SELECT DISTINCT ps_suppkey
  FROM partsupp
  LEFT JOIN shipped ON ps_partkey = pk AND ps_suppkey = sk
  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
    AND ps_availqty > 0.5 * coalesce(qty, 0)
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (SELECT ps_suppkey FROM excess)
ORDER BY s_name
"""


def q_o5_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 — dedup/distinct: distinct users per event type."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


O_O5 = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


def q_o6_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 — skew-salted join (operators/skew.salted_join): events'
    event_type has 5 hot keys, the worst shuffle-join shape at scale. The
    salt extends the shuffle key to (event_type, salt); the result is
    provably identical to the plain join, which is exactly what the
    oracle checks."""
    from gordo_spark.operators.skew import salted_join

    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    joined = salted_join(ev, dim, "event_type", salt=8)
    return (
        joined.groupBy("event_type")
        .agg(
            F.first("n_events").alias("n_events"),
            qround(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("event_type")
    )


O_O6 = """
WITH dim AS (SELECT event_type, count(*) AS n_events FROM events GROUP BY 1)
SELECT e.event_type, n_events, floor((sum(e.value)) * 1000000.0 + 0.5) / 1000000.0 AS sum_value
FROM events e JOIN dim USING (event_type)
GROUP BY 1, 2
ORDER BY 1
"""


def q_o7_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 — bucketed co-located join (sources/bucketed): lineitem and
    orders written bucketed by order key, then joined with NO Exchange in
    the plan (asserted in tests/test_scale_layouts.py) — the fact-fact
    join layout for 100 TB. The oracle is the plain join: bucketing must
    be invisible in the result."""
    import os

    from gordo_spark.sources.bucketed import colocated_join, write_bucketed

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = f"/tmp/gordo_spark_buckets/{tag}"
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    write_bucketed(li, f"gs_li_{tag.replace('.', '_')}", "l_orderkey", buckets=8,
                   path=f"{base}/lineitem")
    write_bucketed(orders, f"gs_ord_{tag.replace('.', '_')}", "l_orderkey", buckets=8,
                   path=f"{base}/orders")
    j = colocated_join(
        spark, f"gs_li_{tag.replace('.', '_')}", f"gs_ord_{tag.replace('.', '_')}",
        "l_orderkey",
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            qround(
                F.avg(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("avg_revenue"),
        )
        .orderBy("o_orderpriority")
    )


O_O7 = """
SELECT o_orderpriority,
       count(*) AS n_lines,
       floor((avg(l_extendedprice * (1 - l_discount))) * 1000000.0 + 0.5) / 1000000.0 AS avg_revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
