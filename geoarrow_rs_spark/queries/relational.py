"""relational query-catalog entries (split from queries.py, round 6)."""

from ._shared import *  # noqa: F401,F403
from ._shared import (  # noqa: F401
    _BM25_K1P1,
    _BM25_TERMS,
    _GRAM8_SQL,
    _NG3,
    _NS_GAP,
    _NS_HOUR,
    _banded_block,
    _hits_sql,
    _luhn_sql,
    _minhash_pairs_cte,
    _money_sum,
    _money_sum_sql,
    _spread,
    _t,
)



# ---------------------------------------------------------------------------
# relational core (native Spark — Catalyst does pushdown/pruning/AQE)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark, sf_dir):
    """TPC-H q1: pricing summary report — flag/status grouped sums and
    means over recent lineitems, exact integer-cents money sums."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum(F.col("l_quantity"), "sum_qty"),
            _money_sum(F.col("l_extendedprice"), "sum_base_price"),
            _money_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "sum_disc_price",
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       {_money_sum_sql('l_quantity', 'sum_qty')},
       {_money_sum_sql('l_extendedprice', 'sum_base_price')},
       {_money_sum_sql('l_extendedprice * (1.0 - l_discount)', 'sum_disc_price')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf_dir):
    """TPC-H q3: unshipped-order revenue by order, BUILDING segment —
    dimension filters broadcast, revenue summed in exact cents."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-03-15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"
            )
        )
    )


ORACLE_Q3 = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {_money_sum_sql('l_extendedprice * (1.0 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
"""


def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H q5: local supplier volume per ASIA nation — five-way join
    with every dimension broadcast (plan-asserted)."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_Q5 = f"""
SELECT n_name,
       {_money_sum_sql('l_extendedprice * (1.0 - l_discount)', 'revenue')},
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
GROUP BY n_name
"""


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H q6: forecast revenue change — pure scan + filter + one
    aggregate; the filters reach the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_Q6 = f"""
SELECT {_money_sum_sql('l_extendedprice * l_discount', 'revenue')},
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_top_customers_per_nation(spark, sf_dir):
    """Top-3 customers by balance per nation — dense ranking window over
    a broadcast-joined dimension."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
    )


ORACLE_TOP_CUSTOMERS = """
SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rnk
  FROM customer
) WHERE rnk <= 3
"""


def q_order_priority(spark, sf_dir):
    """Order-priority histogram with exact money totals per class."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


ORACLE_ORDER_PRIORITY = """
SELECT o_orderpriority, COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# geometry queries (real WKB kernel pipeline; arithmetic oracles)
# ---------------------------------------------------------------------------

def q_customer_value_deciles(spark, sf_dir):
    """Customer lifetime-value deciles: exact integer-cents order totals
    per customer, ntile(10) over a strict total order (value desc, key),
    per-decile counts and exact value sums — the segmentation rollup."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
    per = o.groupBy("o_custkey").agg(F.sum(cents).alias("__c"))
    w = Window.orderBy(F.col("__c").desc(), F.col("o_custkey").asc())
    d = per.withColumn("decile", F.ntile(10).over(w))
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("__c").cast("double") / F.lit(100.0)).alias("total_value"),
    )


ORACLE_Q_DECILES = """
WITH per AS (
  SELECT o_custkey, SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
  FROM orders GROUP BY o_custkey
),
d AS (
  SELECT c, ntile(10) OVER (ORDER BY c DESC, o_custkey ASC) AS decile FROM per
)
SELECT decile, COUNT(*) AS n_customers,
       CAST(SUM(c) AS DOUBLE) / 100.0 AS total_value
FROM d GROUP BY decile
"""


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10-style: revenue from returned items per customer."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_Q10 = f"""
SELECT c_custkey, c_name, n_name,
       {_money_sum_sql('l_extendedprice * (1.0 - l_discount)', 'revenue')},
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
"""


def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12-style: order-priority counts by quantity band."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 25)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("high_line_count"),
            F.sum(
                F.when(
                    ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_quantity >= 25
GROUP BY l_linestatus
"""


def q4_late_shipments(spark, sf_dir):
    """TPC-H q4 adapted (no commit/receipt dates in this schema): priority
    histogram of orders with at least one lineitem shipped >= 60 days after
    the order date — EXISTS becomes a left-semi join (no row duplication,
    no distinct)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    late = l.join(
        o, on=[l.l_orderkey == o.o_orderkey], how="inner"
    ).where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    late_keys = late.select(F.col("l_orderkey").alias("o_orderkey")).distinct()
    return (
        o.join(late_keys, on="o_orderkey", how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE_Q4 = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


def q7_volume_shipping(spark, sf_dir):
    """TPC-H q7: bilateral shipping volume between two nations by year.
    Dimension joins (supplier/customer/nation) broadcast; the only big
    shuffle is lineitem->orders."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


ORACLE_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {_money_sum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def q8_market_share(spark, sf_dir):
    """TPC-H q8 adapted: NATION_5 suppliers' share of PROMO-part revenue to
    customers in region REGION_1, by order year. Ratio of two exact
    integer-cent sums (engine-independent)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .where((F.col("p_type") == "PROMO") & (F.col("r_name") == "REGION_1"))
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    nation_cents = F.when(F.col("supp_nation") == "NATION_5", cents).otherwise(F.lit(0).cast("long"))
    return (
        j.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.sum(nation_cents).alias("__n"),
            F.sum(cents).alias("__t"),
        )
        .select(
            "o_year",
            F.round(F.col("__n").cast("double") / F.col("__t").cast("double"), 6).alias("mkt_share"),
        )
    )


ORACLE_Q8 = """
WITH base AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT) AS cents,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  WHERE p_type = 'PROMO' AND r_name = 'REGION_1'
)
SELECT o_year,
       round(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN cents ELSE 0 END) AS DOUBLE)
             / CAST(SUM(cents) AS DOUBLE), 6) AS mkt_share
FROM base GROUP BY o_year
"""


def q14_promo_revenue(spark, sf_dir):
    """TPC-H q14: fraction of revenue from PROMO parts in one shipdate year."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(F.year("l_shipdate") == 1997)
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    promo = F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0).cast("long"))
    return j.agg(
        F.round(
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(cents).cast("double"), 6
        ).alias("promo_revenue_pct")
    )


ORACLE_Q14 = """
SELECT round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)
                 ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE), 6)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE year(l_shipdate) = 1997
"""


def q18_large_orders(spark, sf_dir):
    """TPC-H q18: orders whose total quantity exceeds a threshold, with the
    customer. Quantity sums as exact integers; HAVING via post-agg filter."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_totalprice"),
            F.col("sum_qty"),
        )
    )


ORACLE_Q18 = """
SELECT c_name, o_orderkey, o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 150
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q16_supplier_variety(spark, sf_dir):
    """TPC-H q16 adapted (no partsupp table): distinct suppliers who shipped
    each (brand, size), excluding one brand — the distinct-agg shape (Spark
    expands to a two-phase partial aggregation)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).where(
        F.col("p_brand") != "Brand#1"
    )
    return j.groupBy("p_brand", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


ORACLE_Q16 = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
GROUP BY p_brand, p_size
"""


def q19_brand_revenue(spark, sf_dir):
    """TPC-H q19 adapted (no container column): revenue under an OR of
    brand/size/quantity conjunctions — the disjunctive-pushdown shape."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).where(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
    )
    return j.agg(
        _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_Q19 = f"""
SELECT {_money_sum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity <= 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
"""


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H q2 shape adapted (no partsupp — supply edges come from
    lineitem, 'cost' is supplier acctbal): for each size-15 part, the
    supplier(s) in region REGION_0 with the maximum account balance.
    The correlated MAX subquery is a per-part aggregate joined back on
    exact double equality; dims broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size") == 15)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "REGION_0")
    edges = l.select("l_partkey", "l_suppkey").distinct()
    cand = (
        edges.join(F.broadcast(p), edges.l_partkey == p.p_partkey)
        .join(F.broadcast(s), edges.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    best = cand.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.max("s_acctbal").alias("__max_bal")
    )
    return cand.join(
        best,
        (cand.p_partkey == best.__pk) & (cand.s_acctbal == best.__max_bal),
    ).select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")


ORACLE_Q2 = """
WITH edges AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name
  FROM edges
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size = 15 AND r_name = 'REGION_0'
)
SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name
FROM cand c
WHERE s_acctbal = (SELECT MAX(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
"""


def q9_product_profit(spark, sf_dir):
    """TPC-H q9 adapted (no ps_supplycost — cost modeled as
    0.6 * p_retailprice per unit): profit by supplier nation and order
    year for PROMO parts. The profit expression is floored to integer
    cents BEFORE summing so the aggregate is exact and order-free."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    cents = F.floor(amount * F.lit(100.0) + F.lit(0.5)).cast("long")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.withColumn("o_year", F.year("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg((F.sum(cents).cast("double") / F.lit(100.0)).alias("sum_profit"))
    )


ORACLE_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount)
                            - 0.6 * p_retailprice * l_quantity) * 100.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 100.0 AS sum_profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
GROUP BY n_name, year(o_orderdate)
"""


def q11_important_values(spark, sf_dir):
    """TPC-H q11 shape adapted (no partsupp — per-part traded value from
    NATION_4 suppliers' lineitems): parts whose value exceeds 0.1% of the
    total. HAVING against a scalar subquery = exact-cents agg broadcast
    back; the threshold comparison is integer arithmetic (cents * 10000 >
    total cents * 10), so no float boundary exists."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_4")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    base = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", cents.alias("__c"))
    )
    per_part = base.groupBy("l_partkey").agg(F.sum("__c").alias("__pc"))
    total = per_part.agg(F.sum("__pc").alias("__tc"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("__pc") * F.lit(10000) > F.col("__tc") * F.lit(10))
        .select(
            "l_partkey",
            (F.col("__pc").cast("double") / F.lit(100.0)).alias("part_value"),
        )
    )


ORACLE_Q11 = """
WITH base AS (
  SELECT l_partkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT) AS c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_4'
),
per_part AS (SELECT l_partkey, SUM(c) AS pc FROM base GROUP BY l_partkey)
SELECT l_partkey, CAST(pc AS DOUBLE) / 100.0 AS part_value
FROM per_part
WHERE pc * 10000 > (SELECT SUM(pc) FROM per_part) * 10
"""


def q13_customer_distribution(spark, sf_dir):
    """TPC-H q13 adapted (no o_comment — the excluded-orders predicate is
    on priority instead): distribution of per-customer order counts via a
    LEFT OUTER join with a compound ON condition, then a second groupBy.
    Both aggregations are pure count shuffles with map-side combine."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            on=[c.c_custkey == o.o_custkey, o.o_orderpriority != "1-URGENT"],
            how="left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


ORACLE_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
"""


def q15_top_supplier(spark, sf_dir):
    """TPC-H q15: supplier(s) with the maximum quarterly revenue. The view
    is one groupBy over lineitem; the scalar MAX is a 1-row broadcast join
    (no second scan of lineitem), and revenue is compared in exact integer
    cents so the equality is engine-independent."""
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-04-01"))
    )
    s = _t(spark, sf_dir, "supplier")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    rev = l.groupBy("l_suppkey").agg(F.sum(cents).alias("__cents"))
    top = rev.agg(F.max("__cents").alias("__max_cents"))
    return (
        rev.join(F.broadcast(top), rev.__cents == top.__max_cents)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("__cents").cast("double") / F.lit(100.0)).alias("total_revenue"),
        )
    )


ORACLE_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(cents AS DOUBLE) / 100.0 AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE cents = (SELECT MAX(cents) FROM revenue)
"""


def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H q17 adapted (no p_container — brand-only filter): yearly
    revenue lost to small orders. The correlated AVG subquery becomes a
    per-part groupBy joined back to lineitem; l_quantity is integer-valued
    so the average (= exact integer sum / count) is engine-independent."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    part_avg = (
        l.groupBy("l_partkey").agg(F.avg("l_quantity").alias("__avg_qty"))
    )
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(part_avg.withColumnRenamed("l_partkey", "__pk"), F.col("p_partkey") == F.col("__pk"))
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("__avg_qty"))
    )
    cents = F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
    return j.agg(
        (F.sum(cents).cast("double") / F.lit(700.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


ORACLE_Q17 = """
SELECT CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 700.0 AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < 0.2 * (
    SELECT AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


def q21_sole_fault_supplier(spark, sf_dir):
    """TPC-H q21 adapted (no commit/receipt dates — the 'fault' signal is
    l_returnflag = 'R'): suppliers who were the ONLY supplier with a
    returned item on a multi-supplier finalized order. EXISTS -> left-semi
    join, NOT EXISTS -> left-anti join; both are equi-joins on l_orderkey
    (shuffle-partitioned, no row duplication, AQE-skew-safe)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    l1 = l.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    others = l.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    others_r = l.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r2_orderkey"), F.col("l_suppkey").alias("r2_suppkey")
    )
    cand = (
        l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            others_r,
            (F.col("l_orderkey") == F.col("r2_orderkey"))
            & (F.col("l_suppkey") != F.col("r2_suppkey")),
            "left_anti",
        )
    )
    return (
        cand.join(F.broadcast(s), cand.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


ORACLE_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE l1.l_returnflag = 'R'
  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND EXISTS (
    SELECT 1 FROM orders WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
  )
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
"""


def q22_idle_customers(spark, sf_dir):
    """TPC-H q22 adapted (no phone column — country code is c_nationkey;
    every customer has orders, so the anti-join excludes customers with any
    URGENT order): wealthy-but-idle customer summary. The scalar AVG is an
    explicit exact-cents ratio broadcast to the probe side; NOT EXISTS is a
    left-anti equi-join."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_nationkey") < 10)
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("c_acctbal") * F.lit(100.0) + F.lit(0.5)).cast("long")
    thresh = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(cents).cast("double")
                / (F.count(F.lit(1)).cast("double") * F.lit(100.0))
            ).alias("__avg_bal")
        )
    )
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("__uk")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("__uk"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _money_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )


ORACLE_Q22 = f"""
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       {_money_sum_sql('c_acctbal', 'totacctbal')}
FROM customer
WHERE c_nationkey < 10
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / (CAST(COUNT(*) AS DOUBLE) * 100.0)
    FROM customer WHERE c_acctbal > 0.0 AND c_nationkey < 10
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
"""


def q20_dominant_suppliers(spark, sf_dir):
    """TPC-H q20 adapted (no partsupp/availqty — the 'excess stock' signal
    becomes shipped-share dominance): suppliers in NATION_1x who, for some
    red part, shipped MORE THAN HALF of that part's 1997 volume. The nested
    IN subqueries become two aggregations over ONE scan of the filtered
    lineitem (per-part totals are re-aggregated from the per-pair partials,
    not a second scan) and a left-semi join; the part filter is broadcast.
    l_quantity is integer-valued, so 2*pair > total is exact BIGINT math.

    Reference shape: TPC-H q20 (nested IN + correlated half-of-volume
    threshold)."""
    p = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("red")).select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    pairs = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("__pair_qty"))
    )
    totals = pairs.groupBy(F.col("l_partkey").alias("__tp")).agg(
        F.sum("__pair_qty").alias("__part_qty")
    )
    dominant = (
        pairs.join(totals, pairs.l_partkey == F.col("__tp"))
        .where(F.lit(2) * F.col("__pair_qty") > F.col("__part_qty"))
        .select(F.col("l_suppkey").alias("__dk"))
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name").startswith("NATION_1"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(dominant, s.s_suppkey == F.col("__dk"), "left_semi")
        .select("s_name", "s_acctbal")
    )


ORACLE_Q20 = """
WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
pairs AS (
  SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM red)
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
),
tot AS (SELECT l_partkey, SUM(q) AS pq FROM pairs GROUP BY l_partkey)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name LIKE 'NATION_1%'
  AND s_suppkey IN (
    SELECT p2.l_suppkey FROM pairs p2 JOIN tot USING (l_partkey)
    WHERE 2 * p2.q > pq
  )
"""


def q_rollup_revenue(spark, sf_dir):
    """Multi-level OLAP rollup: revenue by (nation, order-year), with
    per-nation subtotals and a grand total in ONE pass — Spark's
    ``rollup()`` plans a single Expand + hash aggregate (no re-scan per
    grouping level, unlike a UNION of aggregates). GROUPING() flags
    disambiguate subtotal rows from real NULL keys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").alias("o_year"),
            F.col("o_totalprice"),
        )
    )
    return (
        j.rollup("n_name", "o_year")
        .agg(
            F.grouping("n_name").cast("long").alias("g_nation"),
            F.grouping("o_year").cast("long").alias("g_year"),
            F.count(F.lit(1)).alias("n_orders"),
            _money_sum(F.col("o_totalprice"), "revenue"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("o_year").cast("string"), F.lit("ALL")).alias("year"),
            "g_nation",
            "g_year",
            "n_orders",
            "revenue",
        )
    )


ORACLE_ROLLUP = f"""
SELECT COALESCE(n_name, 'ALL') AS nation,
       COALESCE(CAST(o_year AS VARCHAR), 'ALL') AS year,
       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
       CAST(GROUPING(o_year) AS BIGINT) AS g_year,
       COUNT(*) AS n_orders,
       {_money_sum_sql('o_totalprice', 'revenue')}
FROM (
  SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year, o_totalprice
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
GROUP BY ROLLUP(n_name, o_year)
"""
