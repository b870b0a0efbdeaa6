"""Full TPC-H-shape query breadth (SURVEY.md §2.2 — joins, subqueries,
conditional aggregation, disjunctive pushdown).

The reference implements none of these (zero joins/subqueries in
/root/reference/main.py — verified in SURVEY.md §2.2); they are required
engine surface for a complete analytics rebuild. Q1/Q3/Q5/Q6 live in
relational_queries.py; this module adds the remaining classic TPC-H
shapes, adapted to the driver tables' slimmed schemas (no partsupp, no
l_commitdate/l_receiptdate/l_shipmode, no c_phone — see FIXTURES.md):

- Q2  -> argmin supplier per part, supplier<->part association derived
         from DISTINCT lineitem pairs (partsupp stand-in)
- Q4  -> EXISTS with a correlated cross-table predicate
         (l_shipdate > o_orderdate + 60 days stands in for
         l_commitdate < l_receiptdate)
- Q12 -> l_returnflag stands in for l_shipmode
- Q16/Q20-> supplier-per-part-class counts via the lineitem association
- Q21 -> "only late supplier" via shipdate lag vs order date
- Q22 -> country code from the c_name digit suffix instead of c_phone

Scale notes: every dim side is broadcast; fact-fact joins shuffle on
their join key only; all selective predicates are written on the scan
side so they push into the parquet reader; interpolated values are
rounded (+1e-9) per the cross-engine parity rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from app_insights_generator_spark.queries import register
from app_insights_generator_spark.queries import _exact as _x
from app_insights_generator_spark.queries._exact import (
    disc_price as _dec_disc_price,
)
from app_insights_generator_spark.queries._exact import money as _money
from app_insights_generator_spark.queries._exact import (
    sql_disc_price as _sql_disc_price,
)
from app_insights_generator_spark.sources import load_table

# Exact-decimal SQL twin of _disc_price() — see _exact.py for why every
# money SUM goes through DECIMAL (order-independent, cent-exact both engines).
_DP = _sql_disc_price()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


def _disc_price():
    """Exact DECIMAL(20,4) discounted price — summation-order-proof."""
    return _dec_disc_price()


@register(
    "q2_min_supplier_per_part",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    sup AS (
      SELECT ps.l_partkey AS partkey, s.s_suppkey, s.s_name, s.s_acctbal
      FROM ps
      JOIN supplier s ON ps.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
      SELECT partkey, s_name, s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY partkey
                                ORDER BY s_acctbal, s_suppkey) AS rn
      FROM sup
    )
    SELECT p.p_partkey, p.p_name, r.s_name AS best_supplier,
           ROUND(r.s_acctbal, 2) AS best_acctbal
    FROM ranked r JOIN part p ON p.p_partkey = r.partkey
    WHERE r.rn = 1 AND p.p_size <= 10
    """,
)
def q2_min_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (argmin join). The supplier<->part association is
    derived as DISTINCT (l_partkey, l_suppkey) — at 100 TB that distinct
    is a map-side-combining aggregate on the join key, far cheaper than
    carrying full lineitem rows; the argmin is a ROW_NUMBER window with a
    s_suppkey tiebreak for determinism (classic Q2 is nondeterministic
    under acctbal ties)."""
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    sup = (
        ps.join(s, ps.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select(F.col("l_partkey").alias("partkey"), "s_suppkey", "s_name", "s_acctbal")
    )
    w = Window.partitionBy("partkey").orderBy("s_acctbal", "s_suppkey")
    best = sup.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return best.join(p, p.p_partkey == best.partkey).select(
        "p_partkey",
        "p_name",
        F.col("s_name").alias("best_supplier"),
        F.round("s_acctbal", 2).alias("best_acctbal"),
    )


@register(
    "q4_order_priority_late",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated cross-table predicate
    (ships >60 days after order date, standing in for the reference
    schema's commit<receipt lateness). Planned as a left-semi join whose
    condition carries the non-equi term — no decorrelation UDF, no
    double-scan of orders."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-10-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
             {_sql_disc_price('l.l_extendedprice', 'l.l_discount')} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation-pair trade volume. The disjunctive
    nation-pair predicate applies AFTER both nation joins (it references
    both sides), but each branch's nation list lets Catalyst infer an
    IN ('NATION_3','NATION_7') filter onto each broadcast nation dim.
    The only shuffles are lineitem<->orders and the final group-by."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    o = _t(spark, sf_dir, "orders")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    pair = ["NATION_3", "NATION_7"]
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, s.s_nationkey == F.col("n1_key"))
        .join(n2, c.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
                      AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE) + 1e-9, 4) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             {_sql_disc_price('l.l_extendedprice', 'l.l_discount')} AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional trade volume —
    conditional-sum ratio over an 8-way join. Nation joins twice under
    different roles (customer region membership vs supplier nationality);
    every dim is broadcast so the fact side never shuffles for them."""
    p = F.broadcast(_t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY"))
    li = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
        )
    )
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
        )
    )
    volume = _disc_price()
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, c.c_nationkey == F.col("n1_key"))
        .join(r, F.col("n1_region") == r.r_regionkey)
        .join(n2, s.s_nationkey == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), volume.alias("volume"), "nation")
    )
    target = F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(20,4)")
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(target).cast("double") / F.sum("volume").cast("double") + 1e-9, 4
        ).alias("mkt_share")
    )


@register(
    "q9_product_type_profit",
    f"""
    SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             {_sql_disc_price('l.l_extendedprice', 'l.l_discount')} AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year for a LIKE-
    selected product family (supply-cost term dropped — no partsupp in
    the driver schema). The p_name LIKE '%gear%' contains-filter cannot
    use parquet min/max stats, but it prunes the broadcast part dim to a
    fraction before the fact join."""
    p = F.broadcast(_t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")))
    li = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    o = _t(spark, sf_dir, "orders")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(SUM({_sql_disc_price('l.l_extendedprice', 'l.l_discount')}),
                      2) AS DOUBLE) AS revenue,
           ROUND(c.c_acctbal, 2) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    quarter. Both selective predicates (quarter, returnflag) push to
    their scans; top-k plans as TakeOrderedAndProject with a c_custkey
    tiebreak for determinism."""
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_by_lineclass",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_by_lineclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts of urgent vs non-urgent order
    priority per line class (l_returnflag stands in for the absent
    l_shipmode). One fact-fact shuffle join, then a 3-group aggregate —
    the CASE arms are evaluated inside the partial aggregation, so only
    three rows per partition reach the final exchange."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer,
    including zero-order customers (LEFT OUTER + COUNT(col) null-skip
    semantics). Two-level aggregate; the second group-by is over a tiny
    domain so its shuffle is negligible."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue",
    f"""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN {_sql_disc_price('l.l_extendedprice', 'l.l_discount')}
                                  ELSE 0 END) AS DOUBLE)
                 / CAST(SUM({_sql_disc_price('l.l_extendedprice', 'l.l_discount')})
                        AS DOUBLE) + 1e-9,
                 4) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo share of monthly revenue — conditional-sum
    ratio, broadcast part dim, single-row result. The month filter is the
    only thing touching the fact scan; no shuffle beyond the final
    single-row reduce."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-10-01 00:00:00"))
    )
    p = F.broadcast(_t(spark, sf_dir, "part"))
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
        F.lit(0).cast("decimal(20,4)")
    )
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        F.round(
            100.0 * F.sum(promo).cast("double") / F.sum(_disc_price()).cast("double")
            + 1e-9,
            4,
        ).alias("promo_revenue")
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM({_DP}), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    a derived 'view' consumed twice (once for the max, once for the
    equality filter). Revenue is rounded BEFORE the max/equality so
    float summation-order noise can't break the tie across engines.
    Spark reuses the aggregated exchange for both consumers under AQE."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("mx"))
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == F.col("mx"))
        .join(s, s.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_count_by_partclass",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_count_by_partclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per part class, excluding a
    blacklist (NOT IN sub-select -> left-anti join; safe here because
    s_suppkey is non-null). The supplier<->part association comes from
    lineitem (no partsupp table); COUNT(DISTINCT) plans Expand-based
    exact distinct."""
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#13")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
        )
    )
    bad = F.broadcast(
        _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
                 / 7.0 + 1e-9, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type = 'SMALL'
      AND l.l_quantity < (
        SELECT ROUND(0.5 * AVG(l2.l_quantity) + 1e-9, 2)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-half-average-quantity orders —
    a correlated aggregate in the predicate. Implemented as a per-part
    average (map-side-combining groupBy over just (l_partkey,
    l_quantity)) joined back to the fact; the threshold is rounded in
    both engines so an exactly-at-boundary quantity can't flip on float
    summation order."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL"))
    avg_qty = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        F.round(0.5 * F.avg("l_quantity") + 1e-9, 2).alias("qty_threshold")
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .join(avg_qty, F.col("avg_partkey") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(_money("l_extendedprice")).cast("double") / 7.0 + 1e-9, 2
            ).alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest-quantity orders —
    IN over a HAVING sub-aggregate, planned as a semi join against the
    pre-aggregated order keys (tiny after HAVING, so it broadcasts)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT CAST(ROUND(SUM({_sql_disc_price('l.l_extendedprice', 'l.l_discount')}),
                      2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three-branch disjunction spanning both join
    sides. Catalyst extracts the per-side implied predicates (brand IN
    (...) AND size <= 35 onto part; quantity <= 30 onto lineitem) and
    pushes them below the join, so the scans skip most rows even though
    the full OR can only be evaluated post-join."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    j = li.join(p, p.p_partkey == li.l_partkey)
    branch = lambda brand, max_size, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, max_size)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return j.filter(
        branch("Brand#1", 15, 1, 11)
        | branch("Brand#9", 25, 10, 20)
        | branch("Brand#20", 35, 20, 30)
    ).agg(
        F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q21_only_late_supplier",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q21_only_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for late orders
    (>90 days after order date; the driver schema has no receipt/commit
    dates). The EXISTS / NOT EXISTS pair is re-expressed as ONE per-order
    aggregate — distinct suppliers and distinct late suppliers — instead
    of two extra correlated scans of lineitem: a late line qualifies iff
    the order has >=2 suppliers and exactly 1 late supplier (necessarily
    this one). Same result set, one lineitem pass instead of three."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn("is_late", late)
    stats = lo.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    return (
        lo.filter(F.col("is_late"))
        .join(stats, F.col("k") == F.col("l_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(s, s.s_suppkey == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


@register(
    "q22_inactive_rich_customers",
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DOUBLE)
             AS totacctbal
    FROM (
      SELECT SUBSTRING(c.c_name, 17, 2) AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE c.c_acctbal > (SELECT ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2)))
                                             AS DOUBLE) / COUNT(c_acctbal)
                                        + 1e-9, 2)
                           FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
    ) custsale
    GROUP BY cntrycode
    """,
)
def q22_inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders
    since 1998 (every customer in the driver data has SOME order, so the
    classic no-orders-ever predicate would be vacuously empty), bucketed
    by 'country code' (last-two digits of c_name — the driver schema has
    no c_phone). Scalar uncorrelated subquery (broadcast single row) +
    anti join; the average is rounded in both engines so boundary
    balances can't flip on summation order."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(
            F.sum(_money("c_acctbal")).cast("double") / F.count("c_acctbal") + 1e-9,
            2,
        ).alias("avg_bal")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1998-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.substring("c_name", 17, 2).alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_money("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
    )


@register(
    "q11_important_part_value",
    """
    WITH supply AS (
      SELECT l.l_partkey,
             CAST(l.l_quantity AS DECIMAL(4,0))
               * CAST(p.p_retailprice AS DECIMAL(14,2)) AS value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE n.n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
    ), per_part AS (
      SELECT l_partkey, SUM(value) AS pv FROM supply GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(pv AS DOUBLE) AS part_value
    FROM per_part
    WHERE CAST(pv AS DOUBLE) > 0.001 * (SELECT CAST(SUM(pv) AS DOUBLE) FROM per_part)
    """,
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 (important stock value), adapted: shipped lineitem quantity x
    part retail price stands in for ps_availqty x ps_supplycost. The Q11
    shape is the group-by whose HAVING threshold is a scalar fraction of
    the GLOBAL total. One pass over the fact: the global total is the sum
    of the per-part sums, so lineitem is scanned once, and the one-row
    total is broadcast back onto the per-part aggregate (no second scan,
    no shuffle for the threshold). All three dims broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
    )
    p = _t(spark, sf_dir, "part")
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    supply = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "l_partkey",
            (
                F.col("l_quantity").cast("decimal(4,0)")
                * F.col("p_retailprice").cast("decimal(14,2)")
            ).alias("value"),
        )
    )
    per_part = supply.groupBy("l_partkey").agg(F.sum("value").alias("pv"))
    total = per_part.agg(F.sum("pv").cast("double").alias("tv"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("pv").cast("double") > 0.001 * F.col("tv"))
        .select("l_partkey", F.col("pv").cast("double").alias("part_value"))
    )


@register(
    "q20_excess_supply_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%' AND l_shipdate >= TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 60
    )
    """,
)
def q20_excess_supply_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 (suppliers with excess stock), adapted: a supplier qualifies
    when some red part it ships moved more than 60 units after 1998 —
    the partsupp availability check becomes a grouped-HAVING over the
    lineitem association. Shape: IN-subquery containing its own
    aggregation, planned as fact-side agg -> distinct keys -> left-semi
    join into the dim. The red-part filter broadcasts into the lineitem
    scan; the semi join carries only supplier keys."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = _t(spark, sf_dir, "supplier")
    movers = (
        li.filter(F.col("l_shipdate") >= _ts("1998-01-01"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
        .distinct()
    )
    return s.join(
        movers, s.s_suppkey == movers.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# --- Cohort lifetime-value curve ---------------------------------------------------


@register(
    "ltv_cohort_curve_orders",
    f"""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(CAST(year(o_orderdate) AS BIGINT)) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    per AS (
      SELECT f.cohort,
             CAST(year(o.o_orderdate) AS BIGINT) - f.cohort AS age,
             CAST(SUM({{CENTS}}) AS BIGINT) AS rev_cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    sized AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_users
      FROM firsts GROUP BY cohort
    )
    SELECT p.cohort, p.age, s.cohort_users, p.n_orders, p.rev_cents,
           CAST(SUM(p.rev_cents) OVER (PARTITION BY p.cohort ORDER BY p.age
                                       ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_rev_cents,
           CAST(SUM(p.rev_cents) OVER (PARTITION BY p.cohort ORDER BY p.age
                                       ROWS UNBOUNDED PRECEDING)
                // s.cohort_users AS BIGINT) AS ltv_cents_per_user
    FROM per p JOIN sized s ON s.cohort = p.cohort
    """.replace("{CENTS}", _x.sql_cents("o_totalprice")),
)
def ltv_cohort_curve_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve — the revenue companion of
    retention_cohorts_events and the number a growth team actually
    plans against: customers are cohorted by first-order year, and each
    (cohort, age) cell carries exact order counts, revenue cents, the
    running cumulative revenue, and cumulative LTV per cohort user
    (trunc-DIV of two exact int64s — fully float-free). Age is in
    years (the order-date grain of the TPC-H-shaped data); the same
    plan works at month grain by swapping the year() bucketing.

    Plan: one shuffle to the customer grain for first-order dates, a
    broadcast-ably small (custkey, cohort) table joined back onto the
    fact scan (at 100 TB: shuffled hash join on the natural key), one
    (cohort, age) rollup — the window then runs over the tiny
    cohort × age grid.

    Reference parity: no counterpart; §2.2 analytics extension.
    Registered on ROTATION_NEXT (round-11 window; post-sweep addition)."""
    o = _t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate").cast("long")).alias("cohort")
    )
    per = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort",
            (F.year("o_orderdate").cast("long") - F.col("cohort")).alias(
                "age"
            ),
        )
        .agg(
            F.expr(
                f"CAST(SUM({_x.sql_cents('o_totalprice')}) AS BIGINT)"
            ).alias("rev_cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )
    sized = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per.join(F.broadcast(sized), "cohort")
        .withColumn("cum_rev_cents", F.sum("rev_cents").over(w).cast("long"))
        .select(
            "cohort",
            "age",
            "cohort_users",
            "n_orders",
            "rev_cents",
            "cum_rev_cents",
            F.expr("cum_rev_cents DIV cohort_users")
            .cast("long")
            .alias("ltv_cents_per_user"),
        )
    )
