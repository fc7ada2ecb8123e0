"""Relational + analytics query registry (SURVEY.md Milestone 2): TPC-H-style
coverage, windows, rollup, pivot, set ops, semi/anti joins, as-of joins,
sessionization, resampling — all stock Spark SQL, each with a DuckDB oracle.

Determinism contract: every unordered SUM over doubles goes through
DECIMAL(12,2) (exact, association-free) and is cast to double at the end on
BOTH engines; window running sums are sequential per-row folds and stay
double; every top-k carries a unique tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from es_ch_sync_spark.io.sources import read_parquet_table
from es_ch_sync_spark.operators.analytics import (
    asof_join,
    resample,
    session_stats,
    topk_per_group,
)
from es_ch_sync_spark.operators.transform import unpivot_signals
from es_ch_sync_spark import oracles
from es_ch_sync_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


_DEC = "decimal(12,2)"


# ---------------------------------------------------------------------------
# TPC-H-style aggregation / joins
# ---------------------------------------------------------------------------

@register(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
        sum(l_quantity::DECIMAL(12,2))::DOUBLE AS sum_qty,
        sum(l_extendedprice::DECIMAL(12,2))::DOUBLE AS sum_base_price,
        sum(l_extendedprice::DECIMAL(12,2) * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2)))::DOUBLE AS sum_disc_price,
        sum(l_extendedprice::DECIMAL(12,2) * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2)) * (1::DECIMAL(12,2) + l_tax::DECIMAL(12,2)))::DOUBLE AS sum_charge,
        round(sum(l_quantity::DECIMAL(12,2))::DOUBLE / count(*), 6) AS avg_qty,
        round(sum(l_extendedprice::DECIMAL(12,2))::DOUBLE / count(*), 6) AS avg_price,
        round(sum(l_discount::DECIMAL(12,2))::DOUBLE / count(*), 6) AS avg_disc,
        count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary — partial-agg (map-side combine) on 2 group keys;
    DECIMAL sums for cross-engine exactness, DOUBLE at the surface."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    tax = F.col("l_tax").cast(_DEC)
    one = F.lit(1).cast(_DEC)
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
        F.round(F.sum(qty).cast("double") / n, 6).alias("avg_qty"),
        F.round(F.sum(price).cast("double") / n, 6).alias("avg_price"),
        F.round(F.sum(disc).cast("double") / n, 6).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "tpch_q3_top10",
    """
    SELECT l_orderkey,
           sum(l_extendedprice::DECIMAL(12,2) * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2)))::DOUBLE AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority top-10: broadcast the filtered customer dim, shuffle
    only the orders⋈lineitem join; TakeOrderedAndProject for the limit."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    rev = F.col("l_extendedprice").cast(_DEC) * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_q10_returned",
    """
    SELECT c_custkey, c_name,
           sum(l_extendedprice::DECIMAL(12,2) * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2)))::DOUBLE AS revenue,
           c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item revenue top-20): one shuffle join
    (orders⋈lineitem), both dims broadcast, decimal-exact revenue so the
    cross-engine ordering has no float ambiguity."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice").cast(_DEC) * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q18_large_orders",
    """
    WITH big AS (
        SELECT l_orderkey AS big_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 200
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity)::DOUBLE AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
                  JOIN big ON o_orderkey = big_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): the HAVING subquery becomes a
    partial-aggregated key set semi-joined into orders BEFORE the wide
    join — lineitem is re-read only for qualifying orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 200)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o_big = o.join(big, o.o_orderkey == F.col("big_orderkey"), "left_semi")
    return (
        li.join(o_big, li.l_orderkey == o_big.o_orderkey)
        .join(F.broadcast(c), o_big.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "tpch_q5_local",
    """
    SELECT n_name,
           sum(l_extendedprice::DECIMAL(12,2) * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2)))::DOUBLE AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full TPC-H Q5 (local supplier volume), including the
    customer-nation = supplier-nation equality that makes it the classic
    join-ORDER benchmark: the only shuffle join is lineitem⋈orders;
    supplier/customer/nation/region all broadcast, and the local-supplier
    condition rides the supplier broadcast join as a residual — no extra
    shuffle.  Decimal-exact revenue."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@register(
    "tpch_q7_volume",
    """
    SELECT supp_nation, cust_nation, l_year, sum(volume)::DOUBLE AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               extract(year FROM l_shipdate)::BIGINT AS l_year,
               l_extendedprice::DECIMAL(12,2)
                   * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2)) AS volume
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                      JOIN orders   ON o_orderkey = l_orderkey
                      JOIN customer ON c_custkey = o_custkey
                      JOIN nation n1 ON s_nationkey = n1.n_nationkey
                      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): the two-sided nation-pair query — the
    SAME dimension (nation) joins the fact twice under different roles,
    with a disjunctive cross-role predicate.  Both nation joins and
    supplier/customer broadcast; lineitem⋈orders is the only shuffle, and
    the nation-pair disjunction rides the broadcasts as residuals (it
    cannot be pushed to either scan alone since it couples both sides).
    Decimal-exact volume, grouped by shipdate year."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    vol = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(vol).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q14_promo_share",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                 THEN (l_extendedprice::DECIMAL(12,2) * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2)))
                 ELSE 0::DECIMAL(12,2) END)::DOUBLE
           / sum(l_extendedprice::DECIMAL(12,2) * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2)))::DOUBLE,
           6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promo revenue share): conditional aggregate over a
    month of lineitem joined to part.  Part broadcasts here; at 100 TB the
    part table is big enough that this becomes the bucketed-join case
    (io/bucketed.py) — the query shape is unchanged.  The shipdate band
    reaches the scan as a pushed filter."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(_DEC))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q19_disjunctive",
    """
    SELECT sum(l_extendedprice::DECIMAL(12,2) * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2)))::DOUBLE AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive band predicates): three OR'd
    brand/size/quantity bands evaluated as a residual on the broadcast
    part join.  Catalyst pushes the derivable per-side conjuncts
    (p_brand IN (…), l_quantity between the band hull) below the join —
    the OR does not defeat pushdown."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)
    )
    return j.filter(band).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "revenue_by_nation",
    """
    SELECT n_name,
           sum(l_extendedprice::DECIMAL(12,2) * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2)))::DOUBLE AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-style multi-join: all dims broadcast (the star-schema pattern — the
    only shuffle is the fact-side aggregation)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice").cast(_DEC) * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "rollup_returns",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity::DECIMAL(12,2))::DOUBLE AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set aggregation (subtotals + grand total)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "pivot_order_status",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (priority × status counts); coalesce(0) matches FILTER's empty
    count on the oracle side."""
    o = _t(spark, sf_dir, "orders")
    p = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["O", "F", "P"]).count()
    return p.select(
        "o_orderpriority",
        F.coalesce("O", F.lit(0)).alias("O"),
        F.coalesce("F", F.lit(0)).alias("F"),
        F.coalesce("P", F.lit(0)).alias("P"),
    )


# ---------------------------------------------------------------------------
# Semi/anti joins, set ops, distinct
# ---------------------------------------------------------------------------

@register(
    "semi_join_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "anti_join_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no recent orders (anti join against a filtered fact)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("2001-01-01"))
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "set_ops_users",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 90
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'signup' AND value > 80
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT (both plan as aggregated joins)."""
    e = _t(spark, sf_dir, "events")
    purchasers = e.filter((F.col("event_type") == "purchase") & (F.col("value") > 90)).select("user_id")
    errorers = e.filter(F.col("event_type") == "error").select("user_id")
    signups = e.filter((F.col("event_type") == "signup") & (F.col("value") > 80)).select("user_id")
    return purchasers.intersect(errorers).subtract(signups)


@register(
    "distinct_counts",
    """
    SELECT count(DISTINCT user_id) AS n_users, count(DISTINCT event_type) AS n_types
    FROM events
    """,
)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "snapshot_diff",
    """
    WITH old AS (
        SELECT event_id, value FROM events WHERE event_id % 10 != 0
    ), new AS (
        SELECT event_id,
               CASE WHEN event_type = 'click' THEN round(value + 1.0, 6) ELSE value END AS value
        FROM events
    )
    SELECT coalesce(o.event_id, n.event_id) AS event_id,
           CASE WHEN o.event_id IS NULL THEN 'added'
                WHEN n.event_id IS NULL THEN 'removed'
                ELSE 'updated' END AS change_type,
           o.value AS old_value, n.value AS new_value
    FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
    WHERE o.event_id IS NULL OR n.event_id IS NULL OR o.value != n.value
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed CDC diff between two snapshots (added/removed/updated feed) —
    here old = 90% of events, new = all events with click values bumped;
    the diff is exactly the adds + the click updates."""
    from es_ch_sync_spark.operators.maintenance import snapshot_diff

    e = _t(spark, sf_dir, "events")
    old = e.filter(F.col("event_id") % 10 != 0).select("event_id", "value")
    new = e.select(
        "event_id",
        F.when(
            F.col("event_type") == "click", F.round(F.col("value") + 1.0, 6)
        ).otherwise(F.col("value")).alias("value"),
    )
    return snapshot_diff(old, new, key_cols=["event_id"], compare_cols=["value"])


@register(
    "approx_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50_exact,
           round(quantile_cont(value, 0.95), 6) AS p95_exact,
           1 AS within_tol
    FROM events GROUP BY event_type
    """,
)
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — the 100 TB quantile
    path: mergeable per-partition sketches, no global sort.

    Like approx_distinct_users, the checked contract is bounded-error:
    emit the exact interpolated percentiles plus ``within_tol`` = 1 iff
    every sketch estimate lands within 5% relative (or 0.05 absolute) of
    its exact value at accuracy=10000.  The oracle recomputes the exact
    side and asserts within_tol."""
    e = _t(spark, sf_dir, "events")
    tol = lambda approx, exact: (  # noqa: E731
        F.abs(approx - exact) <= F.greatest(F.abs(exact) * 0.05, F.lit(0.05))
    )
    agg = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("e50"),
        F.expr("percentile(value, 0.95)").alias("e95"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("a95"),
    )
    return agg.select(
        "event_type",
        F.round("e50", 6).alias("p50_exact"),
        F.round("e95", 6).alias("p95_exact"),
        (tol(F.col("a50"), F.col("e50")) & tol(F.col("a95"), F.col("e95")))
        .cast("int")
        .alias("within_tol"),
    )


@register(
    "stats_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation ≙ quantile_cont) + second-
    moment statistics — rounded to 6dp (double association noise ~1e-12)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("med_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
    )


@register(
    "approx_distinct_users",
    """
    SELECT count(DISTINCT user_id)::BIGINT AS n_users_exact, 1 AS within_tol
    FROM events
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — the 100 TB cardinality path.

    Sketch values differ across engines by design, so the checked contract
    is a bounded-error one: the query emits the exact distinct count plus
    ``within_tol`` = 1 iff the HLL++ estimate (rsd=0.01) lands within 5%
    relative error of it.  The oracle recomputes the exact count and
    asserts within_tol=1 — a hash match certifies both the exact path and
    the sketch's documented error bound."""
    e = _t(spark, sf_dir, "events")
    agg = e.agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", 0.01).alias("approx"),
    )
    return agg.select(
        F.col("n_users_exact"),
        (
            F.abs(F.col("approx") - F.col("n_users_exact"))
            <= F.col("n_users_exact") * F.lit(0.05)
        )
        .cast("int")
        .alias("within_tol"),
    )


@register(
    "json_extract_props",
    """
    SELECT event_id, user_id,
           json_extract(props, '$.k')::BIGINT AS k_val
    FROM events
    WHERE json_extract(props, '$.k')::BIGINT > 50
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: pull a field out of the JSON props column
    (get_json_object ≙ DuckDB json_extract) and filter on it."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_id", "user_id", k.alias("k_val"))
        .filter(F.col("k_val") > 50)
    )


@register("kmeans_cells", oracles.kmeans_cells_sql(k=4, iters=2, dim=64))
def q_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational k-means (Lloyd's) cell assignment — the real IVF coarse
    quantizer, fit as pure DataFrame aggregations with no driver-side
    vectors; oracle = the same iterations unrolled as CTEs."""
    from es_ch_sync_spark.operators.clustering import kmeans_assign

    return kmeans_assign(read_parquet_table(spark, sf_dir, "embeddings"), k=4, iters=2)


@register(
    "ann_ivf_kmeans_topk",
    oracles.ivf_kmeans_topk_sql(query_id=0, k=10, n_cells=4, iters=2, dim=64),
)
def q_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the REAL k-means coarse quantizer (kmeans_cells), not
    the label stand-in: fit → final centroids → argmax cell → in-cell
    top-k, all relational, no driver-side vectors; every stage replicated
    in the oracle."""
    from es_ch_sync_spark.operators.clustering import ivf_topk

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, _ivf_query_vec(sf_dir, 0), k=10, n_cells=4, iters=2, exclude_id=0)


@register("pq_codes", oracles.pq_codes_sql(m=4, ksub=4, iters=2, dim=64))
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (Jégou 2011): 4 per-subspace k-means
    run simultaneously (``sub`` in every grouping key); each vector becomes
    4 codeword ids.  Oracle = the same iterations unrolled as CTEs."""
    from es_ch_sync_spark.operators.clustering import pq_fit

    codes, _ = pq_fit(
        read_parquet_table(spark, sf_dir, "embeddings"), m=4, ksub=4, iters=2, dim=64
    )
    return codes


@register(
    "ann_pq_adc_topk",
    oracles.pq_adc_topk_sql(query_id=0, k=10, m=4, ksub=4, iters=2, dim=64),
)
def q_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k over PQ codes: per-query LUT (m·ksub rows, broadcast)
    joined to the code table, summed lookups ≈ squared L2 — the scoring
    scan never touches raw vectors, which at 100 TB is the entire point
    of PQ (codes ~32× smaller than float32 vectors)."""
    from es_ch_sync_spark.operators.clustering import pq_adc_topk

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(
        emb, _ivf_query_vec(sf_dir, 0), k=10, m=4, ksub=4, iters=2, dim=64, exclude_id=0
    )


@register(
    "ann_ivfpq_topk",
    oracles.ivfpq_topk_sql(query_id=0, k=10, n_cells=4, m=4, ksub=4, iters=2, dim=64),
)
def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (FAISS IVF-PQ): coarse cells + residual product quantization,
    query scored by a residual LUT over the probed cell's codes only — the
    full scale ladder's top rung, every stage oracle-replicated."""
    from es_ch_sync_spark.operators.clustering import ivfpq_topk

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb, _ivf_query_vec(sf_dir, 0), k=10, n_cells=4, m=4, ksub=4, iters=2, exclude_id=0
    )


@register(
    "ann_ivfpq_rerank_topk",
    oracles.ivfpq_rerank_topk_sql(
        query_id=0, k=10, shortlist=30, n_cells=4, m=4, ksub=4, iters=2, dim=64
    ),
)
def q_ann_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC + exact rerank (Jégou §III.C "IVFADC+R"): ADC shortlists 30
    candidates from the probed cell's codes, exact cosine rescores only
    those ids — PQ approximation gone from the final ranking, scan still
    codes-only.  The oracle widens the IVFADC top-k to the shortlist and
    replays the cosine rerank."""
    from es_ch_sync_spark.operators.clustering import ivfpq_rerank_topk

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return ivfpq_rerank_topk(
        emb, _ivf_query_vec(sf_dir, 0), k=10, shortlist=30,
        n_cells=4, m=4, ksub=4, iters=2, exclude_id=0,
    )


def _ivfpq_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Persisted IVF-PQ index for this sf, built once into a tmp dir
    (r13 VERDICT #4): the serving layout a real deployment materializes —
    cell-partitioned code lists + centroid/codebook metadata — so every
    query over it is an index READ, never a refit."""
    import hashlib
    import os
    import tempfile

    from es_ch_sync_spark.io.ann_index import build_ivfpq_index

    # Key the cache on a CONTENT fingerprint of the embeddings parquet
    # (relative path + size + mtime of every data file), not just the
    # sf_dir path (ADVICE r14): a regenerated table under the same path
    # gets a fresh index instead of serving a stale one, and a foreign
    # /tmp directory for the old key can't be picked up.  uid in the tag
    # keeps per-user caches separate on shared hosts.
    src = os.path.join(sf_dir, "embeddings.parquet")
    parts = [sf_dir]
    if os.path.isdir(src):
        for root, _dirs, files in os.walk(src):
            for fn in sorted(files):
                p = os.path.join(root, fn)
                st = os.stat(p)
                parts.append(
                    f"{os.path.relpath(p, src)}:{st.st_size}:{st.st_mtime_ns}"
                )
    elif os.path.exists(src):
        st = os.stat(src)
        parts.append(f".:{st.st_size}:{st.st_mtime_ns}")
    uid = os.getuid() if hasattr(os, "getuid") else 0
    tag = hashlib.md5("|".join(parts).encode()).hexdigest()[:16]
    out = os.path.join(
        tempfile.gettempdir(), f"es_ch_sync_spark_ivfpq_u{uid}_{tag}"
    )
    if not os.path.exists(os.path.join(out, "codebook", "_SUCCESS")):
        emb = read_parquet_table(spark, sf_dir, "embeddings")
        build_ivfpq_index(
            emb, out, n_cells=4, m=4, ksub=4, iters=2, dim=64
        )
    return out


@register(
    "ann_ivfpq_index_topk",
    oracles.ivfpq_probe_topk_sql(
        query_id=0, k=10, nprobe=2, n_cells=4, m=4, ksub=4, iters=2, dim=64
    ),
)
def q_ann_ivfpq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ over the PERSISTED index (io/ann_index.py, r13 VERDICT #4):
    build once (coarse cells + residual-PQ codes, partitionBy(cell)), then
    serve ADC top-k reading ONLY the nprobe=2 probed cells' code
    partitions — the cell filter lands as a PartitionFilter and the scan
    touches m small ints per vector instead of the raw float vectors.
    The oracle re-derives the whole chain (coarse k-means, residual PQ,
    top-nprobe probe, per-cell residual LUTs, summed-lookup top-k)."""
    from es_ch_sync_spark.io.ann_index import search_ivfpq_index

    path = _ivfpq_index_dir(spark, sf_dir)
    return search_ivfpq_index(
        spark, path, _ivf_query_vec(sf_dir, 0), k=10, nprobe=2, exclude_id=0,
        sub_dim=16,  # index geometry: dim 64 / m 4 (skips the metadata job)
    )


def _ann_ivfpq_recall_oracle(k: int = 10) -> str:
    exact = oracles.cosine_topk_sql(query_id=0, k=k)
    parts = []
    for np_ in (1, 2, 4):
        probe = oracles.ivfpq_probe_topk_sql(
            query_id=0, k=k, nprobe=np_, n_cells=4, m=4, ksub=4, iters=2,
            dim=64,
        )
        parts.append(
            f"SELECT 'nprobe={np_}' AS method,\n"
            f"  (SELECT count(*) FROM (SELECT vec_id FROM ({probe}))\n"
            f"   JOIN e USING (vec_id))::DOUBLE / {k} AS recall_at_k"
        )
    body = "\nUNION ALL\n".join(parts)
    return f"WITH e AS ({exact})\n{body}"


@register("ann_ivfpq_recall", _ann_ivfpq_recall_oracle(k=10))
def q_ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the PERSISTED IVF-PQ serving path at every probe
    depth (nprobe ∈ {1, 2, 4} of the 4-cell index) against the exact
    cosine baseline — the accuracy side of the nprobe/latency trade-off
    the ann_ivfpq ×100 bench rows price (r14 VERDICT directive #5).  Each
    probe depth reads only its probed cells' code partitions
    (PartitionFilter), so the recall curve is measured on the REAL index
    layout a deployment serves from, not a refit.  Deterministic by
    construction: every input is a deterministic top-k; the oracle
    re-derives the full coarse+residual-PQ chain per depth."""
    from es_ch_sync_spark.io.ann_index import search_ivfpq_index_multi
    from es_ch_sync_spark.operators.similarity import cosine_topk

    k = 10
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    qv = _ivf_query_vec(sf_dir, 0)
    exact = cosine_topk(emb, qv, k=k, exclude_id=0).select("vec_id")
    path = _ivfpq_index_dir(spark, sf_dir)
    # r16 optimization (guide §1.2/§2.4): all three probe depths score
    # in ONE codes scan + ONE aggregate (search_ivfpq_index_multi —
    # the per-depth searches differ only in which ranked-prefix cells
    # they keep), then ONE left join against the exact baseline
    # replaces the three per-depth join+agg legs.  Identical recall
    # values: the per-depth top-k sets are unchanged (same LUT, same
    # (adc_dist, vec_id) order), and the inner-hit count per method is
    # the same sum the per-leg joins produced.
    approx_all = search_ivfpq_index_multi(
        spark, path, qv, k=k, depths=(1, 2, 4), exclude_id=0,
        sub_dim=16,  # index geometry: dim 64 / m 4 (skips the metadata job)
    )
    hits = exact.withColumn("_hit", F.lit(1))
    return (
        approx_all.join(hits, "vec_id", "left")
        .groupBy("method")
        .agg(
            (
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double") / k
            ).alias("recall_at_k")
        )
    )


@register("ann_ivf_topk", oracles.ann_ivf_topk_sql(query_id=0, k=10, dim=64))
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize by the label column (stand-in for
    k-means cell ids), search only the query's cell.  The scale pattern for
    clustered corpora: per-cell partition pruning replaces the full scan.
    Approximate vs exact kNN by construction, but fully deterministic —
    the oracle replicates the centroid argmax + in-cell top-k exactly."""
    import math

    from es_ch_sync_spark.operators.similarity import cosine_topk

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    qv = _ivf_query_vec(sf_dir, 0)

    # centroids computed IN Spark (posexplode → partial-aggregated avgs);
    # the driver only collects the tiny (n_cells × dim) centroid table
    cent_rows = (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
        .collect()
    )
    cents: dict[int, dict[int, float]] = {}
    for r in cent_rows:
        cents.setdefault(r["label"], {})[r["pos"]] = r["c"]
    qn = math.sqrt(sum(x * x for x in qv))
    best_lab, best_cos = None, -2.0
    # sorted: exact-cos ties pick the smaller label, same as the oracle
    for lab, d in sorted(cents.items()):
        c = [d[i] for i in range(len(qv))]
        cn = math.sqrt(sum(x * x for x in c))
        cos = sum(a * b for a, b in zip(qv, c)) / (qn * cn) if cn > 0 else -2.0
        if cos > best_cos:
            best_lab, best_cos = lab, cos
    cell = emb.filter(F.col("label") == best_lab)
    return cosine_topk(cell, qv, k=10, exclude_id=0)


@register(
    "salted_join_events",
    """
    SELECT e.event_id, e.user_id, c.c_name
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient salted join — same rows as the plain equi-join (the
    oracle), hot keys spread over `salt` reducers."""
    from es_ch_sync_spark.operators.joins import salted_join

    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    return salted_join(e, c, key="user_id", salt=8).select("event_id", "user_id", "c_name")


@register(
    "salted_agg_events",
    """
    SELECT user_id,
           count(*) AS n_events,
           min(ts) AS first_ts,
           max(ts) AS last_ts,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation — same result as the plain
    GROUP BY (the oracle), hot keys' reduce work spread over 16 salts.
    DECIMAL sum for cross-engine determinism (order-free)."""
    from es_ch_sync_spark.operators.joins import salted_agg

    e = _t(spark, sf_dir, "events")
    out = salted_agg(
        e,
        "user_id",
        [
            ("count", None, "n_events"),
            ("min", F.col("ts"), "first_ts"),
            ("max", F.col("ts"), "last_ts"),
            ("sum", F.col("value").cast(_DEC), "total_value"),
        ],
        salt=16,
    )
    return out.select(
        "user_id",
        "n_events",
        "first_ts",
        "last_ts",
        F.col("total_value").cast("double").alias("total_value"),
    )


@register(
    "range_join_events",
    """
    SELECT l.event_id AS id_l, r.event_id AS id_r, l.user_id
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_id != r.event_id
     AND abs(epoch_us(l.ts) - epoch_us(r.ts)) <= 600 * 1000000::BIGINT
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (events of the same user within 10 min of each other)
    via time-cell bucketing — an equi-join on (key, cell) instead of the
    O(n·m) inequality join the oracle runs."""
    from es_ch_sync_spark.operators.joins import range_join_buckets

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = range_join_buckets(e, e, key="user_id", max_gap_seconds=600)
    return out.filter(F.col("l.event_id") != F.col("r.event_id")).select(
        F.col("l.event_id").alias("id_l"),
        F.col("r.event_id").alias("id_r"),
        F.col("l.user_id").alias("user_id"),
    )


def _ivf_query_vec(sf_dir: str, vec_id: int) -> list[float]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return t.column("embedding").to_pylist()[t.column("vec_id").to_pylist().index(vec_id)]


@register(
    "dedup_keep_one",
    """
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id IN (
        SELECT min(doc_id) FROM documents
        GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    )
    """,
)
def q_dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full exact-dedup operation (not just the groups): keep one
    representative per content fingerprint via broadcast semi-join."""
    from es_ch_sync_spark.operators.dedup import dedup_exact

    return dedup_exact(_t(spark, sf_dir, "documents")).select("doc_id", "lang", "source")


@register(
    "asof_join_tolerance",
    """
    SELECT e.event_id, e.user_id, e.ts,
           CASE WHEN p.ts >= e.ts - INTERVAL 6 HOUR THEN p.ts END AS matched_ts,
           CASE WHEN p.ts >= e.ts - INTERVAL 6 HOUR THEN p.value END AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 6h tolerance: matches older than the window are
    nulled (pandas merge_asof-style tolerance semantics)."""
    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_join(
        errors, purchases, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["purchase_value"], tolerance_seconds=6 * 3600,
    )
    return out.select("event_id", "user_id", "ts", "matched_ts", "purchase_value")


@register(
    "asof_join_bucketed",
    """
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
         p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
         m AS (
           SELECT e.event_id, p.ts AS matched_ts, p.value AS purchase_value,
                  row_number() OVER (PARTITION BY e.event_id
                                     ORDER BY p.ts DESC, p.value DESC) AS rn
           FROM e JOIN p ON e.user_id = p.user_id
             AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 6 HOUR
         )
    SELECT e.event_id, e.user_id, e.ts, m.matched_ts, m.purchase_value
    FROM e LEFT JOIN m ON e.event_id = m.event_id AND m.rn = 1
    """,
)
def q_asof_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of via interval cells + max(struct) reduce —
    the no-global-sort scale plan; must equal asof_join_tolerance where
    the tolerance binds (same 6h window)."""
    from es_ch_sync_spark.operators.analytics import asof_join_bucketed

    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_join_bucketed(
        errors, purchases, key="user_id", id_col="event_id",
        left_ts="ts", right_ts="ts", right_cols=["purchase_value"],
        tolerance_seconds=6 * 3600,
    )
    return out.select("event_id", "user_id", "ts", "matched_ts", "purchase_value")


@register(
    "signal_daily_rollup",
    """
    WITH tall AS (
        SELECT user_id AS token_id, ts AS timestamp, 'value' AS name,
               value AS value_number
        FROM events WHERE value IS NOT NULL
    )
    SELECT token_id, date_trunc('day', timestamp)::DATE AS day, name,
           count(*) AS n,
           min(value_number) AS v_min,
           max(value_number) AS v_max,
           sum(value_number::DECIMAL(18,4))::DOUBLE AS v_sum
    FROM tall GROUP BY token_id, date_trunc('day', timestamp)::DATE, name
    """,
)
def q_signal_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-aggregate read-model: daily (token, name) rollup over
    the tall signal table (decomposable aggs → incrementally maintainable,
    io/maintenance.py::maintain_daily_rollup)."""
    from es_ch_sync_spark.catalog import SignalCatalog, SignalDef
    from es_ch_sync_spark.io.maintenance import build_daily_rollup

    cat = SignalCatalog([SignalDef("value", "value", "number")])
    e = _t(spark, sf_dir, "events").withColumn("src", F.lit("events"))
    tall = unpivot_signals(e, cat, token_col="user_id", ts_col="ts", source_col="src")
    return build_daily_rollup(tall)


def _profile_oracle() -> str:
    cols = [("event_id", "bigint"), ("ts", "timestamp"), ("user_id", "bigint"),
            ("event_type", "string"), ("value", "double"), ("props", "string")]
    parts = [
        f"""
        SELECT '{c}' AS column, '{t}' AS dtype,
               count(*) AS n_rows,
               count(*) - count({c}) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               min({c}::VARCHAR) AS min_str,
               max({c}::VARCHAR) AS max_str
        FROM events
        """
        for c, t in cols
    ]
    return " UNION ALL ".join(parts)


@register("profile_events", _profile_oracle())
def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of the events table (nulls,
    cardinality, min/max) — one aggregation pass, #cols output rows."""
    from es_ch_sync_spark.operators.profile import profile_table

    return profile_table(_t(spark, sf_dir, "events"))


_STREAM_ORACLE = """
    SELECT DISTINCT user_id AS token_id, ts AS timestamp, 'value' AS name,
           'events' AS source, value AS value_number,
           CAST(NULL AS VARCHAR) AS value_string
    FROM events WHERE value IS NOT NULL
"""


def _read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (AvailableNow callers),
    with the same nanos/NTZ-timestamp normalization as the batch reader:
    the declared stream schema matches the file's physical types (long for
    NANOS, TIMESTAMP_NTZ for no-tz annotations), then the same projection
    casts restore plain TIMESTAMP — so watermarks and epoch math work."""
    import copy

    from pyspark.sql import types as T

    from es_ch_sync_spark.io.sources import _ts_column_kinds

    path = f"{sf_dir}/events.parquet"
    ns_cols, ntz_cols = _ts_column_kinds(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = read_parquet_table(spark, sf_dir, "events").schema
    fields = []
    for f in batch_schema.fields:
        if f.name in ns_cols:
            fields.append(T.StructField(f.name, T.LongType()))
        elif f.name in ntz_cols:
            fields.append(T.StructField(f.name, T.TimestampNTZType()))
        else:
            fields.append(T.StructField(f.name, copy.deepcopy(f.dataType)))
    stream = (
        spark.readStream.schema(T.StructType(fields))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    for c in ns_cols:
        stream = stream.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for c in ntz_cols:
        stream = stream.withColumn(c, F.col(c).cast("timestamp"))
    return stream


def _drain_to_memory(signals: DataFrame, output_mode: str) -> DataFrame:
    """Run a finite stream to completion (AvailableNow) into a memory sink
    and return the result table."""
    import uuid

    sink = f"stream_q_{uuid.uuid4().hex[:8]}"
    q = (
        signals.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    from es_ch_sync_spark.streaming.util import drain

    drain(q, 300)
    return signals.sparkSession.table(sink)


@register("streaming_unpivot", _STREAM_ORACLE)
def q_streaming_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming driven through the checked surface: stream the
    events parquet (AvailableNow), unpivot + watermark-dedup exactly like
    the ingestion pipeline, drain to a memory sink, return the result —
    which must equal the batch distinct unpivot (the oracle).  Exactly-once
    + dedup semantics of the stream are thereby oracle-verified."""
    from es_ch_sync_spark.catalog import SignalCatalog, SignalDef
    from es_ch_sync_spark.streaming.sync_stream import build_signal_stream

    cat = SignalCatalog([SignalDef("value", "value", "number")])
    stream = _read_events_stream(spark, sf_dir).withColumn("src", F.lit("events"))
    signals = build_signal_stream(
        stream, cat, device_dim=None, subject_col="user_id", ts_col="ts", source_col="src",
        watermark="365 days",
    )
    return _drain_to_memory(signals, "append")


@register(
    "streaming_windowed_counts",
    """
    SELECT date_trunc('day', ts)::TIMESTAMP AS day_start, event_type,
           count(*)::BIGINT AS n_events,
           round(sum(value)::DOUBLE, 4) AS v_sum
    FROM events GROUP BY 1, 2
    """,
)
def q_streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed aggregation through the checked surface: tumbling
    1-day event-time windows per event_type over the events stream
    (AvailableNow), complete-mode drain — must equal the batch
    date_trunc groupBy (the oracle).  Epoch-aligned windows ≙
    date_trunc('day') under the UTC session timezone."""
    stream = _read_events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value").cast("double"), 4).alias("v_sum"),
        )
        .select(
            F.col("w.start").alias("day_start"), "event_type", "n_events", "v_sum"
        )
    )
    return _drain_to_memory(agg, "complete")


# ---------------------------------------------------------------------------
# Windows: top-k per group, running totals, sessions, resample, as-of
# ---------------------------------------------------------------------------

@register(
    "window_topk_per_user",
    """
    SELECT user_id, event_id, value, rn FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
        FROM events
    ) WHERE rn <= 3
    """,
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    out = topk_per_group(
        e.select("user_id", "event_id", "value"),
        "user_id",
        [F.col("value").desc(), F.col("event_id").asc()],
        k=3,
    )
    return out.select("user_id", "event_id", "value", "rn")


@register(
    "running_total_per_user",
    """
    SELECT user_id, event_id, ts,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value
    FROM events WHERE user_id < 10
    """,
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum — sequential per-row fold, deterministic in both engines."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, 0)
    return e.select(
        "user_id", "event_id", "ts", F.round(F.sum("value").over(w), 6).alias("running_value")
    )


@register(
    "sessionize_events",
    """
    SELECT user_id, session_id::BIGINT AS session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (
            SELECT user_id, ts,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                             > 3600000000::BIGINT
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    ) GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (1 h) — lag + running boundary count."""
    e = _t(spark, sf_dir, "events")
    return session_stats(e, key="user_id", ts_col="ts", gap_seconds=3600)


@register(
    "sessionize_native",
    """
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 1 HOUR AS session_end,
           count(*) AS n_events
    FROM (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (
            SELECT user_id, ts,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                             >= 3600000000::BIGINT
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    ) GROUP BY user_id, session_id
    """,
)
def q_sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation (the streaming-capable
    form — the same call works under readStream with watermarked state).
    Semantics differ subtly from the manual lag-based build: a new session
    starts at gap ≥ 1 h (windows merge only on strict overlap) and
    session_end = last event + gap; the oracle states exactly that, so the
    two sessionizers' contracts are both pinned."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def _zorder_oracle() -> str:
    from es_ch_sync_spark.operators.layout import zvalue_sql_duckdb

    z = zvalue_sql_duckdb(
        "user_id % 65536",
        "date_diff('day', DATE '1970-01-01', ts::DATE) % 65536",
    )
    return f"SELECT event_id, ({z})::BIGINT AS z_key FROM events"


@register("zorder_events", _zorder_oracle())
def q_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-key over (user_id, day) — the multi-dimensional clustering
    key (Delta OPTIMIZE ZORDER / ClickHouse mortonEncode analog).  Writing
    the fact table range-partitioned by this key gives parquet files tight
    min/max ranges in BOTH dimensions, so either predicate prunes; the
    layout win is pinned quantitatively in tests/test_layout.py."""
    from es_ch_sync_spark.operators.layout import zvalue

    e = _t(spark, sf_dir, "events")
    z = zvalue(
        "user_id % 65536",
        "datediff(cast(ts as date), date'1970-01-01') % 65536",
    )
    return e.select("event_id", z.cast("long").alias("z_key"))


@register(
    "resample_daily",
    """
    SELECT user_id, date_trunc('day', ts)::TIMESTAMP AS bucket, count(*) AS n,
           min(value) AS v_min, max(value) AS v_max,
           sum(value::DECIMAL(12,2))::DOUBLE AS v_sum
    FROM events GROUP BY user_id, date_trunc('day', ts)
    """,
)
def q_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily rollup — the time-bucket resample of the signal model."""
    return resample(_t(spark, sf_dir, "events"), "user_id", "ts", "value", "day")


@register(
    "asof_join_events",
    """
    SELECT e.event_id, e.user_id, e.ts, p.ts AS matched_ts, p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event matched to the user's latest prior
    purchase — composed from union + one last(ignorenulls) window pass
    (Spark has no native ASOF); semantics mirror DuckDB's ASOF JOIN."""
    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_join(errors, purchases, key="user_id", left_ts="ts", right_ts="ts",
                    right_cols=["purchase_value"])
    return out.select("event_id", "user_id", "ts", "matched_ts", "purchase_value")


@register(
    "signal_last_value",
    """
    WITH tall AS (
        SELECT user_id AS token_id, ts AS timestamp, 'value' AS name,
               value AS value_number, CAST(NULL AS VARCHAR) AS value_string
        FROM events WHERE value IS NOT NULL
        UNION ALL
        SELECT user_id, ts, 'event_type', NULL, event_type FROM events
    )
    SELECT token_id, name, timestamp, value_number, value_string FROM (
        SELECT *, row_number() OVER (
            PARTITION BY token_id, name
            ORDER BY timestamp DESC, value_number DESC NULLS LAST, value_string DESC NULLS LAST
        ) AS rn
        FROM tall
    ) WHERE rn = 1
    """,
)
def q_signal_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of snapshot of the tall signal table — 'current state per entity',
    the headline read query the reference's destination table serves."""
    from es_ch_sync_spark.catalog import SignalCatalog, SignalDef

    cat = SignalCatalog(
        [SignalDef("value", "value", "number"), SignalDef("event_type", "event_type", "string")]
    )
    e = _t(spark, sf_dir, "events").withColumn("src", F.lit("events"))
    tall = unpivot_signals(e, cat, token_col="user_id", ts_col="ts", source_col="src")
    w = W.partitionBy("token_id", "name").orderBy(
        F.col("timestamp").desc(),
        F.col("value_number").desc_nulls_last(),
        F.col("value_string").desc_nulls_last(),
    )
    return (
        tall.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("token_id", "name", "timestamp", "value_number", "value_string")
    )


# ---------------------------------------------------------------------------
# TPC-H coverage, round 3: the shapes the suite still lacked — correlated
# EXISTS / NOT EXISTS, scalar subqueries, left-join count distributions,
# view-style CTE reuse (testdata has no partsupp, so q2/q9/q11/q16/q20 are
# out of reach; queries needing l_commitdate/l_receiptdate or p_container
# are adapted to the available columns, keeping the plan shape that makes
# each query a benchmark classic).
# ---------------------------------------------------------------------------

_ONE = "1::DECIMAL(12,2)"
_REV = f"l_extendedprice::DECIMAL(12,2) * ({_ONE} - l_discount::DECIMAL(12,2))"


@register(
    "tpch_q6_revenue",
    f"""
    SELECT sum(l_extendedprice::DECIMAL(12,2) * l_discount::DECIMAL(12,2))::DOUBLE AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-aggregate — every
    predicate must reach the parquet scan, zero joins, one partial-agg
    exchange carrying a single decimal sum."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC)
    return li.agg(F.sum(rev).cast("double").alias("revenue"))


@register(
    "tpch_q4_exists",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority check; the correlated-EXISTS classic,
    adapted to l_shipdate since testdata has no commit/receipt dates): the
    EXISTS is a LEFT SEMI join keyed on orderkey with the correlated
    inequality as a join residual — lineitem is never widened, each order
    row passes at most once, no DISTINCT needed."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    semi = o.alias("o").join(
        li.alias("l"),
        (F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        & (F.col("l.l_shipdate") > F.col("o.o_orderdate")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "tpch_q8_mktshare",
    f"""
    WITH all_sales AS (
        SELECT extract(year FROM o_orderdate) AS o_year,
               {_REV} AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0::DECIMAL(12,2) END)::DOUBLE
                 / sum(volume)::DOUBLE, 6) AS mkt_share
    FROM all_sales GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the deepest join tree in the
    suite — lineitem⋈orders is the only shuffle join; part, supplier,
    customer, both nation roles, and region all broadcast.  Share is a
    conditional decimal sum over the same exact volume, divided once in
    doubles."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey"))
    n2 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)
    )
    sales = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            F.col("supp_nation"),
        )
    )
    zero = F.lit(0).cast(_DEC)
    return sales.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "tpch_q12_late",
    """
    SELECT o_orderpriority,
           sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END)::BIGINT AS late_count,
           count(*) AS n_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode/priority check, adapted: 'late' =
    shipped >60 days after order since testdata has no ship modes or
    receipt dates): one shuffle join + conditional integer counts —
    association-order-free by construction."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum(late).alias("late_count"), F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "tpch_q13_custdist",
    """
    SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT join with an
    ON-clause filter (kept customers with zero matching orders must count
    0), then a two-level aggregate.  First agg shuffles on custkey; the
    histogram agg moves |distinct counts| rows."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, sum({_REV}) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev::DOUBLE AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier, the view-reuse query): the revenue 'view'
    is computed once and reused for both the max and the final join —
    Spark reuses the exchange; the max is a 1-row broadcast compared in
    DECIMAL (exact), so ties survive identically in both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


@register(
    "tpch_q17_small_qty",
    """
    SELECT round(sum(l_extendedprice::DECIMAL(12,2))::DOUBLE / 7.0, 6) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS pk, sum(l_quantity::DECIMAL(12,2))::DOUBLE / count(*) AS avg_qty
          FROM lineitem GROUP BY l_partkey) per_part ON pk = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue; correlated scalar AVG
    decorrelated into a per-part aggregate joined back): the per-part avg
    shuffles once on partkey; the brand filter broadcasts; quantity sums
    are int-valued so the DECIMAL avg is exact in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(F.col("l_quantity").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / 7.0, 6
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q21_waiting",
    """
    SELECT s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting — adapted to
    l_shipdate: the flagged supplier's item is the strictly-latest-shipping
    in a multi-supplier finished order).  The double correlation becomes a
    LEFT SEMI then a LEFT ANTI self-join of lineitem, both keyed on
    orderkey with the supplier/date inequalities as residuals — the
    canonical decorrelation, no DISTINCT, no cross product."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    l1 = li.alias("l1")
    sel = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            li.alias("l2"),
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            li.alias("l3"),
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
            & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
            "left_anti",
        )
    )
    return (
        sel.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


@register(
    "tpch_q22_idle_rich",
    """
    SELECT c_nationkey, count(*) AS numcust,
           sum(c_acctbal::DECIMAL(12,2))::DOUBLE AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT sum(c_acctbal::DECIMAL(12,2))::DOUBLE / count(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales-opportunity: above-average balances
    with no orders; nationkey stands in for the phone country code the
    testdata lacks): scalar-subquery threshold = 1-row broadcast; the NOT
    EXISTS is a LEFT ANTI join against orders keyed on custkey."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("2001-01-01"))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("totacctbal"),
        )
    )


@register(
    "hopping_window_counts",
    """
    SELECT to_timestamp(ws)::TIMESTAMP AS window_start, event_type,
           count(*) AS n_events,
           floor(sum(value::DECIMAL(12,2))::DOUBLE * 10000 + 0.5) / 10000
               AS v_sum
    FROM (
        -- floor(epoch), not ::BIGINT: the cast ROUNDS fractional seconds,
        -- shifting events within 0.5 s below a hop boundary into the wrong
        -- base window (first seen at sf0.1); Spark's F.window truncates
        SELECT e.*,
               (floor(epoch(ts))::BIGINT // 21600) * 21600 - i.i * 21600 AS ws
        FROM events e CROSS JOIN (SELECT unnest(range(4)) AS i) i
        WHERE epoch(ts) >= (floor(epoch(ts))::BIGINT // 21600) * 21600 - i.i * 21600
          AND epoch(ts) <  (floor(epoch(ts))::BIGINT // 21600) * 21600 - i.i * 21600 + 86400
    )
    GROUP BY ws, event_type
    """,
)
def q_hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation (1-day windows sliding every 6h): each
    event lands in 4 overlapping windows — Spark's F.window(slide) plans
    this as ONE generate + aggregate, no self-join; the oracle enumerates
    the 4 hops per event explicitly.  The streaming-capable sliding
    dashboard aggregation (works identically under readStream +
    watermark)."""
    from es_ch_sync_spark.operators.util import round_half_up

    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_half_up(
                F.sum(F.col("value").cast(_DEC)).cast("double"), 4
            ).alias("v_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "v_sum")
    )


@register(
    "streaming_resume_points",
    """
    SELECT user_id AS token_id, min(ts) AS min_ts, max(ts) AS max_ts
    FROM events GROUP BY user_id
    """,
)
def q_streaming_resume_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4's resume-point summary maintained BY THE STREAM: per-token
    min/max event time as a streaming aggregate (complete mode,
    AvailableNow) — state is one (min, max) pair per token, exactly the
    incremental fold merge_resume_points does in batch; must equal the
    batch groupBy (the oracle).  At scale this runs continuously and the
    sync job reads its sink instead of rescanning history."""
    stream = _read_events_stream(spark, sf_dir)
    agg = stream.groupBy(F.col("user_id").alias("token_id")).agg(
        F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts")
    )
    return _drain_to_memory(agg, "complete")


@register(
    "cohort_retention",
    """
    WITH first_seen AS (
        SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               datediff('week', f.cohort_week, date_trunc('week', e.ts)) AS week_offset
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_week::TIMESTAMP AS cohort_week, week_offset,
           count(*) AS n_active
    FROM activity GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen week, counted
    per week-offset of later activity — the product-analytics staple.
    Plan: one aggregate for cohorts (map-side combined), broadcast back
    onto the stream, distinct + count — the events table shuffles once on
    user_id and once on the (cohort, offset) cell."""
    e = _t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(F.broadcast(first_seen), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            ).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


@register(
    "funnel_conversion",
    """
    WITH v AS (SELECT user_id, min(ts) AS t FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t FROM events e
          JOIN v ON e.user_id = v.user_id AND e.ts > v.t
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t FROM events e
          JOIN c ON e.user_id = c.user_id AND e.ts > c.t
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT 'step1_view' AS step, count(*) AS n_users FROM v
    UNION ALL SELECT 'step2_click', count(*) FROM c
    UNION ALL SELECT 'step3_purchase', count(*) FROM p
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase, strictly increasing
    timestamps): each step = one filtered aggregate joined to the prior
    step's per-user anchor time (broadcast — step tables are one row per
    user).  The sequence-match analytics staple without any self-cross."""
    e = _t(spark, sf_dir, "events")

    def step(evt: str, prior: DataFrame | None) -> DataFrame:
        s = e.filter(F.col("event_type") == evt)
        if prior is not None:
            s = s.join(F.broadcast(prior), "user_id").filter(F.col("ts") > F.col("t")).drop("t")
        return s.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = step("view", None)
    c = step("click", v)
    p = step("purchase", c)
    return (
        v.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("step1_view").alias("step"), "n_users")
        .unionByName(c.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("step2_click").alias("step"), "n_users"))
        .unionByName(p.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("step3_purchase").alias("step"), "n_users"))
    )


@register(
    "streaming_interval_join",
    """
    SELECT v.user_id, v.ts AS view_ts, p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join through the checked surface: views ⋈
    purchases within [view_ts, view_ts + 1h] per user, both sides
    watermarked so join state expires (the watermark + the interval bound
    is exactly what lets Spark drop old state — unbounded stream-stream
    joins are rejected).  AvailableNow drain must equal the batch
    interval join (the oracle).  At 100 TB this is continuous attribution
    without re-scanning history."""
    stream = _read_events_stream(spark, sf_dir)
    views = (
        stream.filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts"))
        .withWatermark("ts", "30 days")
        .alias("v")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "value")
        .withWatermark("p_ts", "30 days")
        .alias("p")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("ts"))
        & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("p_ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return _drain_to_memory(joined, "append")


@register(
    "interarrival_stats",
    """
    WITH gaps AS (
        SELECT user_id,
               (epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id))) AS gap_us
        FROM events
    ),
    g AS (SELECT user_id, gap_us FROM gaps WHERE gap_us IS NOT NULL),
    ranked AS (
        SELECT user_id, gap_us,
               row_number() OVER (PARTITION BY user_id ORDER BY gap_us, user_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM g
    )
    SELECT user_id, n AS n_gaps,
           max(CASE WHEN rn = (n + 1) // 2 THEN gap_us END) AS median_gap_us,
           max(CASE WHEN rn = greatest(((n * 9) + 9) // 10, 1) THEN gap_us END) AS p90_gap_us,
           min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us
    FROM ranked GROUP BY user_id, n
    """,
)
def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-user inter-arrival statistics: median/p90/min/max of the
    microsecond gap between consecutive events — EXACT order statistics
    (rank = ceil(q·n), lower-type quantile) in pure integer arithmetic,
    so both engines agree bit-for-bit (no interpolation, no floats).
    Plan: one shuffle on user_id feeds the lag, the rank, and the final
    aggregate — the windows share the same partitioning."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = e.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    rw = W.partitionBy("user_id").orderBy("gap_us", "user_id")
    cw = W.partitionBy("user_id")
    ranked = gaps.select(
        "user_id",
        "gap_us",
        F.row_number().over(rw).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("n"),
    )
    return (
        ranked.groupBy("user_id", F.col("n").alias("n_gaps"))
        .agg(
            F.max(F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("gap_us"))).alias("median_gap_us"),
            F.max(
                F.when(F.col("rn") == F.greatest(F.expr("((n * 9) + 9) DIV 10"), F.lit(1)), F.col("gap_us"))
            ).alias("p90_gap_us"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .select("user_id", "n_gaps", "median_gap_us", "p90_gap_us", "min_gap_us", "max_gap_us")
    )


@register(
    "validate_events",
    """
    WITH t AS (SELECT count(*) AS n FROM events)
    SELECT 'event_id_unique' AS rule, (SELECT n FROM t) AS n_checked,
           (SELECT count(*) - count(DISTINCT event_id) FROM events) AS n_violations
    UNION ALL
    SELECT 'ts_in_range', (SELECT n FROM t),
           (SELECT count(*) FROM events
            WHERE ts IS NULL OR ts < TIMESTAMP '2024-01-01 00:00:00'
               OR ts >= TIMESTAMP '2030-01-01 00:00:00')
    UNION ALL
    SELECT 'value_nonnegative', (SELECT n FROM t),
           (SELECT count(*) FROM events WHERE value < 0)
    UNION ALL
    SELECT 'event_type_in_domain', (SELECT n FROM t),
           (SELECT count(*) FROM events WHERE event_type IS NULL
             OR event_type NOT IN ('click','error','purchase','signup','view'))
    UNION ALL
    SELECT 'user_in_dim', (SELECT n FROM t),
           (SELECT count(*) FROM events e
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
    """,
)
def q_validate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate report (the dbt-test/expectations pattern): five
    rules — key uniqueness, timestamp range, value domain, categorical
    domain, referential integrity against the dimension — each one
    aggregate over the SAME scan (Spark plans the unioned rules as
    parallel branches; the dim check is a broadcast anti join).  Output:
    (rule, n_checked, n_violations); a CI gate fails on any
    n_violations > 0."""
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    n = e.count()

    def rule(name: str, violations: DataFrame) -> DataFrame:
        return violations.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("rule"), F.lit(n).alias("n_checked"), "n_violations"
        )

    uniq = e.agg(
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("n_violations")
    ).select(F.lit("event_id_unique").alias("rule"), F.lit(n).alias("n_checked"), "n_violations")
    ts_bad = rule(
        "ts_in_range",
        e.filter(
            F.col("ts").isNull()
            | (F.col("ts") < F.lit("2024-01-01"))
            | (F.col("ts") >= F.lit("2030-01-01"))
        ),
    )
    val_bad = rule("value_nonnegative", e.filter(F.col("value") < 0))
    dom_bad = rule(
        "event_type_in_domain",
        e.filter(
            F.col("event_type").isNull()
            | ~F.col("event_type").isin("click", "error", "purchase", "signup", "view")
        ),
    )
    ref_bad = rule(
        "user_in_dim",
        e.join(F.broadcast(c.select(F.col("c_custkey"))), e.user_id == F.col("c_custkey"), "left_anti"),
    )
    return uniq.unionByName(ts_bad).unionByName(val_bad).unionByName(dom_bad).unionByName(ref_bad)


_ETYPES = ["click", "error", "purchase", "signup", "view"]


def _corr_matrix_oracle() -> str:
    cols = ",\n               ".join(
        f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS c_{t}" for t in _ETYPES
    )
    sums = ",\n            ".join(
        f"sum(c_{t})::BIGINT AS s_{t}, sum(c_{t} * c_{t})::BIGINT AS ss_{t}" for t in _ETYPES
    )
    crosses = ",\n            ".join(
        f"sum(c_{a} * c_{b})::BIGINT AS sx_{a}_{b}"
        for i, a in enumerate(_ETYPES)
        for b in _ETYPES[i + 1 :]
    )
    def corr(a: str, b: str) -> str:
        # NULLIF guards zero variance (constant daily counts) so DuckDB's
        # IEEE inf/NaN matches Spark's NULL on degenerate columns.
        return (
            f"round((n * sx_{a}_{b} - s_{a} * s_{b})::DOUBLE / "
            f"NULLIF(sqrt((n * ss_{a} - s_{a} * s_{a})::DOUBLE) * "
            f"sqrt((n * ss_{b} - s_{b} * s_{b})::DOUBLE), 0), 6)"
        )
    rows = "\n    UNION ALL ".join(
        f"SELECT '{a}' AS type_a, '{b}' AS type_b, {corr(a, b)} AS corr FROM s"
        for i, a in enumerate(_ETYPES)
        for b in _ETYPES[i + 1 :]
    )
    return f"""
    WITH m AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               {cols}
        FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    s AS (
        SELECT count(*)::BIGINT AS n,
            {sums},
            {crosses}
        FROM m
    )
    {rows}
    """


@register("signal_correlations", _corr_matrix_oracle())
def q_signal_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of daily per-user event-type
    counts — which behaviors co-move.  ONE aggregate computes every
    sufficient statistic (n, Σx, Σx², Σxy for all 10 pairs) over the
    pivoted (user, day) matrix; counts are integers so the stats are
    exact in both engines and only the final corr is double arithmetic.
    Plan: pivot = one conditional-sum aggregate; the stats aggregate
    reduces everything to one row; 10 output rows are projections of that
    row — scan-shaped at any scale."""
    e = _t(spark, sf_dir, "events")
    m = e.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day")).agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"c_{t}")
            for t in _ETYPES
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for t in _ETYPES:
        aggs.append(F.sum(f"c_{t}").alias(f"s_{t}"))
        aggs.append(F.sum(F.col(f"c_{t}") * F.col(f"c_{t}")).alias(f"ss_{t}"))
    for i, a in enumerate(_ETYPES):
        for b in _ETYPES[i + 1 :]:
            aggs.append(F.sum(F.col(f"c_{a}") * F.col(f"c_{b}")).alias(f"sx_{a}_{b}"))
    s = m.agg(*aggs)
    out = None
    for i, a in enumerate(_ETYPES):
        for b in _ETYPES[i + 1 :]:
            num = F.col("n") * F.col(f"sx_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
            da = F.sqrt((F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast("double"))
            db = F.sqrt((F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).cast("double"))
            den = da * db
            row = s.select(
                F.lit(a).alias("type_a"),
                F.lit(b).alias("type_b"),
                # zero-variance guard: both engines agree on NULL for a
                # constant column (see matching NULLIF in the oracle)
                F.round(
                    F.when(den > 0, num.cast("double") / den), 6
                ).alias("corr"),
            )
            out = row if out is None else out.unionByName(row)
    return out


@register(
    "streaming_dim_join",
    """
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    """,
)
def q_streaming_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC broadcast join through the checked surface: the
    purchase stream enriched against the static customer dimension —
    the dim is re-read per micro-batch (picks up new devices/customers)
    and never shuffles the stream; AvailableNow drain equals the batch
    join (the oracle).  This is exactly how build_signal_stream resolves
    tokens continuously."""
    stream = _read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    dim = read_parquet_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    joined = stream.join(F.broadcast(dim), stream.user_id == dim.c_custkey).select(
        "event_id", "user_id", "c_name", "c_mktsegment"
    )
    return _drain_to_memory(joined, "append")


# ---------------------------------------------------------------------------
# TPC-H completion: Q2 / Q9 / Q11 / Q16 / Q20 over a lineitem-derived
# partsupp surrogate (the testdata has no partsupp table; supplycost :=
# min extended price per (part, supplier) pair, availqty := total shipped
# quantity — both DECIMAL-exact so every comparison is bit-identical
# across engines).  With these, all 22 TPC-H query SHAPES are covered.
# ---------------------------------------------------------------------------

_PS_CTE = """
    partsupp AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice::DECIMAL(12,2)) AS ps_supplycost,
               sum(l_quantity::DECIMAL(12,2)) AS ps_availqty
        FROM lineitem GROUP BY 1, 2
    )
"""


def _partsupp(li: DataFrame) -> DataFrame:
    """The partsupp surrogate: one shuffle on (partkey, suppkey) with
    map-side partial min/sum — at 100 TB this is the same pair-grained
    aggregation the dedup-on-write path does, and it reuses exchange when
    a query needs it twice."""
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice").cast(_DEC)).alias("ps_supplycost"),
        F.sum(F.col("l_quantity").cast(_DEC)).alias("ps_availqty"),
    )


@register(
    "tpch_q2_mincost",
    f"""
    WITH {_PS_CTE},
    eligible AS (
        SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
        FROM partsupp
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           ps_supplycost::DOUBLE AS supplycost
    FROM part JOIN eligible ON p_partkey = ps_partkey
    WHERE p_size <= 15 AND p_type = 'ECONOMY'
      AND ps_supplycost = (SELECT min(e2.ps_supplycost) FROM eligible e2
                           WHERE e2.ps_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier; the correlated-scalar-subquery
    query): decorrelated the way Catalyst would — the per-part MIN over
    region-eligible pairs is computed once and joined back on
    (partkey, cost), with cost equality exact in DECIMAL.  Supplier,
    nation, region are broadcast; the only shuffle is the partsupp
    grouping, whose exchange is reused by both branches."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "ECONOMY")
    )
    eligible = (
        _partsupp(li)
        .join(F.broadcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("ps_partkey", "ps_suppkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    min_cost = eligible.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eligible.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mk"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "tpch_q9_profit",
    f"""
    WITH {_PS_CTE}
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           sum(l_extendedprice::DECIMAL(12,2)
                   * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2))
               - ps_supplycost * l_quantity::DECIMAL(12,2))::DOUBLE AS sum_profit
    FROM lineitem
    JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY nation ASC, o_year DESC
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit; the 6-way join query): part filter
    pushes to the scan and broadcasts, supplier/nation broadcast, and the
    two big inputs (lineitem, orders) shuffle once each; profit terms stay
    DECIMAL end-to-end so the unordered SUM is association-free."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    one = F.lit(1).cast(_DEC)
    amount = (
        F.col("l_extendedprice").cast(_DEC) * (one - F.col("l_discount").cast(_DEC))
        - F.col("ps_supplycost") * F.col("l_quantity").cast(_DEC)
    )
    return (
        li.join(
            _partsupp(li),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


@register(
    "tpch_q11_important",
    f"""
    WITH {_PS_CTE},
    natps AS (
        SELECT ps_partkey, ps_supplycost * ps_availqty AS val
        FROM partsupp
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT ps_partkey, sum(val)::DOUBLE AS part_value
    FROM natps
    GROUP BY ps_partkey
    HAVING sum(val)::DOUBLE * (SELECT count(DISTINCT ps_partkey) FROM natps)
         > (SELECT sum(val)::DOUBLE FROM natps) * 2
    ORDER BY part_value DESC, ps_partkey
    LIMIT 100
    """,
)
def q_tpch_q11_important(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock; global-aggregate scalar subquery in
    HAVING): parts holding more than 2x the average per-part value — a
    scale-invariant threshold (the spec's fixed fraction goes empty as SF
    grows).  The global total is a 1-row broadcast; the per-part and
    global aggregates reuse the same partsupp exchange.  The threshold is
    compared in DOUBLE on both engines (exact DECIMAL sums cast once), so
    no decimal-division semantics can diverge."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    natps = (
        _partsupp(li)
        .join(F.broadcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"),
        )
    )
    per_part = natps.groupBy("ps_partkey").agg(
        F.sum("val").cast("double").alias("part_value")
    )
    globals_ = natps.agg(
        F.sum("val").cast("double").alias("total"),
        F.countDistinct("ps_partkey").alias("nparts"),
    )
    return (
        per_part.crossJoin(F.broadcast(globals_))
        .filter(F.col("part_value") * F.col("nparts") > F.col("total") * 2)
        .select("ps_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "ps_partkey")
        .limit(100)
    )


@register(
    "tpch_q16_suppcnt",
    f"""
    WITH {_PS_CTE}
    SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                             WHERE s_suppkey % 7 = 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (supplier relationship; NOT IN anti-join + DISTINCT
    count): the complaint-supplier exclusion (surrogate: every 7th key)
    is a broadcast LEFT ANTI — legal because s_suppkey is non-null, the
    one case where NOT IN and anti-join agree; countDistinct plans as a
    two-phase partial/final, no pre-DISTINCT shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    excl = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 7 == 0).select(
        "s_suppkey"
    )
    return (
        _partsupp(li)
        .join(F.broadcast(excl), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q20_promo",
    f"""
    WITH {_PS_CTE},
    shipped AS (
        SELECT l_partkey AS sh_partkey, l_suppkey AS sh_suppkey,
               sum(l_quantity::DECIMAL(12,2)) AS qty_1996
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT ps_suppkey
        FROM partsupp
        JOIN part ON p_partkey = ps_partkey
        JOIN shipped ON sh_partkey = ps_partkey AND sh_suppkey = ps_suppkey
        WHERE p_name LIKE '%bolt%' AND qty_1996 * 2 > ps_availqty
    )
    ORDER BY s_suppkey
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion; the nested-IN-subqueries
    query): suppliers who moved more than half their all-time volume of a
    part family inside 1996.  Both inner aggregates shuffle on the same
    (partkey, suppkey) key, so the join between them is co-partitioned
    (no extra exchange); the outer IN becomes a LEFT SEMI onto supplier;
    the qty comparison is DECIMAL-exact (x2 is an exact integer scale)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy(
            F.col("l_partkey").alias("sh_partkey"),
            F.col("l_suppkey").alias("sh_suppkey"),
        )
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty_1996"))
    )
    promo_supps = (
        _partsupp(li)
        .join(
            shipped,
            (F.col("sh_partkey") == F.col("ps_partkey"))
            & (F.col("sh_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .filter(F.col("qty_1996") * 2 > F.col("ps_availqty"))
        .select("ps_suppkey")
    )
    return (
        s.join(promo_supps, s.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "ewma_smooth",
    """
    WITH seq AS (
        SELECT user_id,
               list(value ORDER BY ts, event_id) AS vs
        FROM events
        WHERE value IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id, len(vs) AS n_obs,
           round(list_reduce(vs, (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma
    FROM seq
    ORDER BY user_id
    """,
)
def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average (α=0.3), final
    state: a sequential recursion run as a sorted left fold per key —
    both engines execute the identical IEEE operation chain, so no
    rounding slack is needed beyond the surface round(6)."""
    from es_ch_sync_spark.operators.analytics import ewma_last

    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    return ewma_last(
        ev, "user_id", ["ts", "event_id"], "value", alpha=0.3
    ).orderBy("user_id")


@register(
    "streaming_ewma",
    """
    WITH seq AS (
        SELECT user_id,
               list(value ORDER BY ts, event_id) AS vs
        FROM events
        WHERE value IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id, len(vs) AS n_obs,
           round(list_reduce(vs, (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma
    FROM seq
    ORDER BY user_id
    """,
)
def q_streaming_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATEFUL streaming smoothing through the checked surface: the
    events stream folds per-key EWMA state across micro-batches
    (applyInPandasWithState, streaming/ewma_stream.py); the AvailableNow
    drain's final state per key (argmax n_obs — n is monotone) must be
    bit-identical to the batch fold the oracle replays, because both
    execute the same IEEE recursion in the same (ts, event_id) order."""
    from pyspark.sql import Window as W2

    from es_ch_sync_spark.streaming.ewma_stream import ewma_stream

    stream = _read_events_stream(spark, sf_dir).filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    drained = _drain_to_memory(ewma_stream(stream), "append")
    w = W2.partitionBy("user_id").orderBy(F.desc("n_obs"))
    return (
        drained.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("user_id", "n_obs", F.round("ewma", 6).alias("ewma"))
        .orderBy("user_id")
    )


_SESS_CTE = """
    sess AS (
        SELECT user_id, session_id, min(ts) AS session_start,
               max(ts) AS session_end
        FROM (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM (
                SELECT user_id, ts,
                       CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                                 > 3600000000::BIGINT
                            OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       THEN 1 ELSE 0 END AS is_new
                FROM events
            )
        ) GROUP BY user_id, session_id
    )
"""


@register(
    "peak_concurrency",
    f"""
    WITH {_SESS_CTE},
    deltas0 AS (
        SELECT session_start AS t, 1 AS d FROM sess
        UNION ALL
        SELECT session_end AS t, -1 AS d FROM sess
    ),
    deltas AS (
        SELECT * FROM deltas0
        UNION ALL
        -- zero-delta sentinel at each day start: the midnight plateau of
        -- boundary-straddling sessions must participate in the day max
        SELECT DISTINCT date_trunc('day', t)::TIMESTAMP AS t, 0 AS d FROM deltas0
    ),
    run AS (
        SELECT t, d,
               sum(d) OVER (ORDER BY t ASC, d DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM deltas
    )
    SELECT date_trunc('day', t)::TIMESTAMP AS bucket,
           max(c)::BIGINT AS peak_concurrent
    FROM run
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous user sessions per day: sessionize (1 h gap),
    then a DISTRIBUTED sweep-line — per-day windowed prefix sums plus a
    carry-in offset from the tiny per-day totals table, which decomposes
    the global running sum exactly (days are contiguous in time order).
    The oracle runs the single-partition global sweep; matching it proves
    the decomposition."""
    from es_ch_sync_spark.operators.analytics import interval_concurrency

    e = _t(spark, sf_dir, "events")
    sess = session_stats(e, key="user_id", ts_col="ts", gap_seconds=3600)
    return interval_concurrency(
        sess, "session_start", "session_end", bucket="day"
    ).orderBy("bucket")


@register(
    "csv_source_scan",
    """
    SELECT event_id, user_id, ts, event_type, value FROM events
    WHERE event_type = 'purchase' AND value IS NOT NULL
    """,
)
def q_csv_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV as a source format with the quarantine contract: events are
    exported to CSV and read back PERMISSIVE with an explicit schema (no
    inference pass) + corrupt-record column; the filtered read must equal
    the same predicate over the parquet source-of-truth.  Timestamps
    round-trip through an explicit microsecond format — the lossy-by-
    default CSV trap stated and closed."""
    import tempfile
    import uuid

    from es_ch_sync_spark.io.sources import write_read_csv

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    out = tempfile.mkdtemp(prefix=f"csv_src_{uuid.uuid4().hex[:8]}_")
    back = write_read_csv(
        ev, out,
        "event_id bigint, user_id bigint, ts timestamp_ntz, "
        "event_type string, value double",
    )
    assert "_corrupt_record" in back.columns
    return back.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select("event_id", "user_id", "ts", "event_type", "value")


@register(
    "orc_source_scan",
    """
    SELECT event_type, count(*) AS n,
           sum(value::DECIMAL(14,2))::DOUBLE AS v_sum
    FROM events
    WHERE user_id < 50 AND value IS NOT NULL AND event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def q_orc_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC as a source format: the native columnar alternative keeps the
    engine's pruning properties — the user_id predicate must appear in
    the ORC scan's PushedFilters (asserted), and the aggregate equals
    the parquet source-of-truth."""
    import tempfile
    import uuid

    from es_ch_sync_spark.io.sources import write_read_orc

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    out = tempfile.mkdtemp(prefix=f"orc_src_{uuid.uuid4().hex[:8]}_")
    back = write_read_orc(ev, out)
    q = back.filter(
        (F.col("user_id") < 50)
        & F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "user_id" in plan.split(
        "PushedFilters"
    )[1][:200], plan
    return q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("v_sum"),
    )


@register(
    "streaming_funnel",
    """
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    )
    SELECT
        count(*) AS n_users,
        sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_view,
        sum(CASE WHEN t_view IS NOT NULL AND t_click >= t_view
                 THEN 1 ELSE 0 END)::BIGINT AS n_click_after_view,
        sum(CASE WHEN t_view IS NOT NULL AND t_click >= t_view
                      AND t_purchase >= t_click
                 THEN 1 ELSE 0 END)::BIGINT AS n_completed
    FROM per_user
    """,
)
def q_streaming_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel progression maintained as STREAMING state: per-user
    first-touch timestamps per stage are min() aggregates — commutative,
    so the drained complete-mode state is identical under ANY micro-batch
    order/partitioning (the same order-insensitivity argument as the
    streaming KMV sketch; a lag/sequence formulation would NOT survive
    out-of-order batches).  Spark only allows one streaming aggregation,
    so the stage census runs as a batch query over the drained per-user
    state — exactly how a serving layer would read this state store."""
    stream = _read_events_stream(spark, sf_dir)
    per_user = stream.filter(F.col("user_id").isNotNull()).groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    state = _drain_to_memory(per_user, "complete")
    reached_click = F.col("t_view").isNotNull() & (
        F.col("t_click") >= F.col("t_view")
    )
    return state.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("t_view").isNotNull().cast("long")).alias("n_view"),
        F.sum(reached_click.cast("long")).alias("n_click_after_view"),
        F.sum(
            (reached_click & (F.col("t_purchase") >= F.col("t_click"))).cast("long")
        ).alias("n_completed"),
    )


@register(
    "seasonal_decompose_daily",
    """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts)::DATE AS day,
               count(*) AS y
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    mu AS (
        SELECT event_type, day,
               CAST(y::DECIMAL(24,6) * 1000000 AS BIGINT) AS ymu,
               ((date_diff('day', DATE '2024-01-01', day) % 7) + 7) % 7 AS phase
        FROM daily
    ),
    tr AS (
        SELECT *, CASE WHEN count(*) OVER w = 7
                       THEN CAST(floor((sum(ymu) OVER w) / 7) AS BIGINT)
                  END AS tmu
        FROM mu
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (SELECT *, ymu - tmu AS dmu FROM tr),
    pm AS (
        SELECT event_type, phase,
               CAST(floor(sum(dmu) / count(dmu)) AS BIGINT) AS pmu
        FROM det GROUP BY 1, 2
    ),
    cen AS (
        SELECT event_type, phase,
               pmu - CAST(floor(sum(pmu) OVER (PARTITION BY event_type)
                       / count(pmu) OVER (PARTITION BY event_type)) AS BIGINT)
                   AS smu
        FROM pm
    )
    SELECT d.event_type, d.day,
           d.ymu / 1000000.0 AS y,
           d.tmu / 1000000.0 AS trend,
           c.smu / 1000000.0 AS seasonal,
           CASE WHEN d.tmu IS NOT NULL
                THEN (d.ymu - d.tmu - c.smu) / 1000000.0 END AS remainder
    FROM det d JOIN cen c USING (event_type, phase)
    ORDER BY event_type, day
    """,
)
def q_seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the per-type daily event
    counts (trend = centered 7-day moving average, seasonal = centered
    per-phase mean of the detrended series, remainder the rest) — the
    anomaly-detection baseline that sits upstream of zscore_anomalies
    at 100 TB.  The operator runs in micro-unit fixed point end to end,
    so the oracle's independent integer pipeline matches exactly — no
    float-addition-order tolerance anywhere."""
    from es_ch_sync_spark.operators.analytics import seasonal_decompose

    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    return seasonal_decompose(
        daily, key_col="event_type", day_col="day", value_col="y", period=7
    ).orderBy("event_type", "day")


@register(
    "seasonal_strength_daily",
    """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts)::DATE AS day,
               count(*) AS y
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    mu AS (
        SELECT event_type, day,
               CAST(y::DECIMAL(24,6) * 1000000 AS BIGINT) AS ymu,
               ((date_diff('day', DATE '2024-01-01', day) % 7) + 7) % 7 AS phase
        FROM daily
    ),
    tr AS (
        SELECT *, CASE WHEN count(*) OVER w = 7
                       THEN CAST(floor((sum(ymu) OVER w) / 7) AS BIGINT)
                  END AS tmu
        FROM mu
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (SELECT *, ymu - tmu AS dmu FROM tr),
    pm AS (
        SELECT event_type, phase,
               CAST(floor(sum(dmu) / count(dmu)) AS BIGINT) AS pmu
        FROM det GROUP BY 1, 2
    ),
    cen AS (
        SELECT event_type, phase,
               pmu - CAST(floor(sum(pmu) OVER (PARTITION BY event_type)
                       / count(pmu) OVER (PARTITION BY event_type)) AS BIGINT)
                   AS smu
        FROM pm
    ),
    r AS (
        SELECT d.event_type,
               (d.ymu - d.tmu - c.smu)::BIGINT AS rmu,
               (d.ymu - d.tmu)::BIGINT AS srmu,
               (d.ymu - c.smu)::BIGINT AS trmu
        FROM det d JOIN cen c USING (event_type, phase)
        WHERE d.tmu IS NOT NULL
    ),
    m AS (
        SELECT event_type, count(*)::BIGINT AS n,
               sum(rmu)::HUGEINT AS sr,
               sum(rmu::HUGEINT * rmu)::HUGEINT AS srr,
               sum(srmu)::HUGEINT AS ss,
               sum(srmu::HUGEINT * srmu)::HUGEINT AS sss,
               sum(trmu)::HUGEINT AS st,
               sum(trmu::HUGEINT * trmu)::HUGEINT AS stt
        FROM r GROUP BY 1
    )
    SELECT event_type, n AS n_days,
           round(CASE WHEN sss::DOUBLE - ss::DOUBLE * ss::DOUBLE / n::DOUBLE > 0
                 THEN greatest(0.0, 1.0
                      - (srr::DOUBLE - sr::DOUBLE * sr::DOUBLE / n::DOUBLE)
                        / (sss::DOUBLE - ss::DOUBLE * ss::DOUBLE / n::DOUBLE))
                 END, 6) AS f_seasonal,
           round(CASE WHEN stt::DOUBLE - st::DOUBLE * st::DOUBLE / n::DOUBLE > 0
                 THEN greatest(0.0, 1.0
                      - (srr::DOUBLE - sr::DOUBLE * sr::DOUBLE / n::DOUBLE)
                        / (stt::DOUBLE - st::DOUBLE * st::DOUBLE / n::DOUBLE))
                 END, 6) AS f_trend
    FROM m ORDER BY event_type
    """,
)
def q_seasonal_strength_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman seasonal/trend strength of each event type's daily
    series — the one-number "is this series actually weekly" ranking
    over the classical decomposition's exact micro-unit pipeline: at
    fleet scale you rank thousands of series by F_s instead of reading
    decompose curves.  Six exact integer moments per series; each
    strength one float expression."""
    from es_ch_sync_spark.operators.analytics import seasonal_strength

    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    return seasonal_strength(
        daily, key_col="event_type", day_col="day", value_col="y", period=7
    )


@register(
    "rolling_corr_daily",
    """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts)::DATE AS day,
               count(*) AS x,
               sum(value::DECIMAL(14,2))::DOUBLE AS yv
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
    ),
    mu AS (
        SELECT event_type, day,
               CAST(x::DECIMAL(24,3) * 1000 AS BIGINT) AS xm,
               CAST(yv::DECIMAL(24,3) * 1000 AS BIGINT) AS ym
        FROM daily
    ),
    ws AS (
        SELECT event_type, day,
               count(*) OVER w AS n,
               sum(xm) OVER w AS sx, sum(ym) OVER w AS sy,
               sum(xm::DECIMAL(19,0) * xm) OVER w AS sxx,
               sum(ym::DECIMAL(19,0) * ym) OVER w AS syy,
               sum(xm::DECIMAL(19,0) * ym) OVER w AS sxy
        FROM mu
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day,
           CASE WHEN n = 14
                 AND n::DECIMAL(19,0) * sxx - sx::DECIMAL(19,0) * sx > 0
                 AND n::DECIMAL(19,0) * syy - sy::DECIMAL(19,0) * sy > 0
                THEN round(
                    (n::DECIMAL(19,0) * sxy - sx::DECIMAL(19,0) * sy)::DOUBLE
                    / sqrt((n::DECIMAL(19,0) * sxx - sx::DECIMAL(19,0) * sx)::DOUBLE
                         * (n::DECIMAL(19,0) * syy - sy::DECIMAL(19,0) * sy)::DOUBLE),
                    6)
           END AS corr
    FROM ws
    ORDER BY event_type, day
    """,
)
def q_rolling_corr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day rolling Pearson correlation between daily event volume and
    daily value sum, per event type — the drift/health signal pair a
    monitoring pipeline tracks.  Exact fixed-point co-moments (the
    operator never lets a float accumulate), one Window node per key.
    Null rows (short window / zero variance) stay in the frame, like
    pandas.rolling().corr()."""
    from es_ch_sync_spark.operators.analytics import rolling_corr

    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("yv"),
        )
    )
    return rolling_corr(
        daily, key_col="event_type", order_col="day", x_col="x", y_col="yv"
    ).orderBy("event_type", "day")


@register(
    "ab_welch_ttest",
    """
    WITH vm AS (
        SELECT event_type AS arm,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v
        FROM events
        WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
    ),
    per AS (
        SELECT arm, count(*) AS n,
               sum(v)::BIGINT AS s,
               sum(v::DECIMAL(19,0) * v) AS ss
        FROM vm GROUP BY arm
    ),
    stats AS (
        SELECT arm, n,
               round(s::DOUBLE / n / 1e6, 6) AS mean,
               round((n::DECIMAL(19,0) * ss - s::DECIMAL(19,0) * s)::DOUBLE
                     / (n::DOUBLE * (n - 1)) / 1e12, 6) AS var,
               ((n::DECIMAL(19,0) * ss - s::DECIMAL(19,0) * s)::DOUBLE
                     / (n::DOUBLE * (n - 1)) / 1e12) / n AS vn
        FROM per
    )
    SELECT a.n AS n_a, a.mean AS mean_a, a.var AS var_a,
           b.n AS n_b, b.mean AS mean_b, b.var AS var_b,
           round((a.mean - b.mean) / sqrt(a.vn + b.vn), 6) AS t_stat,
           round((a.vn + b.vn) * (a.vn + b.vn)
                 / (a.vn * a.vn / (a.n - 1) + b.vn * b.vn / (b.n - 1)), 4)
               AS welch_df
    FROM (SELECT * FROM stats WHERE arm = 'view') a,
         (SELECT * FROM stats WHERE arm = 'purchase') b
    """,
)
def q_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic between the 'view' and
    'purchase' arms' value distributions — the A/B experiment readout
    [Welch 1947].  Per-arm moments are exact integer sums (one hash
    aggregate over two groups); mean/variance/t/df are single float
    expressions over those exact sums, so both engines agree to the
    printed digit."""
    from es_ch_sync_spark.operators.analytics import ab_welch_report

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ab_welch_report(
        ev, group_col="event_type", value_col="value",
        arm_a="view", arm_b="purchase",
    )


@register(
    "mann_kendall_trend",
    """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts)::DATE AS day,
               count(*)::BIGINT AS y
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type,
               sign(b.y - a.y)::BIGINT AS sgn,
               CAST(round((b.y - a.y)::DOUBLE * 1000000
                          / date_diff('day', a.day, b.day)) AS BIGINT)
                   AS slope_m
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
    ),
    s AS (SELECT event_type, sum(sgn)::BIGINT AS s_stat, count(*) AS np
          FROM pairs GROUP BY 1),
    med AS (
        SELECT event_type, slope_m AS sen_m FROM (
            SELECT event_type, slope_m,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY slope_m) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS cnt
            FROM pairs
        ) WHERE rn = (cnt + 1) // 2
    ),
    nd AS (SELECT event_type, count(*)::BIGINT AS n_days FROM daily GROUP BY 1),
    ties AS (
        SELECT event_type,
               sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_term
        FROM (SELECT event_type, y, count(*)::BIGINT AS t
              FROM daily GROUP BY 1, 2)
        GROUP BY 1
    ),
    j AS (
        SELECT s.event_type, nd.n_days, s.s_stat, med.sen_m,
               nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
                   - ties.tie_term AS var18
        FROM s JOIN med USING (event_type)
               JOIN nd ON s.event_type = nd.event_type
               JOIN ties ON s.event_type = ties.event_type
    ),
    z AS (
        SELECT *,
               CASE WHEN var18 > 0 AND s_stat != 0
                    THEN round((s_stat::DOUBLE - sign(s_stat))
                               / sqrt(var18::DOUBLE / 18.0), 6)
                    ELSE 0.0 END AS z_score
        FROM j
    )
    SELECT event_type, n_days, s_stat,
           sen_m / 1000000.0 AS sen_slope, z_score,
           CASE WHEN z_score > 1.96 THEN 'increasing'
                WHEN z_score < -1.96 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM z
    ORDER BY event_type
    """,
)
def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test + Sen's slope on each event
    type's daily volume series — the nonparametric is-this-metric-
    drifting readout.  S, the tie-corrected variance numerator, and the
    lower-median Sen slope are all integer-exact (pairwise stage is a
    per-key equi-join with an inequality filter, bounded by series
    length); z and the trend label are single float expressions over
    those integers."""
    from es_ch_sync_spark.operators.analytics import mann_kendall_sen

    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    return mann_kendall_sen(
        daily, key_col="event_type", day_col="day", value_col="y"
    ).orderBy("event_type")


@register(
    "spearman_daily",
    """
    WITH daily AS (
        SELECT event_type,
               count(*)::BIGINT AS x,
               CAST(sum(value::DECIMAL(14,2)) * 100 AS BIGINT) AS y
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL
        GROUP BY event_type, date_trunc('day', ts)::DATE
    ),
    r AS (
        SELECT event_type,
               (2 * rank() OVER (PARTITION BY event_type ORDER BY x)
                + count(*) OVER (PARTITION BY event_type, x) - 1)::BIGINT AS rx,
               (2 * rank() OVER (PARTITION BY event_type ORDER BY y)
                + count(*) OVER (PARTITION BY event_type, y) - 1)::BIGINT AS ry
        FROM daily
    ),
    agg AS (
        SELECT event_type, count(*)::BIGINT AS n,
               sum(rx)::BIGINT AS sx, sum(ry)::BIGINT AS sy,
               sum(rx * rx)::BIGINT AS sxx, sum(ry * ry)::BIGINT AS syy,
               sum(rx * ry)::BIGINT AS sxy
        FROM r GROUP BY 1
    )
    SELECT event_type, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round((n * sxy - sx * sy)::DOUBLE
                           / sqrt((n * sxx - sx * sx)::DOUBLE
                                  * (n * syy - sy * sy)::DOUBLE), 6)
           END AS spearman_rho
    FROM agg
    ORDER BY event_type
    """,
)
def q_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between each event type's daily volume
    and daily value sum — the robust (monotone, outlier-insensitive)
    companion to rolling_corr_daily's Pearson.  Tie-averaged ranks are
    carried as integer double-ranks, so the co-moments are exact BIGINT
    sums and ρ is one float expression — engines agree to the printed
    digit."""
    from es_ch_sync_spark.operators.analytics import spearman_by_key

    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("x"),
            (F.sum(F.col("value").cast("decimal(14,2)")) * 100)
            .cast("long")
            .alias("y"),
        )
    )
    return spearman_by_key(
        daily, key_col="event_type", x_col="x", y_col="y"
    ).orderBy("event_type")


@register(
    "jsonl_source_scan",
    """
    SELECT event_id, user_id, ts, event_type, value FROM events
    WHERE event_type = 'purchase' AND value IS NOT NULL
    """,
)
def q_jsonl_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines as a source format — what crawled/LLM corpora actually
    arrive as — with the quarantine contract: events round-trip through
    JSONL and are read back PERMISSIVE with an explicit schema (no
    inference pass) + corrupt-record column; the filtered read must
    equal the same predicate over the parquet source-of-truth.
    Timestamps round-trip through an explicit microsecond format."""
    import tempfile
    import uuid

    from es_ch_sync_spark.io.sources import write_read_jsonl

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    out = tempfile.mkdtemp(prefix=f"jsonl_src_{uuid.uuid4().hex[:8]}_")
    back = write_read_jsonl(
        ev, out,
        "event_id bigint, user_id bigint, ts timestamp_ntz, "
        "event_type string, value double",
    )
    assert "_corrupt_record" in back.columns
    return back.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select("event_id", "user_id", "ts", "event_type", "value")


@register(
    "ab_mann_whitney",
    """
    WITH vm AS (
        SELECT event_type AS arm,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v
        FROM events
        WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
    ),
    r AS (
        SELECT arm,
               (2 * rank() OVER (ORDER BY v)
                + count(*) OVER (PARTITION BY v) - 1)::BIGINT AS r2
        FROM vm
    ),
    per AS (SELECT arm, count(*)::BIGINT AS n, sum(r2)::BIGINT AS rs2
            FROM r GROUP BY 1),
    ties AS (SELECT sum(t * t * t - t)::BIGINT AS tie3
             FROM (SELECT v, count(*)::BIGINT AS t FROM vm GROUP BY 1)),
    j AS (
        SELECT a.n AS n_a, a.rs2 AS rs2a, b.n AS n_b, ties.tie3,
               (a.rs2 - a.n * (a.n + 1))::DOUBLE / 2.0 AS u,
               a.n::DOUBLE * b.n / 12.0
               * ((a.n + b.n + 1.0)
                  - ties.tie3::DOUBLE
                    / ((a.n + b.n)::DOUBLE * (a.n + b.n - 1.0))) AS var_u
        FROM (SELECT * FROM per WHERE arm = 'view') a,
             (SELECT * FROM per WHERE arm = 'purchase') b, ties
    )
    SELECT n_a, n_b, round(u, 1) AS u_stat,
           CASE WHEN var_u > 0
                THEN round((u - n_a::DOUBLE * n_b / 2.0) / sqrt(var_u), 6)
           END AS z_score,
           round(2.0 * u / (n_a::DOUBLE * n_b) - 1.0, 6) AS rank_biserial
    FROM j
    """,
)
def q_ab_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between the 'view' and 'purchase' arms' value
    distributions — the nonparametric A/B readout for skewed metrics,
    next to ab_welch_ttest's t.  Pooled tie-averaged ranks ride as
    integer double-ranks, so the rank sum, U, and the tie term are
    exact; z and the rank-biserial effect size are single float
    expressions over them."""
    from es_ch_sync_spark.operators.analytics import ab_mann_whitney

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ab_mann_whitney(
        ev, group_col="event_type", value_col="value",
        arm_a="view", arm_b="purchase",
    )


@register(
    "wilcoxon_signed_rank",
    """
    WITH ev AS (
        SELECT user_id,
               event_type AS arm,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v
        FROM events
        WHERE event_type IN ('view', 'purchase')
          AND value IS NOT NULL AND user_id IS NOT NULL
    ),
    per AS (
        SELECT user_id,
               sum(CASE WHEN arm = 'view' THEN v END)::BIGINT AS sa,
               sum(CASE WHEN arm = 'purchase' THEN v END)::BIGINT AS sb
        FROM ev GROUP BY 1
    ),
    d AS (
        SELECT (sa - sb)::BIGINT AS d FROM per
        WHERE sa IS NOT NULL AND sb IS NOT NULL AND sa != sb
    ),
    r AS (
        SELECT d,
               (2 * rank() OVER (ORDER BY abs(d))
                + count(*) OVER (PARTITION BY abs(d)) - 1)::BIGINT AS r2
        FROM d
    ),
    m AS (
        SELECT count(*)::BIGINT AS n_pairs,
               sum(CASE WHEN d > 0 THEN r2 ELSE 0 END)::BIGINT AS w2p
        FROM r
    ),
    ties AS (
        SELECT coalesce(sum(t * t * t - t), 0)::BIGINT AS tie3
        FROM (SELECT abs(d) AS ad, count(*)::BIGINT AS t FROM d GROUP BY 1)
    ),
    s AS (
        SELECT n_pairs, w2p, tie3,
               w2p::DOUBLE / 2.0 AS w_plus,
               n_pairs::DOUBLE * (n_pairs + 1.0) / 4.0 AS mu,
               n_pairs::DOUBLE * (n_pairs + 1.0) * (2.0 * n_pairs + 1.0) / 24.0
               - tie3::DOUBLE / 48.0 AS var
        FROM m, ties WHERE n_pairs > 0
    )
    SELECT n_pairs, round(w_plus, 1) AS w_plus,
           CASE WHEN var > 0
                THEN round((w_plus - mu) / sqrt(var), 6) END AS z_score,
           round(4.0 * w_plus
                 / (n_pairs::DOUBLE * (n_pairs + 1.0)) - 1.0, 6)
               AS rank_biserial
    FROM s
    """,
)
def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test of each user's total 'view' value
    against their total 'purchase' value — the PAIRED nonparametric
    test completing the A/B rank family (ab_mann_whitney: independent
    pools; this: within-user differences, cancelling between-user
    variance the way CUPED does for the t-test).  Per-event values
    micro-quantize before the per-(user, arm) integer sums, so every
    difference is exact; tie-averaged |d| ranks ride as integer
    double-ranks over the bounded distinct-|d| census."""
    from es_ch_sync_spark.operators.analytics import wilcoxon_signed_rank

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return wilcoxon_signed_rank(
        ev, pair_col="user_id", arm_col="event_type", value_col="value",
        arm_a="view", arm_b="purchase",
    )


@register(
    "cuped_adjusted_ab",
    """
    WITH ev AS (
        SELECT user_id, event_type,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v
        FROM events
        WHERE event_type IN ('view', 'purchase')
          AND value IS NOT NULL AND user_id IS NOT NULL
    ),
    units AS (
        SELECT user_id,
               coalesce(sum(CASE WHEN event_type = 'view' THEN v END),
                        0)::BIGINT AS x,
               coalesce(sum(CASE WHEN event_type = 'purchase' THEN v END),
                        0)::BIGINT AS y,
               CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        FROM ev GROUP BY 1
    ),
    per AS (
        SELECT arm, count(*)::BIGINT AS n,
               sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
               sum(x::HUGEINT * x::HUGEINT)::HUGEINT AS sxx,
               sum(y::HUGEINT * y::HUGEINT)::HUGEINT AS syy,
               sum(x::HUGEINT * y::HUGEINT)::HUGEINT AS sxy
        FROM units GROUP BY 1
    ),
    ar AS (SELECT n AS n_a, sx AS sxa, sy AS sya, sxx AS sxxa,
                  syy AS syya, sxy AS sxya FROM per WHERE arm = 'A'),
    br AS (SELECT n AS n_b, sx AS sxb, sy AS syb, sxx AS sxxb,
                  syy AS syyb, sxy AS sxyb FROM per WHERE arm = 'B'),
    m1 AS (
        SELECT *,
               n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
               n_a::DOUBLE + n_b::DOUBLE AS nn,
               sxa::DOUBLE + sxb::DOUBLE AS psx,
               sya::DOUBLE + syb::DOUBLE AS psy,
               sxxa::DOUBLE + sxxb::DOUBLE AS psxx,
               syya::DOUBLE + syyb::DOUBLE AS psyy,
               sxya::DOUBLE + sxyb::DOUBLE AS psxy
        FROM ar, br
    ),
    m2 AS (
        SELECT *,
               psxx - psx * psx / nn AS varp,
               psxy - psx * psy / nn AS covp,
               psyy - psy * psy / nn AS syyc,
               (psxy - psx * psy / nn) / (psxx - psx * psx / nn) AS theta,
               psx / nn AS xbar
        FROM m1
    ),
    m3 AS (
        SELECT *,
               sya::DOUBLE / na - theta * (sxa::DOUBLE / na - xbar) AS ma,
               syb::DOUBLE / nb - theta * (sxb::DOUBLE / nb - xbar) AS mb,
               (syya::DOUBLE - sya::DOUBLE * sya::DOUBLE / na
                - 2.0 * theta
                  * (sxya::DOUBLE - sxa::DOUBLE * sya::DOUBLE / na)
                + theta * theta
                  * (sxxa::DOUBLE - sxa::DOUBLE * sxa::DOUBLE / na))
               / (na - 1.0) AS s2a,
               (syyb::DOUBLE - syb::DOUBLE * syb::DOUBLE / nb
                - 2.0 * theta
                  * (sxyb::DOUBLE - sxb::DOUBLE * syb::DOUBLE / nb)
                + theta * theta
                  * (sxxb::DOUBLE - sxb::DOUBLE * sxb::DOUBLE / nb))
               / (nb - 1.0) AS s2b
        FROM m2
    ),
    m4 AS (
        SELECT *, s2a / na AS vna, s2b / nb AS vnb,
               s2a / na + s2b / nb AS se2
        FROM m3
    )
    SELECT n_a, n_b,
           round(CASE WHEN varp > 0 THEN theta END, 6) AS theta,
           round(CASE WHEN n_a > 1 AND n_b > 1 AND varp > 0
                 THEN ma / 1000000.0 END, 6) AS adj_mean_a,
           round(CASE WHEN n_a > 1 AND n_b > 1 AND varp > 0
                 THEN mb / 1000000.0 END, 6) AS adj_mean_b,
           round(CASE WHEN n_a > 1 AND n_b > 1 AND varp > 0 AND se2 > 0
                 THEN (ma - mb) / sqrt(se2) END, 6) AS t_cuped,
           round(CASE WHEN n_a > 1 AND n_b > 1 AND varp > 0 AND se2 > 0
                 THEN se2 * se2
                      / (vna * vna / (na - 1.0) + vnb * vnb / (nb - 1.0))
                 END, 6) AS df,
           round(CASE WHEN varp > 0 AND syyc > 0
                 THEN covp * covp / (varp * syyc) END, 6)
               AS var_reduction_rho2
    FROM m4
    """,
)
def q_cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout [Deng et al. 2013]: each
    user's total 'view' value is the pre-experiment covariate X, their
    total 'purchase' value the outcome Y, arms a deterministic
    user_id-parity split; pooled θ = cov(X,Y)/var(X), then Welch's t on
    Ŷ = Y − θ(X − X̄) plus the ρ² variance-reduction readout.  Per-event
    micro quantization keeps every per-user sum and all twelve arm
    moments exact integers (wilcoxon contract); one hash aggregate
    per stage."""
    from es_ch_sync_spark.operators.analytics import cuped_adjusted_ab

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    )
    vm = (F.col("value").cast("decimal(24,6)") * F.lit(1000000)).cast("long")
    units = (
        ev.select("user_id", F.col("event_type").alias("_et"), vm.alias("_v"))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_et") == "view", F.col("_v"))), F.lit(0)
            )
            .cast("long")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("_et") == "purchase", F.col("_v"))),
                F.lit(0),
            )
            .cast("long")
            .alias("y"),
        )
        .withColumn(
            "arm",
            F.when(F.col("user_id") % 2 == 0, F.lit("A")).otherwise(
                F.lit("B")
            ),
        )
    )
    return cuped_adjusted_ab(
        units, "arm", "x", "y", "A", "B", quantize=False
    )


def _sprt_oracle(
    p0: float = 0.2, p1: float = 0.25, alpha: float = 0.05, beta: float = 0.2
) -> str:
    """SQL mirror of analytics.sprt_conversion_daily on the events
    purchase stream: the four ln constants are the SAME Python doubles
    embedded in both engines (Gumbel shared-literal contract)."""
    import math

    l1 = math.log(p1 / p0)
    l0 = math.log((1.0 - p1) / (1.0 - p0))
    upper = math.log((1.0 - beta) / alpha)
    lower = math.log(beta / (1.0 - alpha))
    llr = f"k_cum::DOUBLE * {l1!r} + (n_cum - k_cum)::DOUBLE * {l0!r}"
    return f"""
    WITH daily AS (
        SELECT date_trunc('day', ts)::DATE AS day,
               count(*)::BIGINT AS n_day,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
                   AS k_day
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT day, n_day, k_day,
               sum(n_day) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS n_cum,
               sum(k_day) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS k_cum
        FROM daily
    )
    SELECT day, n_cum, k_cum,
           round({llr}, 6) AS llr,
           CASE WHEN {llr} >= {upper!r} THEN 'h1'
                WHEN {llr} <= {lower!r} THEN 'h0'
                ELSE 'continue' END AS decision
    FROM cum ORDER BY day
    """


@register("sprt_conversion_daily", _sprt_oracle())
def q_sprt_conversion_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT on the purchase-conversion stream, evaluated at
    daily analysis checkpoints (H0: p = 0.2 vs H1: p = 0.25,
    α = 0.05, β = 0.2) — the sequential-monitoring capstone next to
    the fixed-horizon A/B family: one row per day with cumulative
    trials/successes, the log-likelihood ratio, and the running
    decision.  Exact BIGINT cumsums over the calendar-bounded day
    census; the ln constants are shared Python doubles."""
    from es_ch_sync_spark.operators.analytics import sprt_conversion_daily

    ev = _t(spark, sf_dir, "events")
    return sprt_conversion_daily(
        ev, "ts", F.col("event_type") == "purchase", p0=0.2, p1=0.25
    )


@register(
    "ljung_box_daily",
    """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts)::DATE AS day,
               count(*)::BIGINT AS y
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, count(*)::BIGINT AS n, sum(y)::BIGINT AS s
        FROM daily GROUP BY 1
    ),
    c AS (
        SELECT d.event_type, d.day, (st.n * d.y - st.s)::BIGINT AS c
        FROM daily d JOIN stats st USING (event_type)
    ),
    den AS (
        SELECT event_type, sum(c * c)::BIGINT AS den,
               count(*)::BIGINT AS n_days
        FROM c GROUP BY 1
    ),
    lags AS (SELECT unnest(range(1, 8))::INT AS lag_d),
    pairs AS (
        SELECT a.event_type, l.lag_d, sum(a.c * b.c)::BIGINT AS num
        FROM c a CROSS JOIN lags l
        JOIN c b ON b.event_type = a.event_type AND b.day = a.day + l.lag_d
        GROUP BY 1, 2
    ),
    acf AS (
        SELECT p.event_type, p.lag_d, d.n_days,
               CASE WHEN d.den > 0
                    THEN round(p.num::DOUBLE / d.den::DOUBLE, 6) END AS acf
        FROM pairs p JOIN den d USING (event_type)
    ),
    terms AS (
        SELECT event_type, n_days,
               CAST(round(acf * acf / (n_days - lag_d)::DOUBLE * 1e12)
                    AS BIGINT) AS tq
        FROM acf WHERE acf IS NOT NULL AND n_days > lag_d
    ),
    g AS (
        SELECT event_type, sum(tq)::BIGINT AS st,
               max(n_days)::BIGINT AS n_days,
               count(*)::BIGINT AS n_lags_used
        FROM terms GROUP BY 1
    )
    SELECT event_type, n_days, n_lags_used,
           round(n_days::DOUBLE * (n_days::DOUBLE + 2.0)
                 * (st::DOUBLE / 1e12), 6) AS q_stat
    FROM g ORDER BY event_type
    """,
)
def q_ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau Q over each event type's daily-count acf at
    lags 1..7 — the joint "is it white noise" readout over acf_lags'
    per-lag census (Q ~ chi2(h) under H0).  Each term micro-quantizes at
    1e12 before the per-group sum; Q is one float product."""
    from es_ch_sync_spark.operators.analytics import ljung_box

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    return ljung_box(daily, "event_type", "day", "y", max_lag=7)


@register(
    "cramer_von_mises_ab",
    """
    WITH vm AS (
        SELECT event_type AS arm,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v
        FROM events
        WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
    ),
    pv AS (
        SELECT v,
               sum(CASE WHEN arm = 'view' THEN 1 ELSE 0 END)::BIGINT AS na_v,
               sum(CASE WHEN arm = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS nb_v
        FROM vm GROUP BY 1
    ),
    cum AS (
        SELECT na_v, nb_v,
               sum(na_v) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS ca,
               sum(nb_v) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS cb
        FROM pv
    ),
    tots AS (SELECT sum(na_v)::BIGINT AS n_a, sum(nb_v)::BIGINT AS n_b
             FROM cum),
    s AS (
        SELECT n_a, n_b,
               sum((na_v + nb_v)::HUGEINT
                   * (ca::HUGEINT * n_b - cb::HUGEINT * n_a)
                   * (ca::HUGEINT * n_b - cb::HUGEINT * n_a))::HUGEINT AS sm
        FROM cum, tots
        GROUP BY 1, 2
    )
    SELECT n_a, n_b,
           round(sm::DOUBLE
                 / (n_a::DOUBLE * n_b::DOUBLE
                    * (n_a::DOUBLE + n_b::DOUBLE)
                    * (n_a::DOUBLE + n_b::DOUBLE)), 6) AS t_cvm
    FROM s WHERE n_a > 0 AND n_b > 0
    """,
)
def q_cramer_von_mises_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises T between the 'view' and 'purchase'
    arms — the integrated-squared-ECDF-gap companion to ks_ab_test (max
    gap) and ab_mann_whitney (location): shape/spread differences that
    never open one large gap still register.  Exact integer numerator
    off the MW value census; T is one float division."""
    from es_ch_sync_spark.operators.analytics import cramer_von_mises_ab

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return cramer_von_mises_ab(
        ev, "event_type", "value", "view", "purchase"
    )


@register(
    "hodges_lehmann_daily",
    """
    WITH daily AS (
        SELECT event_type AS arm, date_trunc('day', ts)::DATE AS day,
               (count(*) * 1000000)::BIGINT AS y
        FROM events WHERE event_type IN ('view', 'purchase')
        GROUP BY 1, 2
    ),
    va AS (SELECT y AS ya FROM daily WHERE arm = 'view'),
    vb AS (SELECT y AS yb FROM daily WHERE arm = 'purchase'),
    d AS (SELECT (ya - yb)::BIGINT AS d FROM va, vb),
    r AS (
        SELECT d, row_number() OVER (ORDER BY d) AS i FROM d
    ),
    c AS (SELECT count(*)::BIGINT AS n_pairs FROM d)
    SELECT c.n_pairs, round(r.d::DOUBLE / 1e6, 6) AS hl_shift
    FROM r, c WHERE r.i = (c.n_pairs + 1) // 2
    """,
)
def q_hodges_lehmann_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location-shift estimate between the 'view' and
    'purchase' arms' daily counts — the robust "by how much" next to
    ab_mann_whitney's rank_biserial: the LOWER median of all cross-arm
    daily differences (calendar²-bounded pair census, exact integer
    differences)."""
    from es_ch_sync_spark.operators.analytics import hodges_lehmann_daily

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    daily = ev.groupBy(
        F.col("event_type").alias("arm"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    return hodges_lehmann_daily(daily, "arm", "day", "y", "view", "purchase")


@register(
    "did_effect",
    """
    WITH ev AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
               (date_trunc('day', ts)::DATE >= DATE '2024-01-16') AS post,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v
        FROM events
        WHERE value IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
    ),
    per AS (
        SELECT arm, post, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
               sum(v::HUGEINT * v::HUGEINT)::HUGEINT AS ss
        FROM ev GROUP BY 1, 2
    ),
    a0 AS (SELECT n AS n_a0, s AS sa0, ss AS ssa0 FROM per
           WHERE arm = 'A' AND NOT post),
    a1 AS (SELECT n AS n_a1, s AS sa1, ss AS ssa1 FROM per
           WHERE arm = 'A' AND post),
    b0 AS (SELECT n AS n_b0, s AS sb0, ss AS ssb0 FROM per
           WHERE arm = 'B' AND NOT post),
    b1 AS (SELECT n AS n_b1, s AS sb1, ss AS ssb1 FROM per
           WHERE arm = 'B' AND post),
    m AS (
        SELECT *,
               sa0::DOUBLE / n_a0::DOUBLE AS ma0,
               sa1::DOUBLE / n_a1::DOUBLE AS ma1,
               sb0::DOUBLE / n_b0::DOUBLE AS mb0,
               sb1::DOUBLE / n_b1::DOUBLE AS mb1,
               (ssa0::DOUBLE - sa0::DOUBLE * sa0::DOUBLE / n_a0::DOUBLE)
                   / (n_a0::DOUBLE - 1.0) / n_a0::DOUBLE AS vna0,
               (ssa1::DOUBLE - sa1::DOUBLE * sa1::DOUBLE / n_a1::DOUBLE)
                   / (n_a1::DOUBLE - 1.0) / n_a1::DOUBLE AS vna1,
               (ssb0::DOUBLE - sb0::DOUBLE * sb0::DOUBLE / n_b0::DOUBLE)
                   / (n_b0::DOUBLE - 1.0) / n_b0::DOUBLE AS vnb0,
               (ssb1::DOUBLE - sb1::DOUBLE * sb1::DOUBLE / n_b1::DOUBLE)
                   / (n_b1::DOUBLE - 1.0) / n_b1::DOUBLE AS vnb1
        FROM a0, a1, b0, b1
    ),
    f AS (
        SELECT *,
               (mb1 - mb0) - (ma1 - ma0) AS did,
               vna0 + vna1 + vnb0 + vnb1 AS se2
        FROM m
    )
    SELECT n_a0, n_a1, n_b0, n_b1,
           round(ma0 / 1000000.0, 6) AS mean_a_pre,
           round(ma1 / 1000000.0, 6) AS mean_a_post,
           round(mb0 / 1000000.0, 6) AS mean_b_pre,
           round(mb1 / 1000000.0, 6) AS mean_b_post,
           round(did / 1000000.0, 6) AS did,
           round(CASE WHEN n_a0 > 1 AND n_a1 > 1 AND n_b0 > 1 AND n_b1 > 1
                       AND se2 > 0
                 THEN did / sqrt(se2) END, 6) AS t_did
    FROM f
    """,
)
def q_did_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on the events value metric: arms a
    deterministic user-parity split, pre/post at the calendar midpoint
    (2024-01-16) — the quasi-experimental effect next to the randomized
    A/B family, removing the arm baseline gap and the common time
    trend.  One (arm, period) hash aggregate; exact micro moments;
    Welch-style unpooled SE."""
    from es_ch_sync_spark.operators.analytics import diff_in_diff

    ev = (
        _t(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            F.when(F.col("user_id") % 2 == 0, F.lit("A"))
            .otherwise(F.lit("B"))
            .alias("arm"),
            (F.to_date("ts") >= F.lit("2024-01-16").cast("date")).alias(
                "post"
            ),
            "value",
        )
    )
    return diff_in_diff(ev, "arm", "post", "value", "A", "B")


@register(
    "event_mix_drift_daily",
    """
    WITH c AS (
        SELECT date_trunc('day', ts)::DATE AS day, event_type AS cat,
               count(*)::BIGINT AS n
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM c),
    cats AS (SELECT DISTINCT cat FROM c),
    tot AS (SELECT day, sum(n)::BIGINT AS t FROM c GROUP BY 1),
    grid AS (SELECT day, cat FROM days, cats),
    cur AS (
        SELECT g.day, g.cat, coalesce(c.n, 0)::BIGINT AS cn
        FROM grid g LEFT JOIN c ON g.day = c.day AND g.cat = c.cat
    ),
    prev AS (SELECT day + 1 AS day, cat, n AS pn FROM c),
    ptot AS (SELECT day + 1 AS day, t AS pt FROM tot),
    b AS (
        SELECT cur.day, cur.cat, cur.cn,
               coalesce(p.pn, 0)::BIGINT AS pn2, t.t, pt.pt
        FROM cur
        LEFT JOIN prev p ON cur.day = p.day AND cur.cat = p.cat
        JOIN tot t ON cur.day = t.day
        LEFT JOIN ptot pt ON cur.day = pt.day
    ),
    terms AS (
        SELECT day, pt,
               CASE WHEN cn > 0
                    THEN (cn::DOUBLE / t::DOUBLE)
                         * ln((cn::DOUBLE / t::DOUBLE)
                              / (((cn::DOUBLE / t::DOUBLE)
                                  + (pn2::DOUBLE / pt::DOUBLE)) / 2.0))
                    ELSE 0.0 END AS term_p,
               CASE WHEN pn2 > 0
                    THEN (pn2::DOUBLE / pt::DOUBLE)
                         * ln((pn2::DOUBLE / pt::DOUBLE)
                              / (((cn::DOUBLE / t::DOUBLE)
                                  + (pn2::DOUBLE / pt::DOUBLE)) / 2.0))
                    ELSE 0.0 END AS term_q
        FROM b
    ),
    agg AS (
        SELECT day,
               sum(CAST(floor(term_p * 1e9 + 0.5) AS BIGINT))::BIGINT AS tp,
               sum(CAST(floor(term_q * 1e9 + 0.5) AS BIGINT))::BIGINT AS tq,
               max(pt) AS has_prev,
               count(*)::BIGINT AS n_categories
        FROM terms GROUP BY 1
    )
    SELECT day, n_categories,
           CASE WHEN has_prev IS NOT NULL
                THEN round((tp::DOUBLE + tq::DOUBLE) / 2e9, 6) END
               AS jsd_nats
    FROM agg ORDER BY day
    """,
)
def q_event_mix_drift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day Jensen-Shannon divergence of the event-type mix —
    the production drift monitor: JSD(day ‖ previous day) spikes when
    the incoming mix shifts; bounded ≤ ln 2, symmetric, NULL for days
    with no previous calendar day (drift vs nothing is undefined).
    One (day, type) census; grid support algebra; nano-quantized terms
    (source_jsd contract)."""
    from es_ch_sync_spark.operators.analytics import mix_jsd_daily

    ev = _t(spark, sf_dir, "events")
    return mix_jsd_daily(ev, "ts", "event_type")


@register(
    "friedman_daily",
    """
    WITH daily AS (
        SELECT date_trunc('day', ts)::DATE AS b, event_type AS t,
               (count(*) * 1000000)::BIGINT AS y
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    kt AS (SELECT count(DISTINCT t)::BIGINT AS k FROM daily),
    complete AS (
        SELECT b FROM daily, kt GROUP BY b, kt.k
        HAVING count(DISTINCT t) = any_value(kt.k)
    ),
    dc AS (SELECT d.* FROM daily d JOIN complete USING (b)),
    r AS (
        SELECT b, t,
               (2 * rank() OVER (PARTITION BY b ORDER BY y)
                + count(*) OVER (PARTITION BY b, y) - 1)::BIGINT AS r2
        FROM dc
    ),
    per_t AS (
        SELECT t, sum(r2)::BIGINT AS rs2, count(*)::BIGINT AS nb
        FROM r GROUP BY 1
    ),
    g AS (
        SELECT sum(rs2::HUGEINT * rs2::HUGEINT)::HUGEINT AS sr2,
               max(nb)::BIGINT AS n_blocks,
               count(*)::BIGINT AS k_treatments
        FROM per_t
    )
    SELECT n_blocks, k_treatments,
           round(CASE WHEN n_blocks > 0 AND k_treatments > 1
                 THEN 12.0 / (n_blocks::DOUBLE * k_treatments::DOUBLE
                              * (k_treatments::DOUBLE + 1.0))
                      * (sr2::DOUBLE / 4.0)
                      - 3.0 * n_blocks::DOUBLE * (k_treatments::DOUBLE + 1.0)
                 END, 6) AS chi2_f,
           (k_treatments - 1)::BIGINT AS df_f
    FROM g
    """,
)
def q_friedman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test of the k event types' daily counts over
    complete days — the repeated-measures member completing the
    nonparametric family (days are the blocks, removing the between-day
    volume swing kruskal_wallis cannot).  Tie-averaged within-day
    double-ranks keep every rank sum an exact BIGINT."""
    from es_ch_sync_spark.operators.analytics import friedman_daily

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type").alias("t")
    ).agg(F.count(F.lit(1)).alias("y"))
    return friedman_daily(daily, "day", "t", "y")


@register(
    "grubbs_daily",
    """
    WITH daily AS (
        SELECT event_type AS g, date_trunc('day', ts)::DATE AS day,
               (count(*) * 1000000)::BIGINT AS y
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT g, count(*)::BIGINT AS n_days, sum(y)::BIGINT AS s,
               sum(y::HUGEINT * y::HUGEINT)::HUGEINT AS ss
        FROM daily GROUP BY 1
    ),
    j AS (
        SELECT d.g, d.day, st.n_days, st.s, st.ss,
               abs(st.n_days * d.y - st.s)::BIGINT AS ndev
        FROM daily d JOIN stats st USING (g)
    ),
    top AS (
        SELECT *, row_number() OVER (
                   PARTITION BY g ORDER BY ndev DESC, day ASC) AS rn
        FROM j
    ),
    m AS (
        SELECT g, day, n_days, ndev,
               ss::DOUBLE - s::DOUBLE * s::DOUBLE / n_days::DOUBLE AS ssd
        FROM top WHERE rn = 1
    )
    SELECT g AS event_type, n_days, day AS outlier_day,
           round(CASE WHEN n_days > 1 AND ssd > 0
                 THEN ndev::DOUBLE
                      / (n_days::DOUBLE
                         * sqrt(ssd / (n_days::DOUBLE - 1.0))) END, 6)
               AS g_stat
    FROM m ORDER BY event_type
    """,
)
def q_grubbs_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' max-studentized-deviation statistic per event type over
    the daily count series, with the argmax day — "which single day is
    most anomalous and by how many SDs", next to cusum_shifts (level
    shifts) and page_hinkley (drift).  Deviations scaled by n stay
    exact integers, so the argmax never depends on a float mean."""
    from es_ch_sync_spark.operators.analytics import grubbs_daily

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    return grubbs_daily(daily, "event_type", "day", "y")


@register(
    "page_hinkley_daily",
    """
    WITH daily AS (
        SELECT event_type AS g, date_trunc('day', ts)::DATE AS day,
               (count(*) * 1000000)::BIGINT AS y
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    run AS (
        SELECT g, day, y,
               sum(y) OVER (PARTITION BY g ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS cs,
               count(*) OVER (PARTITION BY g ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS ct
        FROM daily
    ),
    terms AS (
        SELECT g, day,
               CAST(round(y::DOUBLE - cs::DOUBLE / ct::DOUBLE - 0.0)
                    AS BIGINT) AS term
        FROM run
    ),
    cum AS (
        SELECT g, day,
               sum(term) OVER (PARTITION BY g ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS m
        FROM terms
    ),
    mm AS (
        SELECT g, day, m,
               min(m) OVER (PARTITION BY g ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS mmin
        FROM cum
    )
    SELECT g AS event_type, day,
           round((m - mmin)::DOUBLE / 1e6, 6) AS ph_stat,
           ((m - mmin) > 50000000) AS alarm
    FROM mm ORDER BY event_type, day
    """,
)
def q_page_hinkley_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential drift detector per event type over daily
    counts (delta = 0, lambda = 50 in count units) — the self-referencing
    mean-shift monitor next to cusum_shifts: alarm when the cumulative
    deviation from the running mean exceeds lambda over its running
    minimum.  Per-day terms quantize to BIGINTs before the cumsums, so
    every m_T and running min is exact cross-engine."""
    from es_ch_sync_spark.operators.analytics import page_hinkley_daily

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    return page_hinkley_daily(
        daily, "event_type", "day", "y", delta=0.0, lam=50.0
    )


@register(
    "qini_uplift_deciles",
    """
    WITH ev AS (
        SELECT user_id, event_type,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
    ),
    units AS (
        SELECT user_id,
               coalesce(sum(CASE WHEN event_type = 'view' THEN v END),
                        0)::BIGINT AS score,
               (user_id % 2 = 0) AS treated,
               bool_or(event_type = 'purchase') AS converted
        FROM ev GROUP BY user_id
    ),
    cen AS (
        SELECT score AS v, count(*)::BIGINT AS n,
               sum(CASE WHEN treated THEN 1 ELSE 0 END)::BIGINT AS nt,
               sum(CASE WHEN treated AND converted THEN 1 ELSE 0 END)::BIGINT
                   AS ct,
               sum(CASE WHEN NOT treated AND converted THEN 1 ELSE 0 END)::BIGINT
                   AS cc
        FROM units GROUP BY 1
    ),
    tot AS (SELECT sum(n)::BIGINT AS nn FROM cen),
    b AS (
        SELECT least((10 * coalesce(sum(n) OVER (ORDER BY v DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
                   // nn, 9)::INT AS decile,
               n, nt, ct, cc
        FROM cen, tot
    ),
    per AS (
        SELECT decile, sum(n)::BIGINT AS n, sum(nt)::BIGINT AS n_treat,
               sum(ct)::BIGINT AS conv_treat, sum(cc)::BIGINT AS conv_ctrl
        FROM b GROUP BY 1
    ),
    cum AS (
        SELECT decile, n, n_treat, conv_treat, conv_ctrl,
               sum(n_treat) OVER w::BIGINT AS cum_n_treat,
               (sum(n) OVER w - sum(n_treat) OVER w)::BIGINT AS cum_n_ctrl,
               sum(conv_treat) OVER w::BIGINT AS cum_conv_treat,
               sum(conv_ctrl) OVER w::BIGINT AS cum_conv_ctrl
        FROM per
        WINDOW w AS (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT decile, n, n_treat, conv_treat, conv_ctrl,
           cum_n_treat, cum_n_ctrl,
           round(cum_conv_treat::DOUBLE
                 - cum_conv_ctrl::DOUBLE * cum_n_treat::DOUBLE
                   / CASE WHEN cum_n_ctrl > 0
                          THEN cum_n_ctrl::DOUBLE END, 6) AS qini
    FROM cum ORDER BY decile
    """,
)
def q_qini_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift deciles: users ranked by their total 'view' value
    (the targeting score), treatment a deterministic user-parity split,
    conversion = any purchase — the "who should we treat" audit next to
    the A/B family's "did the treatment work".  Descending value-census
    deciles keep ties in one bin; exact counts, one float qini per
    row."""
    from es_ch_sync_spark.operators.analytics import qini_uplift_deciles

    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    vm = (F.col("value").cast("decimal(24,6)") * F.lit(1000000)).cast("long")
    units = (
        ev.select("user_id", F.col("event_type").alias("_et"), vm.alias("_v"))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_et") == "view", F.col("_v"))), F.lit(0)
            )
            .cast("long")
            .alias("score"),
            F.max(F.col("_et") == "purchase").alias("converted"),
        )
        .withColumn("treated", F.col("user_id") % 2 == 0)
    )
    return qini_uplift_deciles(units, "score", "treated", "converted")


@register(
    "kruskal_wallis_arms",
    """
    WITH vm AS (
        SELECT event_type AS g,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v
        FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    pv AS (SELECT v, g, count(*)::BIGINT AS c FROM vm GROUP BY 1, 2),
    tv AS MATERIALIZED (SELECT v, sum(c)::BIGINT AS t FROM pv GROUP BY 1),
    rv AS (
        SELECT v, t,
               coalesce(sum(t) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                   AS cum
        FROM tv
    ),
    pg AS (
        SELECT g, sum(c)::BIGINT AS ng,
               sum(c * (2 * cum + t + 1))::BIGINT AS r2g
        FROM pv JOIN rv USING (v) GROUP BY 1
    ),
    s AS (
        SELECT count(*)::BIGINT AS n_groups, sum(ng)::BIGINT AS n_total,
               sum(CAST(round(r2g::DOUBLE * r2g::DOUBLE
                              / (4.0 * ng::DOUBLE) * 1000000.0)
                        AS HUGEINT))::HUGEINT AS s_m
        FROM pg
    ),
    ties AS (SELECT sum(t * t * t - t)::BIGINT AS tie3 FROM tv)
    SELECT n_groups, n_total,
           round(12.0 / (n_total::DOUBLE * (n_total + 1.0))
                 * (s_m::DOUBLE / 1000000.0) - 3.0 * (n_total + 1.0), 6)
               AS h_stat,
           (n_groups - 1)::BIGINT AS df_h,
           round(CASE WHEN n_total > 1
                       AND 1.0 - tie3::DOUBLE
                           / (n_total::DOUBLE * n_total::DOUBLE * n_total::DOUBLE
                              - n_total::DOUBLE) > 0
                 THEN (12.0 / (n_total::DOUBLE * (n_total + 1.0))
                       * (s_m::DOUBLE / 1000000.0) - 3.0 * (n_total + 1.0))
                      / (1.0 - tie3::DOUBLE
                         / (n_total::DOUBLE * n_total::DOUBLE * n_total::DOUBLE
                            - n_total::DOUBLE))
                 END, 6) AS h_corrected
    FROM s, ties WHERE n_total > 0
    """,
)
def q_kruskal_wallis_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across ALL event types' value distributions —
    the k-group generalization of ab_mann_whitney (one omnibus rank
    test before pairwise drilling).  Pooled tie-averaged double-ranks
    over the distinct-value census keep every per-group rank sum an
    exact BIGINT; the per-group R²/n term micro-quantizes before its
    sum (chi2_independence contract)."""
    from es_ch_sync_spark.operators.analytics import kruskal_wallis

    ev = _t(spark, sf_dir, "events")
    return kruskal_wallis(ev, group_col="event_type", value_col="value")


@register(
    "brown_forsythe_arms",
    """
    WITH vm AS (
        SELECT event_type AS g,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v
        FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    gv AS (SELECT g, v, count(*)::BIGINT AS c FROM vm GROUP BY 1, 2),
    cum AS (
        SELECT g, v, c,
               sum(c) OVER (PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS cum
        FROM gv
    ),
    ng AS (SELECT g, sum(c)::BIGINT AS ng FROM gv GROUP BY 1),
    med AS (
        SELECT g, min(v)::BIGINT AS med
        FROM cum JOIN ng USING (g) WHERE 2 * cum >= ng GROUP BY 1
    ),
    z AS (
        SELECT gv.g AS g, c, abs(v - med)::BIGINT AS z
        FROM gv JOIN med ON gv.g = med.g
    ),
    pg AS (
        SELECT g, sum(c)::BIGINT AS ng, sum(c * z)::BIGINT AS sz,
               sum(c::HUGEINT * z::HUGEINT * z::HUGEINT)::HUGEINT AS szz
        FROM z GROUP BY 1
    ),
    s AS (
        SELECT count(*)::BIGINT AS n_groups, sum(ng)::BIGINT AS n_total,
               sum(sz)::BIGINT AS s_z, sum(szz)::HUGEINT AS s_zz,
               sum(CAST(round(sz::DOUBLE * sz::DOUBLE / ng::DOUBLE
                              * 1000000.0) AS HUGEINT))::HUGEINT AS s_t1m
        FROM pg
    )
    SELECT n_groups, n_total,
           round(CASE WHEN s_zz::DOUBLE - s_t1m::DOUBLE / 1000000.0 > 0
                 THEN (n_total - n_groups)::DOUBLE / (n_groups - 1)::DOUBLE
                      * ((s_t1m::DOUBLE / 1000000.0)
                         - s_z::DOUBLE * s_z::DOUBLE / n_total::DOUBLE)
                      / (s_zz::DOUBLE - s_t1m::DOUBLE / 1000000.0)
                 END, 6) AS w_stat,
           (n_groups - 1)::BIGINT AS df1,
           (n_total - n_groups)::BIGINT AS df2
    FROM s WHERE n_groups > 1 AND n_total > n_groups
    """,
)
def q_brown_forsythe_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) variance-homogeneity
    test across all event types' values — the spread-equality audit
    next to kruskal_wallis_arms' location test.  Group medians are
    LOWER medians decided on the per-group value census in exact
    integers (no interpolating median crosses the engine boundary);
    deviations and moments are exact; W is one float expression."""
    from es_ch_sync_spark.operators.analytics import brown_forsythe

    ev = _t(spark, sf_dir, "events")
    return brown_forsythe(ev, group_col="event_type", value_col="value")


@register(
    "ab_panel",
    """
    WITH vm AS (
        SELECT event_type AS arm,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v
        FROM events
        WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
    ),
    pv AS MATERIALIZED (
        SELECT v,
               sum(CASE WHEN arm = 'view' THEN 1 ELSE 0 END)::BIGINT AS na_v,
               sum(CASE WHEN arm = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS nb_v
        FROM vm GROUP BY 1
    ),
    r AS (
        SELECT v, na_v, nb_v, (na_v + nb_v)::BIGINT AS t,
               coalesce(sum(na_v + nb_v) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                   AS cum_below,
               coalesce(sum(na_v) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                   AS ca_below,
               coalesce(sum(nb_v) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                   AS cb_below,
               sum(na_v) OVER ()::BIGINT AS tot_a,
               sum(nb_v) OVER ()::BIGINT AS tot_b
        FROM pv
    ),
    g AS (
        SELECT sum(na_v)::BIGINT AS n_a, sum(nb_v)::BIGINT AS n_b,
               sum(na_v * (2 * cum_below + t + 1))::BIGINT AS rs2a,
               sum(t * t * t - t)::BIGINT AS tie3,
               sum(na_v * v)::BIGINT AS sa, sum(nb_v * v)::BIGINT AS sb,
               sum(na_v::HUGEINT * v::HUGEINT * v::HUGEINT)::HUGEINT AS ssa,
               sum(nb_v::HUGEINT * v::HUGEINT * v::HUGEINT)::HUGEINT AS ssb,
               max(abs(tot_b * (ca_below + na_v)
                       - tot_a * (cb_below + nb_v)))::BIGINT AS d_num
        FROM r
    ),
    m AS (
        SELECT n_a, n_b, rs2a, tie3, d_num,
               (rs2a - n_a * (n_a + 1))::DOUBLE / 2.0 AS u,
               n_a::DOUBLE * n_b / 12.0
               * ((n_a + n_b + 1.0)
                  - tie3::DOUBLE / ((n_a + n_b)::DOUBLE * (n_a + n_b - 1.0)))
                   AS var_u,
               sa::DOUBLE / n_a::DOUBLE AS ma, sb::DOUBLE / n_b::DOUBLE AS mb,
               ssa::DOUBLE - sa::DOUBLE * sa::DOUBLE / n_a::DOUBLE AS ssd_a,
               ssb::DOUBLE - sb::DOUBLE * sb::DOUBLE / n_b::DOUBLE AS ssd_b
        FROM g WHERE n_a > 0 AND n_b > 0
    ),
    m2 AS (
        SELECT m.*,
               ssd_a / (n_a::DOUBLE - 1.0) AS va,
               ssd_b / (n_b::DOUBLE - 1.0) AS vb
        FROM m
    ),
    m3 AS (
        SELECT m2.*,
               va / n_a::DOUBLE + vb / n_b::DOUBLE AS se2
        FROM m2
    )
    SELECT n_a, n_b, round(u, 1) AS u_stat,
           CASE WHEN var_u > 0
                THEN round((u - n_a::DOUBLE * n_b / 2.0) / sqrt(var_u), 6)
           END AS mw_z,
           round(d_num::DOUBLE / (n_a::DOUBLE * n_b), 6) AS ks_d,
           round(CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0
                 THEN (ma - mb) / sqrt(se2) END, 6) AS welch_t,
           round(CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0
                 THEN se2 * se2
                      / (va * va / (n_a::DOUBLE * n_a::DOUBLE * (n_a::DOUBLE - 1.0))
                         + vb * vb / (n_b::DOUBLE * n_b::DOUBLE * (n_b::DOUBLE - 1.0)))
                 END, 6) AS welch_df,
           round(CASE WHEN n_a > 1 AND n_b > 1 AND ssd_a + ssd_b > 0
                 THEN (ma - mb)
                      / sqrt((ssd_a + ssd_b) / (n_a::DOUBLE + n_b::DOUBLE - 2.0))
                 END, 6) AS cohen_d
    FROM m3
    """,
)
def q_ab_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A/B readout panel — Welch t (+df), Mann-Whitney U/z, KS D,
    and Cohen's d between the 'view' and 'purchase' arms off ONE
    materialized distinct-value census: the shared-pass discipline
    (corpus_stats_panel precedent) applied to the A/B family, which
    otherwise rescans the pool once per test.  Statistics match the
    standalone operators digit for digit."""
    from es_ch_sync_spark.operators.analytics import ab_panel

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ab_panel(
        ev, group_col="event_type", value_col="value",
        arm_a="view", arm_b="purchase",
    )


@register(
    "tukey_pairwise_arms",
    """
    WITH vm AS (
        SELECT event_type AS g,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v
        FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    per AS (
        SELECT g, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
               sum(v::HUGEINT * v::HUGEINT)::HUGEINT AS ss
        FROM vm GROUP BY 1
    ),
    w AS (
        SELECT sum(CAST(round(ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                        AS HUGEINT))::HUGEINT AS ssw,
               sum(n)::BIGINT AS nn, count(*)::BIGINT AS k
        FROM per
    ),
    m AS (
        SELECT CASE WHEN nn > k
               THEN ssw::DOUBLE / (nn - k)::DOUBLE END AS mse
        FROM w
    ),
    pairs AS (
        SELECT a.g AS arm_a, b.g AS arm_b, a.n AS n_a, b.n AS n_b,
               a.s AS sa, b.s AS sb
        FROM per a JOIN per b ON a.g < b.g
    )
    SELECT arm_a, arm_b, n_a, n_b,
           round((sa::DOUBLE / n_a::DOUBLE - sb::DOUBLE / n_b::DOUBLE)
                 / 1e6, 6) AS mean_diff,
           round(CASE WHEN mse > 0
                 THEN abs(sa::DOUBLE / n_a::DOUBLE - sb::DOUBLE / n_b::DOUBLE)
                      / sqrt(mse / 2.0
                             * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE))
                 END, 6) AS q_stat
    FROM pairs, m ORDER BY arm_a, arm_b
    """,
)
def q_tukey_pairwise_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-Kramer pairwise contrasts across ALL event-type arms —
    the post-hoc "which pairs differ" step after kruskal_wallis_arms'
    omnibus answer, in studentized-range q units over the pooled
    within-arm variance.  Per-arm exact moments; per-arm SSD quantized
    before the k-row pooled sum; k²/2 census-sized pairs."""
    from es_ch_sync_spark.operators.analytics import pairwise_mean_contrasts

    ev = _t(spark, sf_dir, "events")
    return pairwise_mean_contrasts(ev, "event_type", "value")


@register(
    "sliding_distinct_users",
    """
    WITH ud AS (
        SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS day
        FROM events WHERE user_id IS NOT NULL
    ),
    days AS (SELECT DISTINCT day FROM ud),
    expanded AS (
        SELECT ud.user_id, ud.day + (g.i || ' days')::INTERVAL AS day_out
        FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS i) g
    ),
    wau AS (
        SELECT day_out::DATE AS day, count(DISTINCT user_id)::BIGINT AS wau
        FROM expanded GROUP BY 1
    )
    SELECT d.day, w.wau
    FROM days d JOIN wau w ON d.day = w.day
    ORDER BY d.day
    """,
)
def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct active users (WAU per day) — the telemetry
    staple Spark windows can't express directly (COUNT(DISTINCT) over a
    RANGE frame is unsupported).  Scale-right formulation: dedup to
    (user, day) once, EXPLODE each user-day into the ≤7 future window
    ends it contributes to, then one exact distinct-count per day —
    shuffle volume O(7·user-days), no self-join of the fact table, no
    per-day rescan.  Output is restricted to days present in the data."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = ud.select("day").distinct()
    expanded = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day_out"),
    )
    wau = expanded.groupBy(F.col("day_out").alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return days.join(wau, "day").orderBy("day")


@register(
    "ks_ab_test",
    """
    WITH vm AS (
        SELECT event_type AS arm,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v
        FROM events
        WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
    ),
    pv AS (
        SELECT v,
               sum(CASE WHEN arm = 'view' THEN 1 ELSE 0 END)::BIGINT AS na_v,
               sum(CASE WHEN arm = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS nb_v
        FROM vm GROUP BY 1
    ),
    cum AS (
        SELECT sum(na_v) OVER (ORDER BY v)::BIGINT AS ca,
               sum(nb_v) OVER (ORDER BY v)::BIGINT AS cb
        FROM pv
    ),
    tot AS (SELECT sum(na_v)::BIGINT AS n_a, sum(nb_v)::BIGINT AS n_b FROM pv),
    d AS (
        SELECT n_a, n_b, max(abs(n_b * ca - n_a * cb))::BIGINT AS d_num
        FROM cum, tot GROUP BY 1, 2
    )
    SELECT n_a, n_b, d_num,
           CASE WHEN n_a > 0 AND n_b > 0
                THEN round(d_num::DOUBLE / (n_a::DOUBLE * n_b), 6)
           END AS d_stat,
           CASE WHEN n_a > 0 AND n_b > 0
                THEN round(d_num::DOUBLE / (n_a::DOUBLE * n_b)
                           * sqrt(n_a::DOUBLE * n_b / (n_a + n_b)), 6)
           END AS ks_scaled
    FROM d
    """,
)
def q_ks_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between the 'view' and 'purchase'
    arms' value distributions — completes the A/B readout triple
    (ab_welch_ttest: means; ab_mann_whitney: location; KS: any ECDF
    divergence).  D rides as an exact BIGINT numerator over n_a·n_b;
    the ECDFs are a window over the bounded distinct-value table."""
    from es_ch_sync_spark.operators.analytics import ks_two_sample

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ks_two_sample(
        ev, group_col="event_type", value_col="value",
        arm_a="view", arm_b="purchase",
    )


@register(
    "effect_sizes_ab",
    """
    WITH vm AS (
        SELECT event_type AS arm,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v
        FROM events
        WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
    ),
    per AS (
        SELECT arm, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
               sum(v::HUGEINT * v::HUGEINT)::HUGEINT AS ss
        FROM vm GROUP BY 1
    ),
    j AS (
        SELECT a.n AS n_a, a.s AS sa, a.ss AS ssa,
               b.n AS n_b, b.s AS sb, b.ss AS ssb
        FROM (SELECT * FROM per WHERE arm = 'view') a,
             (SELECT * FROM per WHERE arm = 'purchase') b
    ),
    m AS (
        SELECT n_a, n_b,
               sa::DOUBLE / n_a::DOUBLE AS ma, sb::DOUBLE / n_b::DOUBLE AS mb,
               ssa::DOUBLE - sa::DOUBLE * sa::DOUBLE / n_a::DOUBLE AS ssd_a,
               ssb::DOUBLE - sb::DOUBLE * sb::DOUBLE / n_b::DOUBLE AS ssd_b
        FROM j
    )
    SELECT n_a, n_b,
           round(CASE WHEN n_a > 1 AND n_b > 1 AND ssd_a + ssd_b > 0
                 THEN (ma - mb)
                      / sqrt((ssd_a + ssd_b) / (n_a::DOUBLE + n_b::DOUBLE - 2.0))
                 END, 6) AS cohen_d,
           round(CASE WHEN n_a > 1 AND n_b > 1 AND ssd_a + ssd_b > 0
                 THEN (ma - mb)
                      / sqrt((ssd_a + ssd_b) / (n_a::DOUBLE + n_b::DOUBLE - 2.0))
                      * (1.0 - 3.0 / (4.0 * (n_a::DOUBLE + n_b::DOUBLE) - 9.0))
                 END, 6) AS hedges_g,
           round(CASE WHEN n_b > 1 AND ssd_b > 0
                 THEN (ma - mb) / sqrt(ssd_b / (n_b::DOUBLE - 1.0))
                 END, 6) AS glass_delta
    FROM m
    """,
)
def q_effect_sizes_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d / Hedges' g / Glass's Δ between the 'view' and
    'purchase' arms — the magnitude readouts completing the A/B family
    (every significance test answers "is it real"; these answer "is it
    big", in pooled-SD, bias-corrected, and control-SD units).  Six
    exact integer moments in, three float expressions out."""
    from es_ch_sync_spark.operators.analytics import effect_sizes_ab

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return effect_sizes_ab(
        ev, group_col="event_type", value_col="value",
        arm_a="view", arm_b="purchase",
    )


@register(
    "theil_sen_daily",
    """
    WITH daily AS (
        SELECT event_type AS g, date_trunc('day', ts)::DATE AS day,
               CAST(count(*)::DECIMAL(24,6) * 1000000 AS BIGINT) AS y
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.g AS g, (b.y - a.y)::DOUBLE / (b.day - a.day)::DOUBLE AS slope
        FROM daily a JOIN daily b ON a.g = b.g AND b.day > a.day
    ),
    r AS (
        SELECT g, slope,
               row_number() OVER (PARTITION BY g ORDER BY slope) AS i
        FROM pairs
    ),
    c AS (SELECT g, count(*)::BIGINT AS n_pairs FROM pairs GROUP BY 1),
    d AS (SELECT g, count(*)::BIGINT AS n_days FROM daily GROUP BY 1)
    SELECT r.g AS event_type, d.n_days, c.n_pairs,
           round(r.slope / 1000000.0, 6) AS sen_slope
    FROM r JOIN c USING (g) JOIN d USING (g)
    WHERE r.i = (c.n_pairs + 1) // 2
    ORDER BY event_type
    """,
)
def q_theil_sen_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope of each event type's daily count series —
    the outlier-tolerant trend magnitude next to linreg_trend (least
    squares) and mann_kendall_trend (direction only): the median of
    all pairwise slopes over the calendar-bounded day census.  Lower
    median (no interpolation crosses the engine boundary); each slope
    is one IEEE division of exact integers."""
    from es_ch_sync_spark.operators.analytics import theil_sen

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    daily = ev.groupBy(
        F.col("event_type").alias("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    return theil_sen(daily, "event_type", "day", "y")


@register(
    "runs_test_daily",
    """
    WITH daily AS (
        SELECT event_type AS g, date_trunc('day', ts)::DATE AS day,
               count(*)::BIGINT AS y
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    mv AS (
        SELECT g, day,
               y - lag(y) OVER (PARTITION BY g ORDER BY day) AS diff
        FROM daily
    ),
    s AS (
        SELECT g, day, (CASE WHEN diff > 0 THEN 1 ELSE -1 END)::BIGINT AS s
        FROM mv WHERE diff IS NOT NULL AND diff != 0
    ),
    seq AS (
        SELECT g, s, lag(s) OVER (PARTITION BY g ORDER BY day) AS prev
        FROM s
    ),
    agg AS (
        SELECT g,
               sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::BIGINT AS n_up,
               sum(CASE WHEN s = -1 THEN 1 ELSE 0 END)::BIGINT AS n_down,
               sum(CASE WHEN prev IS NULL OR s != prev THEN 1 ELSE 0 END)::BIGINT
                   AS n_runs
        FROM seq GROUP BY 1
    ),
    m AS (
        SELECT g, n_up, n_down, n_runs,
               n_up::DOUBLE AS n1, n_down::DOUBLE AS n2,
               n_up::DOUBLE + n_down::DOUBLE AS n
        FROM agg
    )
    SELECT g AS event_type, n_up, n_down, n_runs,
           round(CASE WHEN n > 1
                       AND 2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                           / (n * n * (n - 1.0)) > 0
                 THEN (n_runs::DOUBLE - (2.0 * n1 * n2 / n + 1.0))
                      / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                             / (n * n * (n - 1.0)))
                 END, 6) AS z_score
    FROM m ORDER BY event_type
    """,
)
def q_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on each event type's daily up/down-move
    sequence — the randomness check next to mann_kendall_trend (trend)
    and acf_lags (correlation structure): too few runs = regimes, too
    many = oscillation.  Exact move/run counts off two group-partitioned
    lag windows over the calendar-bounded day census."""
    from es_ch_sync_spark.operators.analytics import runs_test

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    daily = ev.groupBy(
        F.col("event_type").alias("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    return runs_test(daily, "event_type", "day", "y")


@register(
    "gumbel_weekly_max",
    """
    WITH daily AS (
        SELECT event_type AS g, date_trunc('day', ts)::DATE AS day,
               CAST(count(*)::DECIMAL(24,6) * 1000000 AS BIGINT) AS y
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    blocks AS (
        SELECT g, date_trunc('week', day)::DATE AS wk, max(y)::BIGINT AS m
        FROM daily GROUP BY 1, 2
    ),
    agg AS (
        SELECT g, count(*)::BIGINT AS n_blocks, sum(m)::BIGINT AS s,
               sum(m::HUGEINT * m::HUGEINT)::HUGEINT AS ss
        FROM blocks GROUP BY 1
    ),
    m AS (
        SELECT g, n_blocks, s,
               ss::DOUBLE - s::DOUBLE * s::DOUBLE / n_blocks::DOUBLE AS ssd
        FROM agg
    )
    SELECT g AS event_type, n_blocks,
           round(s::DOUBLE / n_blocks::DOUBLE / 1000000.0, 6) AS max_mean,
           round(CASE WHEN n_blocks > 1 AND ssd > 0
                 THEN sqrt(ssd / (n_blocks::DOUBLE - 1.0))
                      * 0.7796968012336793 / 1000000.0 END, 6) AS gumbel_beta,
           round(CASE WHEN n_blocks > 1 AND ssd > 0
                 THEN s::DOUBLE / n_blocks::DOUBLE / 1000000.0
                      - 0.5772156649015329
                        * (sqrt(ssd / (n_blocks::DOUBLE - 1.0))
                           * 0.7796968012336793 / 1000000.0) END, 6)
               AS gumbel_mu
    FROM m ORDER BY event_type
    """,
)
def q_gumbel_weekly_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel (EV-I) method-of-moments fit to each event type's WEEKLY
    maxima of daily counts — the extreme-value capacity readout a
    mean/percentile summary structurally understates (Fisher-Tippett:
    block maxima follow their own distribution).  Exact integer block
    maxima and moments; β and μ are single float expressions with
    √6/π and Euler's γ embedded as shared double literals."""
    from es_ch_sync_spark.operators.analytics import gumbel_block_maxima

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    daily = ev.groupBy(
        F.col("event_type").alias("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    return gumbel_block_maxima(daily, "event_type", "day", "y")


@register(
    "acf_lags",
    """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts)::DATE AS day,
               count(*)::BIGINT AS y
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, count(*)::BIGINT AS n, sum(y)::BIGINT AS s
        FROM daily GROUP BY 1
    ),
    c AS (
        SELECT d.event_type, d.day, (st.n * d.y - st.s)::BIGINT AS c
        FROM daily d JOIN stats st USING (event_type)
    ),
    den AS (
        SELECT event_type, sum(c * c)::BIGINT AS den,
               count(*)::BIGINT AS n_days
        FROM c GROUP BY 1
    ),
    lags AS (SELECT unnest(range(1, 8))::INT AS lag_d),
    pairs AS (
        SELECT a.event_type, l.lag_d, sum(a.c * b.c)::BIGINT AS num,
               count(*)::BIGINT AS n_pairs
        FROM c a CROSS JOIN lags l
        JOIN c b ON b.event_type = a.event_type AND b.day = a.day + l.lag_d
        GROUP BY 1, 2
    )
    SELECT p.event_type, p.lag_d, d.n_days, p.n_pairs,
           CASE WHEN d.den > 0
                THEN round(p.num::DOUBLE / d.den::DOUBLE, 6) END AS acf
    FROM pairs p JOIN den d USING (event_type)
    """,
)
def q_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of each event type's daily count series at lags
    1..7 — seasonality/momentum detection without assuming a period
    (seasonal_decompose's prerequisite check).  Centering at N·y − S
    keeps every sum an exact BIGINT; lag pairs align on calendar day, so
    gaps shorten the overlap instead of misaligning it."""
    from es_ch_sync_spark.operators.analytics import acf_daily

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    out = acf_daily(daily, "event_type", "day", "y", max_lag=7)
    return out.withColumnRenamed("lag", "lag_d")


@register(
    "kendall_tau_daily",
    """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts)::DATE AS day,
               count(*)::BIGINT AS y
        FROM events WHERE event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT p.event_type AS ka, q.event_type AS kb, p.day,
               p.y AS x, q.y AS yy
        FROM daily p JOIN daily q
          ON p.day = q.day AND p.event_type < q.event_type
    ),
    pp AS (
        SELECT i.ka, i.kb,
               (sign(j.x - i.x) * sign(j.yy - i.yy))::BIGINT AS cd
        FROM wide i JOIN wide j
          ON i.ka = j.ka AND i.kb = j.kb AND i.day < j.day
    ),
    s AS (SELECT ka, kb, sum(cd)::BIGINT AS s_stat FROM pp GROUP BY 1, 2),
    n AS (SELECT ka, kb, count(*)::BIGINT AS n FROM wide GROUP BY 1, 2),
    tx AS (
        SELECT ka, kb, ((sum(t * (t - 1))) // 2)::BIGINT AS n1
        FROM (SELECT ka, kb, x, count(*)::BIGINT AS t
              FROM wide GROUP BY 1, 2, 3)
        GROUP BY 1, 2
    ),
    ty AS (
        SELECT ka, kb, ((sum(t * (t - 1))) // 2)::BIGINT AS n2
        FROM (SELECT ka, kb, yy, count(*)::BIGINT AS t
              FROM wide GROUP BY 1, 2, 3)
        GROUP BY 1, 2
    )
    SELECT s.ka AS key_a, s.kb AS key_b, n.n AS n_days, s.s_stat,
           CASE WHEN ((n.n * (n.n - 1)) // 2 - tx.n1)::DOUBLE
                     * ((n.n * (n.n - 1)) // 2 - ty.n2)::DOUBLE > 0
                THEN round(s.s_stat::DOUBLE
                           / sqrt(((n.n * (n.n - 1)) // 2 - tx.n1)::DOUBLE
                                  * ((n.n * (n.n - 1)) // 2 - ty.n2)::DOUBLE),
                           6)
           END AS tau_b
    FROM s JOIN n USING (ka, kb) JOIN tx USING (ka, kb) JOIN ty USING (ka, kb)
    """,
)
def q_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between every pair of event types' daily series —
    the concordance-scale dependence readout next to spearman_daily and
    signal_correlations.  S and both tie terms are exact BIGINTs over
    the aggregated daily table; the day-pair self-join never touches
    event rows."""
    from es_ch_sync_spark.operators.analytics import kendall_tau_pairs

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    return kendall_tau_pairs(daily, "event_type", "day", "y")


@register(
    "benford_digits",
    """
    WITH src AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                           1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (SELECT digit, count(*)::BIGINT AS n_obs FROM src GROUP BY 1),
    grid AS (
        SELECT unnest(range(1, 10))::INT AS digit,
               unnest([0.3010299956639812, 0.17609125905568124,
                       0.12493873660829992, 0.09691001300805642,
                       0.07918124604762482, 0.06694678963061322,
                       0.05799194697768673, 0.05115252244738129,
                       0.04575749056067514]) AS p
    ),
    tot AS (SELECT sum(n_obs)::BIGINT AS n FROM counts),
    g AS (
        SELECT grid.digit, coalesce(counts.n_obs, 0)::BIGINT AS n_obs,
               grid.p, tot.n
        FROM grid LEFT JOIN counts USING (digit), tot
    ),
    t AS (
        SELECT digit, n_obs, round(n::DOUBLE * p, 6) AS expected,
               CAST(round((n_obs::DOUBLE - n::DOUBLE * p)
                          * (n_obs::DOUBLE - n::DOUBLE * p)
                          / (n::DOUBLE * p) * 1000000.0) AS BIGINT) AS term_m
        FROM g
    )
    SELECT digit, n_obs, expected,
           round(term_m::DOUBLE / 1000000.0, 6) AS chisq_term,
           round((sum(term_m) OVER ())::DOUBLE / 1000000.0, 6) AS chisq_total
    FROM t ORDER BY digit
    """,
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit audit of order totals against Benford's
    law with a χ² distance — the fabricated-data screen for financial
    columns.  The digit comes from the integer part's string form
    (never floor(log10)); expected probabilities are frozen literals;
    χ² terms micro-quantize to BIGINT before the 9-row total."""
    from es_ch_sync_spark.operators.analytics import benford_report

    return benford_report(_t(spark, sf_dir, "orders"), "o_totalprice")


@register(
    "readability_sources",
    r"""
    WITH per AS (
        SELECT source,
               len(list_filter(regexp_split_to_array(text, '\s+'),
                               x -> x <> ''))::BIGINT AS w,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS s,
               len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS y
        FROM documents
    ),
    agg AS (
        SELECT source, count(*)::BIGINT AS n_docs,
               sum(w)::BIGINT AS sum_words,
               sum(s)::BIGINT AS sum_sentences,
               sum(y)::BIGINT AS sum_syllables
        FROM per GROUP BY 1
    )
    SELECT source, n_docs, sum_words, sum_sentences, sum_syllables,
           round(206.835
                 - 1.015 * (sum_words::DOUBLE / sum_sentences)
                 - 84.6 * (sum_syllables::DOUBLE
                           / (CASE WHEN sum_words > 0 THEN sum_words END)),
                 6) AS flesch_ease,
           round(0.39 * (sum_words::DOUBLE / sum_sentences)
                 + 11.8 * (sum_syllables::DOUBLE
                           / (CASE WHEN sum_words > 0 THEN sum_words END))
                 - 15.59, 6) AS fk_grade
    FROM agg
    """,
)
def q_readability_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + FK grade per source, micro-averaged from
    pooled integer counts (words / sentence-runs / vowel-group
    syllables) — the pedagogical-difficulty curation signal next to
    text_analysis's length/punct gates."""
    from es_ch_sync_spark.operators.text import readability_by_source

    return readability_by_source(_t(spark, sf_dir, "documents"))


@register(
    "char_entropy_docs",
    """
    WITH cc AS (
        SELECT doc_id, ch, count(*)::BIGINT AS cnt FROM (
            SELECT doc_id, unnest(string_split(text, '')) AS ch
            FROM documents
        ) WHERE ch <> '' GROUP BY 1, 2
    ),
    agg AS (
        SELECT doc_id,
               sum(cnt)::BIGINT AS n_chars,
               count(*)::BIGINT AS n_distinct,
               sum(cnt * CAST(round(ln(cnt) * 1000000, 0) AS BIGINT))::BIGINT
                   AS slnm
        FROM cc GROUP BY 1
    )
    SELECT doc_id, n_chars, n_distinct,
           round((n_chars * CAST(round(ln(n_chars) * 1000000, 0) AS BIGINT)
                  - slnm)::DOUBLE / (n_chars::DOUBLE * 1000000), 6)
               AS entropy_nats
    FROM agg
    """,
)
def q_char_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy (nats) — the cheap
    gibberish/repetition quality signal (r8 judge directive #8): exact
    integer (doc, char) census, micro-quantized ln fold, one float
    division at the end.  One doc-keyed shuffle after map-side partials."""
    from es_ch_sync_spark.operators.text import char_entropy

    return char_entropy(_t(spark, sf_dir, "documents"))


@register(
    "ab_cuped_ttest",
    """
    WITH vm AS (
        SELECT user_id,
               CAST(value::DECIMAL(24,6) * 1000000 AS BIGINT) AS v,
               date_trunc('day', ts)::DATE AS day
        FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
    ),
    pu AS (
        SELECT user_id,
               CASE WHEN substr(md5('cuped:' || user_id), 32, 1)
                    IN ('0','1','2','3','4','5','6','7')
                    THEN 'treat' ELSE 'control' END AS arm,
               sum(CASE WHEN day < DATE '2024-01-16' THEN v ELSE 0 END)
                   ::BIGINT AS x,
               sum(CASE WHEN day >= DATE '2024-01-16' THEN v ELSE 0 END)
                   ::BIGINT AS y
        FROM vm GROUP BY 1, 2
    ),
    per AS (
        SELECT arm, count(*)::BIGINT AS n,
               sum(x::DECIMAL(38,0))::DECIMAL(38,0) AS sx,
               sum(y::DECIMAL(38,0))::DECIMAL(38,0) AS sy,
               sum(x::DECIMAL(38,0) * y::DECIMAL(38,0))::DECIMAL(38,0) AS sxy,
               sum(x::DECIMAL(38,0) * x::DECIMAL(38,0))::DECIMAL(38,0) AS sxx,
               sum(y::DECIMAL(38,0) * y::DECIMAL(38,0))::DECIMAL(38,0) AS syy
        FROM pu GROUP BY 1
    ),
    j AS (
        SELECT a.n AS na, a.sx::DOUBLE AS sxa, a.sy::DOUBLE AS sya,
               a.sxy::DOUBLE AS sxya, a.sxx::DOUBLE AS sxxa,
               a.syy::DOUBLE AS syya,
               b.n AS nb, b.sx::DOUBLE AS sxb, b.sy::DOUBLE AS syb,
               b.sxy::DOUBLE AS sxyb, b.sxx::DOUBLE AS sxxb,
               b.syy::DOUBLE AS syyb
        FROM (SELECT * FROM per WHERE arm = 'treat') a,
             (SELECT * FROM per WHERE arm = 'control') b
    ),
    th AS (
        SELECT *,
               na::DOUBLE + nb AS n, sxa + sxb AS sx, sya + syb AS sy,
               sxya + sxyb AS sxy, sxxa + sxxb AS sxx
        FROM j
    ),
    th2 AS (
        SELECT *,
               CASE WHEN n * sxx - sx * sx > 0
                    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                    ELSE 0.0 END AS c,
               sx / n AS xbar
        FROM th
    ),
    adj AS (
        SELECT *, c * xbar AS d,
               sya - c * sxa + na * (c * xbar) AS asuma,
               syya + c*c*sxxa + na*(c*xbar)*(c*xbar) - 2*c*sxya
                    + 2*(c*xbar)*sya - 2*c*(c*xbar)*sxa AS assqa,
               syb - c * sxb + nb * (c * xbar) AS asumb,
               syyb + c*c*sxxb + nb*(c*xbar)*(c*xbar) - 2*c*sxyb
                    + 2*(c*xbar)*syb - 2*c*(c*xbar)*sxb AS assqb,
               (syya - sya*sya/na) / (na - 1) AS vra,
               (syyb - syb*syb/nb) / (nb - 1) AS vrb
        FROM th2
    ),
    fin AS (
        SELECT *,
               (assqa - asuma*asuma/na) / (na - 1) AS vca,
               (assqb - asumb*asumb/nb) / (nb - 1) AS vcb
        FROM adj
    )
    SELECT na AS n_a, nb AS n_b, round(c, 6) AS theta,
           CASE WHEN vra/na + vrb/nb > 0
                THEN round((sya/na - syb/nb) / sqrt(vra/na + vrb/nb), 6)
           END AS t_raw,
           CASE WHEN vca/na + vcb/nb > 0
                THEN round((asuma/na - asumb/nb) / sqrt(vca/na + vcb/nb), 6)
           END AS t_cuped,
           CASE WHEN vra*(na-1) + vrb*(nb-1) > 0
                THEN round((vca*(na-1) + vcb*(nb-1))
                           / (vra*(na-1) + vrb*(nb-1)), 6)
           END AS var_ratio
    FROM fin
    """,
)
def q_ab_cuped_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout on user purchase value:
    pre-period (Jan 1-15) per-user value is the covariate for the
    post-period (Jan 16-30) metric; arms assigned by md5 parity of the
    user id (append-stable, the split-assignment convention).  Every
    float is scalar algebra over exact DECIMAL moment sums."""
    from es_ch_sync_spark.operators.analytics import ab_cuped

    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    vm = (F.col("value").cast("decimal(24,6)") * F.lit(1000000)).cast("long")
    day = F.to_date("ts")
    pu = ev.groupBy("user_id").agg(
        F.sum(F.when(day < F.lit("2024-01-16"), vm).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(day >= F.lit("2024-01-16"), vm).otherwise(0))
        .cast("long")
        .alias("y"),
    ).withColumn(
        "arm",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("cuped:"), F.col("user_id").cast("string"))),
                32,
                1,
            ).isin(*list("01234567")),
            F.lit("treat"),
        ).otherwise(F.lit("control")),
    )
    return ab_cuped(pu, "arm", "x", "y", "treat", "control")


@register(
    "fdr_bh_trends",
    """
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts)::DATE AS day,
               count(*)::BIGINT AS y
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.user_id, sign(b.y - a.y)::BIGINT AS sgn
        FROM daily a JOIN daily b
          ON a.user_id = b.user_id AND a.day < b.day
    ),
    s AS (SELECT user_id, sum(sgn)::BIGINT AS s_stat FROM pairs GROUP BY 1),
    nd AS (SELECT user_id, count(*)::BIGINT AS n_days FROM daily GROUP BY 1),
    ties AS (
        SELECT user_id,
               sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_term
        FROM (SELECT user_id, y, count(*)::BIGINT AS t
              FROM daily GROUP BY 1, 2)
        GROUP BY 1
    ),
    z AS (
        SELECT s.user_id,
               CASE WHEN nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
                         - ties.tie_term > 0 AND s.s_stat != 0
                    THEN round((s.s_stat::DOUBLE - sign(s.s_stat))
                               / sqrt((nd.n_days * (nd.n_days - 1)
                                       * (2 * nd.n_days + 5)
                                       - ties.tie_term)::DOUBLE / 18.0), 6)
                    ELSE 0.0 END AS z_score
        FROM s JOIN nd USING (user_id) JOIN ties USING (user_id)
    ),
    p AS (
        SELECT user_id, z_score,
               CAST(round(
                   tt * (0.254829592 + tt * (-0.284496736
                        + tt * (1.421413741 + tt * (-1.453152027
                        + tt * 1.061405429))))
                   * exp(-(px * px)) * 1000000.0) AS BIGINT) AS pm
        FROM (SELECT user_id, z_score,
                     abs(z_score) / sqrt(2.0) AS px,
                     1.0 / (1.0 + 0.3275911 * (abs(z_score) / sqrt(2.0)))
                         AS tt
              FROM z)
    ),
    ranked AS (
        SELECT user_id, z_score, pm,
               row_number() OVER (ORDER BY pm, user_id) AS bh_rank,
               count(*) OVER () AS m
        FROM p
    ),
    ks AS (
        SELECT max(CASE WHEN pm * m <= bh_rank * 50000
                        THEN bh_rank ELSE 0 END) AS kstar
        FROM ranked
    )
    SELECT user_id, z_score, round(pm / 1000000.0, 6) AS p_value, bh_rank,
           bh_rank <= ks.kstar AS significant
    FROM ranked, ks
    """,
)
def q_fdr_bh_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR over per-user Mann-Kendall daily-activity
    trends — the multiple-comparisons gate after running thousands of
    trend tests: flags the BH-significant user set at alpha = 0.05 with a
    pure-integer step-up decision (p micro-quantized; erfc via the
    frozen A&S polynomial on both engines)."""
    from es_ch_sync_spark.operators.analytics import fdr_bh, mann_kendall_sen

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    mk = mann_kendall_sen(daily, "user_id", "day", "y")
    return fdr_bh(mk, "user_id", "z_score").withColumnRenamed(
        "rank", "bh_rank"
    )


@register(
    "ab_conversion_ztest",
    """
    WITH pu AS (
        SELECT user_id,
               CASE WHEN substr(md5('conv:' || user_id), 32, 1)
                    IN ('0','1','2','3','4','5','6','7')
                    THEN 'treat' ELSE 'control' END AS arm,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1, 2
    ),
    agg AS (
        SELECT sum(CASE WHEN arm = 'treat' THEN 1 ELSE 0 END)::BIGINT AS n_a,
               sum(CASE WHEN arm = 'treat' AND converted = 1
                        THEN 1 ELSE 0 END)::BIGINT AS x_a,
               sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)::BIGINT AS n_b,
               sum(CASE WHEN arm = 'control' AND converted = 1
                        THEN 1 ELSE 0 END)::BIGINT AS x_b
        FROM pu
    )
    SELECT n_a, x_a, n_b, x_b,
           round(x_a::DOUBLE / n_a, 6) AS rate_a,
           round(x_b::DOUBLE / n_b, 6) AS rate_b,
           CASE WHEN n_a > 0 AND n_b > 0
                 AND ((x_a + x_b)::DOUBLE / (n_a + n_b))
                     * (1.0 - (x_a + x_b)::DOUBLE / (n_a + n_b))
                     * (1.0 / n_a + 1.0 / n_b) > 0
                THEN round((x_a::DOUBLE / n_a - x_b::DOUBLE / n_b)
                           / sqrt(((x_a + x_b)::DOUBLE / (n_a + n_b))
                                  * (1.0 - (x_a + x_b)::DOUBLE / (n_a + n_b))
                                  * (1.0 / n_a + 1.0 / n_b)), 6)
           END AS z_score
    FROM agg
    """,
)
def q_ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on purchase conversion between md5-parity
    arms — the binomial-rate leg of the A/B readout family.  Four exact
    counts in one aggregate; rates and z are single float expressions."""
    from es_ch_sync_spark.operators.analytics import ab_proportions_ztest

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    pu = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).withColumn(
        "arm",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("conv:"), F.col("user_id").cast("string"))),
                32,
                1,
            ).isin(*list("01234567")),
            F.lit("treat"),
        ).otherwise(F.lit("control")),
    )
    return ab_proportions_ztest(pu, "arm", "converted", "treat", "control")


@register(
    "kaplan_meier_conversion",
    """
    WITH pu AS (
        SELECT user_id,
               min(date_trunc('day', ts)::DATE) AS f,
               min(CASE WHEN event_type = 'purchase'
                        THEN date_trunc('day', ts)::DATE END) AS p
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1
    ),
    mx AS (SELECT max(date_trunc('day', ts)::DATE) AS m FROM events
           WHERE user_id IS NOT NULL),
    du AS (
        SELECT CASE WHEN p IS NOT NULL
                    THEN date_diff('day', f, p)
                    ELSE date_diff('day', f, m) END::BIGINT AS t,
               CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS e
        FROM pu, mx
    ),
    per_t AS (
        SELECT t,
               sum(CASE WHEN e = 1 THEN 1 ELSE 0 END)::BIGINT AS d_events,
               sum(CASE WHEN e = 0 THEN 1 ELSE 0 END)::BIGINT AS c_censored
        FROM du GROUP BY 1
    ),
    tot AS (SELECT sum(d_events + c_censored)::BIGINT AS n FROM per_t),
    staged AS (
        SELECT t, d_events, c_censored,
               (tot.n - coalesce(sum(d_events + c_censored) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0))::BIGINT AS n_risk
        FROM per_t, tot
    ),
    terms AS (
        SELECT *,
               CASE WHEN d_events = 0 THEN 0
                    WHEN d_events < n_risk
                    THEN CAST(round(ln((n_risk - d_events)::DOUBLE
                                       / n_risk::DOUBLE) * 1000000.0)
                              AS BIGINT)
                    ELSE -1000000000000 END AS term
        FROM staged
    )
    SELECT t, n_risk, d_events, c_censored,
           round(exp((sum(term) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW))::DOUBLE / 1000000.0), 6) AS survival
    FROM terms ORDER BY t
    """,
)
def q_kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-first-purchase: the conversion-lag survival
    curve (event = first purchase day, right-censored at the corpus
    horizon for never-purchasers) — the correct-under-censoring
    companion to funnel_conversion's fixed-window rates.  Survival
    rides the log-quantized running product, so both engines print the
    identical curve."""
    from es_ch_sync_spark.operators.analytics import kaplan_meier

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    day = F.to_date("ts")
    pu = ev.groupBy("user_id").agg(
        F.min(day).alias("f"),
        F.min(F.when(F.col("event_type") == "purchase", day)).alias("p"),
    )
    mx = ev.agg(F.max(day).alias("m"))
    j = pu.crossJoin(F.broadcast(mx))
    event = F.col("p").isNotNull().cast("int")
    dur = F.when(event == 1, F.datediff(F.col("p"), F.col("f"))).otherwise(
        F.datediff(F.col("m"), F.col("f"))
    )
    per_unit = j.select(dur.alias("dur"), event.alias("converted"))
    return kaplan_meier(per_unit, "dur", "converted")


@register(
    "nelson_aalen_conversion",
    """
    WITH pu AS (
        SELECT user_id,
               min(date_trunc('day', ts)::DATE) AS f,
               min(CASE WHEN event_type = 'purchase'
                        THEN date_trunc('day', ts)::DATE END) AS p
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1
    ),
    mx AS (SELECT max(date_trunc('day', ts)::DATE) AS m FROM events
           WHERE user_id IS NOT NULL),
    du AS (
        SELECT CASE WHEN p IS NOT NULL
                    THEN date_diff('day', f, p)
                    ELSE date_diff('day', f, m) END::BIGINT AS t,
               CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS e
        FROM pu, mx
    ),
    per_t AS (
        SELECT t,
               sum(CASE WHEN e = 1 THEN 1 ELSE 0 END)::BIGINT AS d_events,
               sum(CASE WHEN e = 0 THEN 1 ELSE 0 END)::BIGINT AS c_censored
        FROM du GROUP BY 1
    ),
    tot AS (SELECT sum(d_events + c_censored)::BIGINT AS n FROM per_t),
    staged AS (
        SELECT t, d_events, c_censored,
               (tot.n - coalesce(sum(d_events + c_censored) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0))::BIGINT AS n_risk
        FROM per_t, tot
    )
    SELECT t, n_risk, d_events, c_censored,
           round((sum(CASE WHEN d_events > 0
                      THEN CAST(round(d_events::DOUBLE / n_risk::DOUBLE
                                      * 1000000.0) AS BIGINT)
                      ELSE 0 END) OVER (
                  ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW))::DOUBLE / 1000000.0, 6) AS cum_hazard
    FROM staged ORDER BY t
    """,
)
def q_nelson_aalen_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative conversion hazard — the rate-view
    companion to kaplan_meier_conversion on the identical censored
    framing: the hazard's slope reads out conversion VELOCITY day by
    day.  Per-time d/n increments micro-quantize before the running
    sum, so the curve is exact cross-engine."""
    from es_ch_sync_spark.operators.analytics import nelson_aalen

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    day = F.to_date("ts")
    pu = ev.groupBy("user_id").agg(
        F.min(day).alias("f"),
        F.min(F.when(F.col("event_type") == "purchase", day)).alias("p"),
    )
    mx = ev.agg(F.max(day).alias("m"))
    j = pu.crossJoin(F.broadcast(mx))
    event = F.col("p").isNotNull().cast("int")
    dur = F.when(event == 1, F.datediff(F.col("p"), F.col("f"))).otherwise(
        F.datediff(F.col("m"), F.col("f"))
    )
    per_unit = j.select(dur.alias("dur"), event.alias("converted"))
    return nelson_aalen(per_unit, "dur", "converted")


@register(
    "logrank_cohorts",
    """
    WITH pu AS (
        SELECT user_id, (user_id % 2)::BIGINT AS grp,
               min(date_trunc('day', ts)::DATE) AS f,
               min(CASE WHEN event_type = 'purchase'
                        THEN date_trunc('day', ts)::DATE END) AS p
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1, 2
    ),
    mx AS (SELECT max(date_trunc('day', ts)::DATE) AS m FROM events
           WHERE user_id IS NOT NULL),
    du AS (
        SELECT grp,
               CASE WHEN p IS NOT NULL
                    THEN date_diff('day', f, p)
                    ELSE date_diff('day', f, m) END::BIGINT AS t,
               CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS e
        FROM pu, mx
    ),
    per_t AS (
        SELECT t,
               sum(CASE WHEN grp = 1 AND e = 1 THEN 1 ELSE 0 END)::BIGINT AS d1,
               sum(CASE WHEN grp = 1 AND e = 0 THEN 1 ELSE 0 END)::BIGINT AS c1,
               sum(CASE WHEN grp = 0 AND e = 1 THEN 1 ELSE 0 END)::BIGINT AS d0,
               sum(CASE WHEN grp = 0 AND e = 0 THEN 1 ELSE 0 END)::BIGINT AS c0
        FROM du GROUP BY 1
    ),
    tot AS (SELECT sum(d1 + c1)::BIGINT AS n1, sum(d0 + c0)::BIGINT AS n0
            FROM per_t),
    staged AS (
        SELECT t, d1, d0,
               (tot.n1 - coalesce(sum(d1 + c1) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0))::BIGINT AS r1,
               (tot.n0 - coalesce(sum(d0 + c0) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0))::BIGINT AS r0,
               tot.n1 AS n1, tot.n0 AS n0
        FROM per_t, tot
    ),
    ev AS (SELECT * FROM staged WHERE d1 + d0 > 0),
    g AS (
        SELECT max(n1)::BIGINT AS n_1, max(n0)::BIGINT AS n_0,
               sum(d1)::BIGINT AS observed_1,
               sum(CAST(round((d1 + d0)::DOUBLE * r1::DOUBLE
                              / (r1 + r0)::DOUBLE * 1000000.0) AS BIGINT)
                  )::BIGINT AS e1_m,
               sum(CASE WHEN (r1 + r0) > 1
                   THEN CAST(round((d1 + d0)::DOUBLE
                                   * (r1::DOUBLE / (r1 + r0)::DOUBLE)
                                   * (1.0 - r1::DOUBLE / (r1 + r0)::DOUBLE)
                                   * ((r1 + r0)::DOUBLE - (d1 + d0)::DOUBLE)
                                   / ((r1 + r0)::DOUBLE - 1.0)
                                   * 1000000.0) AS BIGINT)
                   ELSE 0 END)::BIGINT AS v_m
        FROM ev
    )
    SELECT n_1, n_0, observed_1,
           round(e1_m::DOUBLE / 1e6, 6) AS expected_1,
           round(CASE WHEN v_m > 0
                 THEN (observed_1::DOUBLE - e1_m::DOUBLE / 1e6)
                      * (observed_1::DOUBLE - e1_m::DOUBLE / 1e6)
                      / (v_m::DOUBLE / 1e6)
                 END, 6) AS chi2_logrank
    FROM g
    """,
)
def q_logrank_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-cohort log-rank test on censored time-to-first-purchase
    (deterministic cohorts: user_id parity, the bootstrap-style
    synthetic assignment) — the significance test behind comparing two
    Kaplan-Meier curves.  Group risk sets are exact integers off one
    duration census; per-time E₁ and V micro-quantize before their
    sums; χ² is one float expression."""
    from es_ch_sync_spark.operators.analytics import logrank_test

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    day = F.to_date("ts")
    pu = ev.groupBy("user_id").agg(
        F.min(day).alias("f"),
        F.min(F.when(F.col("event_type") == "purchase", day)).alias("p"),
    )
    mx = ev.agg(F.max(day).alias("m"))
    j = pu.crossJoin(F.broadcast(mx))
    event = F.col("p").isNotNull().cast("int")
    dur = F.when(event == 1, F.datediff(F.col("p"), F.col("f"))).otherwise(
        F.datediff(F.col("m"), F.col("f"))
    )
    per_unit = j.select(
        (F.col("user_id") % 2).alias("grp"),
        dur.alias("dur"),
        event.alias("converted"),
    )
    return logrank_test(per_unit, "grp", "dur", "converted")


@register(
    "ab_mde_power",
    """
    WITH pu AS (
        SELECT user_id,
               CASE WHEN substr(md5('conv:' || user_id), 32, 1)
                    IN ('0','1','2','3','4','5','6','7')
                    THEN 'treat' ELSE 'control' END AS arm,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1, 2
    ),
    agg AS (
        SELECT sum(CASE WHEN arm = 'treat' THEN 1 ELSE 0 END)::BIGINT AS n_a,
               sum(CASE WHEN arm = 'treat' AND converted = 1
                        THEN 1 ELSE 0 END)::BIGINT AS x_a,
               sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)::BIGINT AS n_b,
               sum(CASE WHEN arm = 'control' AND converted = 1
                        THEN 1 ELSE 0 END)::BIGINT AS x_b
        FROM pu
    )
    SELECT n_a, x_a, n_b, x_b,
           round(CASE WHEN n_a > 0 AND n_b > 0
                 THEN (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE END, 6)
               AS pooled_rate,
           round(CASE WHEN n_a > 0 AND n_b > 0
                  AND ((x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                      * (1.0 - (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                      * (1.0 / n_a + 1.0 / n_b) > 0
                 THEN 2.801585 * sqrt(((x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                          * (1.0 - (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                          * (1.0 / n_a + 1.0 / n_b))
                 END, 6) AS mde_abs,
           round(CASE WHEN n_a > 0 AND n_b > 0 AND x_b > 0
                  AND ((x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                      * (1.0 - (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                      * (1.0 / n_a + 1.0 / n_b) > 0
                 THEN 2.801585 * sqrt(((x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                          * (1.0 - (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                          * (1.0 / n_a + 1.0 / n_b))
                      / (x_b::DOUBLE / n_b::DOUBLE)
                 END, 6) AS mde_rel
    FROM agg
    """,
)
def q_ab_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect of the purchase-conversion experiment
    at its current arm sizes (alpha=5% two-sided, 80% power, fixed
    z-quantile literals — no normal CDF evaluated): the design-phase
    companion to ab_conversion_ztest, same md5-parity arms, one
    4-count hash aggregate and a closed-form float expression."""
    from es_ch_sync_spark.operators.analytics import ab_mde

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    pu = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).withColumn(
        "arm",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("conv:"), F.col("user_id").cast("string"))),
                32,
                1,
            ).isin(*list("01234567")),
            F.lit("treat"),
        ).otherwise(F.lit("control")),
    )
    return ab_mde(pu, "arm", "converted", "treat", "control")
