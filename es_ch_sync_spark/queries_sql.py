"""Shared-SQL query registry: each entry is ONE ANSI SQL string executed by
BOTH engines — `spark.sql(...)` over temp views of the testdata tables, and
DuckDB over the same parquet.  This exercises the engine's SQL API surface
(Catalyst parses/plans the identical text) and makes parity structural.

Only SQL that means the same thing in both dialects belongs here (ANSI
core: CASE, HAVING, GROUPING SETS/CUBE, UNION, IN/EXISTS subqueries,
correlated scalar subqueries, EXTRACT, INTERVAL arithmetic, LIKE, substr).
Engine-specific function pairs (JSON access, regexp flavors) stay in
queries_relational.py as explicit (spark_fn, oracle) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from es_ch_sync_spark.io.sources import read_parquet_table
from es_ch_sync_spark.queries import register

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    for t in TABLES:
        read_parquet_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


def register_shared_sql(name: str, sql: str) -> None:
    register(name, sql)(lambda spark, sf_dir, _sql=sql: _run_sql(spark, sf_dir, _sql))


register_shared_sql(
    "sql_string_funcs",
    """
    SELECT doc_id,
           upper(lang) AS lang_up,
           substr(text, 1, 12) AS prefix,
           length(text) AS n_chars,
           concat(lang, '-', source) AS lang_src,
           (text LIKE '%spark%') AS mentions_spark,
           replace(lang, 'e', 'E') AS lang_repl,
           trim(lang) AS lang_trim
    FROM documents
    """,
)

register_shared_sql(
    "sql_date_funcs",
    """
    SELECT o_orderkey,
           extract(year FROM o_orderdate) AS y,
           extract(month FROM o_orderdate) AS m,
           extract(day FROM o_orderdate) AS d,
           o_orderdate + INTERVAL 30 DAY AS due_date
    FROM orders
    WHERE extract(year FROM o_orderdate) = 1997
    """,
)

register_shared_sql(
    "sql_case_agg",
    """
    SELECT l_returnflag,
           sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)::BIGINT AS n_big,
           sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)::BIGINT AS n_discounted,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)

register_shared_sql(
    "sql_having",
    """
    SELECT o_custkey, count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 12
    """,
)

register_shared_sql(
    "sql_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)

register_shared_sql(
    "sql_cube",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)

register_shared_sql(
    "sql_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)

register_shared_sql(
    "sql_in_subquery",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_totalprice > 200000
    """,
)

register_shared_sql(
    "sql_corr_subquery",
    """
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT sum(c2.c_acctbal::DECIMAL(12,2))::DOUBLE / count(*)
        FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey
    )
    """,
)

register_shared_sql(
    "sql_range_frame_window",
    """
    SELECT user_id, event_id, ts,
           -- DOUBLE surface: a DECIMAL output column converts to pandas
           -- version-dependently (Decimal objects vs float64) across
           -- DuckDB releases; the exact sum stays DECIMAL internally.
           CAST(round(sum(CAST(value AS DECIMAL(12,2)))
                 OVER (PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW), 2)
                AS DOUBLE)
               AS trailing_7d_value
    FROM events
    WHERE user_id < 8
    """,
)

register_shared_sql(
    "sql_min_per_group_corr",
    """
    SELECT p.p_brand, p.p_partkey, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (
        SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
)

register_shared_sql(
    "sql_order_priority_check",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08
      )
    GROUP BY o_orderpriority
    """,
)

register_shared_sql(
    "sql_decile_spend",
    """
    SELECT decile, count(*) AS n_users,
           round(min(spend), 2) AS min_spend, round(max(spend), 2) AS max_spend
    FROM (
        SELECT user_id, spend, ntile(10) OVER (ORDER BY spend DESC, user_id) AS decile
        FROM (
            SELECT user_id, sum(value::DECIMAL(12,2))::DOUBLE AS spend
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        )
    )
    GROUP BY decile
    """,
)

register_shared_sql(
    "sql_window_sampler",
    """
    SELECT event_id, user_id,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           lead(event_id)  OVER w AS next_id,
           lag(event_id)   OVER w AS prev_id,
           first_value(event_id) OVER w AS first_id,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS prank,
           round(cume_dist() OVER w, 6) AS cdist
    FROM events
    WHERE user_id < 5
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)

register_shared_sql(
    "sql_exists_subquery",
    """
    SELECT p_partkey, p_name
    FROM part p
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45
    )
    """,
)

register_shared_sql(
    # Histogram/binning — the profiling primitive for numeric columns at
    # scale: fixed-width bins via floor division (ANSI; DuckDB has no
    # width_bucket).  One partial-aggregated groupBy; min/max are
    # selection, not arithmetic, so results are bit-identical cross-engine.
    "sql_histogram",
    """
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           count(*) AS n_events,
           min(value) AS lo,
           max(value) AS hi
    FROM events
    GROUP BY CAST(floor(value / 50.0) AS BIGINT)
    """,
)

register_shared_sql(
    # ANSI conditional/comparison scalars over the orders table.
    "sql_conditional_funcs",
    """
    SELECT o_orderkey,
           least(o_totalprice, 100000.0) AS capped,
           greatest(o_totalprice, 100000.0) AS floored,
           coalesce(nullif(o_orderstatus, 'O'), '<open>') AS status_nz,
           CASE WHEN o_totalprice > 200000.0 THEN 'big' ELSE 'small' END AS size_class
    FROM orders
    """,
)

register_shared_sql(
    # ANSI set operations beyond UNION: INTERSECT/EXCEPT are DISTINCT-set
    # semantics in both engines (planned as aggregated semi/anti joins).
    "sql_intersect_except",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)


register_shared_sql(
    "sql_null_semantics",
    """
    SELECT event_id,
           coalesce(user_id, -1) AS uid_or_default,
           CASE WHEN value IS NULL THEN 1 ELSE 0 END AS value_missing,
           nullif(event_type, 'error') AS type_or_null,
           CASE WHEN user_id IS DISTINCT FROM event_id THEN 1 ELSE 0 END
               AS id_mismatch,
           CASE WHEN value IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END
               AS value_is_null_strict
    FROM events
    """,
)


register_shared_sql(
    "sql_recursive_calendar",
    """
    WITH RECURSIVE days(d) AS (
        SELECT DATE '2024-01-01'
        UNION ALL
        SELECT d + INTERVAL 1 DAY FROM days WHERE d < DATE '2024-01-30'
    ),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n
        FROM events GROUP BY 1
    )
    SELECT days.d, coalesce(daily.n, 0) AS n_events
    FROM days LEFT JOIN daily ON days.d = daily.d
    """,
)


# LATERAL correlated derived table (ANSI; Spark 4 + DuckDB both support):
# per-nation top-2 customers by balance — the "top-k per group as a join"
# formulation (the window formulation is window_topk_per_user; LATERAL is
# the decorrelation surface Catalyst rewrites into a ranked join).
register_shared_sql(
    "sql_lateral_topk",
    """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n,
    LATERAL (
        SELECT c.c_name, round(c.c_acctbal, 2) AS c_acctbal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c.c_acctbal DESC, c.c_custkey ASC
        LIMIT 2
    ) t
    """,
)


# time-based sliding window frame: RANGE BETWEEN INTERVAL ... PRECEDING —
# the "rolling 1-hour sum per user" shape (ANSI frame semantics; both
# engines order by the timestamp and bound the frame by event time, so
# gaps and bursts are handled by TIME, not row counts).
register_shared_sql(
    "sql_time_range_window",
    """
    SELECT event_id, user_id, ts,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ), 4) AS rolling_1h,
           count(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS n_1h
    FROM events
    WHERE value IS NOT NULL AND user_id IS NOT NULL
    """,
)
