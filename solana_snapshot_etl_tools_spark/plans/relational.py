"""Relational query corpus over the TPC-H-ish tables (SURVEY.md §2.7).

The reference delegates all SQL to its output DBs; our engine supplies
it via Spark SQL/Catalyst. Every query here is declared with a DuckDB
oracle and hash-compared by the driver, so cross-engine determinism is
part of the design:

- monetary math is cast to DECIMAL before aggregation (exact,
  order-independent — double sums would differ in final ulps between
  engines/partitionings);
- averages are exact decimal sums cast to double, then one IEEE
  division (identical in both engines);
- time arithmetic uses integer microseconds (unix_micros/epoch_us);
- every ORDER BY that feeds a LIMIT has a unique tiebreak column.

Scale notes: filters/projections sit directly on the parquet scan
(pushdown), joins stay equi-join-shaped so Catalyst can pick
broadcast/sort-merge, and AQE handles skew at real scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql import types as T

DEC2 = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) and
        # TIMESTAMP(MICROS) across testdata generations. Nanos are
        # rejected by Spark's vectorized reader, so enable the
        # read-nanos-as-long escape hatch (a no-op for micros files) and
        # convert only when the column actually arrives as a long:
        # truncate to micros with exact integer division (ts div 1000 —
        # float division would lose precision above 2^53). DuckDB's
        # TIMESTAMP cast truncates the same way, so the two engines
        # agree to the microsecond either way.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # Micros files read as TIMESTAMP_NTZ; downstream epoch math
            # (unix_micros) needs TIMESTAMP_LTZ. Session tz is pinned to
            # UTC above, so this cast reinterprets the same wall-clock
            # instant and agrees with DuckDB's epoch_us on the naive
            # value.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _d(c, t=DEC2):
    return (F.col(c) if isinstance(c, str) else c).cast(t)


def _one():
    return F.lit("1.00").cast("decimal(3,2)")


# --- Q1: pricing summary (scan → filter → hash agg → sort) ------------------


def q1_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    disc_price = _d("l_extendedprice") * (_one() - _d("l_discount", "decimal(3,2)"))
    charge = disc_price * (_one() + _d("l_tax", "decimal(3,2)"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_d("l_quantity")).cast("decimal(38,2)").cast("double").alias("sum_qty"),
            F.sum(_d("l_extendedprice")).cast("decimal(38,2)").cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,4)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,6)").cast("double").alias("sum_charge"),
            (F.sum(_d("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_d("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_d("l_discount", "decimal(3,2)")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- Q3-style: top-10 orders by revenue (3-way join → agg → top-k) ----------


def q3_top_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = _d("l_extendedprice") * (_one() - _d("l_discount", "decimal(3,2)"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("decimal(38,4)").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"), "revenue")
    )


Q3_SQL = """
SELECT l_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --- Q5-style: revenue by nation in a region (6-way join) -------------------


def q5_nation_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = _d("l_extendedprice") * (_one() - _d("l_discount", "decimal(3,2)"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("decimal(38,4)").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name,
       CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --- semi / anti joins -------------------------------------------------------


def q_semi_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


Q_SEMI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_nationkey")
    )


Q_ANTI_SQL = """
SELECT c_nationkey, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey ORDER BY c_nationkey
"""


# --- theta (non-equi residual) join ------------------------------------------


def q_theta_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_late_lines"),
            F.sum(_d("l_extendedprice")).cast("decimal(38,2)").cast("double").alias("late_value"),
        )
        .orderBy("o_orderpriority")
    )


Q_THETA_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_late_lines,
       CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS late_value
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- window functions ---------------------------------------------------------


def q_window_topk(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


Q_WINDOW_TOPK_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rn FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part) WHERE rn <= 3
"""


def q_window_running(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_d("o_totalprice")).over(w).cast("decimal(38,2)").cast("double").alias("run_total"),
    )


Q_WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS run_total
FROM orders
"""


def q_window_rank_ties(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_size")
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(W.partitionBy("p_brand").orderBy("p_size", "p_partkey")).alias("quartile"),
    )


Q_WINDOW_RANK_SQL = """
SELECT p_partkey, p_brand, p_size,
       RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS rnk,
       DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS drnk,
       NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) AS quartile
FROM part
"""


def q_window_moving(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(_d("value", "decimal(18,6)")).over(w).cast("decimal(38,6)").cast("double").alias("mov_sum"),
    )


Q_WINDOW_MOVING_SQL = """
SELECT user_id, event_id,
       CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS mov_sum
FROM events
"""


def q_sessionize(spark, sf_dir):
    """Sessionization via lag + gap cumsum (30-min inactivity gap)."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    prev = F.lag(F.unix_micros("ts")).over(w)
    new_s = F.when(
        prev.isNull() | ((F.unix_micros("ts") - prev) > gap_us), 1
    ).otherwise(0)
    return (
        e.withColumn("new_s", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


Q_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id,
         CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM g GROUP BY user_id ORDER BY user_id
"""


# --- grouping sets / rollup / cube -------------------------------------------


def q_rollup(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_d("l_quantity")).cast("decimal(38,2)").cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


Q_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n,
       GROUPING_ID(l_returnflag, l_linestatus) AS gid
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


def q_cube(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_d("o_totalprice")).cast("decimal(38,2)").cast("double").alias("total"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


Q_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS total,
       GROUPING_ID(o_orderstatus, o_orderpriority) AS gid
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
"""


# --- set operations -----------------------------------------------------------


def q_setops(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nk")
    )
    supp = s.select(F.col("s_nationkey").alias("nk"))
    africa = (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "AFRICA")
        .select(F.col("n_nationkey").alias("nk"))
    )
    return building.intersect(supp).subtract(africa).orderBy("nk")


Q_SETOPS_SQL = """
SELECT DISTINCT nk FROM (
  (SELECT c_nationkey AS nk FROM customer WHERE c_mktsegment = 'BUILDING'
   INTERSECT
   SELECT s_nationkey AS nk FROM supplier)
  EXCEPT
  SELECT n_nationkey AS nk FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'AFRICA')
ORDER BY nk
"""


# --- scalar function families --------------------------------------------------


def q_scalar_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 3, 20)).alias("prio_name"),
        F.concat(F.lit("S-"), F.col("o_orderstatus")).alias("status_tag"),
        F.length("o_orderpriority").alias("prio_len"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.floor("o_totalprice").alias("price_floor"),
        F.abs(F.col("o_totalprice") - 1000.0).alias("price_center"),
        (F.col("o_orderkey") % 7).alias("k_mod7"),
    )


Q_SCALAR_SQL = """
SELECT o_orderkey,
       UPPER(SUBSTRING(o_orderpriority, 3, 20)) AS prio_name,
       'S-' || o_orderstatus AS status_tag,
       LENGTH(o_orderpriority) AS prio_len,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
       CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS dom,
       CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
       ABS(o_totalprice - 1000.0) AS price_center,
       o_orderkey % 7 AS k_mod7
FROM orders
"""


# --- JSON + pivot ---------------------------------------------------------------


def q_json_extract(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


Q_JSON_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
"""


def q_pivot(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    p = e.groupBy("user_id").pivot("event_type", kinds).agg(F.count(F.lit(1)))
    return p.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    ).orderBy("user_id")


Q_PIVOT_SQL = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_unpivot(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'retailprice', p_retailprice, 'size', CAST(p_size AS DOUBLE)) AS (metric, value)",
    )


Q_UNPIVOT_SQL = """
SELECT p_partkey, metric, value FROM (
  SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
  UNION ALL
  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part)
"""


def q_distinct_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n"), "event_type")
        .limit(3)
    )


Q_DISTINCT_TOPK_SQL = """
SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY n DESC, event_type LIMIT 3
"""


# --- correlated aggregate (decorrelated as groupBy + join in Spark) -------------


def q_above_avg_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    avg_per_cust = o.groupBy("o_custkey").agg(
        (F.sum(_d("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("cust_avg")
    )
    return (
        o.join(avg_per_cust, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
        .orderBy("o_orderstatus")
    )


Q_ABOVE_AVG_SQL = """
WITH a AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS cust_avg
  FROM orders GROUP BY o_custkey)
SELECT o_orderstatus, COUNT(*) AS n_above_avg
FROM orders JOIN a USING (o_custkey)
WHERE o_totalprice > cust_avg
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# --- tumbling window over event-time (streaming-parity batch query) -------------


def q_tumbling_window(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_d("value", "decimal(18,6)")).cast("decimal(38,6)").cast("double").alias("v"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n",
            "v",
        )
        .orderBy("w_start", "event_type")
    )


Q_TUMBLING_SQL = """
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type, COUNT(*) AS n,
       CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS v
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_nation_revenue": q5_nation_revenue,
    "join_semi": q_semi_join,
    "join_anti": q_anti_join,
    "join_theta": q_theta_join,
    "window_topk": q_window_topk,
    "window_running": q_window_running,
    "window_rank_ties": q_window_rank_ties,
    "window_moving": q_window_moving,
    "sessionize": q_sessionize,
    "rollup_agg": q_rollup,
    "cube_agg": q_cube,
    "setops": q_setops,
    "scalar_funcs": q_scalar_funcs,
    "json_extract": q_json_extract,
    "pivot": q_pivot,
    "unpivot": q_unpivot,
    "distinct_topk": q_distinct_topk,
    "above_avg_orders": q_above_avg_orders,
    "tumbling_window": q_tumbling_window,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_nation_revenue": Q5_SQL,
    "join_semi": Q_SEMI_SQL,
    "join_anti": Q_ANTI_SQL,
    "join_theta": Q_THETA_SQL,
    "window_topk": Q_WINDOW_TOPK_SQL,
    "window_running": Q_WINDOW_RUNNING_SQL,
    "window_rank_ties": Q_WINDOW_RANK_SQL,
    "window_moving": Q_WINDOW_MOVING_SQL,
    "sessionize": Q_SESSIONIZE_SQL,
    "rollup_agg": Q_ROLLUP_SQL,
    "cube_agg": Q_CUBE_SQL,
    "setops": Q_SETOPS_SQL,
    "scalar_funcs": Q_SCALAR_SQL,
    "json_extract": Q_JSON_SQL,
    "pivot": Q_PIVOT_SQL,
    "unpivot": Q_UNPIVOT_SQL,
    "distinct_topk": Q_DISTINCT_TOPK_SQL,
    "above_avg_orders": Q_ABOVE_AVG_SQL,
    "tumbling_window": Q_TUMBLING_SQL,
}
