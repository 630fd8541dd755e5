"""Relational corpus, batch 2: subquery patterns, scalar-function
breadth, exact percentiles, manual moment statistics, window value
functions, explode/collect, limit-offset paging (SURVEY.md §2.7).

Same determinism discipline as batch 1 (see relational.py docstring).
Notable cross-engine choices:
- stddev is computed from exact decimal sums (naive two-pass formula)
  because engines' streaming variance accumulators are partition-order
  dependent;
- Spark ``weekday()+1`` ≡ DuckDB ``isodow`` (both verified);
- Spark ``percentile`` ≡ DuckDB ``quantile_cont`` (verified exact);
- ``collect_list`` is wrapped in ``array_sort`` — bare collect order
  is nondeterministic in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from solana_snapshot_etl_tools_spark.plans.relational import DEC2, _d, _t


# --- correlated max per group (Q2-flavored) ---------------------------------


def q_top_supplier_per_nation(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    mx = s.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.max("s_acctbal").alias("max_bal")
    )
    return (
        s.join(mx, (s.s_nationkey == mx.nk) & (s.s_acctbal == mx.max_bal))
        .select("s_nationkey", "s_suppkey", "s_acctbal")
        .orderBy("s_nationkey", "s_suppkey")
    )


Q_TOP_SUPPLIER_SQL = """
SELECT s_nationkey, s_suppkey, s_acctbal
FROM supplier
WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = supplier.s_nationkey)
ORDER BY s_nationkey, s_suppkey
"""


# --- exists + not-exists combination ----------------------------------------


def q_active_then_churned(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    o95 = o.filter(F.year("o_orderdate") == 1995)
    o01 = o.filter(F.year("o_orderdate") == 2001)
    return (
        c.join(o95, c.c_custkey == o95.o_custkey, "left_semi")
        .join(o01, F.col("c_custkey") == o01.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_churned"))
        .orderBy("c_nationkey")
    )


Q_CHURNED_SQL = """
SELECT c_nationkey, COUNT(*) AS n_churned
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND EXTRACT(YEAR FROM o_orderdate) = 1995)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND EXTRACT(YEAR FROM o_orderdate) = 2001)
GROUP BY c_nationkey ORDER BY c_nationkey
"""


# --- IN-subquery + HAVING -----------------------------------------------------


def q_in_subquery_having(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 100)
        .orderBy("yr")
    )


Q_IN_HAVING_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr, COUNT(*) AS n_orders
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
GROUP BY 1 HAVING COUNT(*) > 100 ORDER BY 1
"""


# --- conditional aggregation --------------------------------------------------


def q_conditional_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.count_if(F.col("o_orderstatus") == "F").alias("n_f"),
            F.count_if(F.col("o_orderstatus") == "O").alias("n_o"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", _d("o_totalprice"))
                .otherwise(F.lit("0").cast(DEC2))
            ).cast("decimal(38,2)").cast("double").alias("urgent_value"),
            F.max(F.least(F.col("o_totalprice"), F.lit(50000.0))).alias("capped_max"),
        )
        .orderBy("yr")
    )


Q_COND_AGG_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
       COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
       CAST(CAST(CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                THEN CAST(o_totalprice AS DECIMAL(18,2))
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS urgent_value,
       MAX(LEAST(o_totalprice, 50000.0)) AS capped_max
FROM orders GROUP BY 1 ORDER BY 1
"""


# --- string function breadth --------------------------------------------------


def q_string_funcs(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_head"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("translated"),
        F.replace(F.col("c_mktsegment"), F.lit("BUILD"), F.lit("MAKE")).alias("replaced"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.substring(F.reverse(F.col("c_mktsegment")), 1, 3).alias("rev3"),
        F.repeat(F.col("c_orderstatus") if "c_orderstatus" in c.columns else F.lit("x"), 2).alias("xx"),
        F.length(F.trim(F.col("c_name"))).alias("name_len"),
    )


Q_STRING_SQL = """
SELECT c_custkey,
       split_part(c_name, '#', 1) AS name_head,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
       replace(c_mktsegment, 'BUILD', 'MAKE') AS replaced,
       CAST(instr(c_name, '#') AS INTEGER) AS hash_pos,
       substring(reverse(c_mktsegment), 1, 3) AS rev3,
       repeat('x', 2) AS xx,
       CAST(length(trim(c_name)) AS INTEGER) AS name_len
FROM customer
"""


# --- date function breadth ----------------------------------------------------


def q_date_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month_start"),
        F.last_day(d).cast("string").alias("month_end"),
        (F.weekday(d) + 1).alias("isodow"),
        F.date_add(d, 30).cast("string").alias("plus30"),
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
    )


Q_DATE_SQL = """
SELECT o_orderkey,
       CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
       CAST(isodow(o_orderdate) AS INTEGER) AS isodow,
       CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy
FROM orders
"""


# --- exact percentiles + manual moments ---------------------------------------


def q_percentiles(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    sum_d = F.sum(_d("l_extendedprice", "decimal(18,2)"))
    sumsq = F.sum(
        _d("l_extendedprice", "decimal(18,2)") * _d("l_extendedprice", "decimal(18,2)")
    )
    # two-pass-exact stddev: engines' streaming accumulators are
    # partition-order dependent; decimal sums are not
    var = (sumsq.cast("double") - sum_d.cast("double") * sum_d.cast("double") / n) / (
        n - 1
    )
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95_price"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.sqrt(var).alias("stddev_price"),
        )
        .orderBy("l_returnflag")
    )


Q_PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS median_price,
       quantile_cont(l_extendedprice, 0.95) AS p95_price,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       -- decimal→double via VARCHAR: DuckDB's direct decimal cast
       -- double-rounds (int128 then /10^scale); the string parse is
       -- correctly rounded like Spark's BigDecimal.doubleValue
       sqrt((CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             - CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               * CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*))
            / (COUNT(*) - 1)) AS stddev_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- window value functions ---------------------------------------------------


def q_window_values(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.lag("o_orderkey", 2).over(w).alias("prev2_order"),
        F.first_value(F.col("o_orderkey")).over(wf).alias("first_order"),
        F.last_value(F.col("o_orderkey")).over(wf).alias("last_order"),
        F.nth_value(F.col("o_orderkey"), 2).over(wf).alias("second_order"),
    )


Q_WINDOW_VALUES_SQL = """
SELECT o_custkey, o_orderkey,
  LEAD(o_orderkey) OVER w AS next_order,
  LAG(o_orderkey, 2) OVER w AS prev2_order,
  FIRST_VALUE(o_orderkey) OVER wf AS first_order,
  LAST_VALUE(o_orderkey) OVER wf AS last_order,
  NTH_VALUE(o_orderkey, 2) OVER wf AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --- explode / collect --------------------------------------------------------


def q_explode_tokens(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(F.explode(F.split("o_orderpriority", "-")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("tok")
    )


Q_EXPLODE_SQL = """
SELECT tok, COUNT(*) AS n
FROM (SELECT unnest(string_split(o_orderpriority, '-')) AS tok FROM orders)
GROUP BY tok ORDER BY tok
"""


def q_collect_sorted(spark, sf_dir):
    # The sorted list is joined to a single string at the output edge so the
    # result is hashable by any canonicalizer (array columns are not).
    n = _t(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias(
                "nations"
            )
        )
        .orderBy("n_regionkey")
    )


Q_COLLECT_SQL = """
SELECT n_regionkey, array_to_string(list_sort(list(n_name)), '|') AS nations
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


# --- null handling + paging ---------------------------------------------------


def q_null_handling(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select(
        "event_id",
        F.coalesce(k, F.lit(-1)).alias("k_or_default"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
        F.when(k.isNull(), "missing").otherwise("present").alias("k_status"),
    )


Q_NULL_SQL = """
SELECT event_id,
       COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k_or_default,
       NULLIF(event_type, 'error') AS type_or_null,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) IS NULL
            THEN 'missing' ELSE 'present' END AS k_status
FROM events
"""


def q_limit_offset(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.orderBy(F.desc("p_retailprice"), "p_partkey")
        .select("p_partkey", "p_retailprice")
        .offset(10)
        .limit(20)
    )


Q_LIMIT_OFFSET_SQL = """
SELECT p_partkey, p_retailprice FROM part
ORDER BY p_retailprice DESC, p_partkey LIMIT 20 OFFSET 10
"""


# --- as-of join (custom operator, operators/asof.py) -------------------------


def q_asof_join(spark, sf_dir):
    """For each purchase event, the most recent prior click of the
    same user: Spark union+window as-of vs DuckDB's native ASOF JOIN."""
    from solana_snapshot_etl_tools_spark.operators.asof import as_of_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    j = as_of_join(purchases, clicks, key="user_id", right_prefix="c_")
    return j.select(
        "user_id",
        "purchase_id",
        F.col("c_click_id").alias("click_id"),
        (F.unix_micros("ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )


Q_ASOF_SQL = """
WITH p AS (SELECT user_id, event_id AS purchase_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id AS click_id, ts FROM events WHERE event_type = 'click')
SELECT p.user_id, p.purchase_id, c.click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# --- sliding event-time window ------------------------------------------------


def q_sliding_window(spark, sf_dir):
    """1-hour windows sliding every 30 minutes — each event lands in
    two windows (streaming-parity semantics of F.window with slide)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n",
        )
        .orderBy("w_start", "event_type")
    )


Q_SLIDING_SQL = """
SELECT strftime(s, '%Y-%m-%d %H:%M:%S') AS w_start, event_type, COUNT(*) AS n
FROM (SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                     time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS s,
             event_type
      FROM events)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- explicit GROUPING SETS through the SQL API --------------------------------


def q_grouping_sets(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    view = "gs_lineitem"
    l.createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n,
               GROUPING_ID(l_returnflag, l_linestatus) AS gid
        FROM {view}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY gid, l_returnflag, l_linestatus
    """)


Q_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n,
       GROUPING_ID(l_returnflag, l_linestatus) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY gid, l_returnflag, l_linestatus
"""


# --- classic TPC-H plan shapes over the shared tables (q6/q10/q14) ----------


def q6_revenue_delta(spark, sf_dir):
    """TPC-H Q6 shape: single-table scan → tight filter → one global
    agg. The whole query should collapse to a pushed-down scan plus a
    partial/final aggregate — the cheapest plan Spark can produce.
    Discount compared as DECIMAL(3,2) so the range test is exact in
    both engines (0.05/0.07 are not representable doubles)."""
    l = _t(spark, sf_dir, "lineitem")
    disc = _d("l_discount", "decimal(3,2)")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (disc >= F.lit("0.05").cast("decimal(3,2)"))
            & (disc <= F.lit("0.07").cast("decimal(3,2)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_d("l_extendedprice") * disc)
            .cast("decimal(38,4)")
            .cast("double")
            .alias("revenue_delta")
        )
    )


Q6_SQL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(3,2))) AS DECIMAL(38,4)) AS DOUBLE)
       AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(l_discount AS DECIMAL(3,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: 4-way join (fact ⋈ fact ⋈ two dims) → group →
    top-k by aggregate. Dims broadcast; the top-k has a unique
    tiebreak (c_custkey) so LIMIT is deterministic cross-engine."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = _d("l_extendedprice") * (
        F.lit("1.00").cast("decimal(3,2)") - _d("l_discount", "decimal(3,2)")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("decimal(38,4)").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DECIMAL(38,4)) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: fact ⋈ dim with a conditional aggregate ratio.
    Both sums are exact decimals; the share is ONE double division at
    the end, so the value hash-matches DuckDB bit-for-bit."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = _d("l_extendedprice") * (
        F.lit("1.00").cast("decimal(3,2)") - _d("l_discount", "decimal(3,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit("0").cast("decimal(21,4)")
    )
    agg = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).agg(
        F.sum(promo).cast("decimal(38,4)").cast("double").alias("_pr"),
        F.sum(rev).cast("decimal(38,4)").cast("double").alias("_tr"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("_pr") / F.col("_tr")).alias("promo_share")
    )


Q14_SQL = """
SELECT 100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
             ELSE CAST(0 AS DECIMAL(21,4)) END) AS DECIMAL(38,4)) AS DOUBLE)
     / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DECIMAL(38,4)) AS DOUBLE) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
"""


def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: date-windowed orders, EXISTS over the fact
    table (→ left-semi join, never a count-then-join), count per
    priority, ordered output. The reference Q4 predicate is
    l_commitdate < l_receiptdate; this corpus carries neither column,
    so the EXISTS tests l_returnflag = 'R' — same shape, same
    semi-join plan property (pinned in test_plans_shape)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(
            l.select(F.col("l_orderkey").alias("o_orderkey")),
            "o_orderkey",
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: fact ⋈ dim under an OR-of-ANDs predicate
    mixing columns of both tables — the classic disjunctive-pushdown
    exercise. Catalyst must extract the part-only disjunction
    ((brand,size) branches) and push it into the part scan instead of
    filtering after the join, and the small side must broadcast (both
    pinned in test_plans_shape). Revenue is exact-decimal summed then
    one double cast, like q6/q14."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = _d("l_extendedprice") * (
        F.lit("1.00").cast("decimal(3,2)") - _d("l_discount", "decimal(3,2)")
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(5, 40)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 50)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(F.sum(rev).cast("decimal(38,4)").cast("double").alias("revenue"))
    )


Q19_SQL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DECIMAL(38,4)) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 30)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25 AND l_quantity BETWEEN 5 AND 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 50)
"""


QUERIES = {
    "asof_join": q_asof_join,
    "q6_revenue_delta": q6_revenue_delta,
    "q10_returned_items": q10_returned_items,
    "q14_promo_share": q14_promo_share,
    "q4_order_priority": q4_order_priority,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "sliding_window": q_sliding_window,
    "grouping_sets": q_grouping_sets,
    "top_supplier_per_nation": q_top_supplier_per_nation,
    "exists_not_exists": q_active_then_churned,
    "in_subquery_having": q_in_subquery_having,
    "conditional_agg": q_conditional_agg,
    "string_funcs": q_string_funcs,
    "date_funcs": q_date_funcs,
    "percentiles_stddev": q_percentiles,
    "window_values": q_window_values,
    "explode_tokens": q_explode_tokens,
    "collect_sorted": q_collect_sorted,
    "null_handling": q_null_handling,
    "limit_offset": q_limit_offset,
}

ORACLES = {
    "asof_join": Q_ASOF_SQL,
    "q6_revenue_delta": Q6_SQL,
    "q10_returned_items": Q10_SQL,
    "q14_promo_share": Q14_SQL,
    "q4_order_priority": Q4_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "sliding_window": Q_SLIDING_SQL,
    "grouping_sets": Q_GROUPING_SETS_SQL,
    "top_supplier_per_nation": Q_TOP_SUPPLIER_SQL,
    "exists_not_exists": Q_CHURNED_SQL,
    "in_subquery_having": Q_IN_HAVING_SQL,
    "conditional_agg": Q_COND_AGG_SQL,
    "string_funcs": Q_STRING_SQL,
    "date_funcs": Q_DATE_SQL,
    "percentiles_stddev": Q_PERCENTILES_SQL,
    "window_values": Q_WINDOW_VALUES_SQL,
    "explode_tokens": Q_EXPLODE_SQL,
    "collect_sorted": Q_COLLECT_SQL,
    "null_handling": Q_NULL_SQL,
    "limit_offset": Q_LIMIT_OFFSET_SQL,
}
