"""Relational operator catalog (SURVEY.md §2.3-2.8) over the test tables.

Every entry is a pair: a Spark DataFrame builder and a DuckDB-compatible
ANSI-SQL oracle producing identical rows (same column names, same types).
Determinism rules used throughout:
- monetary aggregates go through DECIMAL(18,2)/(38,4) so floating-point
  summation order can never flip a value hash; the FINAL output column is
  then cast to DOUBLE (exact for scale-2 decimals below 2^53) because the
  driver's value-hasher materializes Spark decimals as decimal.Decimal but
  DuckDB HUGEINT/DECIMAL sums as float64 — identical values, different
  reprs, diverging hashes. DOUBLE is the one dtype both clients agree on,
- every computed column is aliased identically on both sides,
- ORDER-insensitive comparison is assumed (driver sorts), so no ORDER BY
  is required for correctness, only for top-k semantics (where it is part
  of the query meaning).

Reference parity notes are cited per entry (file:line of the reference
behavior each query re-expresses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- q1-style
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by + multi-agg (reference A1/A3/A4: config-driven agg dicts,
    ``src/sensum/sensum.py:135``, ``src/jobs/ydelsesrefusion.py:68,86``)."""
    li = t(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(
                (dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(18,2)") - dec(F.col("l_discount"))))
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------- filters (P4-P8)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean/date/IN-list predicates (reference P4-P6:
    ``src/jobs/frontdesk_borgerservice.py:183-184``, ``src/sd_delta.py:163``)."""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") != "F")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_totalprice") > 1000.0)
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")


FILTER_COMPOUND_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_orderdate
FROM orders
WHERE o_orderstatus <> 'F'
  AND o_orderpriority IN ('1-URGENT','2-HIGH')
  AND o_orderdate >= DATE '1995-01-01'
  AND o_totalprice > 1000.0
"""


def filter_null_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null predicate + NOT IN (reference P5/P8: ``src/sd_delta.py:91,163``,
    ``src/byggesager/byggesager.py:129``)."""
    e = t(spark, sf_dir, "events")
    return (
        e.filter(F.col("props").isNotNull() & ~F.col("event_type").isin("view", "click"))
        .select("event_id", "user_id", "event_type")
    )


FILTER_NULL_NOTIN_SQL = """
SELECT event_id, user_id, event_type
FROM events
WHERE props IS NOT NULL AND event_type NOT IN ('view','click')
"""


# ---------------------------------------------------------------- joins (J1-J7)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table inner join chain + agg (reference J1/J4: 11-table chain
    ``src/sensum/sensum.py:164-197``). Small dims (nation, region) are
    broadcast — Catalyst does it via AQE, we hint explicitly."""
    li, o, c = (t(spark, sf_dir, n) for n in ("lineitem", "orders", "customer"))
    n, r = t(spark, sf_dir, "nation"), t(spark, sf_dir, "region")
    dec = lambda col: col.cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(18,2)") - dec(F.col("l_discount")))).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


JOIN_STAR_REVENUE_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def join_left_with_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping customers with zero orders (reference J2:
    ``src/sensum/sensum.py:146,192``)."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count(F.col("o_orderkey")).alias("n_orders"))
    )


JOIN_LEFT_WITH_MISSING_SQL = """
SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (reference J6: membership probes
    ``src/sd_delta.py:147``, ``src/capa/capa_data.py:263-268``)."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    recent = o.filter(F.col("o_orderdate") >= F.lit("1997-01-01"))
    return c.join(recent, c.c_custkey == recent.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= DATE '1997-01-01')
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (reference J5: merge-indicator anti
    ``src/sd_delta.py:81-84``; set difference U3 ``:162-164``)."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    recent = o.filter(F.col("o_orderdate") >= F.lit("1998-06-01"))
    return c.join(recent, c.c_custkey == recent.o_custkey, "left_anti").select("c_custkey", "c_name")


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= DATE '1998-06-01')
"""


def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti in one driver entry (J5+J6 consolidated so
    the catalog stays inside the driver's 50-entry CORRECTNESS window;
    ``join_semi`` / ``join_anti`` remain as standalone library
    functions). Customers active since 1997 via a semi join, customers
    dormant since mid-1998 via an anti join, unioned with a status tag
    — both join strategies appear in the one physical plan."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    recent = o.filter(F.col("o_orderdate") >= F.lit("1997-01-01"))
    dormant_cut = o.filter(F.col("o_orderdate") >= F.lit("1998-06-01"))
    active = c.join(recent, c.c_custkey == recent.o_custkey, "left_semi").select(
        "c_custkey", "c_name", F.lit("active").alias("status")
    )
    dormant = c.join(
        dormant_cut, c.c_custkey == dormant_cut.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", F.lit("dormant").alias("status"))
    return active.unionByName(dormant)


JOIN_SEMI_ANTI_SQL = """
SELECT c_custkey, c_name, 'active' AS status
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= DATE '1997-01-01')
UNION ALL
SELECT c_custkey, c_name, 'dormant' AS status
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= DATE '1998-06-01')
"""


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of / temporal join (reference J8/C4: latest effective record at or
    before a point in time, ``src/delta_client.py:136-147``,
    ``src/sd_client.py:195-199``): for each purchase event, the user's most
    recent prior-or-same signup event. Implemented as union + max_by
    aggregation (the engine's skew-resistant LWW kernel) rather than a
    sort-window — see etl_spark.cdc.lww."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts"), F.col("event_id").alias("signup_id")
    )
    # inner join + null-rejecting bound, matching the oracle's WHERE:
    # a NULL signup_ts is an unknown time and can never qualify as
    # "most recent prior" (the old `isNull() |` branch admitted it, so
    # a user whose only signups carry NULL timestamps got a signup id
    # from Spark but NULL from the oracle — purchases with no
    # qualifying signup are restored by the left join below either way)
    joined = purchases.join(signups, "user_id").filter(
        F.col("signup_ts") <= F.col("purchase_ts")
    )
    best = joined.groupBy("purchase_id", "user_id", "purchase_ts").agg(
        F.max_by(F.col("signup_id"), F.struct(F.col("signup_ts"), F.col("signup_id"))).alias("asof_signup_id")
    )
    # keep purchases with no qualifying signup as null. The re-attach is
    # null-safe on the FULL grouped triple: a plain purchase_id equi-join
    # silently drops the as-of value for NULL-id purchase rows (NULL
    # never equi-matches), where the oracle's correlated subquery still
    # resolves them. <=> keys are equi-join keys to Spark (hash join,
    # not BNLJ), so the scale shape is unchanged.
    b = best.select(
        F.col("purchase_id").alias("b_pid"),
        F.col("user_id").alias("b_uid"),
        F.col("purchase_ts").alias("b_ts"),
        "asof_signup_id",
    )
    cond = (
        F.col("purchase_id").eqNullSafe(F.col("b_pid"))
        & F.col("user_id").eqNullSafe(F.col("b_uid"))
        & F.col("purchase_ts").eqNullSafe(F.col("b_ts"))
    )
    return purchases.join(b, cond, "left").select(
        "purchase_id", "user_id", "purchase_ts", "asof_signup_id"
    )


JOIN_ASOF_SQL = """
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), signups AS (
  SELECT user_id, ts AS signup_ts, event_id AS signup_id
  FROM events WHERE event_type = 'signup'
)
SELECT p.purchase_id, p.user_id, p.purchase_ts,
       (SELECT s.signup_id FROM signups s
        WHERE s.user_id = p.user_id AND s.signup_ts <= p.purchase_ts
        ORDER BY s.signup_ts DESC, s.signup_id DESC LIMIT 1) AS asof_signup_id
FROM purchases p
"""


# ---------------------------------------------------------------- windows (W1-W3)
def window_top1_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 per entity (reference W2/W3: pick latest
    ``src/delta_client.py:146-147``) via the engine's max_by kernel."""
    o = t(spark, sf_dir, "orders")
    best = o.groupBy("o_custkey").agg(
        F.max_by(
            F.struct("o_orderkey", "o_totalprice", "o_orderdate"),
            F.struct(F.col("o_totalprice"), F.col("o_orderkey")),
        ).alias("w")
    )
    return best.select(
        "o_custkey",
        F.col("w.o_orderkey").alias("top_orderkey"),
        F.col("w.o_totalprice").alias("top_totalprice"),
    )


WINDOW_TOP1_SQL = """
SELECT o_custkey, o_orderkey AS top_orderkey, o_totalprice AS top_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS rk
  FROM orders
) WHERE rk = 1
"""


def window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ranking window, k>1 (beyond reference — top-3 orders per
    customer by price; W2 generalization)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").desc())
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


WINDOW_RANK_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS rk
  FROM orders
) WHERE rk <= 3
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate per key — sliding frames beyond the
    reference's top-1-only windows."""
    e = t(spark, sf_dir, "events")
    # NULLS FIRST made explicit on both sides: Spark's ASC default is
    # nulls-first but DuckDB's is nulls-last, so a NULL event_id would
    # silently reorder the running frame between engines
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("event_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_value"),
    )


WINDOW_RUNNING_SUM_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
"""


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics (duration between consecutive events per user —
    reference F13 duration math ``src/jobs/frontdesk_borgerservice.py:194-200``)."""
    e = t(spark, sf_dir, "events")
    # explicit NULLS FIRST — see window_running_sum
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").asc_nulls_first())
    return e.select(
        "user_id",
        "event_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
        ).alias("micros_since_prev"),
    )


WINDOW_LAG_DELTA_SQL = """
SELECT user_id, event_id,
       EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id NULLS FIRST))
         AS micros_since_prev
FROM events
"""


def window_running_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum AND lag delta over ONE per-key window — the catalog
    twin covering both ``window_running_sum`` and ``window_lag_delta``
    (kept as standalone library functions) in a single driver-checked
    entry. One sort-based window exchange computes both frames: Spark
    plans a single Window operator because partition+order match."""
    e = t(spark, sf_dir, "events")
    # explicit NULLS FIRST — see window_running_sum
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").asc_nulls_first())
    wr = w.rowsBetween(Window.unboundedPreceding, 0)
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(wr).cast("double").alias("running_value"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
        ).alias("micros_since_prev"),
    )


WINDOW_RUNNING_LAG_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
       EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id NULLS FIRST))
         AS micros_since_prev
FROM events
"""


# ---------------------------------------------------------------- set ops (U1-U3)
def union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union-all then distinct (reference U1/A6:
    ``src/sensum/sensum.py:68-69``)."""
    c, s = t(spark, sf_dir, "customer"), t(spark, sf_dir, "supplier")
    a = c.select(F.col("c_nationkey").alias("nationkey"))
    b = s.select(F.col("s_nationkey").alias("nationkey"))
    return a.unionByName(b).distinct()


UNION_DEDUP_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def except_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (reference U3: ``src/sd_delta.py:162-164``)."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    recent = o.filter(F.col("o_orderdate") >= F.lit("1998-06-01"))
    return c.select(F.col("c_custkey").alias("custkey")).exceptAll(
        recent.select(F.col("o_custkey").alias("custkey"))
    ).distinct()


EXCEPT_ALL_KEYS_SQL = """
SELECT DISTINCT custkey FROM (
  SELECT c_custkey AS custkey FROM customer
  EXCEPT ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= DATE '1998-06-01'
)
"""


# ---------------------------------------------------------------- agg extras
def domain_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill missing group x category combos with zeros (reference A10:
    ``src/byggesager/byggesager.py:139-143`` — nested-loop zero rows,
    re-expressed as crossJoin + left join + na.fill)."""
    o, n = t(spark, sf_dir, "orders"), t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    statuses = o.select("o_orderstatus").distinct()
    grid = n.select("n_nationkey", "n_name").crossJoin(statuses)
    agg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        grid.join(
            agg,
            (grid.n_nationkey == agg.c_nationkey) & (grid.o_orderstatus == agg.o_orderstatus),
            "left",
        )
        .select(grid.n_name, grid.o_orderstatus, F.coalesce(agg.n, F.lit(0)).alias("n_orders"))
    )


DOMAIN_COMPLETION_SQL = """
WITH statuses AS (SELECT DISTINCT o_orderstatus FROM orders),
agg AS (
  SELECT c_nationkey, o_orderstatus, COUNT(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, o_orderstatus
)
SELECT n.n_name, s.o_orderstatus, COALESCE(a.n, 0) AS n_orders
FROM nation n CROSS JOIN statuses s
LEFT JOIN agg a ON a.c_nationkey = n.n_nationkey AND a.o_orderstatus = s.o_orderstatus
"""


def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (beyond reference; free in Spark/DuckDB).

    Two-phase form instead of Spark's ROLLUP operator, for two reasons:
    (1) Spark's ROLLUP emits ZERO rows over an empty input, while the
    SQL standard (and DuckDB) says the () grouping set contributes one
    global row (COUNT=0, SUM=NULL) — deriving the higher levels by
    re-aggregating the cached (year, status) groups restores it (a
    plain agg always yields one row); (2) it shuffles each input row
    once (Expand emits 3 rows per input row before the partial agg).
    The (year, status) frame is groups-sized, so the cache is tiny and
    guarantees ONE table scan across the three levels. The sum stays
    DECIMAL(38,2) until the final cast so the re-derived totals are
    bit-identical to direct aggregation in both engines (summing
    per-year doubles would drift in the last ulp)."""
    o = t(spark, sf_dir, "orders")
    lvl = (
        o.groupBy(F.year("o_orderdate").alias("order_year"), F.col("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("total_dec"),
        )
        .cache()
    )
    yr = (
        lvl.groupBy("order_year")
        .agg(F.sum("n").alias("n"), F.sum("total_dec").cast("decimal(38,2)").alias("total_dec"))
        .select(
            "order_year",
            F.lit(None).cast("string").alias("o_orderstatus"),
            "n",
            "total_dec",
        )
    )
    gt = lvl.agg(
        F.coalesce(F.sum("n"), F.lit(0).cast("bigint")).alias("n"),
        F.sum("total_dec").cast("decimal(38,2)").alias("total_dec"),
    ).select(
        F.lit(None).cast("int").alias("order_year"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        "n",
        "total_dec",
    )
    return (
        lvl.select("order_year", "o_orderstatus", "n", "total_dec")
        .unionByName(yr)
        .unionByName(gt)
        .select(
            "order_year", "o_orderstatus", "n", F.col("total_dec").cast("double").alias("total")
        )
    )


ROLLUP_ORDERS_SQL = """
SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year, o_orderstatus,
       COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (order_year, o_orderstatus)
"""


def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting (reference A7: ``unique()`` calls)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))


DISTINCT_COUNT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------- scalar fns
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex replace, trim, split/substr/upper, zero-pad, case-mapping
    (reference F1-F8: ``src/byggesager/byggesager.py:146``,
    ``src/utils/utils.py:7-10``, ``src/jobs/ydelsesrefusion.py:83``)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace(F.col("p_name"), r"\s+", " ").alias("name_squashed"),
        F.upper(F.substring(F.col("p_brand"), 1, 5)).alias("brand_prefix"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.translate(F.lower(F.col("p_name")), "øåæ", "oa@").alias("name_translit"),
    )


STRING_FUNCTIONS_SQL = """
SELECT p_partkey,
       REGEXP_REPLACE(p_name, '\\s+', ' ', 'g') AS name_squashed,
       UPPER(SUBSTRING(p_brand, 1, 5)) AS brand_prefix,
       LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
       STRING_SPLIT(p_type, ' ')[1] AS type_head,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       TRANSLATE(LOWER(p_name), 'øåæ', 'oa@') AS name_translit
FROM part
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date truncation, offsets, parts, reformat (reference F9-F12:
    ``src/jobs/byggesager_sbsys.py:24-28``, ``src/sd_delta.py:142-143``)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.trunc(F.col("o_orderdate"), "month").alias("month_start"),
        F.add_months(F.col("o_orderdate"), -2).alias("two_months_back"),
        F.year("o_orderdate").alias("y"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        F.date_format("o_orderdate", "dd.MM.yyyy").alias("danish_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate")).alias("days_to_eoy"),
    )


DATE_FUNCTIONS_SQL = """
SELECT o_orderkey,
       DATE_TRUNC('month', o_orderdate)::DATE AS month_start,
       (o_orderdate - INTERVAL 2 MONTH)::DATE AS two_months_back,
       CAST(YEAR(o_orderdate) AS INT) AS y,
       CAST(WEEKOFYEAR(o_orderdate) AS INT) AS iso_week,
       STRFTIME(o_orderdate, '%d.%m.%Y') AS danish_date,
       DATEDIFF('day', o_orderdate, DATE '1998-12-31') AS days_to_eoy
FROM orders
"""


def conditional_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch CASE recode + dict-map with default + null fill
    (reference F5/F6/F14: 11-branch ``groupQueues``
    ``src/jobs/frontdesk_borgerservice.py:141-165``, status map
    ``src/sd_delta.py:14``, fillna ``src/byggesager/byggesager.py:136``)."""
    o = t(spark, sf_dir, "orders")
    prio_map = F.create_map(
        F.lit("1-URGENT"), F.lit("critical"),
        F.lit("2-HIGH"), F.lit("high"),
        F.lit("3-MEDIUM"), F.lit("normal"),
    )
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
        .alias("size_bucket"),
        F.coalesce(prio_map[F.col("o_orderpriority")], F.lit("low")).alias("prio_class"),
    )


CONDITIONAL_RECODE_SQL = """
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            WHEN o_totalprice < 300000 THEN 'large'
            ELSE 'jumbo' END AS size_bucket,
       CASE o_orderpriority WHEN '1-URGENT' THEN 'critical'
                            WHEN '2-HIGH' THEN 'high'
                            WHEN '3-MEDIUM' THEN 'normal'
                            ELSE 'low' END AS prio_class
FROM orders
"""


def custom_collation_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digits-last custom sort key (reference W1:
    ``src/byggesager/byggesager.py:115-116,151``) — expressed as a
    computed sort-class column (order-insensitive compare checks the key)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_brand",
        F.when(F.regexp_extract(F.col("p_brand"), r"[0-9]+$", 0) != "", 1).otherwise(0).alias("digit_class"),
    )


CUSTOM_COLLATION_SQL = """
SELECT p_partkey, p_brand,
       CASE WHEN REGEXP_EXTRACT(p_brand, '[0-9]+$') <> '' THEN 1 ELSE 0 END AS digit_class
FROM part
"""


def cdc_lww_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's flagship shape on the driver's events table: replay a
    change stream to current state — last writer per key by (ts, event_id)
    — using the skew-resistant max_by kernel (SURVEY.md C4/W3; reference
    ``src/delta_client.py:136-147``). 'delete' events remove the key
    (reference C2 state machine ``src/sd_delta.py:106-119``: terminal
    status drops the row)."""
    from etl_spark.cdc.lww import lww_winners

    # project before the aggregation: max_by's buffer carries every
    # payload column, so unused ones (props) must be dropped here — the
    # optimizer cannot prune inside the agg struct
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type", "value")
    # the payload columns close the ordering into a TOTAL order: event_id
    # is unique by contract, but if an upstream feed redelivers the same
    # id with a conflicting payload, max_by over a non-total order picks
    # an arbitrary copy — trailing payload tiebreakers keep the winner
    # deterministic (and engine-agnostic) even then
    winners = lww_winners(
        e, key_columns=["user_id"],
        order_columns=["ts", "event_id", "event_type", "value"],
    )
    return winners.filter(F.col("event_type") != "delete").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


CDC_LWW_STATE_SQL = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       value AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id
    -- payload tiebreakers mirror the Spark side's total order (DuckDB's
    -- default DESC null order is NULLS LAST = Spark's NULL-smallest
    -- struct max, same as the pinned ts/event_id NULL contract)
    ORDER BY ts DESC, event_id DESC, event_type DESC, value DESC
  ) AS rk
  FROM events
) WHERE rk = 1 AND event_type <> 'delete'
"""


def incremental_upsert_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-overwrite-style upsert semantics as a query (reference C7:
    ``src/byggesager/byggesager.py:177-188``): per (user, day), the day's
    latest value replaces earlier ones; emit the merged daily state."""
    e = t(spark, sf_dir, "events")
    return (
        e.withColumn("day", F.to_date(F.col("ts")))
        .groupBy("user_id", "day")
        .agg(
            # value itself closes the order so an exact (ts, event_id)
            # redelivery with a conflicting value resolves the same way
            # in both engines (same total-order rule as cdc_lww_state)
            F.max_by(
                F.col("value"),
                F.struct(F.col("ts"), F.col("event_id"), F.col("value")),
            ).alias("day_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


INCREMENTAL_UPSERT_FOLD_SQL = """
SELECT user_id, day, value AS day_value, n_events FROM (
  SELECT user_id, CAST(ts AS DATE) AS day, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC, value DESC) AS rk,
         COUNT(*) OVER (PARTITION BY user_id, CAST(ts AS DATE)) AS n_events
  FROM events
) WHERE rk = 1
"""


def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested JSON flatten (reference S9/S8: ``uddannelsesstatistik.py:63-72``,
    ``utils.py:13-21``) — schema-on-read over the events props column."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        # try_cast, not cast: a non-numeric $.k value must degrade to
        # NULL under ANSI mode instead of aborting the scan
        F.get_json_object(F.col("props"), "$.k").try_cast("int").alias("prop_k"),
    )


JSON_EXTRACTION_SQL = r"""
SELECT event_id,
       -- dirty-JSON contract, pinned to Spark's documented leniency:
       -- get_json_object parses the LEADING JSON value and ignores
       -- trailing garbage ('{"k":5} zzalt' -> 5), returning NULL only
       -- when no leading value parses. DuckDB's ->> raises on any
       -- malformed input, so the oracle emulates the leniency by
       -- extracting the leading flat object (props is a flat one-level
       -- object by schema — no nested braces) before the validity
       -- guard; TRY_CAST mirrors Spark's try_cast on non-numeric $.k.
       CASE WHEN json_valid(lead)
            THEN TRY_CAST(lead->>'$.k' AS INT) END AS prop_k
FROM (SELECT event_id,
             regexp_extract(props, '^\s*(\{[^{}]*\})', 1) AS lead
      FROM events)
"""


def period_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-grid backfill (reference W4: ``dynamic_period`` year x
    period grid ``src/jobindsats/jobindsats.py:71-113``): for each
    customer (bounded key range), every month between their first and
    last order, zero-filling months with no orders — F.sequence +
    explode, the Spark-native sequence generator."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    month = F.trunc("o_orderdate", "month")
    span = o.groupBy("o_custkey").agg(
        F.min(month).alias("m0"), F.max(month).alias("m1")
    )
    months = span.select(
        "o_custkey",
        F.explode(F.sequence("m0", "m1", F.expr("interval 1 month"))).alias("month"),
    )
    per_month = o.groupBy("o_custkey", month.alias("month")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        months.join(per_month, ["o_custkey", "month"], "left")
        .select("o_custkey", "month", F.coalesce("n", F.lit(0)).alias("n_orders"))
    )


PERIOD_BACKFILL_SQL = """
WITH o AS (SELECT * FROM orders WHERE o_custkey < 500),
span AS (
  SELECT o_custkey,
         MIN(DATE_TRUNC('month', o_orderdate)) AS m0,
         MAX(DATE_TRUNC('month', o_orderdate)) AS m1
  FROM o GROUP BY 1
),
months AS (
  SELECT o_custkey, CAST(u.m AS DATE) AS month
  FROM span, UNNEST(generate_series(CAST(m0 AS TIMESTAMP), CAST(m1 AS TIMESTAMP), INTERVAL 1 MONTH)) AS u(m)
),
per_month AS (
  SELECT o_custkey, DATE_TRUNC('month', o_orderdate)::DATE AS month, COUNT(*) AS n
  FROM o GROUP BY 1, 2
)
SELECT months.o_custkey, months.month, COALESCE(per_month.n, 0) AS n_orders
FROM months LEFT JOIN per_month USING (o_custkey, month)
"""


def positional_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional (index) join (reference J10: ``pd.concat(axis=1)``
    ``src/jobs/frontdesk_borgerservice.py:251``): k-th priciest order
    zipped with the k-th highest-balance customer via row_number — the
    set-based re-expression of an index-aligned concat.

    Scale note: each side is orderBy().limit(k) — Spark plans that as
    TakeOrderedAndProject (parallel per-partition partial top-k, then a
    k-row merge), NOT a global no-partition window that would drag the
    whole table through one task. row_number then runs over only the
    k-row results."""
    o, c = t(spark, sf_dir, "orders"), t(spark, sf_dir, "customer")
    # NULL order pinned explicitly on BOTH sort columns: Spark's bare
    # asc() is NULLS FIRST while DuckDB's ASC is NULLS LAST, so a NULL
    # key in the ordering silently shifts every later position by one
    # relative to the oracle. NULLS LAST on both engines; with it, tied
    # rows are identical in all projected columns, so rank assignment
    # among ties cannot change the output multiset.
    wo = Window.orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
    )
    wc = Window.orderBy(
        F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey").asc_nulls_last()
    )
    top_o = (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last())
        .limit(100)
        .withColumn("rk", F.row_number().over(wo))
    )
    top_c = (
        c.select("c_custkey", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey").asc_nulls_last())
        .limit(100)
        .withColumn("rk", F.row_number().over(wc))
    )
    return top_o.join(top_c, "rk").select("rk", "o_orderkey", "o_totalprice", "c_custkey", "c_acctbal")


POSITIONAL_JOIN_SQL = """
WITH top_o AS (
  SELECT o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice DESC NULLS LAST,
                            o_orderkey ASC NULLS LAST) AS rk
  FROM orders QUALIFY rk <= 100
),
top_c AS (
  SELECT c_custkey, c_acctbal,
         ROW_NUMBER() OVER (ORDER BY c_acctbal DESC NULLS LAST,
                            c_custkey ASC NULLS LAST) AS rk
  FROM customer QUALIFY rk <= 100
)
SELECT rk, o_orderkey, o_totalprice, c_custkey, c_acctbal
FROM top_o JOIN top_c USING (rk)
"""


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counts per event_type — the
    100 TB path where exact countDistinct's per-group hash sets blow
    memory: fixed-size sketches, full map-side partial aggregation, one
    exchange. No SQL oracle (DuckDB's approx_count_distinct uses a
    different sketch; estimates differ by construction) — the driver
    records a rows-only check; exactness is covered by the exact twin
    ``distinct_count``."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


def all_null_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any/all-null column reduction (reference A9:
    ``src/jobs/sd_delta.py:44`` — ``df[col].isnull().all()`` gates a
    whole processing branch). COUNT-based so both engines emit int64,
    one partial-aggregating pass, no shuffle beyond the 1-row final."""
    e = t(spark, sf_dir, "events")
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("props").isNull(), 1)).alias("props_nulls"),
        (F.count("props") == 0).alias("props_all_null"),
        (F.count(F.when(F.col("value").isNull(), 1)) > 0).alias("value_any_null"),
    )


ALL_NULL_CHECK_SQL = """
SELECT COUNT(*) AS n_rows,
       COUNT(CASE WHEN props IS NULL THEN 1 END) AS props_nulls,
       COUNT(props) = 0 AS props_all_null,
       COUNT(CASE WHEN value IS NULL THEN 1 END) > 0 AS value_any_null
FROM events
"""


def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (completes the U1-U3 set-op family — the
    reference has union and except; intersect is its missing dual):
    nations that have BOTH customers and suppliers."""
    c, s = t(spark, sf_dir, "customer"), t(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(s.select(F.col("s_nationkey").alias("nationkey")))
    )


INTERSECT_KEYS_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def set_ops_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT and INTERSECT in one tagged frame — the catalog twin
    covering both ``except_all_keys`` and ``intersect_keys`` (kept as
    standalone library functions) in a single driver-checked entry.
    Keys are cast to bigint so the two branches union losslessly."""
    ex = except_all_keys(spark, sf_dir).select(
        F.lit("except").alias("op"), F.col("custkey").cast("bigint").alias("key")
    )
    ix = intersect_keys(spark, sf_dir).select(
        F.lit("intersect").alias("op"), F.col("nationkey").cast("bigint").alias("key")
    )
    return ex.unionByName(ix)


SET_OPS_KEYS_SQL = f"""
SELECT 'except' AS op, CAST(custkey AS BIGINT) AS key FROM ({EXCEPT_ALL_KEYS_SQL})
UNION ALL
SELECT 'intersect' AS op, CAST(nationkey AS BIGINT) AS key FROM ({INTERSECT_KEYS_SQL})
"""
