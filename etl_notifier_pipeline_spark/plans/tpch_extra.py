"""Additional TPC-H-shaped relational queries (SURVEY §2.2-2.4 widening):
nation-pair volume shipping (Q7), market share (Q8), and the
anti-join-plus-scalar-subquery sales-opportunity shape (Q22) — the
multi-fact join patterns the round-1/2 catalog had not yet exercised.

Determinism follows the registry contract: money doubles -> DECIMAL
before SUM (the fixture's doubles round identically to DECIMAL on both
engines), ratios as one final double division, years as ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_notifier_pipeline_spark.catalog import load_table
from etl_notifier_pipeline_spark.plans.registry import register

MONEY = "decimal(12,2)"
RATE = "decimal(4,2)"

# Exact line revenue: decimal all the way (order-independent sums).
_VOL_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))"
)


def _vol() -> F.Column:
    return (
        F.col("l_extendedprice").cast(MONEY)
        * (F.lit(1) - F.col("l_discount").cast(RATE))
    ).cast("decimal(18,4)")


@register(
    "q40_volume_shipping",
    category="join",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l.l_shipdate) AS l_year,
         {_VOL_SQL} AS volume
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q40_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations
    by supplier-nation x customer-nation x ship year.

    Scale shape: supplier+nation and customer+nation resolve as TWO
    broadcast dimension bundles (each pre-filtered to one nation, so
    the broadcast side shrinks before it ships); lineitem⨝orders on
    the orderkey is the only real shuffle. The nation-pair disjunction
    becomes two one-sided filters pushed into the broadcast builds.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(_vol()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q41_market_share",
    category="join",
    oracle=f"""
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share,
       COUNT(*) AS n_lineitems
FROM (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
         n1.n_name AS supp_nation,
         {_VOL_SQL} AS volume
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n2.n_regionkey
  WHERE r.r_name = 'ASIA'
)
GROUP BY o_year
""",
)
def q41_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3 suppliers' share of revenue sold into
    ASIA customers, by order year.

    Scale shape: conditional aggregation over ONE pass — numerator and
    denominator are two decimal sums of the same joined frame, never
    two scans. Dimension chains broadcast; the fact-fact join shuffles
    on the orderkey; the share is a single final double division (both
    sums exact decimals, so the ratio is bit-stable).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    asia_cust = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(n.alias("n2"), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n2.n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    vol = _vol()
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q43_small_quantity_revenue",
    category="join",
    oracle="""
WITH part_avg AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT l.l_partkey,
       COUNT(*) AS n_small,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         AS small_revenue
FROM lineitem l
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE l.l_quantity < 0.5 * a.avg_qty
GROUP BY l.l_partkey
""",
)
def q43_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems below half their part's
    average quantity — the canonical correlated-aggregate subquery,
    DECORRELATED into a per-part WINDOW average over one scan. The
    aggregate + join-back rewrite (what DuckDB plans) scans lineitem
    twice on Spark — the agg branch prunes/filters differently, so
    exchange reuse misses (verified at runtime, 0 ReusedExchange) —
    while the window form scans once, and the final per-part aggregate
    reuses the window's l_partkey partitioning (no second exchange).

    The average is an exact decimal sum / count, so the 0.5x
    threshold compare is bit-stable."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast(MONEY)).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        li.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.sum(F.col("l_extendedprice").cast(MONEY))
            .cast("double")
            .alias("small_revenue"),
        )
    )


@register(
    "q44_top_supplier",
    category="join",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM({_VOL_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def q44_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum total revenue —
    the view + scalar-max-subquery pattern.

    Scale shape: revenue aggregates once on l_suppkey; the scalar max
    is an unpartitioned WINDOW over that aggregate — a crossJoin with
    a rev-derived 1-row max would re-derive the aggregate subtree
    (Spark's exchange reuse misses it: the two branches prune columns
    differently) and scan lineitem TWICE, verified on the runtime
    plan. The window's single-partition pass sees only the
    supplier-cardinality frame, never the fact table; ties (all max
    suppliers) survive, matching Q15 semantics."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_vol()).cast("double").alias("total_revenue")
    )
    return (
        rev.withColumn(
            "__max_rev", F.max("total_revenue").over(Window.partitionBy())
        )
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q45_promo_revenue_share",
    category="aggregation",
    oracle=f"""
SELECT EXTRACT(year FROM l.l_shipdate) AS l_year,
       CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_VOL_SQL}
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM({_VOL_SQL}) AS DOUBLE) AS DOUBLE) AS promo_share,
       COUNT(*) AS n_lineitems
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1
""",
)
def q45_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO parts' share of revenue by ship year —
    conditional aggregation over one broadcast-joined pass (numerator
    and denominator never scan twice). Exact decimal sums; the share
    is one final double division."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    )
    vol = _vol()
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            ).cast("double").alias("promo_share"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q46_salted_skew_join",
    category="join",
    oracle=f"""
SELECT s.s_suppkey, s.s_name,
       CAST(SUM({_VOL_SQL}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
GROUP BY s.s_suppkey, s.s_name
""",
)
def q46_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe revenue-per-supplier through ``salted_join``: the fact
    side carries a deterministic 8-way salt (hash of the line number,
    never rand() — speculative retries must salt identically), the
    supplier side replicates per salt, and the join key becomes
    (suppkey, salt) so a hot supplier spreads over 8 reducers instead
    of one. The oracle is the PLAIN join — salting must be
    row-identical to the unsalted join, and this query value-checks
    that equivalence on every driver run."""
    from etl_notifier_pipeline_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = salted_join(
        li, s, ["l_suppkey"], n_salts=8, salt_source="l_linenumber"
    )
    return (
        joined.groupBy(
            F.col("l_suppkey").alias("s_suppkey"), "s_name"
        )
        .agg(
            F.sum(_vol()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q47_salted_aggregation",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows,
       CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q47_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation on a 3-value (maximally hot) group
    key: stage 1 aggregates on (l_returnflag, salt-of-linenumber),
    stage 2 merges the per-salt partials — the explicit form of the
    hot-key group-by idiom. The oracle is the PLAIN aggregation:
    two-stage must be value-identical (decimal partials merge
    exactly), checked on every driver run."""
    from etl_notifier_pipeline_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("sum", F.sum(F.col("l_quantity").cast(MONEY))),
            "n_rows": ("sum", F.count(F.lit(1))),
            "max_price": ("max", F.max("l_extendedprice")),
        },
        n_salts=8,
        salt_source="l_linenumber",
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "n_rows",
        F.col("max_price").cast("double").alias("max_price"),
    )


@register(
    "q48_funnel_conversion",
    category="join",
    oracle="""
WITH s AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
),
conv AS (
  SELECT DISTINCT s.user_id
  FROM events s JOIN events p
    ON s.user_id = p.user_id
   AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
  WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
)
SELECT c.c_mktsegment,
       COUNT(*) AS n_signup_users,
       COUNT(conv.user_id) AS n_converted,
       CAST(COUNT(conv.user_id) AS DOUBLE) / COUNT(*) AS conversion_rate
FROM s
JOIN customer c ON c.c_custkey = s.user_id
LEFT JOIN conv ON conv.user_id = s.user_id
GROUP BY c.c_mktsegment
""",
)
def q48_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel conversion (within 1 hour) per customer
    segment — the event-sequence analytics composition: LEFT interval
    self-join (st08's shape) -> per-user converted flag -> broadcast
    dimension rollup. Counts are int-exact; the rate is one final
    double division.

    Scale shape: events is scanned exactly twice (signup slice,
    purchase slice — both filters pushed), not three times: the
    non-converted users survive the LEFT join, so the signup-user
    universe never needs a separate distinct pass. The per-user flag
    is max-of-case over the user shuffle the join already created."""
    ev = load_table(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", F.col("ts").alias("s_ts"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
    )
    per_user = (
        signups.join(
            purchases,
            (signups["user_id"] == purchases["user_id"])
            & (F.col("p_ts") >= F.col("s_ts"))
            & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .select(signups["user_id"], "p_ts")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("p_ts").isNotNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("__converted")
        )
    )
    seg = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    return (
        per_user.join(seg, F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_signup_users"),
            F.sum("__converted").alias("n_converted"),
            (
                F.sum("__converted").cast("double") / F.count(F.lit(1))
            ).alias("conversion_rate"),
        )
    )


@register(
    "q42_sales_opportunity",
    category="join",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS v
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.v
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
  )
GROUP BY c_mktsegment
""",
)
def q42_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no large
    order (sales opportunities), rolled up per market segment.

    Scale shape: the positive-balance average rides in as a broadcast
    1-row aggregate (crossJoin, no collect). This IS a second pass
    over customer — but both passes are narrow column-pruned scans
    that aggregate map-side, which beats the single-scan alternative
    (an unpartitioned window over the raw table would funnel every
    row through ONE task; fine over an aggregate as in q44, wrong
    over a full table). The
    "no large order" predicate is a broadcast anti-join against the
    pre-filtered orders side (only big orders ship); the exact decimal
    average makes the > comparison bit-stable cross-engine.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(MONEY)).cast("double")
            / F.count(F.lit(1))
        ).alias("__avg_bal")
    )
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(F.broadcast(big), "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(MONEY)).cast("double").alias("total_acctbal"),
        )
    )
