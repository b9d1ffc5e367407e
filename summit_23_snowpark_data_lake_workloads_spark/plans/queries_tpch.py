"""Extended TPC-H-shaped workload over the trimmed testdata schema.

The reference's consume layer is only a handful of query shapes
(SURVEY §2.11); these queries widen the declared workload to the
classic decision-support patterns a data-lake engine must serve —
multi-way joins with dimension broadcast, conditional aggregation,
correlated per-group thresholds, win-vs-all shares, top-1-by-group
via window max — each with a DuckDB oracle.

Schema note: the testdata is TPC-H-ish but trimmed (no partsupp, no
l_shipmode / l_receiptdate / p_container / c_phone), so Q2/Q12/Q16/
Q20/Q21 are re-expressed against available columns where the shape
survives, and skipped where it doesn't.

Determinism rules are the module-wide ones from ``queries.py``:
decimal-cast addends for money sums (order-independent), round on
both sides, unique tie-breaks under every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .queries import _money_sum, _t, query

def _disc_price() -> F.Column:
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2)::DOUBLE
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    headline=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + filter + scalar agg — the predicate-pushdown
    benchmark. All three filters reach the parquet scan (PushedFilters);
    the shuffle moves one partial sum per partition.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
                "revenue"
            )
        )
    )


@query(
    "q8_market_share",
    oracle="""
    WITH volumes AS (
        SELECT year(o_orderdate) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                          ELSE 0 END)::DOUBLE
                 / sum(volume)::DOUBLE, 6) AS mkt_share
    FROM volumes
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): six-way join, conditional share
    of a win-vs-all sum per year.

    Scale: customer/supplier/nation/region are all dimension-sized next
    to lineitem — each explicitly broadcast so the only shuffle is the
    lineitem⋈orders equi-join and the final 2-group agg. Share division
    happens once per group on exact decimal sums.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    vol = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().cast("decimal(18,4)").alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE
           AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-line profit by supplier nation and year),
    re-expressed without partsupp (the testdata has no supply cost, so
    profit degenerates to discounted revenue — the join/agg shape is
    intact).

    Scale: the part filter (`LIKE '%red%'`) lands on the broadcast side
    and prunes the fact stream at the join; supplier/nation broadcast;
    one shuffle joins lineitem⋈orders, one aggregates 25x7 groups.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(_money_sum(_disc_price(), 4).alias("sum_profit"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(
             100.00 * sum(CASE WHEN p_type = 'PROMO'
                               THEN CAST(l_extendedprice * (1 - l_discount)
                                         AS DECIMAL(18,4))
                               ELSE 0 END)::DOUBLE
             / sum(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4)))::DOUBLE, 6) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional share scalar over one
    ship-month. Part broadcasts; the date filter pushes to the scan, so
    the join touches ~1/80th of lineitem.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    dp = _disc_price().cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", dp).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum(dp).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,4))), 2)::DOUBLE AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, keep the
    max. The max-equality predicate is a window max over an unpartitioned
    frame — Spark computes it without a second scan of lineitem (the
    per-supplier aggregate is tiny: one row per supplier). Ties all
    survive, exactly like the SQL formulation; revenue is an exact
    decimal sum so the equality is portable.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _money_sum(_disc_price(), 4).alias("total_revenue")
    )
    rev = rev.withColumn(
        "max_rev", F.max("total_revenue").over(W.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    return (
        F.broadcast(supp)
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#4'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship), re-expressed over
    lineitem since the testdata has no partsupp: distinct suppliers that
    shipped each qualifying (brand, type, size).

    Scale: all three filters evaluate on the broadcast part side before
    the join; count(DISTINCT) is a two-phase hash agg (partial distinct
    per partition, exact merge) — no global sort.
    """
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    WITH agg AS (
        SELECT l_partkey AS a_partkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE / 7.0, 2)
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN agg  ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated per-part
    average quantity threshold.

    The correlated subquery decorrelates to a self-join against a
    per-part aggregate. Scale shape: the Brand#4 part filter broadcasts
    and prunes the fact stream FIRST (1/25 of parts), the per-part
    average is then computed on that pruned stream, and the agg-to-fact
    join carries NO broadcast hint — per_part has one row per part
    (20M+ rows at sf100), past any broadcast ceiling, so AQE picks the
    strategy from runtime stats. The 0.2*avg threshold is derived from
    an EXACT decimal sum divided once as double, so the float comparison
    is bit-identical in both engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    li_p = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    per_part = li_p.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li_p.join(per_part, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@query(
    "q18_large_volume",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): HAVING-subquery semi-join on
    the fact table itself, then re-aggregate with customer attributes.

    Scale: the qualifying-order set (sum qty > 300) is tiny — it
    broadcasts as a semi-join filter into the lineitem scan instead of
    shuffling the full fact table twice. Customer is NOT hinted: it
    grows with SF (15B rows at 100 TB) while the semi-filtered fact side
    is a few thousand rows — AQE broadcasts the small side at runtime.
    l_quantity sums exactly (X.0 doubles), so no decimal cast is needed.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query(
    "q13_custdist",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): LEFT join so zero-order
    customers appear (count(o_orderkey) counts non-null only), then a
    second aggregation into a histogram. The join-condition filter
    (excluding '5-LOW' priority; the testdata has no o_comment) must
    stay IN the join clause — as a WHERE it would silently turn the
    left join into an inner one and drop the zero bucket.

    Scale: first agg shuffles on c_custkey (uniform key); the histogram
    agg moves one row per distinct count — negligible.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    c_orders = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q22_idle_rich_customers",
    oracle="""
    WITH threshold AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS nation_key,
           count(*) AS numcust,
           round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2)::DOUBLE AS totacctbal
    FROM customer CROSS JOIN threshold
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): above-average-balance
    customers with no recent orders, re-keyed on c_nationkey (the
    testdata has no phone column for the country-code trick).

    Scale: the global average is a one-row broadcast (exact decimal sum
    /count, portable); the NOT EXISTS is a left-anti join against the
    date-filtered orders projection — the anti side carries only
    o_custkey through the shuffle.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _money_sum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE
           AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates), adapted to
    the testdata schema (no p_container/l_shipmode columns: brand x size
    x quantity bands carry the disjunction).

    The point of Q19 is OR-of-ANDs predicate handling: the part-only
    disjunction (brand AND size bands) is pre-applied to the part dim
    BEFORE the broadcast, so the fact stream joins against only
    potentially-matching parts; the residual brand x quantity disjunction
    evaluates post-join inside codegen. Quantity bounds are also pushed
    to the lineitem scan as a single coarse range (1..30 covers all
    arms) — parquet row groups outside any arm never decompress.
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 30))
    part = _t(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35))
    )
    arms = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(arms)
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name = 'NATION_3'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: the
    returnflag 'R' marks the at-fault lineitem (testdata has no
    commit/receipt dates). Keeps Q21's signature shape — a correlated
    EXISTS and NOT EXISTS against the same fact table.

    Scale rewrite: instead of two lineitem self-joins (the literal
    EXISTS translation — two extra shuffles of the biggest table), ONE
    per-order aggregate computes n_supp = distinct suppliers and
    n_supp_r = distinct at-fault suppliers; then
    EXISTS(other supplier)      <=> n_supp   >= 2
    NOT EXISTS(other at fault)  <=> n_supp_r == 1   (l1 itself is 'R').
    One shuffle on l_orderkey replaces both semi/anti self-joins; the
    supplier/nation dims broadcast; TakeOrderedAndProject caps the top-10.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    per_order = li.groupBy(F.col("l_orderkey").alias("po_okey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_supp_r"),
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(per_order, F.col("l_orderkey") == F.col("po_okey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_supp_r") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "q12_late_lines",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
           count(*) AS total_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-delay quality by priority), adapted:
    no l_shipmode/l_receiptdate in the testdata, so "late" = shipped
    more than 90 days after order date, split by order priority.
    Conditional sums are BIGINT-cast in the oracle (DuckDB HUGEINT
    stringification lesson from round 1).

    Scale: one fact⋈fact equi-join on the order key (both sides huge —
    sort-merge under AQE), one 5-group aggregate; the CASE evaluates in
    codegen post-join.
    """
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
    ).otherwise(0)
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(late).alias("late_lines"),
            F.count(F.lit(1)).alias("total_lines"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), regional AS (
        SELECT p_partkey, s_acctbal, s_name, n_name, unit_cost,
               min(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
        FROM supply
        JOIN part     ON l_partkey = p_partkey
                     AND p_size <= 15 AND p_type = 'PROMO'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
           round(unit_cost, 4) AS unit_cost
    FROM regional WHERE unit_cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: no partsupp table in
    the testdata, so the part-supplier relationship and its supply cost
    derive from lineitem — unit_cost = min observed l_extendedprice /
    l_quantity per (part, supplier). Keeps Q2's signature shape: a
    correlated per-part MIN over the region's suppliers deciding which
    (part, supplier) rows survive.

    Scale: the correlated subquery is re-expressed as a window MIN
    partitioned by part over the already-joined regional supply rows —
    one shuffle on l_partkey for the supply aggregate, the part filter
    and all three dimension joins (part/supplier/nation+region)
    broadcast BEFORE the window, so the window input is the filtered
    subset, not the full supply table. No self-join of the aggregate
    (the literal Q2 plan) — the window pass replaces it.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "PROMO")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    regional = (
        supply.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = W.partitionBy("p_partkey")
    return (
        regional.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH scoped AS (
        SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS val
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey AND r_name = 'ASIA'
    ), pv AS (
        SELECT l_partkey AS p_partkey, sum(val) AS value_dec
        FROM scoped GROUP BY l_partkey
    )
    SELECT p_partkey, round(value_dec, 2)::DOUBLE AS value
    FROM pv
    WHERE value_dec * 1000 > (SELECT sum(val) FROM scoped)
    ORDER BY value DESC, p_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: part value
    held by a region's suppliers = sum of their lineitem extendedprice
    (no partsupp availqty/supplycost in the testdata). Keeps Q11's
    signature shape — GROUP BY with a HAVING threshold that is a scalar
    subquery over the SAME scoped input (value > 0.1% of the global
    total).

    Scale: supplier/nation/region broadcast onto the fact scan; ONE
    shuffle produces the per-part decimal sums; the global total is the
    second-stage reduce of those partials (tiny), cross-joined back as
    a broadcast scalar — the fact table is read and shuffled once, not
    twice. Decimal addends make both sums order-independent.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    scoped = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("l_partkey"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("val"),
        )
    )
    pv = scoped.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum("val").alias("value_dec")
    )
    # threshold comparison stays in exact decimal on BOTH engines:
    # value_dec * 1000 > grand_total (a double 0.001 multiplier could
    # flip the > for a part landing within rounding distance of 0.1%)
    total = pv.agg(F.sum("value_dec").alias("grand_total"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") * F.lit(1000) > F.col("grand_total"))
        .select(
            "p_partkey",
            F.round("value_dec", 2).cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


@query(
    "q20_excess_share_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    ), shares AS (
        SELECT l_suppkey, qty,
               sum(qty) OVER (PARTITION BY l_partkey) AS part_qty
        FROM shipped
    )
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey AND r_name = 'AMERICA'
    WHERE s_suppkey IN (SELECT l_suppkey FROM shares WHERE qty > 0.3 * part_qty)
    ORDER BY s_name
    """,
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (suppliers with excess stock), adapted: no partsupp
    availqty, so "excess" = the supplier shipped more than 30% of a
    'red%' part's total 1996 volume. Keeps Q20's signature shape — a
    semi-join on a nested, per-part-correlated aggregate threshold.

    Scale: part filter broadcasts onto the fact scan (with the shipdate
    range pushed to parquet); one shuffle on (l_partkey, l_suppkey) for
    the per-pair sums; the per-part denominator is a window over those
    (already small) aggregates, NOT a second fact shuffle; the surviving
    supplier ids dedup and semi-join the supplier dim. Quantities are
    integer-valued doubles, so the sums are exact and order-independent.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    shipped = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    shares = shipped.withColumn(
        "part_qty", F.sum("qty").over(W.partitionBy("l_partkey"))
    )
    excess = (
        shares.filter(F.col("qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )
