"""Second batch of TPC-H-shaped analytics (see tpch_shapes.py for the
first): the Q6 (scan-only forecast), Q11 (global-share HAVING), Q13
(left-join count distribution), Q15 (argmax-over-aggregate), Q17
(correlated per-group average), Q18 (IN-aggregate large orders), Q19
(disjunctive multi-bracket predicate) and Q22 (scalar-subquery +
anti-join) shapes, adapted to this lake's schema (no partsupp /
l_commitdate / l_shipmode columns — course analog: the two-table joins
of work/Intro_pySpark.ipynb:1158 these plans grow out of).

Shared scale discipline (same as tpch_shapes.py):
- scan-side filters stay below every join (PushedFilters prune before
  any exchange);
- scalar aggregates (corpus totals, max revenue, average balance) ride
  ONE broadcast row via crossJoin(broadcast(...)) — never a global
  window, which would funnel the table through one reducer;
- money math: exact decimal(28,6) sums, one rounding, then double cast
  — identical algebra in the DuckDB oracle. Threshold comparisons
  against scalars cast decimal -> double FIRST on both engines, then
  compare (one cast + one multiply each side, IEEE-deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.relational import dec_sum
from cours_datalake_dwh_td_kafka_spark.registry import register

# ---------------------------------------------------------------------------
# Q6 shape: forecast revenue change — scan, filter, one global sum.
# ---------------------------------------------------------------------------
_Q6_LO, _Q6_HI = "1997-01-01", "1998-01-01"

_FORECAST_SQL = f"""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice * l_discount
                 AS DECIMAL(28,6))) AS DOUBLE), 2) AS forecast_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q6_LO}'
      AND l_shipdate <  TIMESTAMP '{_Q6_HI}'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@register("forecast_revenue", _FORECAST_SQL)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue that would be gained by eliminating
    mid-band discounts for a year. The whole query is a single scan —
    all three predicates push into the parquet reader (year range maps
    to row-group min/max pruning), the sum partial-aggregates map-side,
    and exactly one row crosses the exchange. The canonical
    'is-the-scan-path-clean' probe: any plan wider than
    scan->filter->partial->final agg is a regression."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= _Q6_LO)
            & (F.col("l_shipdate") < _Q6_HI)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "forecast_revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q11 shape: parts whose revenue exceeds a fraction of the corpus total.
# ---------------------------------------------------------------------------
_Q11_FRACTION = 0.0008

_TOP_REV_PARTS_SQL = f"""
    WITH pr AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(28,6))) AS rev
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(rev) AS DOUBLE) AS total_rev FROM pr)
    SELECT l_partkey, ROUND(CAST(rev AS DOUBLE), 2) AS part_revenue
    FROM pr CROSS JOIN tot
    WHERE CAST(rev AS DOUBLE) > total_rev * {_Q11_FRACTION}
    ORDER BY part_revenue DESC, l_partkey
"""


@register("top_revenue_parts", _TOP_REV_PARTS_SQL)
def q_top_revenue_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp in this lake, so value = lineitem
    revenue): parts holding more than a fixed fraction of total
    revenue. The per-part aggregate feeds both the output rows and the
    global-total scalar; materialized once (lazy localCheckpoint,
    O(parts) rows) so the second use reads the tiny aggregate instead
    of re-scanning and re-shuffling the fact table. The share threshold
    compares doubles cast from the exact decimal sums — one cast and
    one multiply per side on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pr = li.groupBy("l_partkey").agg(
        F.sum(rev.cast("decimal(28,6)")).alias("rev")
    ).localCheckpoint(eager=False)
    tot = pr.agg(F.sum("rev").cast("double").alias("total_rev"))
    return (
        pr.crossJoin(F.broadcast(tot))
        .where(
            F.col("rev").cast("double")
            > F.col("total_rev") * F.lit(_Q11_FRACTION)
        )
        .select(
            "l_partkey",
            F.round(F.col("rev").cast("double"), 2).alias("part_revenue"),
        )
        .orderBy(F.desc("part_revenue"), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q13 shape: distribution of orders-per-customer (incl. zero).
# ---------------------------------------------------------------------------
_CUSTDIST_SQL = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@register("customer_order_distribution", _CUSTDIST_SQL)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... non-urgent
    orders. The join-condition filter (priority <> URGENT) belongs in
    the JOIN's ON clause, not a WHERE — a WHERE would turn the left
    join inner and silently drop zero-order customers. COUNT(column)
    counts only matched rows, so unmatched customers land in the
    c_count=0 bucket. Two aggregations: the first shuffles on custkey
    (same key as the join — AQE reuses the exchange), the second on the
    tiny c_count domain."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q15 shape: the supplier(s) with the maximum quarterly revenue.
# ---------------------------------------------------------------------------
_Q15_LO, _Q15_HI = "1997-01-01", "1997-04-01"

_TOP_SUPPLIER_SQL = f"""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(28,6))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
          AND l_shipdate <  TIMESTAMP '{_Q15_HI}'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           ROUND(CAST(r.total_rev AS DOUBLE), 2) AS total_rev
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    CROSS JOIN (SELECT MAX(total_rev) AS max_rev FROM rev) m
    WHERE r.total_rev = m.max_rev
    ORDER BY s.s_suppkey
"""


@register("top_supplier", _TOP_SUPPLIER_SQL)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) whose quarter revenue equals the
    maximum. The argmax is a broadcast scalar join against the
    aggregate — NOT a global window rank, which would sort every
    supplier's row through one reducer at scale. The equality compares
    the exact decimal sums (order-insensitive), so ties surface
    deterministically on both engines; rounding happens only in the
    output column."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _Q15_LO) & (F.col("l_shipdate") < _Q15_HI)
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # the per-supplier aggregate feeds both the argmax scalar and the
    # output join: materialize it once (O(suppliers) rows) rather than
    # re-scanning the quarter's lineitems for the MAX branch
    rev = li.groupBy("l_suppkey").agg(
        F.sum(vol.cast("decimal(28,6)")).alias("total_rev")
    ).localCheckpoint(eager=False)
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 2).alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 shape: revenue from small-quantity lines of one brand.
# ---------------------------------------------------------------------------
_Q17_BRAND = "Brand#3"

_SMALL_QTY_SQL = f"""
    WITH brand_li AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = '{_Q17_BRAND}'
    ),
    pq AS (
        SELECT l_partkey,
               SUM(l_quantity) / COUNT(*) AS avg_qty
        FROM brand_li GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(b.l_extendedprice AS DECIMAL(28,6)))
                 AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM brand_li b
    JOIN pq ON pq.l_partkey = b.l_partkey
    WHERE b.l_quantity < 0.2 * pq.avg_qty
"""


@register("small_quantity_revenue", _SMALL_QTY_SQL)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly-averaged revenue from lines of one brand
    ordered below 20% of that part's average quantity. The correlated
    AVG decorrelates to a per-part aggregate joined back on partkey —
    and the brand filter is applied BEFORE the aggregate (restricting
    which parts get an average cannot change any part's average), so
    the heavy per-part pass runs over the brand's ~4% slice, not the
    whole fact table. Quantities are integers in doubles, so
    SUM/COUNT (written explicitly instead of AVG on both engines) is
    exact and the 0.2x threshold is IEEE-deterministic."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == _Q17_BRAND)
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # the brand slice (~1/25 of the fact table) feeds both the per-part
    # average and the revenue branch: materialize the slice once instead
    # of scanning + broadcast-joining the full fact table twice
    brand_li = li.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    ).drop("p_partkey").localCheckpoint(eager=False)
    pq = brand_li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        brand_li.join(
            F.broadcast(pq), F.col("l_partkey") == F.col("pq_partkey")
        )
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast(
                    "double"
                )
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q18 shape: customers behind the largest orders.
# ---------------------------------------------------------------------------
_Q18_QTY = 350

_LARGE_ORDERS_SQL = f"""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > {_Q18_QTY}
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
"""


@register("large_orders", _LARGE_ORDERS_SQL)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the customers behind orders totalling more than
    350 units. The IN-aggregate is a semi-join against the HAVING
    aggregate; the surviving key set is tiny (a handful of orders), so
    it broadcasts and prunes both fact scans before the customer join.
    Quantity sums are integer-exact in doubles; the BIGINT cast
    normalizes the output type across engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > _Q18_QTY)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(
            F.broadcast(big), F.col("l_orderkey") == F.col("big_orderkey")
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive multi-bracket revenue.
# ---------------------------------------------------------------------------
_Q19_BRACKETS = (
    ("Brand#1", 1, 15, 1, 11),
    ("Brand#2", 1, 25, 10, 20),
    ("Brand#3", 1, 35, 20, 30),
)

_DISJUNCTIVE_SQL = """
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {brackets}
""".format(
    brackets=" OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi}"
        f" AND l.l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in _Q19_BRACKETS
    )
)


@register("disjunctive_revenue", _DISJUNCTIVE_SQL)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three (brand, size, quantity)
    brackets OR-ed together. The mixed-table disjunction cannot push
    below the join as-is, so the IMPLIED single-table supersets are
    added explicitly — brand IN (the three brands) + max size bound on
    the part scan, quantity within the union of the quantity ranges on
    the lineitem scan. They are redundant with the residual OR (same
    result set) but reach the parquet readers as PushedFilters,
    shrinking both join inputs — the classic hand-CNF that Catalyst
    does not derive on its own."""
    brands = [b for b, *_ in _Q19_BRACKETS]
    max_size = max(shi for _, _, shi, _, _ in _Q19_BRACKETS)
    qty_lo = min(qlo for *_, qlo, _ in _Q19_BRACKETS)
    qty_hi = max(qhi for *_, _, qhi in _Q19_BRACKETS)
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_brand").isin(brands) & (F.col("p_size") <= max_size)
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").between(qty_lo, qty_hi)
    )
    bracket = None
    for b, slo, shi, qlo, qhi in _Q19_BRACKETS:
        clause = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        bracket = clause if bracket is None else (bracket | clause)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(bracket)
        .agg(dec_sum(rev).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q22 shape: well-funded customers gone quiet.
# ---------------------------------------------------------------------------
_Q22_CUTOFF = "1999-01-01"

_IDLE_CUSTOMERS_SQL = f"""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(*) AS threshold
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6)))
                 AS DOUBLE), 2) AS total_balance
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.threshold
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}'
      )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
"""


@register("idle_customer_balance", _IDLE_CUSTOMERS_SQL)
def q_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per segment, customers whose balance beats the
    positive-balance average but who placed no order since the cutoff
    (this lake's every customer has SOME order, so the anti-join is
    time-scoped). The average is an exact decimal sum / count cast to
    double — one broadcast scalar row; the NOT EXISTS is a LEFT ANTI
    join whose right side carries only the filtered custkeys (project-
    before-join: keys only cross the shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("threshold")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= _Q22_CUTOFF)
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("threshold"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum(F.col("c_acctbal")).alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Q8 shape: one nation's market share inside a region, by year.
# ---------------------------------------------------------------------------
_Q8_NATION = "NATION_1"
_Q8_REGION = "EUROPE"

_MARKET_SHARE_SQL = f"""
    SELECT o_year,
           ROUND(
             CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}'
                           THEN volume
                           ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT year(o.o_orderdate) AS o_year,
               CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(28,6)) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = '{_Q8_REGION}'
    ) t
    GROUP BY o_year
    ORDER BY o_year
"""


@register("nation_market_share", _MARKET_SHARE_SQL)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the share of one supplier nation in the revenue
    bought by one region's customers, per year. The region filter
    collapses the customer-side dim chain BEFORE it touches the fact
    table — region -> nation is folded into one broadcast key list, so
    customers outside the region drop at their first (broadcast) join
    and the fact shuffle carries only in-region orders. Both sums
    accumulate exactly in decimal and divide once as doubles (the
    promo_revenue_share discipline), so the yearly shares hash-match."""
    r = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == _Q8_REGION
    )
    n1 = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cust_nkey"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    zero = F.lit(0).cast("decimal(28,6)")
    in_region_cust = c.join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nkey")
    ).select("c_custkey")
    nat_share = F.sum(
        F.when(F.col("supp_nation") == _Q8_NATION, vol).otherwise(zero)
    ).cast("double")
    total = F.sum(vol).cast("double")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(in_region_cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("supp_nkey") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(nat_share / total, 6).alias("mkt_share"))
        .orderBy("o_year")
    )
