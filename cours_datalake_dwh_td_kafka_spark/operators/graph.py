"""Iterative graph analytics over lake-derived graphs: PageRank on the
part co-purchase graph (parts sharing an order, the classic
recommendation graph; course analog: the reference's two-table joins,
work/Intro_pySpark.ipynb:1158, never iterate). Companion to the
connected-components operator in dedup.py — together they cover the two
standard message-passing shapes (min-label convergence, weighted-sum
power iteration).

Unlike LDA/IVF (rows-only by necessity), this iterative operator IS
value-oracled: a FIXED iteration count unrolls into chained CTEs on the
DuckDB side, and both engines follow the same exact algebra per step —
decimal(38,18) contribution sums, one ROUND(.,12) per iteration — so
ranks match bit-for-bit after 10 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.registry import register

PAGERANK_ITERS = 4
PAGERANK_DAMPING = 0.85
PAGERANK_TELEPORT = 0.15
PAGERANK_TOP_K = 20


def _pagerank_sql(iters: int = PAGERANK_ITERS, top_k: int = PAGERANK_TOP_K) -> str:
    steps = []
    for t in range(iters):
        steps.append(
            f"""r{t + 1} AS (
      SELECT n.node,
             ROUND({PAGERANK_TELEPORT} / nn.n
                   + {PAGERANK_DAMPING} * CAST(COALESCE(SUM(
                       CAST(r{t}.rank / d.deg AS DECIMAL(38,18))
                     ), 0) AS DOUBLE), 12) AS rank
      FROM nodes n
      CROSS JOIN nn
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN r{t} ON r{t}.node = e.src
      LEFT JOIN deg d ON d.node = e.src
      GROUP BY n.node, nn.n
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (
      SELECT node, ROUND(1.0 / nn.n, 12) AS rank FROM nodes CROSS JOIN nn
    ),
    {chain}
    SELECT node AS part, rank
    FROM r{iters}
    ORDER BY rank DESC, part
    LIMIT {top_k}
"""


def copurchase_edges(li: DataFrame) -> DataFrame:
    """Directed co-purchase edges: (src, dst) for every ordered pair of
    distinct parts sharing an order. The self-join key is the order id,
    so fan-out per order is lines² — bounded by the few lines an order
    has, NOT corpus-scale (same per-key-bounded-blowup argument as the
    grid KNN join). DISTINCT collapses repeat co-purchases."""
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")
    )
    return (
        a.join(b, "ok")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = PAGERANK_ITERS,
    damping: float = PAGERANK_DAMPING,
) -> DataFrame:
    """Power-iteration PageRank over a (src, dst) edge table, returning
    (node, rank) after ``iters`` rounds.

    Semantics: simplified PageRank restricted to nodes that appear as a
    source (every node of the symmetric co-purchase graph has both
    directions, so no dangling-mass redistribution is needed; on a
    graph with sinks, add it before trusting the ranks).

    Scale shape per iteration: one equi-join of the rank vector against
    the degree-annotated edge list on src (built ONCE outside the loop
    — the edge/degree join does not vary), one aggregation on dst, one
    left join back onto the node set for teleport-only nodes. State
    between rounds is the O(nodes) rank vector, localCheckpoint-ed
    every CHECKPOINT_EVERY rounds (same lineage-bounding trick as
    dedup_clusters, amortized: a short join chain between checkpoints
    is fine; an unbounded one is not). A lost executor re-reads the
    last checkpoint, not the whole chain.

    Cross-engine exactness: the per-node inbound sum accumulates in
    decimal(38,18) (order-insensitive), is damped in doubles, and is
    rounded to 12 dp before feeding the next round — the rank vector
    is therefore IDENTICAL on both engines at every iteration, not
    just close at the last one."""
    checkpoint_every = 2
    teleport = 1.0 - damping
    edges = edges.localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        # empty graph: 1/n below would constant-fold to a divide-by-zero
        # under ANSI mode before any row could even exist
        return nodes.select(
            "node", F.lit(None).cast("double").alias("rank")
        )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # the per-iteration message structure never changes: annotate each
    # edge with its source degree ONCE, outside the loop
    e2 = edges.join(deg, "src").localCheckpoint(eager=True)
    ranks = nodes.select(
        "node", F.round(F.lit(1.0) / n, 12).alias("rank")
    )
    for it in range(iters):
        contribs = e2.join(ranks, e2.src == ranks.node).select(
            F.col("dst"),
            (F.col("rank") / F.col("deg")).cast("decimal(38,18)").alias(
                "contrib"
            ),
        )
        inbound = contribs.groupBy("dst").agg(
            F.sum("contrib").cast("double").alias("s")
        )
        ranks = nodes.join(
            inbound, nodes.node == inbound.dst, "left"
        ).select(
            "node",
            F.round(
                F.lit(teleport) / n
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                12,
            ).alias("rank"),
        )
        if (it + 1) % checkpoint_every == 0 or it == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


@register("pagerank_copurchase", _pagerank_sql())
def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    ranks = pagerank(copurchase_edges(li))
    return (
        ranks.select(F.col("node").alias("part"), "rank")
        .orderBy(F.desc("rank"), "part")
        .limit(PAGERANK_TOP_K)
    )


# ---------------------------------------------------------------------------
# association rules over the same baskets: support / confidence / lift
# ---------------------------------------------------------------------------
BASKET_MIN_PAIR = 3
BASKET_TOP_N = 20

_LIFT_SQL = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT basket) AS DOUBLE) AS n_baskets
          FROM items),
    item_n AS (
      SELECT item, COUNT(*) AS n_item FROM items GROUP BY item
    ),
    pair_n AS (
      SELECT a.item AS part_a, b.item AS part_b, COUNT(*) AS n_pair
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= {BASKET_MIN_PAIR}
    )
    SELECT part_a, part_b, CAST(n_pair AS BIGINT) AS n_pair,
           ROUND(n_pair / n.n_baskets, 6) AS support,
           ROUND(CAST(n_pair AS DOUBLE) / ia.n_item, 6) AS confidence,
           ROUND(n_pair * n.n_baskets / (ia.n_item * CAST(ib.n_item
                 AS DOUBLE)), 6) AS lift
    FROM pair_n
    JOIN item_n ia ON ia.item = part_a
    JOIN item_n ib ON ib.item = part_b
    CROSS JOIN n
    ORDER BY lift DESC, part_a, part_b
    LIMIT {BASKET_TOP_N}
"""


@register("market_basket_lift", _LIFT_SQL)
def q_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: the top part pairs by lift
    (n_pair * N / (n_a * n_b)) with support and confidence — the
    frequent-itemset mining step product analytics runs over the same
    co-purchase structure PageRank above ranks.

    Scale shape: distinct (basket, item) once; the pair join is keyed on
    the basket id, fan-out bounded by basket size squared (the KNN-grid
    argument again); the min-pair HAVING prunes the long tail BEFORE the
    two item-frequency joins; item counts broadcast (one row per part).
    All ratios are exact-integer arithmetic in doubles (counts << 2^53),
    rounded once — bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    items = li.distinct().localCheckpoint(eager=False)  # 3 consumers below
    n_baskets = items.select("basket").distinct().count()
    item_n = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a = items.select("basket", F.col("item").alias("part_a"))
    b = items.select("basket", F.col("item").alias("part_b"))
    pair_n = (
        a.join(b, "basket")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= BASKET_MIN_PAIR)
    )
    ia = item_n.select(
        F.col("item").alias("ia_item"), F.col("n_item").alias("n_a")
    )
    ib = item_n.select(
        F.col("item").alias("ib_item"), F.col("n_item").alias("n_b")
    )
    nb = float(n_baskets)
    return (
        pair_n.join(F.broadcast(ia), F.col("part_a") == F.col("ia_item"))
        .join(F.broadcast(ib), F.col("part_b") == F.col("ib_item"))
        .select(
            "part_a",
            "part_b",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.round(F.col("n_pair") / nb, 6).alias("support"),
            F.round(
                F.col("n_pair").cast("double") / F.col("n_a"), 6
            ).alias("confidence"),
            F.round(
                F.col("n_pair") * nb
                / (F.col("n_a") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(BASKET_TOP_N)
    )


# ---------------------------------------------------------------------------
# triangle counting over the same co-purchase graph (degree-ordered)
# ---------------------------------------------------------------------------
TRIANGLE_TOP_N = 20

_TRIANGLE_SQL = f"""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    members AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node AS part, COUNT(*) AS n_triangles
    FROM members
    GROUP BY node
    ORDER BY n_triangles DESC, part
    LIMIT {TRIANGLE_TOP_N}
"""


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected edge table (directed
    (src, dst) pairs in both orientations, as :func:`copurchase_edges`
    emits). Classic clustering-coefficient numerator: which parts sit in
    densely co-purchased cliques.

    Scale shape (the MapReduce triangle recipe of Suri & Vassilvitskii,
    WWW'11): orient every edge from the lower-(degree, id) endpoint to
    the higher — each triangle then has EXACTLY one wedge whose center
    is its lowest-ranked vertex, and the wedge-closing join counts it
    once. Degree-ordering bounds each vertex's out-degree by O(sqrt(m))
    regardless of how big a hub it is, so the wedge fan-out — the step
    that explodes on skewed graphs if you orient by id alone — stays
    O(m^1.5) worst-case with NO hot key: a celebrity node of degree d
    contributes d wedges as a spoke, not d^2 as a center. Both joins
    are plain equi-joins (wedge: on the center; closure: on the
    (lo, hi) edge key); nothing is ever collected."""
    # the canonical edge set feeds FOUR consumers (degrees, orientation,
    # both closure probes) — materialize the order self-join + distinct
    # once instead of recomputing the corpus-scale upstream per consumer
    und = (
        edges.where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ranked = und.join(du, "u").join(dv, "v")
    fwd = F.col("du") < F.col("dv")
    tie = (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    directed = ranked.select(
        F.when(fwd | tie, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(fwd | tie, F.col("v")).otherwise(F.col("u")).alias("hi"),
    ).localCheckpoint(eager=False)
    # CENTER-based wedges: both spokes leave the triangle's lowest-ranked
    # vertex, and hi1 < hi2 emits each unordered spoke pair once —
    # sum_v C(outdeg_v, 2) wedge rows, half the path-based (a->b->c) form
    w1 = directed.select("lo", F.col("hi").alias("b"))
    w2 = directed.select(F.col("lo").alias("lo2"), F.col("hi").alias("c"))
    wedges = (
        w1.join(w2, F.col("lo") == F.col("lo2"))
        .where(F.col("b") < F.col("c"))
        .select(F.col("lo").alias("a"), "b", "c")
    )
    # closure probes the UNDIRECTED canonical edge set: the spokes' ends
    # are id-ordered (b < c) but their degree-rank order is unknown
    closing = und.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    tri = wedges.join(
        closing,
        (F.col("b") == F.col("x")) & (F.col("c") == F.col("y")),
    ).select("a", "b", "c")
    members = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return members.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


@register("triangle_count", _TRIANGLE_SQL)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    return (
        triangle_counts(copurchase_edges(li))
        .select(F.col("node").alias("part"), "n_triangles")
        .orderBy(F.desc("n_triangles"), "part")
        .limit(TRIANGLE_TOP_N)
    )


# ---------------------------------------------------------------------------
# beyond-ref: degree distribution of the co-purchase graph
# ---------------------------------------------------------------------------
_DEGREE_DIST_SQL = """
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src AS node, COUNT(*) AS degree FROM edges GROUP BY src)
    SELECT CAST(FLOOR(LOG2(degree)) AS INT) AS log2_bucket,
           CAST(POW(2, FLOOR(LOG2(degree))) AS BIGINT) AS bucket_min_degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(degree) AS BIGINT) AS min_degree,
           CAST(MAX(degree) AS BIGINT) AS max_degree
    FROM deg
    GROUP BY 1, 2
    ORDER BY log2_bucket
"""


def degree_distribution(li: DataFrame) -> DataFrame:
    """Log2-bucketed out-degree histogram of the co-purchase graph —
    the first diagnostic before any graph algorithm (PageRank /
    triangles): a heavy tail here predicts hub-induced skew in every
    subsequent neighborhood join, and the bucket counts are what sizes
    the degree-ordering defence (graph.triangle_count) against.

    Scale shape: edges come from the same per-order bounded self-join
    as PageRank (fan-out = order line count squared, never corpus
    scale), degree is one keyed count, the histogram is a ~log(max
    degree)-group aggregate. Integer-exact throughout; LOG2 only
    buckets integers (exact for any degree < 2^53)."""
    deg = copurchase_edges(li).groupBy(
        F.col("src").alias("node")
    ).agg(F.count(F.lit(1)).alias("degree"))
    bucket = F.floor(F.log2("degree")).cast("int")
    return (
        deg.groupBy(bucket.alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.min("degree").cast("bigint").alias("min_degree"),
            F.max("degree").cast("bigint").alias("max_degree"),
        )
        .select(
            "log2_bucket",
            F.pow(F.lit(2.0), F.col("log2_bucket").cast("double"))
            .cast("bigint")
            .alias("bucket_min_degree"),
            "n_nodes",
            "min_degree",
            "max_degree",
        )
        .orderBy("log2_bucket")
    )


@register("degree_distribution", _DEGREE_DIST_SQL)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degree_distribution(load_table(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# beyond-ref: connected components of the co-purchase graph (hash-min)
# ---------------------------------------------------------------------------
#: minimum distinct-order co-purchase support for a CC edge — prunes the
#: one-off clique blowup (every multi-line order connects all its parts)
#: down to REPEATED co-purchases, the market-basket convention
CC_MIN_SUPPORT = 2

_COMPONENTS_SQL = f"""
    WITH RECURSIVE edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.l_orderkey) >= {CC_MIN_SUPPORT}
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    comp AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
    sizes AS (SELECT comp, COUNT(*) AS sz FROM comp GROUP BY comp)
    SELECT CAST(FLOOR(LOG2(sz)) AS INT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_components,
           CAST(MIN(sz) AS BIGINT) AS min_size,
           CAST(MAX(sz) AS BIGINT) AS max_size,
           CAST(SUM(sz) AS BIGINT) AS n_nodes
    FROM sizes
    GROUP BY 1
    ORDER BY log2_bucket
"""


def graph_components(li: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components of the co-purchase graph by hash-min label
    propagation, summarized as a log2 histogram of component sizes —
    the fragmentation diagnostic behind dedup clustering and any
    "related products" feature: one giant component means transitive
    similarity chains everything together; many small ones mean the
    graph is actually informative.

    Scale shape: the same bounded per-order edge self-join as PageRank,
    then a support filter (>= CC_MIN_SUPPORT distinct orders) that prunes
    the one-off clique noise every multi-line order injects — the
    market-basket convention, and what keeps both the component
    structure informative and the oracle's transitive closure bounded;
    each round is ONE (edge join + node-keyed min) — the standard
    distributed CC (hash-min), rounds bounded by the graph diameter
    with an early exit when a round changes no label (the change count
    is a one-scalar driver read per round, the PageRank convention, and
    at most ``max_iters`` rounds run). The inter-round state is the
    O(nodes) label vector, localCheckpoint-ed so lineage doesn't stack.
    Oracle: DuckDB transitive closure via recursive CTE + MIN — a
    different algorithm entirely, so agreement pins semantics, not
    implementation. For path-compressed O(log n) rounds at web scale,
    swap in the star-contraction kernel dedup_clusters already uses."""
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")
    )
    edges = (
        a.join(b, "ok")
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count_distinct(F.col("ok")).alias("support"))
        .where(F.col("support") >= CC_MIN_SUPPORT)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # candidate label per node: min over (its own, each neighbor's)
        neigh = (
            edges.join(
                labels.withColumnRenamed("node", "dst").withColumnRenamed(
                    "comp", "n_comp"
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("n_comp").alias("n_comp"))
        )
        stepped = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))
                ).alias("comp"),
            )
            # the pointer jump below self-joins this frame: pin ONE
            # materialization so the edge-join subtree doesn't run twice
            # per round (the shared-subtree convention)
            .localCheckpoint(eager=False)
        )
        # pointer jump: comp := min(comp, comp[comp]) — a label is always
        # itself a node id, so chasing one hop of the label chain per
        # round turns the O(diameter) propagation into O(log diameter)
        # (the pointer-doubling half of star contraction)
        jump = stepped.select(
            F.col("node").alias("j_node"), F.col("comp").alias("j_comp")
        )
        nxt = (
            stepped.join(
                jump, stepped["comp"] == jump["j_node"], "left"
            )
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("j_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            nxt.join(
                labels.withColumnRenamed("comp", "old"), "node"
            )
            .where(F.col("comp") != F.col("old"))
            .count()
        )
        labels = nxt
        if changed == 0:
            break
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("sz"))
    bucket = F.floor(F.log2("sz")).cast("int")
    return (
        sizes.groupBy(bucket.alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_components"),
            F.min("sz").cast("bigint").alias("min_size"),
            F.max("sz").cast("bigint").alias("max_size"),
            F.sum("sz").cast("bigint").alias("n_nodes"),
        )
        .orderBy("log2_bucket")
    )


@register("graph_components", _COMPONENTS_SQL)
def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph_components(load_table(spark, sf_dir, "lineitem"))
