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
