"""Build the 10x replicated lake used by README's "Measured scale-up"
table (rounds 4-5): sf0.1 replicated 10x into a ~sf1 lake at
``--out`` (default /tmp/sf1x) with structure-PRESERVING perturbations,
so per-query cost scales like real data rather than like 10 identical
shards:

- documents: per-replica token tagging (every word of replica r > 0 gets
  an ``x{r}`` suffix) — within-replica shingle/minhash structure is
  identical, cross-replica similarity is destroyed, so dedup candidate
  counts grow linearly, not 100x;
- embeddings: per-replica SIGNED PERMUTATION of the dimensions (roll by
  r, flip signs on a r-dependent stripe) — an orthogonal transform, so
  within-replica cosines/norms are bit-preserved while cross-replica
  neighborhoods decorrelate;
- events: user ids shifted per replica (same per-user group sizes and
  skew, 10x rows);
- lineitem: order/part/supp keys shifted per replica (same join
  fan-outs, 10x rows).

Run, then point bench at it:

    python tools/make_10x_lake.py --out /tmp/sf1x
    SPARK_GRAFT_SF_DIR=/tmp/sf1x python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as `python tools/make_10x_lake.py` from the repo root or
# anywhere else — the package lives next to this file's parent dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1x")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument(
        "--tables",
        default="documents,embeddings,events,lineitem",
        help="comma list of the big tables to replicate (round 14: the "
        "100x curves only need documents+events — replication is "
        "embarrassingly parallel, so build only what the measurement "
        "reads; small dims always copy through)",
    )
    args = ap.parse_args()
    tables = {t.strip() for t in args.tables.split(",") if t.strip()}

    from pyspark.sql import functions as F

    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.session import get_spark

    spark = get_spark()
    os.makedirs(args.out, exist_ok=True)
    R = args.replicas

    def union_all(parts):
        out = parts[0]
        for x in parts[1:]:
            out = out.unionByName(x)
        return out

    if "documents" in tables:
        d = load_table(spark, args.sf_dir, "documents")
        # n_chars is recomputed from the PERTURBED text (replica r > 0 gains
        # an x{r} suffix per word) so length-derived metrics — quality-score
        # divisors, weighted_sample keys, dq audits — stay internally
        # consistent on every replica, not just replica 0.
        union_all(
            [
                d.select(
                    (F.col("doc_id") + F.lit(r * 1_000_000)).alias("doc_id"),
                    (
                        F.regexp_replace(F.col("text"), r"(\w+)", f"$1x{r}")
                        if r
                        else F.col("text")
                    ).alias("text"),
                    "lang",
                    "source",
                ).withColumn("n_chars", F.length("text").cast("long"))
                for r in range(R)
            ]
        ).write.mode("overwrite").parquet(f"{args.out}/documents.parquet")

    if "embeddings" in tables:
        e = load_table(spark, args.sf_dir, "embeddings")
        dim = len(e.select("embedding").first()[0])
        reps = []
        for r in range(R):
            if r == 0:
                emb = F.col("embedding")
            else:
                # signed permutation: dim i of the output takes dim
                # (i + r) % dim of the input, sign-flipped when i < r —
                # orthogonal, so within-replica geometry is exact
                emb = F.array(
                    *[
                        (F.lit(-1.0) if i < r else F.lit(1.0))
                        * F.col("embedding")[(i + r) % dim]
                        for i in range(dim)
                    ]
                )
            reps.append(
                e.select(
                    (F.col("vec_id") + F.lit(r * 1_000_000)).alias("vec_id"),
                    emb.alias("embedding"),
                    "label",
                )
            )
        union_all(reps).write.mode("overwrite").parquet(
            f"{args.out}/embeddings.parquet"
        )

    if "events" in tables:
        ev = load_table(spark, args.sf_dir, "events")
        union_all(
            [
                ev.select(
                    (F.col("event_id") + F.lit(r * 100_000_000)).alias(
                        "event_id"
                    ),
                    "ts",
                    (F.col("user_id") + F.lit(r * 1_000_000)).alias("user_id"),
                    "event_type",
                    "value",
                    "props",
                )
                for r in range(R)
            ]
        ).write.mode("overwrite").parquet(f"{args.out}/events.parquet")

    if "lineitem" in tables:
        li = load_table(spark, args.sf_dir, "lineitem")
        union_all(
            [
                li.select(
                    (F.col("l_orderkey") + F.lit(r * 10_000_000)).alias(
                        "l_orderkey"
                    ),
                    (F.col("l_partkey") + F.lit(r * 1_000_000)).alias(
                        "l_partkey"
                    ),
                    (F.col("l_suppkey") + F.lit(r * 1_000_000)).alias(
                        "l_suppkey"
                    ),
                    "l_linenumber",
                    "l_quantity",
                    "l_extendedprice",
                    "l_discount",
                    "l_tax",
                    "l_returnflag",
                    "l_linestatus",
                    "l_shipdate",
                )
                for r in range(R)
            ]
        ).write.mode("overwrite").parquet(f"{args.out}/lineitem.parquet")

    # small dims copy through unchanged (broadcast sides don't scale)
    import shutil

    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
    ):
        src = os.path.join(args.sf_dir, f"{t}.parquet")
        dst = os.path.join(args.out, f"{t}.parquet")
        if os.path.isfile(src):
            shutil.copyfile(src, dst)
        elif os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
    print("built", sorted(os.listdir(args.out)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
