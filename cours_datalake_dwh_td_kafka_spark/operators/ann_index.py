"""Persisted IVF index: the build/serve split of the in-query IVF search
(similarity.py). ``ivf_topk`` re-trains its quantizer and re-assigns the
corpus on every call — correct for one-shot analytics, wasteful for a
serving workload that answers many query batches against one corpus.

Index layout (plain parquet, no sidecar formats; versioned like the
lake layer so a rebuild is ATOMIC for readers):
    <index>/CURRENT                          pointer file -> live version
    <index>/v_<id>/centroids.parquet         (cell, centroid array<double>)
    <index>/v_<id>/vectors/cell=<c>/part-*.parquet  cell-PARTITIONED rows

A rebuild writes a complete NEW version directory and atomically swaps
the CURRENT pointer (tmp + rename); a reader that resolved the pointer
keeps reading its immutable version even while a rebuild lands — no
mixed old-centroids/new-vectors state, no missing-file window. Stale
versions are reclaimed by :func:`vacuum_index`.

The partitionBy("cell") layout is the mechanism, not a convenience: a
probe reads ``WHERE cell IN (...)`` and Spark's partition pruning turns
that into "open only the probed cells' directories" — the scan cost per
query batch is nprobe/n_cells of the corpus, enforced by the LAYOUT
rather than by a runtime filter (pinned by a plan test on
PartitionFilters). This is the same files-are-the-index idea behind the
lake layer's z-order/bucket levers (io.py).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.operators.similarity import (
    N_CELLS,
    NPROBE,
    TOP_K,
    QUANTIZER_SAMPLE,
    _fit_cells,
    global_topk,
)


def _current_version_dir(path: str) -> str:
    """Resolve the live version directory via the CURRENT pointer."""
    try:
        with open(os.path.join(path, "CURRENT")) as f:
            name = f.read().strip()
    except FileNotFoundError:
        raise ValueError(f"no IVF index at {path} (missing CURRENT)") from None
    return os.path.join(path, name)


def _publish_current(path: str, version_name: str) -> None:
    """Atomically point CURRENT at ``version_name`` (tmp + rename —
    last writer wins, which is the right semantic for an index refresh;
    readers that already resolved the old pointer keep their immutable
    snapshot)."""
    tmp = os.path.join(path, f"CURRENT.tmp.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(version_name)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, "CURRENT"))


def vacuum_index(path: str, grace_seconds: float = 24 * 3600) -> list[str]:
    """Delete version directories the CURRENT pointer no longer
    references (the rebuild residue). Returns removed version names.

    ``grace_seconds`` is the same retention-window guard the lake's
    vacuum uses: a version directory younger than the window is never
    swept, so a concurrent :func:`build_ivf_index` that has written its
    new ``v_*`` dir but not yet swapped CURRENT can't have it deleted
    out from under it (which would leave CURRENT pointing at a missing
    directory). Pass ``grace_seconds=0`` only when no rebuild can be
    in flight."""
    import shutil
    import time

    live = os.path.basename(_current_version_dir(path))
    cutoff = time.time() - grace_seconds
    removed = []
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if (
            name.startswith("v_")
            and name != live
            and os.path.isdir(full)
            and os.path.getmtime(full) <= cutoff
        ):
            shutil.rmtree(full)
            removed.append(name)
    return removed


def build_ivf_index(
    emb: DataFrame, path: str, n_cells: int = N_CELLS
) -> int:
    """Train the coarse quantizer (deterministic sample, O(1) in corpus
    size), assign every vector to its nearest cell (one BLAS
    mapInPandas pass, no shuffle), and persist a complete NEW index
    version, then atomically swap the CURRENT pointer — rebuild-in-place
    is safe under concurrent readers. Returns the cell count actually
    used (clamped on tiny corpora)."""
    import numpy as np

    spark = emb.sparkSession
    emb_d = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    sample_rows = (
        emb_d.orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(QUANTIZER_SAMPLE)
        .select("emb")
        .collect()
    )
    centroids = _fit_cells([r.emb for r in sample_rows], n_cells)
    n_cells = len(centroids)
    cents = np.asarray(centroids, dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["emb"].to_numpy()).astype(np.float64)
            xn = x / np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-12
            )
            pdf = pdf.copy()
            pdf["cell"] = (xn @ cents.T).argmax(axis=1).astype("int32")
            yield pdf

    assigned = emb_d.mapInPandas(
        assign, "vec_id bigint, emb array<double>, cell int"
    )
    # fresh immutable version dir; the pointer swap below is the ONLY
    # mutation readers can observe, so a half-failed build never poisons
    # the path (its unreferenced v_ dir is vacuum_index residue) and a
    # racing reader never pairs old centroids with new vectors
    version = f"v_{uuid.uuid4().hex[:12]}"
    vdir = os.path.join(path, version)
    assigned.write.partitionBy("cell").parquet(f"{vdir}/vectors")
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).write.parquet(f"{vdir}/centroids.parquet")
    os.makedirs(path, exist_ok=True)
    _publish_current(path, version)
    return n_cells


def ivf_query_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int = NPROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """Answer a (query_id, emb) batch against a persisted index.

    The centroid table is tiny (one row per cell) — collected, the
    probed cells per query are a driver-side numpy matmul (the same
    probe-assignment shape as ivf_topk). The vector scan then carries
    ``cell IN (probed)``, which partition pruning resolves to directory
    selection — the corpus outside the probed cells is never opened.
    Scoring is one BLAS mapInPandas pass with the (small) query matrix
    in the closure; the global top-k is the shared tree reduce."""
    import numpy as np

    vdir = _current_version_dir(path)
    cent_rows = spark.read.parquet(f"{vdir}/centroids.parquet").collect()
    if not cent_rows:
        raise ValueError(f"empty IVF index at {path}")
    cents = np.zeros((len(cent_rows), len(cent_rows[0].centroid)))
    for r in cent_rows:
        cents[r.cell] = r.centroid
    n_cells = len(cent_rows)
    nprobe = min(nprobe, n_cells)

    q_rows = queries.collect()
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id BIGINT, neighbor_id BIGINT, cosine DOUBLE, rn BIGINT"
        )
    qmat = np.vstack([np.asarray(r.emb, dtype=np.float64) for r in q_rows])
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qids = np.asarray([int(r.query_id) for r in q_rows])
    sims_qc = qmat @ cents.T
    cell_probes: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        order = sorted(range(n_cells), key=lambda i: (-sims_qc[qi, i], i))
        for c in order[:nprobe]:
            cell_probes.setdefault(c, []).append(qi)
    probed = sorted(cell_probes)

    vecs = spark.read.parquet(f"{vdir}/vectors").where(
        F.col("cell").isin(probed)
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for c, grp in pdf.groupby("cell", sort=False):
                probes = cell_probes.get(int(c))
                if not probes:
                    continue
                x = np.vstack(grp["emb"].to_numpy()).astype(np.float64)
                xn = x / np.maximum(
                    np.linalg.norm(x, axis=1, keepdims=True), 1e-12
                )
                sims = qmat[probes] @ xn.T
                ids = grp["vec_id"].to_numpy()
                for row, qi in enumerate(probes):
                    mask = ids != qids[qi]
                    if not mask.any():
                        continue
                    out.append(
                        pd.DataFrame(
                            {
                                "query_id": qids[qi],
                                "neighbor_id": ids[mask],
                                "cosine": np.round(sims[row][mask], 6),
                            }
                        )
                    )
            if out:
                yield pd.concat(out, ignore_index=True)

    scored = vecs.mapInPandas(
        score, "query_id bigint, neighbor_id bigint, cosine double"
    )
    return global_topk(scored, top_k)
