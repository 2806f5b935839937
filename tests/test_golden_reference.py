"""Golden-file parity: replay the reference's committed sessionization
output (work/data/trajets_csv/part-00000-*.csv) through our ``sessionize``
on the reference's own Cyclistes input CSVs.

This pins REFERENCE semantics directly — the `+1`-minute duration rule
(work/TD_pySpark.ipynb:399-405), trip numbering via the running sum of
mount transitions (work/TD_pySpark.ipynb:303-322), avg speed over active
rows only — rather than transitively through the DuckDB oracle. If any of
those details drift, this test fails on the reference's own 1764 rows.
"""

from __future__ import annotations

import csv
import glob
import math
import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.operators.sessionization import sessionize

REF_DATA = "/root/reference/work/data"
GOLDEN_GLOB = f"{REF_DATA}/trajets_csv/part-*.csv"
CYCLISTES_DIR = f"{REF_DATA}/Cyclistes"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CYCLISTES_DIR) or not glob.glob(GOLDEN_GLOB),
    reason="reference repo data not mounted",
)


def _load_golden() -> dict[tuple[int, int], tuple[float, float, float, float]]:
    """(id, numero) -> (debut_epoch, fin_epoch, vitesse_moyenne, duree_min)."""
    out = {}
    with open(glob.glob(GOLDEN_GLOB)[0], newline="") as fh:
        for row in csv.DictReader(fh):
            key = (int(row["id"]), int(row["numero_de_trajet"]))
            debut = datetime.fromisoformat(
                row["debut_trajet"].replace("Z", "+00:00")
            ).timestamp()
            fin = datetime.fromisoformat(
                row["fin_trajet"].replace("Z", "+00:00")
            ).timestamp()
            out[key] = (
                debut,
                fin,
                float(row["vitesse_moyenne"]),
                float(row["duree_trajet_min"]),
            )
    return out


def test_sessionize_replays_reference_golden_output(spark):
    golden = _load_golden()
    assert len(golden) == 1764  # committed reference output size
    # the reference committed outputs for 50 cyclists but only 31 input
    # files; replay is only possible for the ids whose input is present
    input_ids = {
        int(os.path.basename(p).split("_")[1].split(".")[0])
        for p in glob.glob(f"{CYCLISTES_DIR}/cycliste_*.csv")
    }
    golden = {k: v for k, v in golden.items() if k[0] in input_ids}
    assert len(golden) == 954

    src = (
        spark.read.csv(CYCLISTES_DIR, header=True)
        .select(
            F.col("id").cast("int").alias("id"),
            F.to_timestamp("timestamp").alias("ts"),
            (F.col("sur_velo") == "True").alias("active"),
            F.col("vitesse").cast("double").alias("vitesse"),
        )
    )

    # Reference numbering (running sum of mount transitions) equals our
    # dense_rank numbering ONLY when every entity's log starts dismounted;
    # assert that precondition on the data instead of assuming it.
    w_first = F.row_number().over(Window.partitionBy("id").orderBy("ts"))
    leading_active = (
        src.withColumn("rn", w_first).where("rn = 1 AND active").count()
    )
    assert leading_active == 0, "a cyclist starts mounted: numbering offset"

    got = sessionize(src, "id", "ts", F.col("active"), "vitesse").collect()

    assert len(got) == len(golden)
    for r in got:
        key = (r.id, r.session_id)
        assert key in golden, f"trip {key} not in reference output"
        debut, fin, vmoy, duree = golden[key]
        assert r.session_start.replace(tzinfo=timezone.utc).timestamp() == debut
        assert r.session_end.replace(tzinfo=timezone.utc).timestamp() == fin
        # ours rounds avg to 6 decimals; golden keeps full double precision
        assert math.isclose(r.avg_value, vmoy, abs_tol=5e-7), key
        # the +1-minute rule must match exactly (whole-minute timestamps)
        assert math.isclose(r.duration_min, duree, abs_tol=1e-9), key


def test_villes_notebook_outputs_replay_bit_exact(spark):
    """Second golden replay: the API-tour notebook's PRINTED numeric
    outputs over its committed villes CSV (reference:
    work/Intro_pySpark.ipynb cells 27-35 — corr, cov, seeded sample +
    exceptAll counts, describe, grouped averages) must reproduce
    bit-for-bit through our reader + the same operator surface. The
    seeded Bernoulli sample matching (3 kept / 47 except) additionally
    pins that Spark's sampler stream is stable across the reference's
    Spark 3 and our Spark 4 for this partitioning."""
    import pytest
    from pyspark.sql import functions as F

    from cours_datalake_dwh_td_kafka_spark.io import read_csv

    v = read_csv(
        spark,
        "/root/reference/work/data/Villes/ville_1.csv",
        header=True,
        infer_schema=True,
    )
    assert v.count() == 50
    # cells 27/28: Pearson corr and sample covariance
    assert v.stat.corr("age", "vitesse_a_velo") == -0.06411845578664936
    assert v.stat.cov("age", "vitesse_a_velo") == -1.5721945755314064
    # cells 29/30: seeded 10% sample keeps 3; exceptAll leaves 47
    s = v.sample(fraction=0.1, seed=42)
    assert s.count() == 3
    assert v.exceptAll(s).count() == 47
    # cell 33: describe(age) after the int cast
    d = {
        r["summary"]: r["age"]
        for r in v.withColumn("age", F.col("age").cast("int"))
        .describe("age")
        .collect()
    }
    assert d["count"] == "50"
    assert d["mean"] == "48.4"
    assert d["stddev"] == "19.79898987322333"
    assert d["min"] == "16"
    # cells 34/35: grouped means
    g = {
        r.sexe: (r.ma, r.ms)
        for r in v.groupBy("sexe")
        .agg(F.avg("age").alias("ma"), F.avg("sportivite").alias("ms"))
        .collect()
    }
    assert g["F"] == (
        pytest.approx(46.095238095238095, abs=0),
        pytest.approx(1.8410619134680517, abs=0),
    )
    assert g["H"] == (
        pytest.approx(50.06896551724138, abs=0),
        pytest.approx(1.6356186755623958, abs=0),
    )
