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
