"""Multimodal columns: opaque binary payloads + typed metadata, with the
Spark-side plumbing (schema, partition-friendly layout, Arrow-batched
featurizer UDFs) fully real and the codec layer stubbed.

Design (BASELINE.json north star): image/audio/video cells are `binary`
columns; metadata rides in sibling typed columns (modality, byte length,
content hash). Decode / resize / frame-sample are `mapInPandas`
featurizers over Arrow batches — at 100 TB only the binary column's
partitions stream through the Python workers, everything else is pruned
at the parquet scan. The actual image/audio codecs aren't in this
container, so `decode_stub` produces a deterministic fake feature vector
from the bytes; real codecs drop into the same UDF signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.registry import register

# ---------------------------------------------------------------------------
# payload assembly: documents.text re-encoded as the opaque binary payload
# (deterministic stand-in for real media bytes)
# ---------------------------------------------------------------------------
_META_SQL = """
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           hex(encode(substr(text, 1, 8))) AS head_hex
    FROM documents
    ORDER BY doc_id
"""


def multimodal_table(d: DataFrame) -> DataFrame:
    """documents -> multimodal layout: (doc_id, modality, payload, metadata)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(F.col("text")).alias("content_md5"),
        F.col("text").alias("content_text"),
    )


@register("multimodal_meta", _META_SQL)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = multimodal_table(load_table(spark, sf_dir, "documents"))
    return mm.select(
        "doc_id",
        "modality",
        "n_bytes",
        "content_md5",
        F.hex(F.encode(F.substring("content_text", 1, 8), "UTF-8")).alias("head_hex"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# featurizer: mapInPandas over Arrow batches. The decode step is a
# deterministic stub (real pipelines swap in PIL/ffmpeg here — marked).
# ---------------------------------------------------------------------------
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_std", DoubleType()),
        StructField("fake_width", LongType()),
        StructField("fake_height", LongType()),
    ]
)


def decode_stub(payload: bytes, modality: str) -> dict:
    """Deterministic stand-in for the codec layer.

    Real deployment: replace the body with PIL.Image.open /
    soundfile.read / av.open — same signature, same output dict. Raising
    path kept for unknown modalities so pipelines fail loudly.
    """
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for modality {modality!r}")
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return {"byte_mean": 0.0, "byte_std": 0.0, "fake_width": 0, "fake_height": 0}
    return {
        "byte_mean": float(arr.mean()),
        "byte_std": float(arr.std()),
        # fake dimensions derived from content so tests are reproducible
        "fake_width": int(arr[: min(4, arr.size)].sum()) % 512 + 1,
        "fake_height": int(arr[-min(4, arr.size):].sum()) % 512 + 1,
    }


def featurize(mm: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched featurizer over the multimodal table. Only the
    columns in the projection cross into Python — project BEFORE calling
    so parquet column pruning keeps unrelated columns out of the Arrow
    stream.

    The decode logic is inlined into the closure (not a call to the
    module-level ``decode_stub``) so cloudpickle ships it BY VALUE: the
    executors' Python workers must not need this package importable —
    the driver contract runs from an arbitrary cwd."""
    field_names = [f.name for f in FEATURE_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def decode(payload: bytes, modality: str) -> dict:
            # deterministic stand-in for PIL/ffmpeg — see decode_stub
            if modality not in ("image", "audio", "video"):
                raise NotImplementedError(f"no codec for modality {modality!r}")
            arr = np.frombuffer(payload, dtype=np.uint8)
            if arr.size == 0:
                return {
                    "byte_mean": 0.0,
                    "byte_std": 0.0,
                    "fake_width": 0,
                    "fake_height": 0,
                }
            return {
                "byte_mean": float(arr.mean()),
                "byte_std": float(arr.std()),
                "fake_width": int(arr[: min(4, arr.size)].sum()) % 512 + 1,
                "fake_height": int(arr[-min(4, arr.size):].sum()) % 512 + 1,
            }

        for pdf in batches:
            feats = [decode(p, m) for p, m in zip(pdf["payload"], pdf["modality"])]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "modality", pdf["modality"].values)
            out.insert(2, "n_bytes", pdf["n_bytes"].values)
            yield out[field_names]

    return mm.select("doc_id", "modality", "n_bytes", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


# Python featurizer output is engine-specific -> rows-only driver check;
# numeric determinism is covered by tests (same input -> same features).
@register("multimodal_features")
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = multimodal_table(load_table(spark, sf_dir, "documents"))
    return featurize(mm).orderBy("doc_id")


# ---------------------------------------------------------------------------
# resize: binary -> binary transform over the image slice. The stub
# resamples the byte stream to target_w x target_h by index striding;
# a real pipeline swaps the body for PIL's Image.resize with the same
# (payload in, payload out + dims) contract. Plumbing that IS real:
# the modality filter prunes at the scan, only (doc_id, payload) crosses
# the Arrow boundary, and the output is again an opaque binary column.
# ---------------------------------------------------------------------------
RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", LongType()),
        StructField("out_height", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_images(
    mm: DataFrame, target_w: int = 16, target_h: int = 16
) -> DataFrame:
    """Resize every image-modality payload to ``target_w x target_h``."""
    out_names = [f.name for f in RESIZE_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n_out = target_w * target_h

        def resize(payload: bytes) -> bytes:
            # stub resample: stride the source bytes onto the target grid
            # (real codec: PIL decode -> resize -> re-encode, same contract)
            arr = np.frombuffer(payload, dtype=np.uint8)
            if arr.size == 0:
                return bytes(n_out)
            idx = (np.arange(n_out, dtype=np.int64) * arr.size) // n_out
            return arr[idx].tobytes()

        for pdf in batches:
            if not len(pdf):
                continue
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "out_width": target_w,
                    "out_height": target_h,
                    "payload": [resize(p) for p in pdf["payload"]],
                }
            )
            out["n_bytes"] = out["payload"].map(len)
            yield out[out_names]

    src = mm.where(F.col("modality") == "image").select("doc_id", "payload")
    return src.mapInPandas(run, RESIZE_SCHEMA)


@register("multimodal_resize")
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only driver check (binary output); determinism + shape are
    asserted in tests/test_algorithms.py."""
    mm = multimodal_table(load_table(spark, sf_dir, "documents"))
    return resize_images(mm).orderBy("doc_id")


# ---------------------------------------------------------------------------
# frame sampling: one video payload -> N frame rows (the 1->many batch
# shape). The stub treats each 64-byte slice as a frame and keeps every
# n-th; a real pipeline swaps in av/ffmpeg keyframe extraction with the
# same output schema.
# ---------------------------------------------------------------------------
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_len", LongType()),
    ]
)

FRAME_SIZE = 64


def sample_frames(mm: DataFrame, every_n: int = 4) -> DataFrame:
    """Emit every ``every_n``-th fixed-size frame of each video payload."""
    out_names = [f.name for f in FRAME_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {n: [] for n in out_names}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + FRAME_SIZE - 1) // FRAME_SIZE
                for fi in range(0, n_frames, every_n):
                    chunk = payload[fi * FRAME_SIZE : (fi + 1) * FRAME_SIZE]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(fi)
                    rows["frame_bytes"].append(bytes(chunk))
                    rows["frame_len"].append(len(chunk))
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    src = mm.where(F.col("modality") == "video").select("doc_id", "payload")
    return src.mapInPandas(run, FRAME_SCHEMA)


@register("multimodal_frame_sample")
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only driver check (binary output); frame-count arithmetic is
    asserted in tests/test_algorithms.py."""
    mm = multimodal_table(load_table(spark, sf_dir, "documents"))
    return sample_frames(mm).orderBy("doc_id", "frame_idx")


# Per-doc rollup of the frame sampler — every column is scalar arithmetic
# over byte lengths, so the 1->many UDF's slicing gets a REAL value-hash
# oracle (generate_series twin) instead of the rows-only check the binary
# frame payloads force on `multimodal_frame_sample` itself.
_FRAME_STATS_SQL = f"""
    WITH v AS (
      SELECT doc_id, octet_length(encode(text)) AS nb
      FROM documents WHERE doc_id % 3 = 2
    ),
    f AS (
      SELECT doc_id, nb,
             unnest(generate_series(
               0, CAST(CEIL(nb / {FRAME_SIZE}.0) AS BIGINT) - 1, 4)) AS frame_idx
      FROM v
    )
    SELECT doc_id,
           COUNT(*) AS n_frames_kept,
           CAST(SUM(LEAST({FRAME_SIZE}, nb - frame_idx * {FRAME_SIZE})) AS BIGINT)
             AS bytes_kept,
           MAX(frame_idx) AS last_frame_idx
    FROM f
    GROUP BY doc_id
    ORDER BY doc_id
"""


@register("multimodal_frame_stats", _FRAME_STATS_SQL)
def q_multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = multimodal_table(load_table(spark, sf_dir, "documents"))
    return (
        sample_frames(mm)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames_kept"),
            F.sum("frame_len").alias("bytes_kept"),
            F.max("frame_idx").alias("last_frame_idx"),
        )
        .orderBy("doc_id")
    )
