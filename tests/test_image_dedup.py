"""Properties of the DCT perceptual hash and its Hamming-banded pair
join: invariance under the repo's own resize and under uniform
brightness shifts, discrimination between distinct images, and provable
equality of the banding with the all-pairs theta join."""

from __future__ import annotations

from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.image_dedup import (
    PHASH_BITS,
    PHASH_HAMMING_MAX,
    hamming_banded_pairs,
    image_phash,
    phash_corpus,
)
from cours_datalake_dwh_td_kafka_spark.operators.multimodal import (
    resize_images,
    synth_bmp_images,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def _hashes(df):
    return {r.img_id: r.phash for r in df.collect()}


def test_phash_invariant_under_nn_resize(spark):
    """pHash survives the pipeline's own nearest-neighbor resize EXACTLY
    (hamming 0): the floor-index maps compose — downsampling the 16x16
    resize to the 8x8 grid selects the same source pixels as
    downsampling the original — so a resized copy is a guaranteed catch,
    not a probabilistic one."""
    docs = load_table(spark, SF_SMOKE, "documents").where(
        F.col("doc_id") % 3 == 0
    )
    imgs = synth_bmp_images(docs).withColumnRenamed("doc_id", "img_id")
    orig = _hashes(image_phash(imgs))
    resized = resize_images(
        imgs.withColumnRenamed("img_id", "doc_id"), 16, 16
    ).select(F.col("doc_id").alias("img_id"), "payload")
    after = _hashes(image_phash(resized))
    assert orig and set(orig) == set(after)
    assert all(orig[i] == after[i] for i in orig)


def test_phash_invariant_under_uniform_brightness(spark):
    """A +k-per-channel brightness shift cancels in the scaled mean
    centering (X = 64*g - sum g), so re-graded copies hash identically."""
    docs = load_table(spark, SF_SMOKE, "documents").where(
        F.col("doc_id") % 3 == 0
    )
    imgs = synth_bmp_images(docs).withColumnRenamed("doc_id", "img_id")
    orig = _hashes(image_phash(imgs))

    def brighten(batches):
        import numpy as np
        import pandas as pd

        from cours_datalake_dwh_td_kafka_spark.operators.multimodal import (
            decode_bmp24,
            encode_bmp24,
        )

        for pdf in batches:
            ids, payloads = [], []
            for img_id, payload in zip(pdf["img_id"], pdf["payload"]):
                px = decode_bmp24(bytes(payload)).astype(np.int64)
                ids.append(int(img_id))
                payloads.append(
                    encode_bmp24(np.minimum(px + 40, 255).astype(np.uint8))
                )
            yield pd.DataFrame({"img_id": ids, "payload": payloads})

    bright = imgs.mapInPandas(brighten, "img_id BIGINT, payload BINARY")
    after = _hashes(image_phash(bright))
    # +40 clips at 255 for bytes >= 216; restrict the exact-invariance
    # claim to images whose bytes stay unclipped (ASCII text bytes are
    # < 128, so every synthetic image qualifies — assert that too).
    assert set(orig) == set(after)
    assert all(orig[i] == after[i] for i in orig)


def test_phash_discriminates_distinct_images(spark):
    """Distinct documents' images collide only at a negligible rate: the
    cross-document near-dup fraction stays under 1% while every
    perturbed twin is caught (the attested query's contract)."""
    docs = load_table(spark, SF_ORACLE, "documents").where(
        F.col("doc_id") % 3 == 0
    )
    hashes = image_phash(phash_corpus(docs))
    pairs = hamming_banded_pairs(
        hashes, "img_id", "phash", PHASH_BITS, PHASH_HAMMING_MAX
    ).collect()
    n_imgs = hashes.count()
    n_docs = n_imgs // 2
    twins = sum(1 for r in pairs if r.id_a // 2 == r.id_b // 2)
    cross = len(pairs) - twins
    assert twins == n_docs  # every perturbed re-encode is caught
    n_cross_pairs = n_docs * (n_docs - 1) * 2  # orig/pert cross products
    assert cross / n_cross_pairs < 0.01


def test_banded_pairs_equal_all_pairs_brute_force(spark):
    """The two-level variable-width banding returns EXACTLY the all-pairs
    theta join on seeded 60-bit hashes — including hashes crafted to
    differ in exactly PHASH_HAMMING_MAX scattered bits (the pigeonhole
    boundary) and in PHASH_HAMMING_MAX + 1 bits (must be excluded)."""
    import hashlib

    def h60(i: int) -> int:
        return (
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
            % (1 << PHASH_BITS)
        )

    base = [h60(i) for i in range(40)]
    crafted = []
    # flip exactly k scattered bits of base[0] for k at/over the bound
    for k, bits in ((PHASH_HAMMING_MAX, (0, 13, 27, 41, 59)),
                    (PHASH_HAMMING_MAX + 1, (2, 11, 23, 37, 47, 58))):
        v = base[0]
        for b in bits:
            v ^= 1 << b
        crafted.append(v)
    values = base + crafted
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "img_id BIGINT, phash BIGINT")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_banded_pairs(
            df, "img_id", "phash", PHASH_BITS, PHASH_HAMMING_MAX
        ).collect()
    )
    want = sorted(
        (i, j, bin(values[i] ^ values[j]).count("1"))
        for i in range(len(values))
        for j in range(i + 1, len(values))
        if bin(values[i] ^ values[j]).count("1") <= PHASH_HAMMING_MAX
    )
    assert got == want
    assert (0, len(base), PHASH_HAMMING_MAX) in got  # boundary caught
    ids = {(a, b) for a, b, _ in got}
    assert (0, len(base) + 1) not in ids  # one-over excluded


def test_banded_pairs_rejects_sign_bit_widths(spark):
    """n_bits > 62 would sign-extend through shiftright and silently
    break completeness — the guard rejects it up front (round-8
    advice); 62 itself still works end-to-end."""
    import pytest

    df = spark.createDataFrame(
        [(0, (1 << 61) | 5), (1, (1 << 61) | 5), (2, 56)],
        "img_id BIGINT, phash BIGINT",
    )
    for bad in (63, 64, 0, -1):
        with pytest.raises(ValueError, match="1..62-bit"):
            hamming_banded_pairs(df, "img_id", "phash", bad, 2)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_banded_pairs(df, "img_id", "phash", 62, 2).collect()
    }
    assert got == {(0, 1, 0)}  # bit-61 hashes band correctly at width 62


def test_video_phash_catches_trimmed_and_regraded_copies(spark):
    """The motivating cases for keyframe-set containment: a TRIMMED
    prefix of a video (fewer shots, same keyframes) and a re-graded
    re-encode (+k per channel, different bytes) both pair with the
    original at containment 1.0, while an unrelated video does not."""
    import numpy as np

    from cours_datalake_dwh_td_kafka_spark.operators.image_dedup import (
        video_keyframe_hashes,
        video_phash_pairs,
    )
    from cours_datalake_dwh_td_kafka_spark.operators.multimodal import (
        FRAME_H,
        FRAME_W,
        encode_bmp24,
    )

    rng = np.random.RandomState(11)

    def shot(seed, n):
        base = rng.randint(0, 180, size=(FRAME_H, FRAME_W, 3))
        return [base.astype(np.uint8)] * n  # flat shot: no intra cuts

    def video(frames, shift=0):
        return b"".join(
            encode_bmp24(np.minimum(f.astype(np.int64) + shift, 255
                                    ).astype(np.uint8))
            for f in frames
        )

    s1, s2, s3 = shot(1, 3), shot(2, 2), shot(3, 3)
    full = video(s1 + s2 + s3)
    trimmed = video(s1 + s2)          # first two shots only
    regraded = video(s1 + s2 + s3, shift=25)
    other = video(shot(9, 4))
    d = spark.createDataFrame(
        [(1, full), (2, trimmed), (3, regraded), (4, other)],
        "vid_id BIGINT, payload BINARY",
    )
    pairs = {
        (r.vid_a, r.vid_b): r.containment
        for r in video_phash_pairs(video_keyframe_hashes(d)).collect()
    }
    assert pairs.get((1, 2)) == 1.0   # trimmed copy caught
    assert pairs.get((1, 3)) == 1.0   # re-grade caught
    assert not any(4 in p for p in pairs)  # unrelated video clean
