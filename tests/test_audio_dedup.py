"""Audio near-dup fingerprint properties: the invariances that make it
a DEDUP signature rather than a checksum — gain-shifted copies collide
EXACTLY (scale-equivariance of the sign bits), copies through the
repo's own 2:1 floor-mean resample collide within the Hamming
threshold, and distinct clips don't."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.audio_dedup import (
    AUDIO_HAMMING_MAX,
    audio_fingerprint_of_samples,
    fingerprint_corpus,
    hamming_banded_pairs,
)
from cours_datalake_dwh_td_kafka_spark.operators.image_dedup import (
    PHASH_BITS,
)
from tests.conftest import SF_ORACLE


def _clips(spark, n_docs: int = 60):
    d = (
        load_table(spark, SF_ORACLE, "documents")
        .where((F.col("doc_id") % 3 == 1) & (F.col("n_chars") >= 64))
        .limit(n_docs)
        .select("doc_id", "text")
        .collect()
    )
    out = []
    for r in d:
        b = np.frombuffer(r.text.encode("utf-8"), dtype=np.uint8)
        out.append((int(r.doc_id), b.astype(np.int64) - 128))
    return out


def test_gain_shift_hashes_identically(spark):
    """X = 64*E - sum(E) scales by g^2 under samples*g, so every sign
    bit is unchanged: EXACT collision, the attested twin contract."""
    for _doc_id, s in _clips(spark):
        h = audio_fingerprint_of_samples(s)
        for gain in (2, 3, 7):
            assert audio_fingerprint_of_samples(s * gain) == h


def test_resampled_copy_within_threshold_for_structured_clips():
    """A 2:1 floor-mean decimated copy (multimodal_audio_resample's
    exact kernel) must stay within AUDIO_HAMMING_MAX for clips that
    HAVE an envelope (the invariance domain the module docstring
    states): seeded amplitude-modulated square waves, where aligned
    pairs average to their plateau value and the floor-cell boundary
    rule composes exactly — plus a half-amplitude additive wobble so
    the test isn't only the trivially-exact plateau case. (Pure byte
    NOISE has no envelope for any perceptual hash to preserve —
    measured hamming ~14 — which is why the attested twin is the gain
    re-master, exact for every signal.)"""
    rng = np.random.RandomState(7)
    for clip in range(40):
        n = 4096
        seg = n // 8
        amps = rng.randint(500, 8000, size=8)
        env = np.repeat(amps, seg)
        carrier = np.where((np.arange(n) // 4) % 2 == 0, 1, -1)
        wobble = np.repeat(rng.randint(-200, 200, size=n // 16), 16)
        s = (env * carrier + wobble).astype(np.int64)
        dec = s.reshape(-1, 2).sum(axis=1) // 2
        d = bin(
            audio_fingerprint_of_samples(s)
            ^ audio_fingerprint_of_samples(dec)
        ).count("1")
        assert d <= AUDIO_HAMMING_MAX, f"clip {clip}: hamming {d}"


def test_stereo_clips_fingerprint_through_the_codec():
    """decode_wav_pcm16 returns (n, channels) for multi-channel WAV —
    the fingerprint must flatten frame-interleaved instead of crashing
    (round-9 review), hash identically whether the caller pre-flattens
    or not, and keep the exact gain invariance on stereo."""
    from cours_datalake_dwh_td_kafka_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    rng = np.random.RandomState(11)
    frames = rng.randint(-300, 300, size=(256, 2)).astype(np.int64)
    payload = encode_wav_pcm16(
        frames.reshape(-1).astype("<i2"), 8000, channels=2
    )
    _, dec = decode_wav_pcm16(payload)
    assert dec.ndim == 2  # the shape that used to crash np.bincount
    h = audio_fingerprint_of_samples(dec.astype(np.int64))
    assert h == audio_fingerprint_of_samples(frames.reshape(-1))
    assert h == audio_fingerprint_of_samples(frames * 3)  # gain-exact


def test_distinct_clips_rarely_collide(spark):
    """Cross-clip near-dup rate stays under 1% while every gain twin is
    caught — the attested query's contract, checked via the banded join
    (which the image tests prove equals all-pairs)."""
    docs = (
        load_table(spark, SF_ORACLE, "documents")
        .where(F.col("doc_id") % 3 == 1)
    )
    hashes = fingerprint_corpus(docs)
    pairs = hamming_banded_pairs(
        hashes, "aud_id", "ahash", PHASH_BITS, AUDIO_HAMMING_MAX
    ).collect()
    n_clips = hashes.count()
    n_docs = n_clips // 2
    twins = sum(1 for r in pairs if r.id_a // 2 == r.id_b // 2)
    cross = len(pairs) - twins
    assert twins == n_docs  # every gain re-master caught (hamming 0)
    assert all(
        r.hamming == 0 for r in pairs if r.id_a // 2 == r.id_b // 2
    )
    n_cross_pairs = n_docs * (n_docs - 1) * 2
    assert cross / max(n_cross_pairs, 1) < 0.01


def test_short_clips_fingerprint_not_crash(spark):
    """ADVICE r11: clips shorter than 64 samples must hash, not crash
    (the pre-reduceat bincount contract: empty trailing cells carry
    zero energy). Pins determinism, gain equivariance, a bit-level
    cross-path agreement between the short python-int path and the
    reduceat path on an identical energy envelope, and the empty-input
    rejection."""
    import pytest

    rng = np.random.default_rng(11)
    for n in (1, 2, 7, 33, 63, 64, 200):
        a = rng.integers(-127, 128, size=n).astype(np.int64)
        h = audio_fingerprint_of_samples(a)
        assert h == audio_fingerprint_of_samples(a.copy())
        assert h == audio_fingerprint_of_samples(a * 3)
    # cross-path pin: a 1-sample clip puts ALL its energy in cell 0 —
    # exactly like a 64-sample clip whose only nonzero sample is index
    # 0 with the same magnitude (cell 0 energy v^2, rest zero), so the
    # python-int short path and the reduceat path must agree bit-level
    one = audio_fingerprint_of_samples(np.array([100], dtype=np.int64))
    full = np.zeros(64, dtype=np.int64)
    full[0] = 100
    assert one == audio_fingerprint_of_samples(full)
    with pytest.raises(ValueError, match="at least one sample"):
        audio_fingerprint_of_samples(np.array([], dtype=np.int64))
