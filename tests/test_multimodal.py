"""Multimodal plumbing tests: schema, payload determinism, batch shapes,
one-to-many frame fan-out, and the decoder stub contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from petasearch_spark.operators import multimodal as mm

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_table(spark, SF_DIR).cache()


def test_media_schema_and_kinds(media):
    assert media.columns == [
        "media_id", "kind", "width", "height", "channels", "n_frames", "sample_rate", "payload",
    ]
    assert dict(media.dtypes)["payload"] == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_payload_length_matches_metadata(media):
    bad = media.filter(
        (
            (F.col("kind") == "image")
            & (F.length("payload") != F.col("width") * F.col("height") * F.col("channels"))
        )
        | ((F.col("kind") == "audio") & (F.length("payload") != mm.AUDIO_SAMPLES))
        | (
            (F.col("kind") == "video")
            & (F.length("payload") != F.col("n_frames") * F.col("width") * F.col("height"))
        )
    ).count()
    assert bad == 0


def test_payload_deterministic_cycled_bytes(media):
    row = media.filter(F.col("kind") == "image").orderBy("media_id").first()
    payload = np.frombuffer(row["payload"], dtype=np.uint8)
    assert payload.shape == (mm.IMG_W * mm.IMG_H * mm.IMG_C,)
    # all bytes printable ASCII (the derivation strips everything else)
    assert payload.min() >= 0x20 and payload.max() <= 0x7E


def test_image_stats_bounds(spark):
    stats = mm.image_stats(spark, SF_DIR).collect()
    assert len(stats) > 0
    for r in stats:
        assert 0x20 <= r["min_px"] <= r["max_px"] <= 0x7E
        assert r["min_px"] <= r["mean_px"] <= r["max_px"]


def test_video_frame_fanout_shape(spark):
    vids = mm.media_table(spark, SF_DIR).filter(F.col("kind") == "video").count()
    frames = mm.video_frame_sample(spark, SF_DIR).collect()
    per_video = mm.VID_FRAMES // mm.FRAME_EVERY
    assert len(frames) == vids * per_video
    idxs = sorted({r["frame_idx"] for r in frames})
    assert idxs == list(range(0, mm.VID_FRAMES, mm.FRAME_EVERY))


def test_resize_halves_metadata(spark):
    thumbs = mm.image_resize(spark, SF_DIR).collect()
    assert all(r["width"] == mm.IMG_W // 4 and r["height"] == mm.IMG_H // 4 for r in thumbs)


def test_decoder_stub_contract():
    # the container has no imaging libs: the stub must say so, not crash
    assert mm.try_real_decoder() is None


def test_round6_half_up():
    assert mm._round6(92.8203125) == 92.820313  # banker's would give ...312
    assert mm._round6(1.0) == 1.0


# ---- perceptual-hash near-dup images (round 3) ----------------------------

def _phash_scalar(payload: bytes) -> int:
    """Independent scalar twin of the dHash kernel: per-pixel loops, no
    numpy reshape tricks."""
    from petasearch_spark.operators import multimodal as M

    f = M.IMG_W // M.PH_GRID
    px = list(payload)
    h = 0
    for y in range(M.PH_GRID):
        sums = []
        for x in range(M.PH_GRID):
            s = 0
            for dy in range(f):
                for dx in range(f):
                    s += px[(y * f + dy) * M.IMG_W + (x * f + dx)]
            sums.append(s)
        for x in range(M.PH_GRID - 1):
            if sums[x] < sums[x + 1]:
                h |= 1 << (y * (M.PH_GRID - 1) + x)
    return h


def test_image_phash_matches_scalar_twin(spark):
    from petasearch_spark.operators import multimodal as M

    media = M.media_table(spark, SF_DIR).filter("kind = 'image'")
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    got = {r["media_id"]: r["phash"] for r in M.image_phash(spark, SF_DIR).collect()}
    assert got.keys() == payloads.keys()
    for mid, b in payloads.items():
        assert got[mid] == _phash_scalar(b), mid


def test_phash_banding_pigeonhole_guarantee():
    """Any two 56-bit signatures within Hamming distance PH_MAX_HAMMING
    agree exactly on at least one of the PH_BANDS bands (so the band join
    can never miss a qualifying pair)."""
    import itertools
    import random

    from petasearch_spark.operators import multimodal as M

    assert M.PH_BANDS * M.PH_BAND_BITS == M.PH_BITS
    rng = random.Random(7)
    for _ in range(200):
        a = rng.getrandbits(M.PH_BITS)
        flips = rng.sample(range(M.PH_BITS), M.PH_MAX_HAMMING)
        b = a
        for f in flips:
            b ^= 1 << f
        shared = any(
            (a >> (i * M.PH_BAND_BITS)) & ((1 << M.PH_BAND_BITS) - 1)
            == (b >> (i * M.PH_BAND_BITS)) & ((1 << M.PH_BAND_BITS) - 1)
            for i in range(M.PH_BANDS)
        )
        assert shared


def test_image_phash_dedup_counts_are_symmetric(spark):
    from petasearch_spark.operators import multimodal as M

    out = M.image_phash_dedup(spark, SF_DIR).collect()
    hashes = {r["media_id"]: r["phash"] for r in out}
    counts = {r["media_id"]: r["n_neardups"] for r in out}
    # recompute ground truth pair counts by brute force over the signatures
    ids = sorted(hashes)
    truth = {i: 0 for i in ids}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(hashes[a] ^ hashes[b]).count("1") <= M.PH_MAX_HAMMING:
                truth[a] += 1
                truth[b] += 1
    assert counts == truth
