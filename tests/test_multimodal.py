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
