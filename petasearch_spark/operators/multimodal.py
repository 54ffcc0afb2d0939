"""Multimodal columns: image/audio/video as opaque BINARY payloads with
typed metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

This is the large-scale-training-pipeline surface the reference engine
does not have (it is sequence-only); the Spark-side plumbing — schema,
partitioning, UDF signatures, one-row-to-many-frame fan-out, batch
shapes — is real and oracle-checked. Only the *codec* is swapped: the
container ships no image/audio libraries, so `decode` falls back to a
deterministic fake (payload bytes reinterpreted per the metadata) when
PIL/soundfile are absent; the fallback is what the DuckDB oracles model,
which makes every query below value-checkable end to end.

Media derivation: each `documents` row becomes one media row. The payload
is the document's printable-ASCII bytes cycled to the exact length the
metadata implies (width*height*channels for images, n_samples for audio,
n_frames*width*height for video) — a pure function of the row, identical
in Spark and DuckDB SQL.

At 100 TB: payloads are opaque bytes in parquet (never parsed by the
scan), metadata columns prune without touching payload pages, and every
operator here is a narrow mapInPandas over independent rows — no shuffle
at all except frame-sampling's optional re-sort; Arrow moves the binary
column zero-copy into numpy.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from petasearch_spark.functions.ordering import sort_via_exchange

from petasearch_spark.sources.tables import load_table

# metadata per kind (doc_id % 3): 0=image, 1=audio, 2=video
IMG_W, IMG_H, IMG_C = 16, 16, 1
AUDIO_SAMPLES, AUDIO_RATE = 256, 8000
VID_FRAMES, VID_W, VID_H = 8, 8, 8
FRAME_EVERY = 2  # frame-sampling stride

_KIND = ["image", "audio", "video"]
_PAYLOAD_LEN = {"image": IMG_W * IMG_H * IMG_C, "audio": AUDIO_SAMPLES, "video": VID_FRAMES * VID_W * VID_H}


def try_real_decoder():
    """The real codec path. The container ships no imaging/audio libs, so
    this returns None and the deterministic fake below is used; in a real
    deployment, PIL.Image.open / soundfile.read slot in here with the
    same (payload bytes) -> ndarray contract."""
    try:  # pragma: no cover - not installed in this environment
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError:
        return None


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> media(media_id, kind, width, height, channels,
    n_frames, sample_rate, payload BINARY).

    Payload = printable-ASCII bytes of the text, cycled to the length the
    metadata implies. Pure column expressions — Catalyst evaluates the
    whole derivation JVM-side; nothing here needs Python."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    clean = F.regexp_replace(F.col("text"), "[^ -~]", "")
    clean = F.when(F.length(clean) > 0, clean).otherwise(F.lit("x"))
    kind = F.element_at(F.array(*[F.lit(k) for k in _KIND]), (F.col("doc_id") % 3 + 1).cast("int"))
    plen = (
        F.when(F.col("kind") == "image", F.lit(_PAYLOAD_LEN["image"]))
        .when(F.col("kind") == "audio", F.lit(_PAYLOAD_LEN["audio"]))
        .otherwise(F.lit(_PAYLOAD_LEN["video"]))
    )
    df = docs.select(F.col("doc_id").alias("media_id"), kind.alias("kind"), clean.alias("_clean"))
    df = df.withColumn("_plen", plen)
    # cycle the text to exactly _plen chars, then reinterpret as bytes
    df = df.withColumn(
        "payload",
        F.encode(F.expr("substring(repeat(_clean, ceil(_plen / length(_clean))), 1, _plen)"), "UTF-8"),
    )
    return df.select(
        "media_id",
        "kind",
        F.when(F.col("kind") == "image", F.lit(IMG_W)).when(F.col("kind") == "video", F.lit(VID_W)).otherwise(F.lit(0)).alias("width"),
        F.when(F.col("kind") == "image", F.lit(IMG_H)).when(F.col("kind") == "video", F.lit(VID_H)).otherwise(F.lit(0)).alias("height"),
        F.when(F.col("kind") == "image", F.lit(IMG_C)).otherwise(F.lit(0)).alias("channels"),
        F.when(F.col("kind") == "video", F.lit(VID_FRAMES)).otherwise(F.lit(0)).alias("n_frames"),
        F.when(F.col("kind") == "audio", F.lit(AUDIO_RATE)).otherwise(F.lit(0)).alias("sample_rate"),
        "payload",
    )


# shared SQL fragment: the same media derivation for the DuckDB oracle
MEDIA_SQL = """
media AS (
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CASE doc_id % 3 WHEN 0 THEN {img_w} WHEN 2 THEN {vid_w} ELSE 0 END AS width,
           CASE doc_id % 3 WHEN 0 THEN {img_h} WHEN 2 THEN {vid_h} ELSE 0 END AS height,
           CASE doc_id % 3 WHEN 0 THEN {img_c} ELSE 0 END AS channels,
           CASE doc_id % 3 WHEN 2 THEN {vid_f} ELSE 0 END AS n_frames,
           CASE doc_id % 3 WHEN 1 THEN {rate} ELSE 0 END AS sample_rate,
           substring(repeat(t, CAST(ceil(plen / len(t)) AS INT)), 1, plen) AS payload_str
    FROM (
        SELECT doc_id,
               CASE WHEN len(regexp_replace(text, '[^ -~]', '', 'g')) > 0
                    THEN regexp_replace(text, '[^ -~]', '', 'g') ELSE 'x' END AS t,
               CASE doc_id % 3 WHEN 0 THEN {img_len} WHEN 1 THEN {aud_len} ELSE {vid_len} END AS plen
        FROM documents
    )
)
""".format(
    img_w=IMG_W, img_h=IMG_H, img_c=IMG_C, vid_w=VID_W, vid_h=VID_H, vid_f=VID_FRAMES,
    rate=AUDIO_RATE, img_len=_PAYLOAD_LEN["image"], aud_len=_PAYLOAD_LEN["audio"],
    vid_len=_PAYLOAD_LEN["video"],
)


def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind catalog stats over metadata + payload — the 'never decode
    what you can prune' query: only payload length touches the binary."""
    m = media_table(spark, sf_dir)
    return (
        m.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max("width").alias("max_width"),
            F.max("n_frames").alias("max_frames"),
        )
        .orderBy("kind")
    )


MEDIA_CATALOG_SQL = f"""
WITH {MEDIA_SQL}
SELECT kind, COUNT(*) AS n, CAST(SUM(len(payload_str)) AS BIGINT) AS total_bytes,
       MAX(width) AS max_width, MAX(n_frames) AS max_frames
FROM media GROUP BY kind ORDER BY kind
"""


def _round6(x: float) -> float:
    """HALF_UP to 6 decimals (what Spark's round() and DuckDB's ROUND do;
    Python's round() is banker's and disagrees exactly at the .5 boundary,
    which uint8 means hit constantly: k/256 * 1e6 is often exactly *.5)."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def _decode_batch(pdf: pd.DataFrame) -> list[np.ndarray]:
    """payload bytes -> uint8 ndarray per row (the deterministic fake
    decode; a real codec would produce the same shape contract)."""
    return [np.frombuffer(b, dtype=np.uint8) for b in pdf["payload"]]


def image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every image and emit per-image pixel statistics — the
    feature-extraction pattern: mapInPandas, one Arrow batch of opaque
    binaries in, one small numeric row per image out."""
    imgs = media_table(spark, sf_dir).filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = _decode_batch(pdf)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "mean_px": [_round6(float(a.mean())) for a in arrs],
                    "min_px": [int(a.min()) for a in arrs],
                    "max_px": [int(a.max()) for a in arrs],
                }
            )

    # sort_via_exchange: a bare orderBy re-runs the decode kernel (and the
    # payload scan under it) for RangePartitioner sampling (functions/ordering.py)
    return sort_via_exchange(
        imgs.mapInPandas(run, "media_id long, mean_px double, min_px int, max_px int"),
        "media_id",
    )


IMAGE_STATS_SQL = f"""
WITH {MEDIA_SQL}
, px AS (
    SELECT media_id, ord(substring(payload_str, i, 1)) AS code
    FROM media, range(1, {_PAYLOAD_LEN["image"] + 1}) r(i)
    WHERE kind = 'image'
)
SELECT media_id, ROUND(AVG(code), 6) AS mean_px,
       CAST(MIN(code) AS INT) AS min_px, CAST(MAX(code) AS INT) AS max_px
FROM px GROUP BY media_id ORDER BY media_id
"""


def image_resize(spark: SparkSession, sf_dir: str, factor: int = 4) -> DataFrame:
    """Nearest-neighbour thumbnail (16x16 -> 4x4): the resize pattern —
    payload in, smaller payload out, metadata rewritten to match. Emits
    the thumbnail mean so the oracle can value-check the resample."""
    imgs = media_table(spark, sf_dir).filter(F.col("kind") == "image")
    w, h = IMG_W // factor, IMG_H // factor

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_mean, out_ids = [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                img = np.frombuffer(b, dtype=np.uint8).reshape(IMG_H, IMG_W)
                thumb = img[::factor, ::factor]  # nearest-neighbour, top-left anchor
                out_ids.append(mid)
                out_mean.append(_round6(float(thumb.mean())))
            yield pd.DataFrame(
                {"media_id": out_ids, "width": w, "height": h, "thumb_mean": out_mean}
            )

    return sort_via_exchange(
        imgs.mapInPandas(run, "media_id long, width int, height int, thumb_mean double"),
        "media_id",
    )


IMAGE_RESIZE_SQL = f"""
WITH {MEDIA_SQL}
, px AS (
    SELECT media_id,
           ord(substring(payload_str, (y * {4}) * {IMG_W} + (x * {4}) + 1, 1)) AS code
    FROM media, range(0, {IMG_H // 4}) ry(y), range(0, {IMG_W // 4}) rx(x)
    WHERE kind = 'image'
)
SELECT media_id, {IMG_W // 4} AS width, {IMG_H // 4} AS height,
       ROUND(AVG(code), 6) AS thumb_mean
FROM px GROUP BY media_id ORDER BY media_id
"""


def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode audio payloads as signed 8-bit PCM and emit RMS + peak —
    same mapInPandas contract as image_stats, different reinterpretation
    of the same opaque bytes."""
    auds = media_table(spark, sf_dir).filter(F.col("kind") == "audio")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rms, peak = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                wave = np.frombuffer(b, dtype=np.int8).astype(np.float64)
                ids.append(mid)
                rms.append(_round6(float(np.sqrt(np.mean(wave * wave)))))
                peak.append(int(np.abs(wave).max()))
            yield pd.DataFrame({"media_id": ids, "rms": rms, "peak": peak})

    return sort_via_exchange(
        auds.mapInPandas(run, "media_id long, rms double, peak int"), "media_id"
    )


AUDIO_FEATURES_SQL = f"""
WITH {MEDIA_SQL}
, smp AS (
    SELECT media_id,
           CASE WHEN ord(substring(payload_str, i, 1)) > 127
                THEN ord(substring(payload_str, i, 1)) - 256
                ELSE ord(substring(payload_str, i, 1)) END AS v
    FROM media, range(1, {AUDIO_SAMPLES + 1}) r(i)
    WHERE kind = 'audio'
)
SELECT media_id, ROUND(sqrt(AVG(v * v)), 6) AS rms, CAST(MAX(ABS(v)) AS INT) AS peak
FROM smp GROUP BY media_id ORDER BY media_id
"""


def video_frame_sample(spark: SparkSession, sf_dir: str, every: int = FRAME_EVERY) -> DataFrame:
    """Frame sampling: each video row fans out to one row per kept frame
    (frame_idx % every == 0) with the frame's mean intensity. The
    one-to-many fan-out happens INSIDE mapInPandas — Spark sees a single
    narrow stage, no explode shuffle, and the payload is sliced without
    copying the rest of the video."""
    vids = media_table(spark, sf_dir).filter(F.col("kind") == "video")
    fbytes = VID_W * VID_H

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, fmean = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                frames = np.frombuffer(b, dtype=np.uint8).reshape(VID_FRAMES, fbytes)
                for i in range(0, VID_FRAMES, every):
                    ids.append(mid)
                    fidx.append(i)
                    fmean.append(_round6(float(frames[i].mean())))
            yield pd.DataFrame({"media_id": ids, "frame_idx": fidx, "frame_mean": fmean})

    return sort_via_exchange(
        vids.mapInPandas(run, "media_id long, frame_idx int, frame_mean double"),
        "media_id", "frame_idx",
    )


VIDEO_FRAME_SAMPLE_SQL = f"""
WITH {MEDIA_SQL}
, fr AS (
    SELECT media_id, f.f AS frame_idx,
           ord(substring(payload_str, f.f * {VID_W * VID_H} + p.p + 1, 1)) AS code
    FROM media, range(0, {VID_FRAMES}) f(f), range(0, {VID_W * VID_H}) p(p)
    WHERE kind = 'video' AND f.f % {FRAME_EVERY} = 0
)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx, ROUND(AVG(code), 6) AS frame_mean
FROM fr GROUP BY media_id, frame_idx ORDER BY media_id, frame_idx
"""

# ---- perceptual-hash near-duplicate images --------------------------------
# dHash over the decoded image: 16x16 -> 8x8 integer block sums (2x2), one
# bit per horizontal neighbour comparison -> 56-bit signature. Banded
# 4 x 14 bits: any pair within Hamming distance 3 agrees exactly on >=1
# band (pigeonhole), so candidate generation is a band-bucket equi-join —
# the image twin of dedup_simhash's banding, with the signature coming out
# of the Arrow decode kernel instead of token hashing.
PH_GRID = 8           # block grid (16x16 px -> 8x8 block sums)
PH_BITS = PH_GRID * (PH_GRID - 1)  # 56 gradient bits
PH_BANDS = 4
PH_BAND_BITS = 14
PH_MAX_HAMMING = 3


def image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, phash): 56-bit dHash per image via the mapInPandas
    decode kernel. Block sums stay integer so the DuckDB oracle can
    reproduce every bit exactly."""
    imgs = media_table(spark, sf_dir).filter(F.col("kind") == "image")
    f = IMG_W // PH_GRID

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                img = np.frombuffer(b, dtype=np.uint8).reshape(IMG_H, IMG_W).astype(np.int64)
                s = img.reshape(PH_GRID, f, PH_GRID, f).sum(axis=(1, 3))
                bits = (s[:, :-1] < s[:, 1:]).astype(np.int64)
                weights = (1 << np.arange(PH_BITS, dtype=np.int64)).reshape(PH_GRID, PH_GRID - 1)
                ids.append(mid)
                hashes.append(int((bits * weights).sum()))
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return imgs.mapInPandas(run, "media_id long, phash long")


def image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image detection at catalog scale: per image, its
    perceptual hash and how many other images sit within Hamming
    distance {PH_MAX_HAMMING} of it.

    Candidates come ONLY from the 4x14-bit band buckets (pigeonhole-exact
    for the distance bound — same guarantee as dedup_simhash), so the
    self-join cost is bounded by true bucket collisions, never O(n²);
    the Hamming verify is a single bit_count(xor) on the 8-byte
    signature. At 100 TB the phash table is tiny next to the payloads
    (8 bytes vs W*H) and the decode never shuffles."""
    ph = image_phash(spark, sf_dir).persist()
    bands = ph.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("phash"), i * PH_BAND_BITS)
                        .bitwiseAND((1 << PH_BAND_BITS) - 1)
                        .alias("key"),
                    )
                    for i in range(PH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "phash", "bk.band", "bk.key")
    a = bands.select(F.col("media_id").alias("ma"), F.col("phash").alias("pa"), "band", "key")
    b = bands.select(F.col("media_id").alias("mb"), F.col("phash").alias("pb"), "band", "key")
    # Hamming verify BEFORE the distinct: bit_count is a per-row
    # no-shuffle op, the distinct is a shuffle — filter first so only
    # true near-dup pairs (not every band collision) pay it, and dedup
    # on the narrow (ma, mb) key (a pair colliding in several bands
    # would otherwise double-count)
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("ma") < F.col("mb"))
        .filter(F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))) <= PH_MAX_HAMMING)
        .select("ma", "mb")
        .distinct()
    )
    partners = (
        pairs.select(F.col("ma").alias("media_id"))
        .unionAll(pairs.select(F.col("mb").alias("media_id")))
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_neardups"))
    )
    return (
        ph.join(partners, "media_id", "left")
        .select(
            "media_id",
            "phash",
            F.coalesce(F.col("n_neardups"), F.lit(0)).cast("long").alias("n_neardups"),
        )
        .orderBy("media_id")
    )


_PH_F = IMG_W // PH_GRID

IMAGE_PHASH_DEDUP_SQL = f"""
WITH {MEDIA_SQL}
, blocks AS (
    SELECT media_id, y, x,
           SUM(ord(substring(payload_str, (y * {_PH_F} + dy) * {IMG_W} + (x * {_PH_F} + dx) + 1, 1))) AS s
    FROM media, range(0, {PH_GRID}) ry(y), range(0, {PH_GRID}) rx(x),
         range(0, {_PH_F}) rdy(dy), range(0, {_PH_F}) rdx(dx)
    WHERE kind = 'image'
    GROUP BY media_id, y, x
), bits AS (
    SELECT l.media_id, l.y, l.x,
           CASE WHEN l.s < r.s THEN 1 ELSE 0 END AS bit
    FROM blocks l JOIN blocks r
      ON l.media_id = r.media_id AND l.y = r.y AND r.x = l.x + 1
    WHERE l.x < {PH_GRID - 1}
), ph AS (
    SELECT media_id,
           CAST(SUM(CAST(bit AS BIGINT) << (y * {PH_GRID - 1} + x)) AS BIGINT) AS phash
    FROM bits GROUP BY media_id
), bands AS (
    SELECT media_id, phash, i AS band,
           (phash >> (i * {PH_BAND_BITS})) & {(1 << PH_BAND_BITS) - 1} AS key
    FROM ph, range(0, {PH_BANDS}) r(i)
), pairs AS (
    SELECT DISTINCT a.media_id AS ma, b.media_id AS mb, a.phash AS pa, b.phash AS pb
    FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.media_id < b.media_id
), close AS (
    SELECT ma, mb FROM pairs WHERE bit_count(xor(pa, pb)) <= {PH_MAX_HAMMING}
), partners AS (
    SELECT media_id, COUNT(*) AS n_neardups FROM (
        SELECT ma AS media_id FROM close UNION ALL SELECT mb AS media_id FROM close
    ) GROUP BY media_id
)
SELECT p.media_id, p.phash, CAST(COALESCE(t.n_neardups, 0) AS BIGINT) AS n_neardups
FROM ph p LEFT JOIN partners t USING (media_id)
ORDER BY p.media_id
"""
