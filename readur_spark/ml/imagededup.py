"""Perceptual image dedup: 64-bit difference hash (dHash) + banded
near-dup blocking.

The multimodal twin of the text near-dup tier: a training-image corpus
carries the same re-crawl/re-encode duplication as web text, and exact
sha256 (A5) misses every re-encode. dHash (the classic perceptual hash
from the image-dedup literature: downscale to 9×8 grayscale, emit one
bit per horizontal neighbour comparison) is robust to re-encoding and
mild resizing while staying integer-exact and RNG-free — the engine's
oracle-twin style.

Reference tie-in: the reference dedups on content sha256 only
(src/services/file_service.rs hash path; db/documents duplicate
groups); this module is the perceptual extension a 100 TB multimodal
pipeline needs on top.

Scale design:
  - hashing is ONE narrow Arrow-batched pass over (key, payload) —
    payload never shuffles; the emitted (key, 64-bit hash) stream is
    16 bytes/row;
  - near-dup candidates come from the same 4 × 16-bit chunk blocking
    as ml/dedup.py simhash (provably complete for Hamming ≤ 3: 3
    flipped bits leave ≥ 1 of 4 chunks intact) — never all-pairs;
  - verification is a JVM xor + bit_count on the candidate set.

The block-mean downscale uses an exact integer summed-area table
(sum // count per cell), so hashes are bit-reproducible across
machines — no float resampling in the signature path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

DHASH_COLS = 9  # downscale width  -> 8 comparisons per row
DHASH_ROWS = 8  # downscale height -> 64 bits total


def block_mean_resize(
    img: np.ndarray, out_w: int = DHASH_COLS, out_h: int = DHASH_ROWS
) -> np.ndarray:
    """Deterministic integer block-mean downscale: output cell (r, c)
    is the floor mean of the source block with row bounds
    [r*h//out_h, (r+1)*h//out_h) (cols analogous) — exact block sums
    via a summed-area table, `sum // count` per cell. Sources smaller
    than the target in either axis fall back to nearest-neighbour
    index sampling (still deterministic)."""
    h, w = img.shape
    if h < out_h or w < out_w:
        ri = (np.arange(out_h) * h) // out_h
        ci = (np.arange(out_w) * w) // out_w
        return img.astype(np.int64)[np.ix_(ri, ci)]
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    ii[1:, 1:] = img.astype(np.int64).cumsum(axis=0).cumsum(axis=1)
    rb = (np.arange(out_h + 1) * h) // out_h
    cb = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w), dtype=np.int64)
    for r in range(out_h):
        for c in range(out_w):
            r0, r1, c0, c1 = rb[r], rb[r + 1], cb[c], cb[c + 1]
            s = ii[r1, c1] - ii[r0, c1] - ii[r1, c0] + ii[r0, c0]
            out[r, c] = s // ((r1 - r0) * (c1 - c0))
    return out


def dhash64(img: np.ndarray) -> int:
    """64-bit dHash as a SIGNED long (two's-complement wrap, matching
    Spark's LongType): bit r*8+c set when cell (r, c) < cell (r, c+1)
    of the 9×8 block-mean downscale."""
    cells = block_mean_resize(img)
    bits = (cells[:, :-1] < cells[:, 1:]).astype(np.uint64)
    k = np.arange(64, dtype=np.uint64).reshape(DHASH_ROWS, DHASH_COLS - 1)
    v = int((bits << k).sum())
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash_table(
    pages: DataFrame, *, key_col: str = "url", payload_col: str = "html"
) -> DataFrame:
    """(key, dhash) for every decodable image payload; undecodable
    rows are dropped (they belong to the placeholder/failure arms, not
    the dedup index). One narrow Arrow pass, payload pruned to exactly
    (key, bytes)."""
    slim = pages.select(key_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from readur_spark.kernels.image import decode_image_gray

        for pdf in batches:
            keys: list = []
            hashes: list[int] = []
            for key, data in zip(pdf[key_col], pdf[payload_col]):
                img = decode_image_gray(
                    bytes(data) if data is not None else b""
                )
                if img is None:
                    continue
                keys.append(key)
                hashes.append(dhash64(img))
            yield pd.DataFrame({key_col: keys, "dhash": hashes})

    return slim.mapInPandas(run, schema=f"{key_col} string, dhash long")


def dhash_near_pairs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup image pairs at Hamming ≤ max_hamming via the proven
    simhash chunk-blocking join (ml/dedup.py:338-374) — 4 × 16-bit
    bands, complete for ≤ 3 flipped bits, then one JVM xor+popcount
    verify. Returns (key_a, key_b, hamming) with key_a < key_b."""
    from readur_spark.ml.dedup import simhash_near_pairs

    key_col = sig.columns[0]
    pairs = simhash_near_pairs(
        sig.select(F.col(key_col).alias("id"), F.col("dhash").alias("simhash")),
        max_hamming=max_hamming,
    )
    return pairs.select(
        F.col("id_a").alias("key_a"),
        F.col("id_b").alias("key_b"),
        "hamming",
    )


# ---- constructed-corpus twins ----------------------------------------------
# 9×8 sources hit the no-resize path, so every hash bit is a pure
# function of doc_id that DuckDB re-derives. The corpus is built as
# SIBLING PAIRS: docs 2f and 2f+1 share the md5-derived base image of
# family f (pixel (r, c) = first byte of md5('f#r#c') — full 64-bit
# hash entropy per family, so cross-family Hamming ≤ 3 has ~2⁻⁴⁸
# probability and the pair set stays O(n), never O(n²)); the odd
# sibling perturbs exactly two cells, (0,0) and (7,8), each of which
# feeds exactly ONE comparison bit — so sibling Hamming is 0–2, always
# inside the blocking bound.


def _px(f: int, r: int, c: int, odd: bool) -> int:
    import hashlib

    v = int(hashlib.md5(f"{f}#{r}#{c}".encode()).hexdigest()[:2], 16)
    if odd and (r, c) in ((0, 0), (7, 8)):
        v = (v + 128) % 256
    return v


def constructed_image_pages_9x8(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(url, html) — one REAL 9×8 grayscale PNG per document under the
    SQL-replayable sibling-pair pixel rule above."""
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from readur_spark.kernels.image import encode_png_gray

        for pdf in batches:
            urls: list[str] = []
            blobs: list[bytes] = []
            for did in pdf["doc_id"]:
                did = int(did)
                f, odd = did // 2, bool(did % 2)
                img = np.array(
                    [
                        [_px(f, r, c, odd) for c in range(DHASH_COLS)]
                        for r in range(DHASH_ROWS)
                    ],
                    dtype=np.uint8,
                )
                urls.append("https://img.example/tiny%d.png" % did)
                blobs.append(encode_png_gray(img))
            yield pd.DataFrame({"url": urls, "html": blobs})

    return docs.mapInPandas(run, schema="url string, html binary")


# One byte of md5('f#r#c'), +128 (mod 256) at the two perturbed cells
# of odd siblings — identical to _px above.
_PX_SQL = """(
  CAST(concat('0x', substr(md5(
        CAST(doc_id // 2 AS VARCHAR) || '#' ||
        CAST({r} AS VARCHAR) || '#' || CAST({c} AS VARCHAR)), 1, 2))
     AS INT)
  + CASE WHEN doc_id % 2 = 1
              AND (({r} = 0 AND {c} = 0) OR ({r} = 7 AND {c} = 8))
         THEN 128 ELSE 0 END
) % 256"""

_DHASH_SQL = f"""
      SELECT doc_id,
             'https://img.example/tiny' || CAST(doc_id AS VARCHAR)
               || '.png' AS url,
             CAST((
               SELECT sum(CASE WHEN {_PX_SQL.format(r='r.r', c='c.c')}
                               < {_PX_SQL.format(r='r.r', c='(c.c + 1)')}
                               THEN CASE WHEN r.r*8 + c.c >= 63
                                    THEN -9223372036854775808
                                    ELSE (1::BIGINT << (r.r*8 + c.c)) END
                               ELSE 0 END)
               FROM UNNEST(range(0, 8)) AS r(r),
                    UNNEST(range(0, 8)) AS c(c)
             ) AS BIGINT) AS dhash
      FROM documents
"""


@register(
    "image_dhash_constructed",
    oracle=f"""
    WITH h AS ({_DHASH_SQL})
    SELECT url, dhash FROM h
    """,
)
def image_dhash_constructed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dHash kernel value-hash-checked end-to-end: real PNG encode
    → decode → downscale (identity at 9×8) → comparison bits, with the
    DuckDB twin re-deriving all 64 bits (two's-complement, bit 63 as
    the sign summand) from the construction rule."""
    sigs = dhash_table(constructed_image_pages_9x8(spark, sf_dir))
    return sigs.select("url", "dhash")


@register(
    "image_neardup_dhash",
    oracle=f"""
    WITH h AS ({_DHASH_SQL})
    SELECT a.url AS key_a, b.url AS key_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
    FROM h a JOIN h b ON a.url < b.url
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    """,
)
def image_neardup_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup image pairs (Hamming ≤ 3) over the
    constructed corpus — the banded chunk join + verify, value-hashed
    against DuckDB's brute-force xor/popcount over the re-derived
    hashes. Completeness of the blocking at this bound is what makes
    blocked-Spark ≡ all-pairs-SQL an equality, not an approximation."""
    sigs = dhash_table(constructed_image_pages_9x8(spark, sf_dir))
    pairs = dhash_near_pairs(sigs, max_hamming=3)
    return pairs.select(
        "key_a", "key_b", F.col("hamming").cast("int").alias("hamming")
    )


# ---- video keyframe selection (r5s11) --------------------------------------
#
# Scene-cut keyframing — the standard video-corpus decimation step
# (one representative frame per shot feeds the image-text tier instead
# of every frame): consecutive-frame dHash Hamming distance spikes at
# a cut and stays near 0 inside a shot. Constructed ground truth: each
# document is a VIDEO of F = 6 + doc_id % 3 frames; frame k belongs to
# scene k div 3; a scene's 9×8 image is md5(video#scene#r#c) per cell
# (a fresh random image per scene → cross-cut Hamming ≈ 32), and
# within a scene frame k jitters cell (0,0) by +16·(k mod 3) — that
# cell feeds exactly ONE comparison bit, so within-shot Hamming ≤ 1.
# Keyframe rule: frame 0, or Hamming to the previous frame ≥ KF_T.

KF_T = 10          # cut threshold (within-shot ≤1, cross-shot ≈32)
KF_SCENE_LEN = 3   # frames per scene in the construction


def _kf_px(video: int, scene: int, k: int, r: int, c: int) -> int:
    import hashlib

    v = int(
        hashlib.md5(f"{video}#{scene}#{r}#{c}".encode()).hexdigest()[:2], 16
    )
    if (r, c) == (0, 0):
        v = (v + 16 * (k % KF_SCENE_LEN)) % 256
    return v


def constructed_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(video_id, frame_idx, html) — real 9×8 grayscale PNGs under the
    scene/jitter rule above, one row per frame."""
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from readur_spark.kernels.image import encode_png_gray

        for pdf in batches:
            vids: list[int] = []
            ks: list[int] = []
            blobs: list[bytes] = []
            for did in pdf["doc_id"]:
                did = int(did)
                for k in range(6 + did % 3):
                    scene = k // KF_SCENE_LEN
                    img = np.array(
                        [
                            [_kf_px(did, scene, k, r, c)
                             for c in range(DHASH_COLS)]
                            for r in range(DHASH_ROWS)
                        ],
                        dtype=np.uint8,
                    )
                    vids.append(did)
                    ks.append(k)
                    blobs.append(encode_png_gray(img))
            yield pd.DataFrame(
                {"video_id": vids, "frame_idx": ks, "html": blobs}
            )

    return docs.mapInPandas(
        run, schema="video_id long, frame_idx int, html binary"
    )


def keyframe_select(frames_sig: DataFrame) -> DataFrame:
    """(video_id, frame_idx, hamming_prev, is_keyframe) from a
    (video_id, frame_idx, dhash) signature frame: one window lag per
    video, xor + bit_count, threshold at KF_T (frame 0 always keeps).
    Scale: the signature frame is 8 bytes/frame; the lag is a
    per-video sort of that slim frame — the decoded pixels never
    shuffle."""
    from pyspark.sql import Window

    w = Window.partitionBy("video_id").orderBy("frame_idx")
    lagged = frames_sig.withColumn("prev", F.lag("dhash").over(w))
    return lagged.select(
        "video_id",
        "frame_idx",
        F.expr("cast(bit_count(dhash ^ prev) as int)").alias(
            "hamming_prev"
        ),
        F.expr(
            f"prev is null or bit_count(dhash ^ prev) >= {KF_T}"
        ).alias("is_keyframe"),
    )


_KF_PX_SQL = """(
  CAST(concat('0x', substr(md5(
        CAST(doc_id AS VARCHAR) || '#' ||
        CAST(k // 3 AS VARCHAR) || '#' ||
        CAST({r} AS VARCHAR) || '#' || CAST({c} AS VARCHAR)), 1, 2))
     AS INT)
  + CASE WHEN {r} = 0 AND {c} = 0 THEN 16 * (k % 3) ELSE 0 END
) % 256"""

_KF_DHASH_SQL = f"""
      SELECT doc_id AS video_id, CAST(k AS INT) AS frame_idx,
             CAST((
               SELECT sum(CASE WHEN {_KF_PX_SQL.format(r='r.r', c='c.c')}
                               < {_KF_PX_SQL.format(r='r.r', c='(c.c + 1)')}
                               THEN CASE WHEN r.r*8 + c.c >= 63
                                    THEN -9223372036854775808
                                    ELSE (1::BIGINT << (r.r*8 + c.c)) END
                               ELSE 0 END)
               FROM UNNEST(range(0, 8)) AS r(r),
                    UNNEST(range(0, 8)) AS c(c)
             ) AS BIGINT) AS dhash
      FROM (SELECT doc_id, unnest(range(6 + doc_id % 3)) AS k
            FROM documents)
"""


@register(
    "video_keyframe_select",
    oracle=f"""
    WITH h AS ({_KF_DHASH_SQL}), lagged AS (
      SELECT video_id, frame_idx, dhash,
             lag(dhash) OVER (PARTITION BY video_id ORDER BY frame_idx)
               AS prev
      FROM h
    )
    SELECT video_id, frame_idx,
           CAST(bit_count(xor(dhash, prev)) AS INT) AS hamming_prev,
           (prev IS NULL OR bit_count(xor(dhash, prev)) >= {KF_T})
             AS is_keyframe
    FROM lagged
    """,
)
def video_keyframe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut keyframe selection value-hash-checked end-to-end: real
    PNG encode → decode → dHash per frame, then the lag/threshold
    sweep — with the DuckDB twin re-deriving every frame's 64 bits
    from the construction rule and replaying the lag and the cut
    threshold."""
    frames = constructed_video_frames(spark, sf_dir)
    # dhash_table types its key as string: feed it a video/frame
    # composite key and split it back after the Arrow pass
    return keyframe_select(
        dhash_table(
            frames.withColumn(
                "vf",
                F.concat_ws(
                    "/",
                    F.col("video_id").cast("string"),
                    F.col("frame_idx").cast("string"),
                ),
            ),
            key_col="vf",
            payload_col="html",
        )
        .select(
            F.split(F.col("vf"), "/")[0].cast("long").alias("video_id"),
            F.split(F.col("vf"), "/")[1].cast("int").alias("frame_idx"),
            "dhash",
        )
    )
