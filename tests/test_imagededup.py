"""ml/imagededup.py — dHash kernel + banded perceptual near-dup."""

from __future__ import annotations

import numpy as np
import pytest

from readur_spark.ml.imagededup import (
    block_mean_resize,
    dhash64,
    dhash_near_pairs,
    dhash_table,
)


def _naive_block_mean(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = img.shape
    out = np.empty((out_h, out_w), dtype=np.int64)
    for r in range(out_h):
        for c in range(out_w):
            blk = img[
                (r * h) // out_h : ((r + 1) * h) // out_h,
                (c * w) // out_w : ((c + 1) * w) // out_w,
            ].astype(np.int64)
            out[r, c] = blk.sum() // blk.size
    return out


def _grad(h: int, w: int, salt: int = 0) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 5 + xx * 11 + salt) % 256).astype(np.uint8)


class TestBlockMeanResize:
    def test_exact_vs_naive(self):
        img = _grad(37, 23, salt=9)
        got = block_mean_resize(img)
        want = _naive_block_mean(img, 9, 8)
        assert np.array_equal(got, want)

    def test_identity_at_target_dims(self):
        img = _grad(8, 9)
        assert np.array_equal(block_mean_resize(img), img.astype(np.int64))

    def test_small_image_fallback(self):
        img = _grad(4, 5)  # smaller than 9x8: nearest-sample path
        out = block_mean_resize(img)
        assert out.shape == (8, 9)
        ri = (np.arange(8) * 4) // 8
        ci = (np.arange(9) * 5) // 9
        assert np.array_equal(out, img.astype(np.int64)[np.ix_(ri, ci)])


class TestDhash64:
    def test_brightness_invariant(self):
        """dHash compares neighbours, so a uniform brightness shift
        must not change a single bit (the property that makes it a
        re-encode-robust perceptual hash)."""
        img = _grad(64, 96)
        shifted = np.clip(img.astype(np.int64) + 7, 0, 255).astype(np.uint8)
        assert dhash64(img) == dhash64(shifted)

    def test_downscale_robust(self):
        """A 2x2-mean half-size rendition of the same picture stays
        within the near-dup bound."""
        img = _grad(64, 96).astype(np.int64)
        half = (
            (img[0::2, 0::2] + img[0::2, 1::2] + img[1::2, 0::2] + img[1::2, 1::2])
            // 4
        ).astype(np.uint8)
        a, b = dhash64(img.astype(np.uint8)), dhash64(half)
        assert bin(a ^ b).count("1") <= 3

    def test_distinct_images_distant(self):
        a = dhash64(_grad(64, 96, salt=1))
        b = dhash64(_grad(64, 96, salt=77)[::-1, :].copy())
        assert bin(a ^ b).count("1") > 3

    def test_signed_long_range(self):
        # all-ones pattern -> wraps to negative, must fit LongType
        img = np.tile(np.arange(9, dtype=np.uint8) * 20, (8, 1))
        v = dhash64(img)
        assert -(1 << 63) <= v < (1 << 63)
        assert v == -1  # strictly increasing rows -> every bit set


class TestSparkPaths:
    @pytest.fixture(scope="class")
    def sigs(self, spark):
        from readur_spark.kernels.image import encode_png_gray

        rows = []
        base = _grad(32, 48, salt=3)
        rows.append(("u/base.png", bytearray(encode_png_gray(base))))
        # near-dup: brightness shift (hamming 0)
        shifted = np.clip(base.astype(np.int64) + 5, 0, 255).astype(np.uint8)
        rows.append(("u/shift.png", bytearray(encode_png_gray(shifted))))
        # far image
        rows.append(
            ("u/other.png", bytearray(encode_png_gray(_grad(32, 48, salt=131)[::-1, :].copy())))
        )
        # undecodable payload must be dropped, not crash
        rows.append(("u/junk.bin", bytearray(b"PK\x03\x04 not an image")))
        df = spark.createDataFrame(rows, "url string, html binary")
        return dhash_table(df)

    def test_table_drops_undecodable(self, sigs):
        got = {r["url"]: r["dhash"] for r in sigs.collect()}
        assert set(got) == {"u/base.png", "u/shift.png", "u/other.png"}
        assert got["u/base.png"] == got["u/shift.png"]

    def test_blocked_pairs_match_bruteforce(self, sigs):
        rows = sigs.collect()
        brute = set()
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                ka, kb = sorted([a["url"], b["url"]])
                ham = bin((a["dhash"] ^ b["dhash"]) & ((1 << 64) - 1)).count("1")
                if ham <= 3:
                    brute.add((ka, kb, ham))
        got = {
            (r["key_a"], r["key_b"], r["hamming"])
            for r in dhash_near_pairs(sigs, max_hamming=3).collect()
        }
        assert got == brute
        assert ("u/base.png", "u/shift.png", 0) in got


class TestKeyframes:
    def test_lag_threshold_semantics(self, spark):
        from readur_spark.ml.imagededup import keyframe_select

        # video 1: frame 1 differs from 0 by 2 bits (shot-internal),
        # frame 2 by 33 bits (cut). video 2: single frame.
        rows = [
            (1, 0, 0b111),
            (1, 1, 0b101),                 # hamming 1
            (1, 2, (1 << 33) - 1),         # hamming vs prev ≥ KF_T
            (2, 0, 42),
        ]
        df = spark.createDataFrame(
            rows, "video_id long, frame_idx int, dhash long"
        )
        got = {(r["video_id"], r["frame_idx"]): r
               for r in keyframe_select(df).collect()}
        assert got[(1, 0)]["is_keyframe"] and got[(1, 0)]["hamming_prev"] is None
        assert not got[(1, 1)]["is_keyframe"]
        assert got[(1, 1)]["hamming_prev"] == 1
        assert got[(1, 2)]["is_keyframe"]
        assert got[(2, 0)]["is_keyframe"]

    def test_constructed_keyframes_are_scene_starts(self, spark):
        from readur_spark.ml.imagededup import (
            KF_SCENE_LEN,
            constructed_video_frames,
            dhash_table,
            keyframe_select,
        )
        from pyspark.sql import functions as F

        frames = constructed_video_frames(
            spark, "/root/testdata/sf0.001"
        ).filter(F.col("video_id") < 12)
        sig = dhash_table(
            frames.withColumn(
                "vf",
                F.concat_ws("/", F.col("video_id").cast("string"),
                            F.col("frame_idx").cast("string")),
            ),
            key_col="vf", payload_col="html",
        ).select(
            F.split("vf", "/")[0].cast("long").alias("video_id"),
            F.split("vf", "/")[1].cast("int").alias("frame_idx"),
            "dhash",
        )
        out = keyframe_select(sig).collect()
        for r in out:
            assert r["is_keyframe"] == (r["frame_idx"] % KF_SCENE_LEN == 0)
