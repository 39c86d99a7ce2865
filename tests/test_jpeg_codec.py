"""kernels/jpeg.py — baseline T.81 codec (A35 codec parity).

The reference encodes thumbnails/placeholders as JPEG via the image
crate (src/services/file_service.rs:315-337, 441-466, 468-493); this
codec reproduces the same stream profile (baseline sequential, Annex K
tables, YCbCr 4:4:4 / grayscale, JFIF container) with no external
library. Round-trip bounds below are self-checks of the pair; the
structural tests pin the on-wire profile so any real decoder reads the
output.
"""

from __future__ import annotations

import numpy as np
import pytest

from readur_spark.kernels.jpeg import (
    AC_BITS,
    DC_BITS,
    QUANT_CHROMA,
    QUANT_LUMA,
    ZIGZAG,
    decode_jpeg_gray,
    decode_jpeg_rgb,
    encode_jpeg_gray,
    encode_jpeg_rgb,
    quality_scaled_table,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _test_image(h: int = 200, w: int = 200) -> np.ndarray:
    rng = np.random.default_rng(7)
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    img = ((np.add.outer(y, x)) / 2).astype(int)
    img[h // 5 : h // 3, :] = 255
    img[:, w // 2 : w // 2 + 5] = 0
    img = np.clip(img + rng.integers(-10, 10, (h, w)), 0, 255)
    return img.astype(np.uint8)


class TestAnnexKTables:
    def test_quant_tables_pinned(self):
        # first rows of T.81 Annex K.1 / K.2
        assert QUANT_LUMA[0].tolist() == [16, 11, 10, 16, 24, 40, 51, 61]
        assert QUANT_CHROMA[0].tolist() == [17, 18, 24, 47, 99, 99, 99, 99]

    def test_quality_scaling_libjpeg_formula(self):
        assert quality_scaled_table(50)[0, 0] == 16  # scale 100
        assert quality_scaled_table(100).max() == 1  # scale 0 -> clamp 1
        assert quality_scaled_table(25)[0, 0] == 32  # scale 200
        assert quality_scaled_table(75)[0, 0] == 8   # scale 50

    def test_huffman_table_shapes(self):
        assert sum(DC_BITS) == 12
        assert sum(AC_BITS) == 162

    def test_zigzag_is_permutation(self):
        assert sorted(ZIGZAG.tolist()) == list(range(64))
        # first diagonal walk
        assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


class TestGrayRoundTrip:
    def test_psnr_by_quality(self):
        img = _test_image()
        prev_size = 0
        for q, floor in ((50, 30.0), (75, 32.0), (85, 33.0), (95, 38.0)):
            data = encode_jpeg_gray(img, q)
            out = decode_jpeg_gray(data)
            assert out is not None and out.shape == img.shape
            assert _psnr(img, out) >= floor
            assert len(data) > prev_size  # higher q, more bytes
            prev_size = len(data)

    def test_odd_shapes_and_edges(self):
        rng = np.random.default_rng(3)
        for shape in ((1, 1), (7, 13), (8, 8), (17, 31), (64, 1)):
            img = rng.integers(0, 256, shape).astype(np.uint8)
            out = decode_jpeg_gray(encode_jpeg_gray(img, 90))
            assert out.shape == shape

    def test_flat_image_is_tiny_and_exact(self):
        img = np.full((96, 96), 130, dtype=np.uint8)
        data = encode_jpeg_gray(img, 85)
        out = decode_jpeg_gray(data)
        assert int(np.abs(out.astype(int) - 130).max()) <= 1
        assert len(data) < 1200

    def test_deterministic(self):
        img = _test_image(64, 64)
        assert encode_jpeg_gray(img, 85) == encode_jpeg_gray(img, 85)


class TestRgbRoundTrip:
    def test_solid_placeholder_colors_near_exact(self):
        # the four reference placeholder colors (file_service.rs:475-481)
        for color in ((220, 38, 27), (34, 139, 34), (41, 128, 185),
                      (108, 117, 125)):
            img = np.empty((200, 200, 3), dtype=np.uint8)
            img[:] = color
            out = decode_jpeg_rgb(encode_jpeg_rgb(img, 75))
            assert int(np.abs(out.astype(int) - np.array(color)).max()) <= 3

    def test_textured_rgb_psnr(self):
        g = _test_image()
        rgb = np.stack([g, np.roll(g, 7, axis=0), 255 - g], axis=-1)
        out = decode_jpeg_rgb(encode_jpeg_rgb(rgb, 85))
        assert out.shape == rgb.shape
        assert _psnr(rgb, out) >= 30.0

    def test_gray_replicated_luma_matches_gray_path(self):
        # encoding gray-replicated RGB and reading the luma plane lands
        # within JPEG loss of the gray-path result
        g = _test_image(96, 96)
        rgb = np.repeat(g[..., None], 3, axis=2)
        luma = decode_jpeg_gray(encode_jpeg_rgb(rgb, 75))
        assert _psnr(g, luma) >= 30.0

    def test_one_component_stream_replicates(self):
        g = _test_image(40, 40)
        out = decode_jpeg_rgb(encode_jpeg_gray(g, 90))
        assert out.shape == (40, 40, 3)
        assert (out[..., 0] == out[..., 1]).all()


class TestStreamProfile:
    def test_container_markers(self):
        data = encode_jpeg_rgb(np.zeros((16, 16, 3), dtype=np.uint8), 75)
        assert data[:2] == b"\xFF\xD8" and data[-2:] == b"\xFF\xD9"
        assert data[2:4] == b"\xFF\xE0" and data[6:11] == b"JFIF\x00"
        assert b"\xFF\xC0" in data  # SOF0 = baseline sequential
        assert b"\xFF\xC2" not in data.split(b"\xFF\xDA")[0]  # no progressive
        # SOF0 carries the true dimensions
        i = data.index(b"\xFF\xC0")
        assert data[i + 5 : i + 9] == (16).to_bytes(2, "big") * 2
        # 3 components, all 1x1 sampling (4:4:4)
        assert data[i + 9] == 3
        assert data[i + 11] == 0x11 and data[i + 14] == 0x11

    def test_decoder_rejects_out_of_profile(self):
        img = _test_image(32, 32)
        good = encode_jpeg_gray(img, 85)
        assert decode_jpeg_gray(b"not a jpeg") is None
        assert decode_jpeg_gray(b"\xFF\xD8garbage") is None
        assert decode_jpeg_gray(good[:40]) is None  # truncated headers
        # flip SOF0 to SOF2 (progressive): must refuse, not misparse
        prog = bytearray(good)
        prog[prog.index(b"\xFF\xC0") + 1] = 0xC2
        assert decode_jpeg_gray(bytes(prog)) is None

    def test_byte_stuffing_survives(self):
        # craft an image whose entropy stream is long enough that 0xFF
        # bytes almost surely occur; the stuffed stream must round-trip
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (128, 128)).astype(np.uint8)
        data = encode_jpeg_gray(img, 95)
        scan = data.split(b"\xFF\xDA")[1]
        assert b"\xFF\x00" in scan  # stuffing actually exercised
        out = decode_jpeg_gray(data)
        assert out is not None and out.shape == img.shape

    def test_encode_rejects_bad_input(self):
        with pytest.raises(ValueError):
            encode_jpeg_gray(np.zeros((0, 0), dtype=np.uint8))
        with pytest.raises(ValueError):
            encode_jpeg_rgb(np.zeros((4, 4), dtype=np.uint8))
