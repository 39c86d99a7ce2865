"""Operational queries (boolean search, audits, bulk ops, salted agg),
search suggestions, and multimodal plumbing."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from readur_spark.queries.registry import oracle_sql, queries
from readur_spark.queries.search import search_suggestions

NEW_ORACLE_KEYS = [
    "search_boolean",
    "consistency_orphan_events",
    "consistency_stale_inflight",
    "bulk_retry_preview",
    "bulk_delete_accounting",
    "host_counts_salted",
]


def _duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
            % (t, sf_dir, t)
        )
    return con.execute(sql).df()


@pytest.mark.parametrize("key", NEW_ORACLE_KEYS)
def test_new_queries_match_duckdb(spark, sf_dir, key):
    """Mirror of the driver's correctness gate: row count + sorted
    values must match the DuckDB oracle."""
    df = queries()[key](spark, sf_dir)
    got = df.toPandas()
    exp = _duckdb_run(oracle_sql()[key], sf_dir)
    assert sorted(got.columns) == sorted(exp.columns), (got.columns, exp.columns)
    got = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    exp = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
    assert len(got) == len(exp)
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype.kind in "fc" or e.dtype.kind in "fc":
            assert ((g - e).abs().fillna(0) < 1e-6).all(), c
        else:
            assert (g.astype(str).fillna("") == e.astype(str).fillna("")).all(), c


def test_salted_host_counts_match_plain_groupby(spark, sf_dir):
    """The salted two-phase aggregate must equal a plain GROUP BY."""
    from readur_spark.corpus import pages_from_documents
    from readur_spark.operators.partitioning import host_counts_salted, with_host

    pages = pages_from_documents(spark, sf_dir)
    salted = {
        r.host: r.n_pages for r in host_counts_salted(pages, n_salts=8).collect()
    }
    plain = {
        r.host: r["count"]
        for r in with_host(pages).groupBy("host").count().collect()
    }
    assert salted == plain


def test_search_suggestions_rules():
    assert search_suggestions("") == []
    s = search_suggestions("spark")
    assert "spark*" in s and "spark document" in s and len(s) <= 3
    s2 = search_suggestions("spark join plan")
    assert '"spark join plan"' in s2 and "spark" in s2
    assert search_suggestions('"already quoted"')[:1] != ['""already quoted""']


def test_image_metadata_table_decodes_engine_pngs(spark):
    from readur_spark.corpus import synthetic_pages
    from readur_spark.ml.multimodal import image_metadata_table

    pages = synthetic_pages(spark, 400).filter(F.col("url").endswith(".png"))
    meta = image_metadata_table(pages).toPandas()
    assert len(meta) == pages.count()
    decoded = meta[meta.decode_status == "decoded"]
    assert len(decoded) > 0
    # every decoded row has dims + pixel stats; orientation consistent
    assert decoded.width.notna().all() and decoded.mean_brightness.notna().all()
    land = decoded[decoded.width > decoded.height]
    assert (land.orientation == "landscape").all()


def test_image_metadata_unknown_format(spark):
    from readur_spark.ml.multimodal import image_metadata_table

    rows = [("u1", bytearray(b"not an image")), ("u2", None)]
    df = spark.createDataFrame(rows, "url string, html binary")
    meta = {r.url: r for r in image_metadata_table(df).collect()}
    assert meta["u1"].decode_status == "unknown_format"
    assert meta["u2"].decode_status == "unknown_format"
    assert meta["u2"].byte_size == 0


def test_frame_sampler_deterministic_and_complete(spark):
    from readur_spark.ml.multimodal import frame_sample_table, sample_frames_bytes

    data = bytes(range(256)) * 8  # 2048 bytes
    frames = sample_frames_bytes(data, 4, frame_size=64)
    assert [f[0] for f in frames] == [0, 512, 1024, 1536]
    assert all(len(f[1]) == 64 for f in frames)
    assert frames == sample_frames_bytes(data, 4, frame_size=64)

    df = spark.createDataFrame(
        [("u1", bytearray(data)), ("u2", bytearray(b"xy")), ("u3", None)],
        "url string, html binary",
    )
    out = {r.url: r for r in frame_sample_table(df, n_frames=4).collect()}
    assert out["u1"].n_frames == 4
    assert list(out["u1"].frame_offsets) == [0, 512, 1024, 1536]
    assert out["u2"].n_frames == 2  # short payload → fewer windows
    assert out["u3"].n_frames == 0


def test_audio_decode_is_capability_gated():
    from readur_spark.ml.multimodal import decode_audio

    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF....WAVE")


# ---- A35 thumbnails --------------------------------------------------------


class TestThumbnails:
    def test_fit_box_math(self):
        from readur_spark.kernels.thumbnails import fit_box

        assert fit_box(400, 200) == (200, 100)   # landscape fits width
        assert fit_box(200, 400) == (100, 200)   # portrait fits height
        assert fit_box(100, 50) == (100, 50)     # never upscale
        assert fit_box(1000, 10) == (200, 2)
        assert fit_box(0, 0) == (1, 1)

    def test_image_thumbnail_roundtrip(self):
        import numpy as np

        from readur_spark.kernels.image import encode_png_gray
        from readur_spark.kernels.jpeg import decode_jpeg_gray
        from readur_spark.kernels.thumbnails import generate_thumbnail

        img = np.tile(np.arange(256, dtype=np.uint8), (300, 2))[:, :400]
        row = generate_thumbnail("https://x.example/a.png", encode_png_gray(img))
        assert row["thumb_kind"] == "image"
        assert row["thumb_format"] == "jpeg"
        assert (row["thumb_width"], row["thumb_height"]) == (200, 150)
        decoded = decode_jpeg_gray(bytes(row["thumbnail"]))
        assert decoded.shape == (150, 200)

    def test_color_thumbnail_preserves_color(self):
        # r4: color sources keep their color end-to-end (the r3
        # gray-plane deviation is retired) — a red/blue split PNG must
        # come out of the JPEG with distinctly red and blue halves
        import numpy as np

        from readur_spark.kernels.image import encode_png_rgb
        from readur_spark.kernels.jpeg import decode_jpeg_rgb
        from readur_spark.kernels.thumbnails import generate_thumbnail

        src = np.zeros((400, 400, 3), dtype=np.uint8)
        src[:, :200] = (200, 30, 30)   # left: red
        src[:, 200:] = (30, 30, 200)   # right: blue
        row = generate_thumbnail("https://x.example/c.png", encode_png_rgb(src))
        assert row["thumb_kind"] == "image"
        rgb = decode_jpeg_rgb(bytes(row["thumbnail"]))
        assert rgb.shape == (200, 200, 3)
        left = rgb[50:150, 30:70].reshape(-1, 3).mean(axis=0)
        right = rgb[50:150, 130:170].reshape(-1, 3).mean(axis=0)
        assert left[0] > left[2] + 100, left    # red dominates
        assert right[2] > right[0] + 100, right  # blue dominates

    def test_png_rgb_roundtrip_and_luma(self):
        import numpy as np

        from readur_spark.kernels.image import (
            decode_image_gray,
            decode_image_rgb,
            encode_png_rgb,
            rgb_to_luma,
        )

        g = np.tile(np.arange(256, dtype=np.uint8), (64, 1))[:, :120]
        rgb = np.stack([g, g[::-1, :], 255 - g], axis=-1)
        data = encode_png_rgb(rgb)
        # lossless truecolor round-trip
        assert np.array_equal(decode_image_rgb(data), rgb)
        # gray decode of a color PNG = Rec.601 luma (the OCR-side view)
        assert np.array_equal(decode_image_gray(data), rgb_to_luma(rgb))

    def test_jpeg_input_decodes(self):
        # the image branch accepts real baseline JPEG payloads (.jpg
        # urls carried PNG-or-nothing before the round-3 codec landed)
        import numpy as np

        from readur_spark.kernels.jpeg import encode_jpeg_gray
        from readur_spark.kernels.thumbnails import generate_thumbnail

        img = np.tile(np.arange(256, dtype=np.uint8), (300, 2))[:, :400]
        row = generate_thumbnail(
            "https://x.example/photo.jpg", encode_jpeg_gray(img, 90)
        )
        assert row["thumb_kind"] == "image"
        assert (row["thumb_width"], row["thumb_height"]) == (200, 150)

    def test_dispatch_and_placeholders_deterministic(self):
        import numpy as np

        from readur_spark.kernels.jpeg import decode_jpeg_rgb
        from readur_spark.kernels.thumbnails import generate_thumbnail

        pdf = generate_thumbnail("https://x.example/doc.pdf", b"%PDF-1.4")
        assert pdf["thumb_kind"] == "placeholder"
        # placeholders are deterministic per label
        pdf2 = generate_thumbnail("https://y.example/other.pdf", b"junk")
        assert bytes(pdf["thumbnail"]) == bytes(pdf2["thumbnail"])
        txt = generate_thumbnail("https://x.example/n.txt", b"hello")
        assert txt["thumb_kind"] == "text"
        assert bytes(txt["thumbnail"]) != bytes(pdf["thumbnail"])
        corrupt = generate_thumbnail("https://x.example/broken.png", b"\x00bad")
        assert corrupt["thumb_kind"] == "placeholder"
        noext = generate_thumbnail("https://x.example/page", b"<html>")
        assert noext["thumb_kind"] == "placeholder"
        # reference color map (file_service.rs:475-481): PDF red,
        # DOC blue, unknown gray — solid fills survive JPEG near-losslessly
        doc = generate_thumbnail("https://x.example/r.docx", b"PK")
        for row, expect in ((pdf, (220, 38, 27)), (doc, (41, 128, 185)),
                            (noext, (108, 117, 125))):
            rgb = decode_jpeg_rgb(bytes(row["thumbnail"]))
            assert rgb.shape == (200, 200, 3)
            err = np.abs(rgb.astype(int) - np.array(expect)).max()
            assert err <= 3, (expect, err)

    def test_text_thumbnail_pixel_placement(self):
        # generate_text_based_thumbnail parity (file_service.rs:411-466):
        # white 2-px marks at x=10+7c / y=20+12l over the green fill
        import numpy as np

        from readur_spark.kernels.thumbnails import text_thumbnail_pixels

        px = text_thumbnail_pixels(b"hello world\nsecond line")
        assert px.shape == (200, 200, 3)
        # line 0 is the "TXT" type indicator: 3 chars at y=20
        assert (px[20, 10] == 255).all() and (px[20, 11] == 255).all()
        assert (px[20, 10 + 2 * 7] == 255).all()
        assert tuple(px[20, 10 + 3 * 7]) == (34, 139, 34)
        # line 1 = "hello world" (11 chars incl. space) at y=32
        assert (px[32, 10] == 255).all()
        assert (px[32, 10 + 10 * 7] == 255).all()
        assert tuple(px[32, 10 + 11 * 7]) == (34, 139, 34)
        # line 2 = "second line" at y=44
        assert (px[44, 10] == 255).all()
        # >25 chars are clipped; >300-byte payloads truncate first
        long = text_thumbnail_pixels(b"x" * 400)
        assert (long[32, 10 + 24 * 7] == 255).all()
        assert tuple(long[32, 10 + 25 * 7]) == (34, 139, 34)

    def test_text_thumbnail_truncates_decoded_not_raw(self):
        # ADVICE r3: the reference slices the already-lossy-DECODED
        # string at 300 bytes. Invalid UTF-8 inflates to 3-byte U+FFFD
        # on decode, so raw-byte truncation sees a different prefix.
        import numpy as np

        from readur_spark.kernels.thumbnails import text_thumbnail_pixels

        # 150 invalid bytes -> 150 U+FFFD = 450 decoded bytes: decoded
        # truncation keeps exactly 100 chars (300/3); raw truncation
        # would have kept all 150. Line 1 shows min(100,25)=25 marks —
        # same clip — so distinguish via multi-line: newline after 99
        # replacement chars must survive decoded-side truncation.
        data = b"\xff" * 99 + b"\n" + b"A" * 10 + b"\xff" * 200
        px = text_thumbnail_pixels(data)
        # decoded: 99*3=297 bytes + '\n' (298) + 'AA' (300) -> line 2
        # begins "AA" only; a raw-300 slice would have kept all 10 A's
        # plus replacement marks beyond.
        assert (px[44, 10] == 255).all()            # 'A' at char 0
        assert (px[44, 10 + 1 * 7] == 255).all()    # 'A' at char 1
        assert tuple(px[44, 10 + 2 * 7]) == (34, 139, 34)  # truncated here

    def test_text_thumbnail_backs_off_char_boundary(self):
        # Only documented deviation from file_service.rs: Rust would
        # panic slicing mid-char; we back off to the prior boundary.
        from readur_spark.kernels.thumbnails import text_thumbnail_pixels

        # 299 ASCII bytes + one 3-byte char straddling the 300 mark
        px = text_thumbnail_pixels(b"x" * 299 + "€".encode("utf-8"))
        assert px.shape == (200, 200, 3)  # no exception, boundary-safe

    def test_thumbnail_table_covers_every_page(self, spark):
        from readur_spark.corpus import synthetic_pages
        from readur_spark.ml.multimodal import thumbnail_table

        pages = synthetic_pages(spark, 200)
        thumbs = thumbnail_table(pages)
        assert thumbs.count() == pages.count()
        kinds = {r.thumb_kind for r in thumbs.select("thumb_kind").distinct().collect()}
        assert "image" in kinds and "placeholder" in kinds
