"""sources/sitemap.py — sitemaps.org frontier discovery."""

from __future__ import annotations

import gzip

from readur_spark.sources.sitemap import parse_sitemap, read_sitemap_frontier

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example/p1</loc><lastmod>2024-01-02T03:04:05Z</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://a.example/p2</loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""

INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example/s1.xml</loc></sitemap>
  <sitemap><loc>https://a.example/s2.xml.gz</loc></sitemap>
</sitemapindex>"""


class TestParse:
    def test_urlset(self):
        rows, children = parse_sitemap(URLSET)
        assert children == []
        assert [r["url"] for r in rows] == [
            "https://a.example/p1", "https://a.example/p2"
        ]  # loc-less entry dropped
        assert rows[0]["lastmod"] == "2024-01-02T03:04:05Z"
        assert rows[0]["changefreq"] == "daily"
        assert rows[0]["priority"] == 0.8
        assert rows[1]["priority"] is None

    def test_index(self):
        rows, children = parse_sitemap(INDEX)
        assert rows == []
        assert children == [
            "https://a.example/s1.xml", "https://a.example/s2.xml.gz"
        ]

    def test_gzip_and_garbage(self):
        rows, _ = parse_sitemap(gzip.compress(URLSET))
        assert len(rows) == 2
        assert parse_sitemap(b"not xml at all") == ([], [])
        assert parse_sitemap(b"\x1f\x8btruncated") == ([], [])


class TestSparkFrontier:
    def test_read_frontier(self, spark, tmp_path):
        (tmp_path / "a.xml").write_bytes(URLSET)
        (tmp_path / "b.xml.gz").write_bytes(gzip.compress(
            URLSET.replace(b"a.example", b"b.example")))
        (tmp_path / "idx.xml").write_bytes(INDEX)  # contributes no urls
        df = read_sitemap_frontier(spark, str(tmp_path))
        got = {r["url"]: r for r in df.collect()}
        assert set(got) == {
            "https://a.example/p1", "https://a.example/p2",
            "https://b.example/p1", "https://b.example/p2",
        }
        assert got["https://a.example/p1"].lastmod is not None
        assert got["https://a.example/p2"].lastmod is None
