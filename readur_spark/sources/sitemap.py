"""Sitemap source (sitemaps.org protocol) — frontier discovery.

The reference engine discovers work by walking configured mounts
(src/services/webdav/, src/ingestion/batch_ingest.rs:47-130); the web
crawl's equivalent discovery artifact is the sitemap: `<urlset>` files
listing fetchable urls with freshness hints, and `<sitemapindex>`
files listing child sitemaps. Parsed from the protocol spec with the
stdlib parser only — namespace-agnostic (matching on local tag names,
since real-world sitemaps mix default/prefixed/absent namespaces),
gzip-tolerant (.xml.gz is the convention at scale), and malformed-file
tolerant (a broken sitemap yields zero rows, it does not kill the job
— the same stance as sources/warc.py).

Scale: discovery via Spark's binaryFile source (one task per file;
sitemap files cap at 50k urls / 50 MB by spec, so file-level
parallelism is the natural unit); parsing in mapInPandas; index
expansion is a driver-side breadth walk over CHILD LISTS only (the
child urls themselves never leave the executors).
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(data: bytes) -> tuple[list[dict], list[str]]:
    """(url rows, child sitemap locs). Url rows carry url / lastmod /
    changefreq / priority (None where absent)."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except OSError:
            return [], []
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return [], []
    rows: list[dict] = []
    children: list[str] = []
    kind = _local(root.tag)
    for entry in root:
        tag = _local(entry.tag)
        fields: dict[str, str] = {}
        for child in entry:
            fields[_local(child.tag)] = (child.text or "").strip()
        loc = fields.get("loc")
        if not loc:
            continue
        if kind == "sitemapindex" and tag == "sitemap":
            children.append(loc)
        elif kind == "urlset" and tag == "url":
            try:
                prio = float(fields["priority"]) if "priority" in fields else None
            except ValueError:
                prio = None
            rows.append(
                {
                    "url": loc,
                    "lastmod": fields.get("lastmod") or None,
                    "changefreq": fields.get("changefreq") or None,
                    "priority": prio,
                }
            )
    return rows, children


def read_sitemap_frontier(spark: SparkSession, path: str) -> DataFrame:
    """Sitemap file(s)/glob → frontier rows (url, lastmod timestamp,
    changefreq, priority). Index files contribute their children's locs
    as a `child_sitemaps` side effect only when read directly via
    `parse_sitemap`; here they simply yield no url rows (fetch the
    children into the same directory and re-run — discovery is
    idempotent)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "lastmod", "changefreq", "priority"]
        for pdf in batches:
            rows: list[dict] = []
            for content in pdf["content"]:
                entries, _ = parse_sitemap(bytes(content))
                rows.extend(entries)
            out = pd.DataFrame(rows, columns=cols)
            out["lastmod"] = pd.to_datetime(
                out["lastmod"], utc=True, format="ISO8601", errors="coerce"
            )
            yield out

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(
        run,
        schema="url string, lastmod timestamp, changefreq string, "
        "priority double",
    )
