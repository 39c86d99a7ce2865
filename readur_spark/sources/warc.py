"""WARC source — Common-Crawl's native archive format as a pages table.

The reference ingests from filesystem walks and WebDAV sync
(src/ingestion/batch_ingest.rs:47-130, src/services/webdav/); the
Common-Crawl-scale equivalent input is WARC (ISO 28500): length-
prefixed records of HTTP responses. This module reads WARC files into
the engine's canonical pages schema (url, warc_ts, html, text, lang)
with no external dependencies:

  - discovery: Spark's binaryFile source lists and reads whole files
    in parallel (one task per file — WARC members are not splittable
    without an index; Common Crawl ships ~1 GB files by design, so
    file-level parallelism is the intended unit);
  - parsing: a pure-Python WARC record walker inside mapInPandas —
    header parse, Content-Length framed payload, HTTP header/body
    split; response records only;
  - gzip: .warc.gz is a concatenation of per-record gzip members
    (the CC convention) — handled by decompressing the multi-member
    stream.

At 100 TB: 100k × 1 GB files → 100k parallel tasks; lang/text stay
null at ingest (they are extraction outputs, not inputs). A real
deployment would register the resulting frame as the Iceberg input
table this engine's pipeline reads.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """(warc_headers, payload) per record. Tolerant walker: a malformed
    record ends the file (same stance as CC tooling) rather than
    raising — at 10^5 files one truncated archive must not kill a job."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # multi-member streams supported
    pos, n = 0, len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        headers = _parse_headers(data[pos:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        yield headers, payload
        pos = body_start + length
        # record terminator: two CRLFs
        while data.startswith(_CRLF, pos):
            pos += 2


def _http_body(payload: bytes) -> bytes:
    """Split the HTTP response head from the body (response records
    carry the full HTTP message)."""
    if payload[:5] in (b"HTTP/",):
        split = payload.find(_CRLF + _CRLF)
        if split >= 0:
            return payload[split + 4 :]
    return payload


def parse_warc_bytes(data: bytes) -> list[dict]:
    """WARC file bytes → pages rows (response records only)."""
    rows = []
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        ts = headers.get("warc-date")
        rows.append(
            {
                "url": url,
                "warc_ts": pd.Timestamp(ts) if ts else None,
                "html": _http_body(payload),
                "text": None,
                "lang": None,
            }
        )
    return rows


def latest_per_url(pages: DataFrame) -> DataFrame:
    """Enforce the corpus contract (input_hint: url is the table key):
    keep the latest capture per url, tie-broken by payload sha256.

    Scale shape: winner selection runs on a slim (url, ts, sha) key
    projection (~100 B/row) as a map-side-combinable agg; the MB-scale
    payload crosses the wire once, in the (url, ts, sha) semi-join.
    Rows still tied after (warc_ts, sha256) are byte-identical captures,
    so the final dropDuplicates on the same composite key is
    content-deterministic (any survivor is the same bytes); AQE reuses
    the semi-join's hash partitioning so it does not re-shuffle."""
    from pyspark.sql import functions as F

    hashed = pages.withColumn("_sha", F.sha2(F.col("html"), 256)).withColumn(
        "_ts0", F.coalesce(F.col("warc_ts"), F.lit("1970-01-01").cast("timestamp"))
    )
    winners = (
        hashed.select("url", "_ts0", "_sha")
        .groupBy("url")
        .agg(F.max(F.struct("_ts0", "_sha")).alias("w"))
        .select("url", F.col("w._ts0").alias("_ts0"), F.col("w._sha").alias("_sha"))
    )
    return (
        hashed.join(winners, ["url", "_ts0", "_sha"], "left_semi")
        .dropDuplicates(["url", "_ts0", "_sha"])
        .drop("_sha", "_ts0")
    )


def read_warc_pages(
    spark: SparkSession, path: str, unique_urls: bool = True
) -> DataFrame:
    """WARC file(s)/glob → pages DataFrame (canonical schema).

    WARC archives carry one record per *capture*, so a recrawled
    WARC-Target-URI appears multiple times; the engine's pages table is
    keyed by url (input_hint). With unique_urls=True (default) the
    within-file duplicates are dropped in the parse batch (free) and
    cross-file ones by latest_per_url (one slim-key agg + one payload
    semi-join); pass False to see raw captures."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for pdf in batches:
            rows: list[dict] = []
            for content in pdf["content"]:
                rows.extend(parse_warc_bytes(bytes(content)))
            out = pd.DataFrame(rows, columns=cols)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True)
            if unique_urls and len(out):
                # within-file: keep the last capture per url (records are
                # written in crawl order; the global pass handles ties)
                out = out.drop_duplicates(subset=["url"], keep="last")
            yield out

    files = spark.read.format("binaryFile").load(path).select("content")
    pages = files.mapInPandas(
        run,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    return latest_per_url(pages) if unique_urls else pages


# -- writer (tests / fixtures; also documents the format we accept) --------


def write_warc(rows: list[tuple[str, str, bytes]], compress: bool = False) -> bytes:
    """Build a WARC file from (url, iso_ts, body) triples, wrapping
    each body in a minimal HTTP/1.1 200 response — the shape CC
    produces and `read_warc_pages` consumes."""
    out = io.BytesIO()
    for url, ts, body in rows:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "
            + str(len(body)).encode()
            + _CRLF + _CRLF
            + body
        )
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + _CRLF +
            b"WARC-Date: " + ts.encode() + _CRLF +
            b"Content-Type: application/http;msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + _CRLF + _CRLF
        )
        rec = head + http + _CRLF + _CRLF
        out.write(gzip.compress(rec) if compress else rec)
    return out.getvalue()


# -- WET emission (extracted-text conversion records) -----------------------


def wet_record_bytes(url: str, iso_ts: str, text: str) -> bytes:
    """One WARC/1.0 `conversion` record — the WET format Common Crawl
    ships extracted text in (ISO 28500 §6.8; framing identical to the
    records `iter_warc_records` walks). Deterministic by construction:

      - WARC-Record-ID is a pseudo-uuid derived from md5(url + date)
        instead of a random uuid (documented deviation — the engine's
        content-addressed convention; re-runs emit identical bytes);
      - WARC-Block-Digest is the spec's sha1 in RFC 4648 base32 (160
        bits -> exactly 32 chars, no padding).
    """
    import base64
    import hashlib

    body = text.encode("utf-8")
    rid = hashlib.md5((url + iso_ts).encode()).hexdigest()
    record_id = (
        f"<urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}"
        f"-{rid[16:20]}-{rid[20:32]}>"
    )
    digest = base64.b32encode(hashlib.sha1(body).digest()).decode()
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: " + url.encode() + _CRLF +
        b"WARC-Date: " + iso_ts.encode() + _CRLF +
        b"WARC-Record-ID: " + record_id.encode() + _CRLF +
        b"WARC-Block-Digest: sha1:" + digest.encode() + _CRLF +
        b"Content-Type: text/plain\r\n"
        b"Content-Length: " + str(len(body)).encode() + _CRLF + _CRLF
    )
    return head + body + _CRLF + _CRLF


def wet_member_bytes(url: str, iso_ts: str, text: str) -> bytes:
    """The record as one gzip member (mtime pinned to 0 so the bytes
    are reproducible) — CC's member-per-record convention, so WET files
    concatenate and split at member boundaries."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(wet_record_bytes(url, iso_ts, text))
    return buf.getvalue()


def parse_wet_bytes(data: bytes) -> list[dict]:
    """WET file bytes → extracted-text rows (conversion records)."""
    rows = []
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != "conversion":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        ts = headers.get("warc-date")
        rows.append(
            {
                "url": url,
                "warc_ts": pd.Timestamp(ts) if ts else None,
                "text": payload.decode("utf-8", "replace"),
            }
        )
    return rows


def wet_members(
    extracted: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "extracted_text",
) -> DataFrame:
    """(url, wet binary) — each row's extracted text as one gzip WET
    member. A pure Arrow-batched projection (one payload pass, no
    shuffle); writing a shard file is then `concat(members)` per
    partition — the member-per-record framing makes shard assembly an
    order-preserving byte concatenation, no re-compression."""
    slim = extracted.select(url_col, ts_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            urls: list[str] = []
            members: list[bytes] = []
            for url, ts, text in zip(
                batch[url_col], batch[ts_col], batch[text_col]
            ):
                if text is None:
                    continue
                # NaT arrives as pd.NaT (not None); pd.isna covers both,
                # else strftime raises inside the Arrow task.
                iso = (
                    "1970-01-01T00:00:00Z"
                    if pd.isna(ts)
                    else pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
                )
                urls.append(url)
                members.append(wet_member_bytes(url, iso, text))
            yield pd.DataFrame({"url": urls, "wet": members})

    return slim.mapInPandas(run, schema="url string, wet binary")
