"""Content-defined chunking (Gear hash) for payload-level dedup.

Published recipe (Xia et al., "FastCDC: a Fast and Efficient
Content-Defined Chunking Approach for Data Deduplication", USENIX ATC
2016, and the Gear hash it builds on — re-implemented from the
paper's description, simplified to the classic Gear-CDC cut rule):
split a byte stream at positions where a rolling hash of the last 64
bytes masks to zero. Because the cut decision depends only on LOCAL
content, inserting or deleting bytes early in a document only
re-chunks the neighborhood of the edit — every later chunk keeps its
boundaries and digest, which is what makes chunk-level dedup of a
10^12-document payload store (the WARC/html column) actually work
across recrawls: a banner swap re-uploads one chunk, not the page.

This is the storage-tier sibling of ml/winnow.py (which fingerprints
for SIMILARITY; CDC partitions for STORAGE). The fixed-size-block
alternative breaks on any insertion — the boundary-shift test below
is the property that rules it out.

Gear rolling hash, windowed form: with a 256-entry random table G
(deterministic here: md5-derived, engine- and platform-independent),

    h_i = sum_{j=0..63} G[b_{i-j}] << j   (mod 2^64)

— each shift drops one bit per step, so only the last 64 bytes ever
contribute. That windowed form is what the kernel computes with 64
vectorized numpy adds per buffer (no per-byte Python loop); the
sequential part — enforcing MIN/MAX chunk bounds — walks only the
sparse candidate list (~n/1024 positions).

Cut rule: position i ends a chunk when (h_i & CDC_MASK) == 0 and the
chunk is >= CDC_MIN bytes; a chunk is force-cut at CDC_MAX. Expected
chunk size ~= CDC_MIN + 2^mask_bits.

Scale design (100 TB payload):
  - chunking is mapInPandas over the payload column — embarrassingly
    parallel, no shuffle; emitted rows are slim (url, idx, off, len,
    digest), the bytes themselves never leave the scan task unless
    the caller materializes chunk content;
  - the dedup rollup is one combinable agg over digests (the exact
    hash-groupBy family, A5/A6);
  - no oracle: the per-byte rolling kernel is not reasonably
    SQL-expressible, so this registers on the rows-only tier with
    the algorithmic contract pinned by pytest instead (boundary
    determinism, min/max bounds, reassembly identity, and the
    shift-invariance property that IS the reason CDC exists) — the
    same stance as MinHash/SimHash plan pins.

Reference tie-in: the reference stores whole-file SHA-256 for exact
dedup (src/ingestion/, SURVEY §2 A5/A6); CDC is the sub-file
generalization its 100 TB deployment would need.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

CDC_WINDOW = 64
CDC_MASK = 0x3FF  # 10 bits -> ~1 KiB average above the floor
CDC_MIN = 256
CDC_MAX = 4096
_U64 = (1 << 64) - 1


def gear_table() -> list[int]:
    """256 deterministic 64-bit gear values (md5-derived — identical
    on every platform/engine, so chunk boundaries are reproducible
    corpus facts, not runtime artifacts)."""
    return [
        int(hashlib.md5(b"cdc-gear-%d" % b).hexdigest()[:16], 16)
        for b in range(256)
    ]


def chunk_boundaries(data: bytes, gear: list[int] | None = None) -> list[int]:
    """End offsets (exclusive) of each chunk of `data`. Pure-Python
    reference kernel — the numpy batch kernel must agree exactly."""
    if gear is None:
        gear = gear_table()
    n = len(data)
    if n == 0:
        return []
    cuts = []
    h = 0
    start = 0
    for i, b in enumerate(data):
        h = ((h << 1) + gear[b]) & _U64
        length = i - start + 1
        if (length >= CDC_MIN and (h & CDC_MASK) == 0) or length >= CDC_MAX:
            cuts.append(i + 1)
            start = i + 1
    if start < n:
        cuts.append(n)
    return cuts


def _boundaries_np(data: bytes, gear_np) -> list[int]:
    """Vectorized twin: windowed Gear hash via 64 shifted adds, then a
    sparse walk over mask-zero candidates enforcing MIN/MAX."""
    import numpy as np

    n = len(data)
    if n == 0:
        return []
    b = np.frombuffer(data, dtype=np.uint8)
    g = gear_np[b]  # per-position gear values
    h = np.zeros(n, dtype=np.uint64)
    for j in range(min(CDC_WINDOW, n)):
        # h[i] += G[b[i-j]] << j  — uint64 wraps mod 2^64 like the
        # reference kernel's mask
        if j == 0:
            h += g
        else:
            h[j:] += g[:-j] << np.uint64(j)
    cand = np.flatnonzero((h & np.uint64(CDC_MASK)) == 0) + 1  # end offsets
    cuts = []
    start = 0
    ci = 0
    m = len(cand)
    while start < n:
        limit = start + CDC_MAX
        floor = start + CDC_MIN
        while ci < m and cand[ci] < floor:
            ci += 1
        if ci < m and cand[ci] <= limit:
            cut = int(cand[ci])
            ci += 1
        else:
            cut = min(limit, n)
        cuts.append(cut)
        start = cut
    return cuts


def chunk_table(
    docs: DataFrame, *, payload_col: str = "payload", id_col: str = "url"
) -> DataFrame:
    """(url, idx, off, length, digest) — CDC chunks of a binary
    column via the vectorized kernel; digests are md5-16-hex of the
    chunk bytes."""
    import numpy as np

    gear_np = np.array(gear_table(), dtype=np.uint64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "idx": [], "off": [], "length": [],
                   "digest": []}
            for url, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                prev = 0
                for idx, cut in enumerate(_boundaries_np(data, gear_np)):
                    out["url"].append(url)
                    out["idx"].append(idx)
                    out["off"].append(prev)
                    out["length"].append(cut - prev)
                    out["digest"].append(
                        hashlib.md5(data[prev:cut]).hexdigest()[:16]
                    )
                    prev = cut
            yield pd.DataFrame(out)

    return docs.select(id_col, payload_col).mapInPandas(
        run, "url STRING, idx INT, off LONG, length LONG, digest STRING"
    )


def dedup_rollup(chunks: DataFrame) -> DataFrame:
    """One-row storage accounting: chunk/byte totals, distinct chunk
    content, and the dedup ratio in permille."""
    return chunks.agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.countDistinct("digest").cast("long").alias("n_distinct"),
        F.sum("length").cast("long").alias("total_bytes"),
    ).crossJoin(
        chunks.groupBy("digest").agg(F.first("length").alias("l"))
        .agg(F.sum("l").cast("long").alias("stored_bytes"))
    ).select(
        "n_chunks", "n_distinct", "total_bytes", "stored_bytes",
        F.expr("(1000L * stored_bytes) div greatest(total_bytes, 1L)")
        .alias("stored_permille"),
    )


@register("cdc_chunk_stats")  # rows-only: per-byte kernel, no SQL twin
def cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC storage accounting over the documents' text payloads (the
    sandbox's stand-in for the html/WARC byte column). Algorithmic
    contract pinned by tests/test_cdc.py: numpy==reference kernel,
    min/max bounds, reassembly identity, boundary-shift invariance."""
    docs = load(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc"), F.col("doc_id")).alias("url"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    return dedup_rollup(chunk_table(docs))
