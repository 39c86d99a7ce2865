#!/usr/bin/env python
"""Regenerate the frozen extraction golden (tests/goldens/).

Run ONLY after an intentional, reviewed semantic change to the
extraction kernels; the frozen file exists to catch unintentional
drift (tests/test_frozen_golden.py).

    PYTHONPATH=. python tests/make_golden.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from readur_spark.datagen import generate_pages
from readur_spark.kernels.extract import extract_page

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_PATH = os.path.join(HERE, "goldens", "extracted_n500_s42.parquet")
N_DOCS, SEED = 500, 42


def compute_golden() -> pa.Table:
    rows = generate_pages(N_DOCS, seed=SEED).to_pylist()
    cols: dict[str, list] = {
        "url": [], "extracted_text": [], "confidence": [],
        "word_count": [], "status": [], "failure_reason": [],
    }
    for r in rows:
        payload = bytes(r["html"]) if r["html"] is not None else b""
        res = extract_page(r["url"], payload)
        cols["url"].append(r["url"])
        cols["extracted_text"].append(res.extracted_text)
        cols["confidence"].append(res.confidence)
        cols["word_count"].append(res.word_count)
        cols["status"].append(res.status)
        cols["failure_reason"].append(res.failure_reason)
    return pa.table(
        {
            "url": pa.array(cols["url"]),
            "extracted_text": pa.array(cols["extracted_text"]),
            "confidence": pa.array(cols["confidence"], pa.float32()),
            "word_count": pa.array(cols["word_count"], pa.int32()),
            "status": pa.array(cols["status"]),
            "failure_reason": pa.array(cols["failure_reason"]),
        }
    )


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    pq.write_table(compute_golden(), GOLDEN_PATH, compression="zstd")
    print(GOLDEN_PATH)
