"""queries/crawl.py politeness_schedule — per-host serialized fetches."""

from __future__ import annotations

import hashlib

from readur_spark.queries.crawl import politeness_schedule


ROWS = [
    (1, "a.example", "https://a.example/1", 500),
    (2, "a.example", "https://a.example/2", 500),
    (3, "a.example", "https://a.example/3", 500),
    (4, "b.example", "https://b.example/1", 1000),
    (5, "b.example", "https://b.example/2", 1000),
]


def _frame(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, host string, url string, delay_ms long"
    )


class TestPolitenessSchedule:
    def test_waves_are_dense_per_host(self, spark):
        got = politeness_schedule(_frame(spark)).collect()
        by_host = {}
        for r in got:
            by_host.setdefault(r["host"], []).append(r["wave"])
        assert sorted(by_host["a.example"]) == [0, 1, 2]
        assert sorted(by_host["b.example"]) == [0, 1]

    def test_offsets_respect_delay(self, spark):
        got = {
            r["doc_id"]: r
            for r in politeness_schedule(_frame(spark)).collect()
        }
        for r in got.values():
            delay = 500 if r["host"] == "a.example" else 1000
            assert r["offset_ms"] == r["wave"] * delay

    def test_order_is_md5_of_url(self, spark):
        got = {
            r["doc_id"]: r["wave"]
            for r in politeness_schedule(_frame(spark)).collect()
        }
        a_rows = [(d, u) for d, h, u, _ in ROWS if h == "a.example"]
        want_order = sorted(
            a_rows, key=lambda t: hashlib.md5(t[1].encode()).hexdigest()
        )
        assert [got[d] for d, _ in want_order] == [0, 1, 2]
