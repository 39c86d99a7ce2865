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


class TestRetryBackoff:
    """retry_backoff_plan (queries/crawl.py): ledger edge cases."""

    def _plan(self, spark, rows):
        from readur_spark.queries.crawl import retry_backoff_plan

        df = spark.createDataFrame(
            rows, "url string, attempt_ts long, outcome string"
        )
        return {r["url"]: r for r in retry_backoff_plan(df).collect()}

    def test_exponential_and_cap(self, spark):
        rows = [("u", 1000 + i, "timeout") for i in range(3)]
        out = self._plan(spark, rows)
        # 3 consecutive failures -> delay 60 << 2 = 240
        assert out["u"]["n_fail"] == 3
        assert out["u"]["next_attempt_ts"] == 1002 + 240
        rows12 = [("v", 2000 + i, "dns") for i in range(12)]
        from readur_spark.queries.crawl import retry_backoff_plan

        df = spark.createDataFrame(
            rows12, "url string, attempt_ts long, outcome string"
        )
        v = retry_backoff_plan(df, max_attempts=20).first()
        # 12 failures -> 60 << 11 = 122880 > cap 86400 -> capped
        assert v["next_attempt_ts"] == 2011 + 86_400

    def test_success_resets_and_latest_success_drops(self, spark):
        rows = [
            ("u", 1, "timeout"), ("u", 2, "ok"), ("u", 3, "http_5xx"),
            ("w", 1, "timeout"), ("w", 2, "ok"),
        ]
        out = self._plan(spark, rows)
        # u: one failure AFTER the success -> n_fail 1, delay 60
        assert out["u"]["n_fail"] == 1
        assert out["u"]["next_attempt_ts"] == 3 + 60
        # w: latest attempt succeeded -> not scheduled at all
        assert "w" not in out

    def test_give_up_past_max(self, spark):
        rows = [("u", 10 + i, "dns") for i in range(6)]
        out = self._plan(spark, rows)
        assert out["u"]["give_up"] is True
        assert out["u"]["next_attempt_ts"] is None
