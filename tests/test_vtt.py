"""WebVTT cue parsing (ml/vtt.py).

Full DuckDB value-hash runs in test_entry_contract.py (the oracle
restates every cue from the construction rule); here: timestamp
arithmetic across the hour boundary, header/NOTE skipping, multi-line
payload normalization, malformed-block tolerance, and the
zero-Python plan."""

from __future__ import annotations

from readur_spark.ml.vtt import parse_vtt_cues

SF = "/root/testdata/sf0.001"


def _tracks(spark, vtt):
    return spark.createDataFrame([("u", vtt)], ["url", "vtt"])


class TestParse:
    def test_hours_minutes_seconds_millis(self, spark):
        vtt = (
            "WEBVTT\n\n"
            "01:02:03.456 --> 01:02:04.000\nfirst cue\n\n"
            "10:00:00.001 --> 10:00:00.999\nsecond cue\n"
        )
        rows = parse_vtt_cues(_tracks(spark, vtt)).orderBy("cue_idx").collect()
        assert rows[0]["start_ms"] == 3723456
        assert rows[0]["end_ms"] == 3724000
        assert rows[1]["start_ms"] == 36000001
        assert rows[1]["end_ms"] == 36000999
        assert [r["text"] for r in rows] == ["first cue", "second cue"]

    def test_header_and_note_skipped_without_index(self, spark):
        vtt = (
            "WEBVTT\n\nNOTE a comment block\n\n"
            "00:00:01.000 --> 00:00:02.000\nonly cue\n"
        )
        rows = parse_vtt_cues(_tracks(spark, vtt)).collect()
        assert len(rows) == 1 and rows[0]["cue_idx"] == 0

    def test_multiline_payload_joined(self, spark):
        vtt = (
            "WEBVTT\n\n00:00:00.000 --> 00:00:01.000\nline one\nline two\n"
        )
        r = parse_vtt_cues(_tracks(spark, vtt)).first()
        assert r["text"] == "line one line two"

    def test_malformed_block_dropped(self, spark):
        vtt = (
            "WEBVTT\n\nnot a timing line\njust text\n\n"
            "00:00:05.000 --> 00:00:06.000\nreal cue\n"
        )
        rows = parse_vtt_cues(_tracks(spark, vtt)).collect()
        assert [r["text"] for r in rows] == ["real cue"]


class TestPlan:
    def test_no_python_ops(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["vtt_cue_parse"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan


class TestFrameAlign:
    def test_coverage_arithmetic(self, spark):
        from readur_spark.queries.registry import queries

        rows = queries()["cue_frame_align"](spark, SF).collect()
        assert rows
        for r in rows:
            # a 1500-2000ms cue at 500ms clock covers 3-4 frames
            assert 2 <= r["n_frames"] <= 5
            assert r["n_frames"] == r["last_frame"] - r["first_frame"] + 1
            # frame instants lie inside [start, end): boundary sanity
            assert r["first_frame"] * 500 >= 0
