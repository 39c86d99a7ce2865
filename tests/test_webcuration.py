"""Unit tests for the web-curation tier: C4/Gopher gates, PII
redaction, hash splits, crawl diff, URL canonicalization, packing.

The sf0.01 oracle parity for every registered query lives in
test_entry_contract.py; these tests pin the operator semantics on
hand-built rows where the expected answer is computed by eye.
"""

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from readur_spark.ml.packing import pack_concat_chunks, pack_greedy
from readur_spark.ml.webfilters import (
    redact_pii,
    web_filter_signals,
    with_hash_split,
)
from readur_spark.queries.crawl import canonicalize_url, snapshot_diff


class TestWebFilters:
    def test_signals_on_known_rows(self, spark):
        rows = [
            Row(id=1, text="the and " + " ".join(f"word{i}" for i in range(60))),  # keep
            Row(id=2, text="the and tiny doc"),               # too short
            Row(id=3, text="zz " * 80),                       # no stopwords + repetitive
        ]
        df = spark.createDataFrame(rows)
        sig = web_filter_signals(F.col("text"), min_words=40)
        out = {
            r["id"]: r
            for r in df.select(
                "id", *[e.alias(n) for n, e in sig.items()]
            ).collect()
        }
        assert out[1]["keep"] == 1
        assert out[2]["keep"] == 0 and out[2]["flag_word_count"] == 1
        assert out[3]["keep"] == 0
        assert out[3]["flag_stopwords"] == 1
        assert out[3]["flag_repetitive"] == 1

    def test_redaction_bytes(self, spark):
        df = spark.createDataFrame(
            [Row(t="mail a.b+c@x-y.org ip 10.0.255.4 tel 555-123-4567 end")]
        )
        got = df.select(redact_pii(F.col("t")).alias("r")).first()["r"]
        assert got == "mail <EMAIL> ip <IP> tel <PHONE> end"

    def test_redaction_leaves_clean_text(self, spark):
        clean = "no pii here just words and 12 numbers 3.14"
        got = (
            spark.createDataFrame([Row(t=clean)])
            .select(redact_pii(F.col("t")).alias("r"))
            .first()["r"]
        )
        assert got == clean

    def test_hash_split_deterministic_and_total(self, spark):
        df = spark.createDataFrame(
            [Row(url=f"https://x.example/{i}") for i in range(500)]
        )
        a = with_hash_split(df, "url").groupBy("split").count().collect()
        b = with_hash_split(df.repartition(7), "url").groupBy("split").count()
        counts = {r["split"]: r["count"] for r in a}
        assert counts == {r["split"]: r["count"] for r in b.collect()}
        assert sum(counts.values()) == 500
        # ~80/10/10 with slack for a 500-row sample
        assert counts["train"] > 350
        assert counts.get("valid", 0) > 10
        assert counts.get("test", 0) > 10


class TestDecontam:
    def test_contamination_hits(self, spark):
        from readur_spark.ml.decontam import contamination_hits

        corpus = spark.createDataFrame([
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=2, text="one two three four five six seven"),
            Row(doc_id=3, text="x y alpha beta gamma delta epsilon q"),
        ])
        ev = spark.createDataFrame(
            [Row(doc_id=9, text="alpha beta gamma delta epsilon")]
        )
        got = {
            r["doc_id"]: r["n_hit_shingles"]
            for r in contamination_hits(corpus, ev).collect()
        }
        # docs 1 and 3 contain the eval 5-gram; doc 2 is clean
        assert got == {1: 1, 3: 1}

    def test_site_boilerplate_recovers_header(self, spark):
        from readur_spark.ml.decontam import site_boilerplate_shingles

        rows = [
            Row(doc_id=i, source="s1",
                text=f"header one two three four body{i} tail{i} x{i} y{i} z{i}")
            for i in range(10)
        ]
        rows += [
            Row(doc_id=100 + i, source="s2",
                text=f"totally different words here {i} a{i} b{i} c{i} d{i}")
            for i in range(10)
        ]
        df = spark.createDataFrame(rows)
        got = site_boilerplate_shingles(df).collect()
        sites = {r["site"] for r in got}
        assert sites == {"s1"}  # only s1 shares a template
        assert {r["s"] for r in got} == {"header one two three four"}
        assert all(r["frac_r"] == 1.0 for r in got)

    def test_stratified_sample_exact_and_stable(self, spark):
        from readur_spark.ml.webfilters import stratified_sample

        rows = [
            Row(k=f"u{i}", stratum="a" if i % 2 == 0 else "b")
            for i in range(100)
        ]
        df = spark.createDataFrame(rows)
        s1 = {r["k"] for r in stratified_sample(df, ["stratum"], "k", 10).collect()}
        s2 = {
            r["k"]
            for r in stratified_sample(
                df.repartition(13), ["stratum"], "k", 10
            ).collect()
        }
        assert s1 == s2  # same winners under any partitioning
        assert len(s1) == 20  # exactly quota per stratum


class TestCrawl:
    def test_snapshot_diff_statuses(self, spark):
        prev = spark.createDataFrame(
            [Row(url="a", text="one"), Row(url="b", text="two"),
             Row(url="c", text="three")]
        )
        curr = spark.createDataFrame(
            [Row(url="b", text="two"), Row(url="c", text="THREE"),
             Row(url="d", text="four")]
        )
        got = {r["url"]: r["status"] for r in snapshot_diff(prev, curr).collect()}
        assert got == {
            "a": "removed", "b": "unchanged", "c": "changed", "d": "added",
        }

    @pytest.mark.parametrize(
        "raw,canon",
        [
            ("HTTP://WWW.Ex.COM:80/A/B/?z=1&a=2#f", "http://ex.com/A/B?a=2&z=1"),
            ("https://ex.com/path", "https://ex.com/path"),
            ("https://ex.com:443/", "https://ex.com"),
            ("https://sub.www-ish.com/x", "https://sub.www-ish.com/x"),
            # non-default ports are real endpoints — never stripped
            ("http://h.com:443/x", "http://h.com:443/x"),
            ("https://h.com:80/x", "https://h.com:80/x"),
            ("ftp://h.com:80/x", "ftp://h.com:80/x"),
        ],
    )
    def test_canonicalize(self, spark, raw, canon):
        got = (
            spark.createDataFrame([Row(u=raw)])
            .select(canonicalize_url(F.col("u")).alias("c"))
            .first()["c"]
        )
        assert got == canon


class TestPacking:
    def _docs(self, spark):
        # one shard, token counts chosen to straddle a 10-token chunk
        rows = [Row(doc_id=i, shard=0, n_tokens=n)
                for i, n in enumerate([4, 4, 4, 6, 12, 3])]
        return spark.createDataFrame(rows)

    def test_concat_chunks_offsets(self, spark):
        out = {
            r["doc_id"]: r
            for r in pack_concat_chunks(self._docs(spark), chunk_tokens=10)
            .collect()
        }
        # offsets: 0,4,8,12,18,30
        assert [out[i]["start_offset"] for i in range(6)] == [0, 4, 8, 12, 18, 30]
        # doc2 spans chunks 0-1; doc4 spans 1-2
        assert (out[2]["chunk_first"], out[2]["chunk_last"]) == (0, 1)
        assert out[2]["spans_boundary"] == 1
        assert (out[4]["chunk_first"], out[4]["chunk_last"]) == (1, 2)
        assert out[1]["spans_boundary"] == 0

    def test_greedy_bins(self, spark):
        out = pack_greedy(self._docs(spark), bin_tokens=10).toPandas()
        out = out.sort_values("doc_id")
        # greedy: [4,4]=8 | [4,6]=10 | [12] | [3]
        assert list(out["bin_id"]) == [0, 0, 1, 1, 2, 3]

    def test_greedy_state_survives_batches(self, spark):
        rows = [Row(doc_id=i, shard=i % 2, n_tokens=3) for i in range(200)]
        df = spark.createDataFrame(rows)
        small_batches = spark.conf.get(
            "spark.sql.execution.arrow.maxRecordsPerBatch", None
        )
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
        try:
            out = pack_greedy(df, bin_tokens=9).toPandas()
        finally:
            if small_batches is None:
                spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
            else:
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", small_batches
                )
        # each shard has 100 docs of 3 tokens, 3 per bin -> 34 bins, all
        # but the last holding exactly 3 docs — only true if the fill
        # state carried across the 16-row Arrow batches
        for shard in (0, 1):
            sizes = (
                out[out["shard"] == shard].groupby("bin_id").size().tolist()
            )
            assert sizes == [3] * 33 + [1]


class TestSketches:
    def test_hll_within_relative_error(self, spark):
        from readur_spark.ml.textqc import approx_distinct_tokens

        rows = [
            Row(lang="en", text=" ".join(f"tok{i+j}" for j in range(50)))
            for i in range(0, 2000, 50)
        ]
        df = spark.createDataFrame(rows)
        for r in approx_distinct_tokens(df).collect():
            rel = abs(r["approx_distinct"] - r["exact_distinct"]) / r["exact_distinct"]
            assert rel < 0.05, (r, rel)


class TestReviewRegressions:
    """Pins for the round-2 code-review fixes."""

    def test_web_filters_whitespace_tokenization(self, spark):
        from readur_spark.ml.webfilters import web_filter_signals

        # newline/tab separated words must count individually; double
        # spaces must not create empty tokens
        rows = [Row(id=1, text="the and\n" + "\t".join(f"word{i}" for i in range(50))),
                Row(id=2, text="the  and  " + "  ".join(f"word{i}" for i in range(50)))]
        sig = web_filter_signals(F.col("text"), min_words=40)
        out = {
            r["id"]: r
            for r in spark.createDataFrame(rows)
            .select("id", *[e.alias(n) for n, e in sig.items()])
            .collect()
        }
        assert out[1]["n_words"] == 52
        assert out[2]["n_words"] == 52
        assert out[1]["keep"] == 1 and out[2]["keep"] == 1

    def test_small_sites_not_flagged_as_boilerplate(self, spark):
        from readur_spark.ml.decontam import site_boilerplate_shingles

        rows = [Row(doc_id=1, source="tiny",
                    text="unique words in a single page here today")]
        rows += [
            Row(doc_id=10 + i, source="big",
                text=f"header one two three four body{i} x{i} y{i} z{i} q{i}")
            for i in range(10)
        ]
        got = site_boilerplate_shingles(spark.createDataFrame(rows)).collect()
        assert {r["site"] for r in got} == {"big"}

    def test_pack_concat_chunks_rows_frame_on_ties(self, spark):
        from readur_spark.ml.packing import pack_concat_chunks

        # duplicate (shard, doc_id): ROWS frame must give running
        # offsets, not peer-inclusive RANGE sums
        rows = [Row(doc_id=1, shard=0, n_tokens=4),
                Row(doc_id=1, shard=0, n_tokens=4),
                Row(doc_id=2, shard=0, n_tokens=4)]
        out = sorted(
            (r["start_offset"] for r in
             pack_concat_chunks(spark.createDataFrame(rows), chunk_tokens=10)
             .collect())
        )
        assert out == [0, 4, 8]

    def test_paginate_accepts_partial_settings(self, spark):
        from readur_spark.queries.facets import paginate

        df = spark.createDataFrame([Row(i=i) for i in range(30)])
        got = paginate(df, [F.asc("i")], page=1, settings={"unrelated": 1}).count()
        assert got == 25  # falls back to the default page size


class TestIdempotenceLaws:
    """Canonical forms must be fixed points: f(f(x)) == f(x). Checked
    in one Spark pass over a deterministic messy-input matrix (per-row
    hypothesis would pay a Spark job per example)."""

    def test_canonicalize_idempotent(self, spark):
        schemes = ["http", "HTTPS", "ftp"]
        hosts = ["WWW.Ex.COM", "ex.com:443", "www.ex.com:80", "a.b-c.de:8080"]
        paths = ["", "/", "/A/b/", "/x%20y"]
        qss = ["", "?b=2&a=1", "?one=1"]
        frags = ["", "#f"]
        rows = [
            Row(u=f"{s}://{h}{p}{q}{fr}")
            for s in schemes for h in hosts for p in paths
            for q in qss for fr in frags
        ]
        df = spark.createDataFrame(rows)
        once = canonicalize_url(F.col("u"))
        out = df.select(
            once.alias("c1"),
            canonicalize_url(once).alias("c2"),
        ).collect()
        for r in out:
            assert r["c1"] == r["c2"], r

    def test_redact_pii_idempotent(self, spark):
        texts = [
            "a@b.co then 1.2.3.4 and 555-123-4567",
            "nested a.b@c.dd.ee text 999.999.999.999",
            "<EMAIL> stays put 10.0.0.1",
            "clean text no pii at all",
        ]
        df = spark.createDataFrame([Row(t=t) for t in texts])
        once = redact_pii(F.col("t"))
        out = df.select(once.alias("r1"), redact_pii(once).alias("r2")).collect()
        for r in out:
            assert r["r1"] == r["r2"], r


class TestRepeatedSpans:
    def test_shared_tail_recovered_and_merged(self, spark):
        from readur_spark.ml.decontam import repeated_ngram_spans

        shared = " ".join(f"s{i}" for i in range(25))
        rows = [
            Row(doc_id=1, text=" ".join(f"a{i}" for i in range(30)) + " " + shared),
            Row(doc_id=2, text=" ".join(f"b{i}" for i in range(10)) + " " + shared),
            Row(doc_id=3, text=" ".join(f"c{i}" for i in range(40))),
        ]
        out = repeated_ngram_spans(spark.createDataFrame(rows), n=20)
        spans = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in out.collect()}
        # overlapping hit grams merge into ONE maximal span per doc,
        # covering exactly the 25-token shared tail
        assert spans == {1: (31, 55), 2: (11, 35)}
        assert out.filter(F.col("doc_id") == 3).count() == 0


    def test_remove_spans_strips_exact_tail(self, spark):
        from readur_spark.ml.decontam import remove_spans

        docs = spark.createDataFrame([
            Row(doc_id=1, text="a b c d e f g h"),
            Row(doc_id=2, text="x y z"),
        ])
        spans = spark.createDataFrame(
            [Row(doc_id=1, span_start=3, span_end=5)]
        )
        out = {
            r["doc_id"]: r["cleaned_text"]
            for r in remove_spans(docs, spans).collect()
        }
        assert out == {1: "a b f g h", 2: "x y z"}
