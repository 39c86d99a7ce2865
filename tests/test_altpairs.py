"""Image-text pair mining (ml/altpairs.py).

Full DuckDB value-hash runs in test_entry_contract.py (the oracle
restates every pair from the construction rule); here: tag-parse edge
cases the constructed corpus can't reach (missing attributes,
self-closing tags, caption binding across multiple figures), the gate
boundary, and the single-Arrow-free plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from readur_spark.ml.altpairs import (
    MIN_ALT_CHARS,
    alt_pair_gate,
    extract_image_alts,
    figure_captions,
    image_text_pairs,
)

SF = "/root/testdata/sf0.001"


def _pages(spark, *htmls):
    return spark.createDataFrame(
        [(f"u{i}", h) for i, h in enumerate(htmls)], ["url", "html_str"]
    )


class TestExtract:
    def test_attribute_order_free(self, spark):
        html = (
            '<img src="a.jpg" alt="first one">'
            '<img alt="second one" src="b.jpg">'
        )
        rows = extract_image_alts(_pages(spark, html)).orderBy("img_idx").collect()
        assert [(r["src"], r["alt"]) for r in rows] == [
            ("a.jpg", "first one"),
            ("b.jpg", "second one"),
        ]

    def test_missing_alt_is_empty(self, spark):
        r = extract_image_alts(_pages(spark, '<img src="x.jpg">')).first()
        assert r["alt"] == "" and r["n_alt_chars"] == 0

    def test_self_closing_and_noise_attrs(self, spark):
        html = '<img width="3" src="y.jpg" class="c" alt="tiny cat"/>'
        r = extract_image_alts(_pages(spark, html)).first()
        assert r["src"] == "y.jpg" and r["alt"] == "tiny cat"


class TestCaptions:
    def test_two_figures_bind_to_own_src(self, spark):
        html = (
            '<figure><img src="a.jpg"><figcaption>A cap</figcaption></figure>'
            '<figure><img src="b.jpg"><figcaption>B cap</figcaption></figure>'
        )
        rows = {r["src"]: r["caption"] for r in
                figure_captions(_pages(spark, html)).collect()}
        assert rows == {"a.jpg": "A cap", "b.jpg": "B cap"}

    def test_unwrapped_img_gets_empty_caption(self, spark):
        out = image_text_pairs(
            _pages(spark, '<img src="solo.jpg" alt="a lone image here">')
        ).first()
        assert out["caption"] == "" and out["keep"]


class TestGate:
    def test_boundary_and_stoplist(self, spark):
        df = spark.createDataFrame(
            [("tiny",), ("tinys",), ("logo",), ("a real alt",)], ["alt"]
        ).select(
            "alt",
            alt_pair_gate(F.col("alt"), F.length("alt").cast("long")).alias("keep"),
        )
        got = {r["alt"]: r["keep"] for r in df.collect()}
        assert got == {
            "tiny": False,       # 4 < MIN_ALT_CHARS
            "tinys": True,       # exactly at the boundary
            "logo": False,       # stoplisted
            "a real alt": True,
        }
        assert MIN_ALT_CHARS == 5


class TestFetchPlan:
    def test_dedup_and_politeness_shape(self, spark):
        from readur_spark.queries.registry import queries

        rows = queries()["image_fetch_plan"](spark, SF).collect()
        # every surviving image fetched once, with its reference count
        srcs = [r["src"] for r in rows]
        assert len(srcs) == len(set(srcs))
        assert all(r["n_refs"] == 2 for r in rows)
        # placeholder-alt groups (g % 5 == 0) never reach the plan
        assert all("/i0.jpg" not in r["src"] for r in rows)
        # per-host waves are dense from 0 and offsets follow the delay
        by_host: dict[str, list] = {}
        for r in rows:
            by_host.setdefault(r["host"], []).append(r)
        assert len(by_host) == 7
        for host, rs in by_host.items():
            waves = sorted(r["wave"] for r in rs)
            assert waves == list(range(len(rs))), host
            per_wave = {r["wave"]: r["offset_ms"] for r in rs}
            if len(per_wave) > 1:
                delay = per_wave[1] - per_wave[0]
                assert all(per_wave[w] == w * delay for w in per_wave), host


class TestPlan:
    def test_no_python_ops(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["image_alt_pairs"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        assert "BroadcastHashJoin" in plan  # captions broadcast, never shuffled

    def test_fetch_plan_pure_catalyst(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["image_fetch_plan"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan


class TestSrcsetResolve:
    def test_max_width_wins_any_declaration_order(self, spark):
        from readur_spark.ml.altpairs import extract_image_sources

        html = (
            '<img src="ph.gif" srcset="a.jpg 1280w, b.jpg 320w, c.jpg 640w">'
        )
        r = extract_image_sources(_pages(spark, html)).first()
        assert r["effective_src"] == "a.jpg"
        assert r["src_kind"] == "srcset"

    def test_density_descriptors_lose_to_widths(self, spark):
        from readur_spark.ml.altpairs import extract_image_sources

        html = '<img srcset="hi.jpg 2x, wide.jpg 800w">'
        r = extract_image_sources(_pages(spark, html)).first()
        assert r["effective_src"] == "wide.jpg"

    def test_data_src_beats_placeholder_src(self, spark):
        from readur_spark.ml.altpairs import extract_image_sources

        html = '<img src="1px.gif" data-src="real.jpg">'
        r = extract_image_sources(_pages(spark, html)).first()
        assert r["effective_src"] == "real.jpg"
        assert r["src_kind"] == "data-src"

    def test_plain_src_and_none(self, spark):
        from readur_spark.ml.altpairs import extract_image_sources

        rows = extract_image_sources(
            _pages(spark, '<img src="x.jpg"><img class="deco">')
        ).orderBy("img_idx").collect()
        assert (rows[0]["effective_src"], rows[0]["src_kind"]) == (
            "x.jpg", "src")
        assert (rows[1]["effective_src"], rows[1]["src_kind"]) == ("", "none")
