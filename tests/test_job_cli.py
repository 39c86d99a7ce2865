"""spark-submit job entry: end-to-end run, resume, packaging."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(args: list[str]) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "jobs", "run_extraction.py"), *args],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_job_run_and_resume(tmp_path, pages_parquet):
    store = str(tmp_path / "store")
    r1 = _run_job(["--input", pages_parquet, "--store", store,
                   "--run-id", "r1", "--cpus", "8"])
    assert r1["status"] == "committed"
    assert r1["n_docs"] > 0
    assert os.path.isdir(os.path.join(store, "metrics"))
    assert os.path.isdir(os.path.join(store, "lineage"))

    # re-run: everything committed → up_to_date, no second snapshot
    r2 = _run_job(["--input", pages_parquet, "--store", store,
                   "--run-id", "r2", "--cpus", "8"])
    assert r2["status"] == "up_to_date"


def test_job_type_filter_gates_ingest(tmp_path, pages_parquet):
    """A7 at the job layer: the default run drops disallowed
    extensions (.zip etc.) before extraction; --no-type-filter ingests
    everything. Distinct stores so resume doesn't interfere."""
    filtered = _run_job(["--input", pages_parquet,
                         "--store", str(tmp_path / "s1"), "--cpus", "8"])
    raw = _run_job(["--input", pages_parquet, "--no-type-filter",
                    "--store", str(tmp_path / "s2"), "--cpus", "8"])
    assert filtered["status"] == raw["status"] == "committed"
    assert filtered["n_docs"] < raw["n_docs"]
    # the delta is exactly the disallowed-extension pages (urls with an
    # extension outside the allow list)
    import pyarrow.parquet as pq

    from readur_spark.kernels.mime import is_allowed_file_type, url_extension
    from readur_spark.kernels.settings import DEFAULT_SETTINGS

    urls = [r["url"] for r in pq.read_table(pages_parquet, columns=["url"]).to_pylist()]
    allowed = DEFAULT_SETTINGS["allowed_file_types"]
    n_disallowed = sum(
        1 for u in urls
        if url_extension(u) and not is_allowed_file_type(u, allowed)
    )
    assert n_disallowed > 0
    # raw ingests every page; filtered lost ≥ the disallowed ones after
    # dedup (dedup collapses some, so compare committed deltas loosely)
    assert raw["n_docs"] - filtered["n_docs"] <= n_disallowed


def test_package_zip_importable(tmp_path):
    sys.path.insert(0, os.path.join(REPO_ROOT, "jobs"))
    try:
        import package as pkg_mod
    finally:
        sys.path.pop(0)
    out = pkg_mod.build(str(tmp_path / "readur_spark.zip"))
    with zipfile.ZipFile(out) as z:
        names = z.namelist()
    assert "readur_spark/__init__.py" in names
    assert "readur_spark/kernels/extract.py" in names
    assert not any("__pycache__" in n for n in names)
    # the zip itself is importable (the --py-files contract)
    sys.path.insert(0, out)
    try:
        import importlib

        importlib.invalidate_caches()
        spec = importlib.util.find_spec("readur_spark.kernels.text")
        assert spec is not None
    finally:
        sys.path.pop(0)


def test_job_charset_normalize_flag(tmp_path, spark):
    """--charset-normalize: a windows-1252 page extracts to the real
    punctuation instead of U+FFFD mojibake; the default path is
    byte-compatible with the historical strict-UTF-8 read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    html = (
        '<html><head><meta http-equiv="Content-Type" content="text/html; '
        'charset=iso-8859-1"></head><body><article><p>'
        + "A long enough paragraph of body prose so the content scorer "
        "keeps the block, quoting “smart quotes” and the — dash "
        "to prove the decode. " * 3
        + "</p></article></body></html>"
    ).encode("cp1252")
    src = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.table(
            {
                "url": ["https://ex.test/a.html"],
                "warc_ts": pa.array([None], pa.timestamp("us")),
                "html": pa.array([html], pa.binary()),
                "text": [None],
                "lang": ["en"],
            }
        ),
        src,
    )
    plain = _run_job(["--input", src, "--store", str(tmp_path / "s1"),
                      "--cpus", "4"])
    fixed = _run_job(["--input", src, "--charset-normalize",
                      "--store", str(tmp_path / "s2"), "--cpus", "4"])
    assert plain["status"] == fixed["status"] == "committed"

    def _texts(store):
        df = spark.read.parquet(
            *[str(p) for p in (tmp_path / store / "snapshots").rglob("*.parquet")]
        )
        return [
            r["extracted_text"] or ""
            for r in df.select("extracted_text").collect()
        ]

    assert any("“smart quotes”" in t and "—" in t for t in _texts("s2"))
    assert not any("“smart quotes”" in t for t in _texts("s1"))


def test_curation_job_end_to_end(tmp_path, pages_parquet):
    """extraction job → curation job → shard layout with yields."""
    store = str(tmp_path / "cstore")
    r1 = _run_job(["--input", pages_parquet, "--store", store,
                   "--run-id", "cur1", "--cpus", "8"])
    assert r1["status"] == "committed"

    shards = str(tmp_path / "shards")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
         "--input", store,
         "--output", shards, "--redact-pii", "--min-words", "5",
         "--cpus", "8"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["status"] == "written"
    total = sum(v["n_docs"] for v in summary["yields"].values())
    assert total > 0
    # layout exists and rows survive a read-back
    import glob
    assert glob.glob(os.path.join(shards, "split=*", "*.parquet"))


def test_curation_append_is_incremental(tmp_path, pages_parquet):
    store = str(tmp_path / "astore")
    _run_job(["--input", pages_parquet, "--store", store,
              "--run-id", "a1", "--cpus", "8"])
    shards = str(tmp_path / "ashards")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")

    def _curate(extra):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
             "--input", store, "--output", shards,
             "--min-words", "5", "--cpus", "8", *extra],
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    first = _curate([])
    assert first["status"] == "written"
    # same input again in append mode: everything already shipped
    again = _curate(["--append"])
    assert again["status"] == "up_to_date"


def _gate_passing_text(i: int) -> str:
    """60 words, mean word length in [3,10], ≥2 distinct stopwords,
    high unique ratio — clears every C4/Gopher gate."""
    words = ["the", "and"] + [f"w{i}x{j}" for j in range(58)]
    return " ".join(words)


def _curate_plain(input_path: str, output: str, extra: list[str]) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
         "--input", input_path, "--output", output,
         "--min-words", "5", "--cpus", "4", *extra],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_curation_append_new_rows_yields_delta(tmp_path):
    """ADVICE r2: --append with genuinely NEW input must report the
    delta's yields (not silently zero) and the layout must hold
    old + new. Also pins the single-execution contract: rows_observed
    (the Observation on the curated plan) == rows actually written."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    def write_docs(path, lo, hi):
        pq.write_table(
            pa.table({
                "url": [f"https://h{i}.example/d{i}.txt" for i in range(lo, hi)],
                "extracted_text": [_gate_passing_text(i) for i in range(lo, hi)],
            }),
            path,
        )

    in1 = str(tmp_path / "in1.parquet")
    in2 = str(tmp_path / "in2.parquet")
    write_docs(in1, 0, 20)
    write_docs(in2, 0, 32)  # the first 20 plus 12 genuinely new docs
    shards = str(tmp_path / "shards")

    first = _curate_plain(in1, shards, [])
    n_first = sum(v["n_docs"] for v in first["yields"].values())
    assert n_first == 20
    assert first["rows_observed"] == n_first

    second = _curate_plain(in2, shards, ["--append"])
    assert second["status"] == "written"
    n_second = sum(v["n_docs"] for v in second["yields"].values())
    assert n_second == 12  # only the delta
    assert second["rows_observed"] == n_second

    n_layout = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{shards}/*/*.parquet')"
    ).fetchone()[0]
    assert n_layout == 32
    n_distinct = duckdb.sql(
        f"SELECT count(DISTINCT url) FROM read_parquet('{shards}/*/*.parquet')"
    ).fetchone()[0]
    assert n_distinct == 32  # no double-shipped urls


def test_curation_append_then_compact(tmp_path, pages_parquet):
    """--append --compact together: delta write, then layout rewrite;
    row set preserved."""
    store = str(tmp_path / "ccstore")
    _run_job(["--input", pages_parquet, "--store", store,
              "--run-id", "cc1", "--cpus", "8"])
    shards = str(tmp_path / "ccshards")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")

    def _curate(extra):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
             "--input", store, "--output", shards,
             "--min-words", "5", "--cpus", "8",
             "--max-records-per-file", "20", *extra],
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    first = _curate([])
    n_total = sum(v["n_docs"] for v in first["yields"].values())
    second = _curate(["--append", "--compact"])
    assert second["status"] in ("written", "up_to_date")
    import duckdb

    n_after = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{shards}/*/*.parquet')"
    ).fetchone()[0]
    assert n_after == n_total


def test_curation_job_round3_gates(tmp_path, pages_parquet):
    """--url-gates/--domain-blocklist/--domain-cap/--nfc/--line-filter/
    --lm-filter compose with the base pipeline; the blocked dominant
    host is absent from the written shards."""
    store = str(tmp_path / "gstore")
    r1 = _run_job(["--input", pages_parquet, "--store", store,
                   "--run-id", "g1", "--cpus", "8"])
    assert r1["status"] == "committed"

    bl = tmp_path / "blocklist.txt"
    bl.write_text("host0.example\n")
    shards = str(tmp_path / "gshards")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
         "--input", store, "--output", shards,
         "--min-words", "5", "--cpus", "8",
         "--url-gates", "--domain-blocklist", str(bl),
         "--domain-cap", "50", "--nfc", "--line-filter", "--lm-filter"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["status"] == "written"
    assert sum(v["n_docs"] for v in summary["yields"].values()) > 0

    from pyspark.sql import functions as F

    from readur_spark.session import get_spark

    spark = get_spark(8)
    written = spark.read.parquet(shards)
    assert written.filter(
        F.col("url").contains("//host0.example/")
    ).count() == 0
    assert written.count() > 0


def test_curation_nb_filter_composes(tmp_path, pages_parquet):
    """--nb-filter trains the gate-distilled classifier on the run's
    own corpus and drops scored-negative docs; the job still yields
    rows (the corpus' prose family is lexically distinct from its
    boilerplate, so positives survive)."""
    store = str(tmp_path / "nbstore")
    r1 = _run_job(["--input", pages_parquet, "--store", store,
                   "--run-id", "nb1", "--cpus", "8"])
    assert r1["status"] == "committed"

    shards = str(tmp_path / "nbshards")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
         "--input", store, "--output", shards,
         "--min-words", "5", "--cpus", "8", "--nb-filter"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["status"] == "written"
    assert sum(v["n_docs"] for v in summary["yields"].values()) > 0


def test_export_job_end_to_end(tmp_path, pages_parquet):
    """extract → curate → export: BPE learned on train, every split
    token-accounted, train packed into context-bounded bins."""
    store = str(tmp_path / "xstore")
    r1 = _run_job(["--input", pages_parquet, "--store", store,
                   "--run-id", "x1", "--cpus", "8"])
    assert r1["status"] == "committed"

    shards = str(tmp_path / "xshards")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
         "--input", store, "--output", shards,
         "--min-words", "5", "--cpus", "8"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]

    packed = str(tmp_path / "xpacked")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "jobs", "run_export.py"),
         "--input", shards, "--output", packed,
         "--context", "256", "--shards", "4", "--cpus", "8"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    m = json.loads(line)
    assert m["status"] == "written"
    assert m["num_merges_learned"] > 0
    assert m["splits"]["train"]["n_docs"] > 0
    assert m["splits"]["train"]["n_bpe_tokens"] > 0
    assert m["train_bins"] > 0
    assert 0 < m["train_bin_fill_pct"]

    from pyspark.sql import functions as F

    from readur_spark.session import get_spark

    spark = get_spark(8)
    written = spark.read.parquet(packed).filter(F.col("split") == "train")
    # bin invariant: a bin's tokens fit the context unless it holds
    # exactly one oversized doc
    bad = (
        written.groupBy("shard", "bin_id")
        .agg(F.sum("n_bpe_tokens").alias("t"), F.count("*").alias("k"))
        .filter((F.col("t") > 256) & (F.col("k") > 1))
        .count()
    )
    assert bad == 0
    # within-shard order column is a clean 1..n sequence
    n = written.count()
    assert written.select("shard", "pos").distinct().count() == n


def test_frontier_job_end_to_end(tmp_path, spark):
    """run_frontier.py: robots gate + politeness plan over a url list."""
    urls = [
        ("https://h1.example/doc1",),   # blocked by prefix rule
        ("https://h1.example/page2",),
        ("https://h1.example/page3",),
        ("https://h2.example/doc9",),   # other host: no rules -> allowed
    ]
    spark.createDataFrame(urls, "url string").write.parquet(
        str(tmp_path / "urls")
    )
    spark.createDataFrame(
        [("h1.example", "/doc", False)],
        "host string, prefix string, allow boolean",
    ).write.parquet(str(tmp_path / "rules"))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO_ROOT, "jobs", "run_frontier.py"),
            "--input", str(tmp_path / "urls"),
            "--output", str(tmp_path / "plan"),
            "--rules", str(tmp_path / "rules"),
            "--delay-ms", "700",
            "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["n_input"] == 4
    assert summary["n_blocked_by_robots"] == 1
    assert summary["n_scheduled"] == 3
    assert summary["n_hosts"] == 2
    assert summary["fetch_horizon_ms"] == summary["max_wave"] * 700

    plan = {r["url"]: r for r in spark.read.parquet(
        str(tmp_path / "plan")).collect()}
    assert "https://h1.example/doc1" not in plan
    assert sorted(
        r["wave"] for u, r in plan.items() if u.startswith("https://h1")
    ) == [0, 1]


def test_curation_mojibake_and_paragraph_dedup_compose(tmp_path, pages_parquet):
    """--mojibake repairs encoding damage ahead of normalization and
    --paragraph-dedup removes corpus-duplicated paragraphs; composed
    with the document gates the job still yields rows."""
    store = str(tmp_path / "mpstore")
    r1 = _run_job(["--input", pages_parquet, "--store", store,
                   "--run-id", "mp1", "--cpus", "8"])
    assert r1["status"] == "committed"

    shards = str(tmp_path / "mpshards")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
         "--input", store, "--output", shards,
         "--min-words", "5", "--cpus", "8",
         "--mojibake", "--paragraph-dedup", "--nfc"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["status"] == "written"
    assert sum(v["n_docs"] for v in summary["yields"].values()) > 0


def test_curation_soft_dedup_cap(tmp_path, pages_parquet):
    """--soft-dedup-cap drops gram-commonness-heavy documents; with a
    permissive cap the pipeline still yields rows, and a prohibitive
    cap (999 < the 1000 full-weight floor) drops every doc with grams
    while gramless docs fall to the word gate — proving the stage is
    actually wired in."""
    store = str(tmp_path / "sdstore")
    r1 = _run_job(["--input", pages_parquet, "--store", store,
                   "--run-id", "sd1", "--cpus", "8"])
    assert r1["status"] == "committed"

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")

    def run(cap, out_dir):
        out = subprocess.run(
            [sys.executable,
             os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
             "--input", store, "--output", out_dir,
             "--min-words", "5", "--cpus", "8",
             "--soft-dedup-cap", str(cap)],
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        return json.loads(line)

    loose = run(10_000_000, str(tmp_path / "sd_loose"))
    assert loose["status"] == "written"
    n_loose = sum(v["n_docs"] for v in loose["yields"].values())
    assert n_loose > 0

    tight = run(999, str(tmp_path / "sd_tight"))
    n_tight = sum(v["n_docs"] for v in tight["yields"].values())
    assert n_tight < n_loose


def test_curation_sentence_dedup_and_blocklist_compose(tmp_path, pages_parquet):
    """--sentence-dedup removes corpus-frequent sentences and
    --blocklist drops docs containing banned terms; composed with the
    document gates the job still yields rows, and a blocklist naming a
    corpus-universal word drops everything — proving both stages are
    actually wired in."""
    store = str(tmp_path / "sbstore")
    r1 = _run_job(["--input", pages_parquet, "--store", store,
                   "--run-id", "sb1", "--cpus", "8"])
    assert r1["status"] == "committed"

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")

    def run(extra, out_dir):
        out = subprocess.run(
            [sys.executable,
             os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
             "--input", store, "--output", out_dir,
             "--min-words", "5", "--cpus", "8"] + extra,
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        return json.loads(line)

    rare = str(tmp_path / "rare.txt")
    with open(rare, "w") as fh:
        fh.write("zzz_never_in_corpus\n# not a term\nzz qq\n".replace("# not a term\n", ""))
    s1 = run(["--sentence-dedup", "--blocklist", rare],
             str(tmp_path / "sb_loose"))
    assert s1["status"] == "written"
    n_loose = sum(v["n_docs"] for v in s1["yields"].values())
    assert n_loose > 0

    common = str(tmp_path / "common.txt")
    with open(common, "w") as fh:
        fh.write("the\n")  # near-universal in extracted English text
    s2 = run(["--blocklist", common], str(tmp_path / "sb_tight"))
    n_tight = sum(v["n_docs"] for v in s2["yields"].values())
    assert n_tight < n_loose


def test_cdx_plan_job_end_to_end(tmp_path, spark):
    """run_cdx_plan.py: CDXJ lines -> latest-capture + digest-dedup ->
    coalesced span plan. Three captures of one url (two sharing a
    digest), one malformed line, two files."""
    import pyspark.sql.functions as F

    from readur_spark.sources.cdx import cdxj_line, surt_urlkey

    base = spark.createDataFrame(
        [
            ("http://e.com/a", "20230101000001", "d1", "f1.warc.gz", 0, 700),
            ("http://e.com/a", "20230101000002", "d1", "f1.warc.gz", 1000, 700),
            ("http://e.com/a", "20230101000003", "d2", "f1.warc.gz", 2000, 700),
            ("http://e.com/b", "20230101000001", "d3", "f2.warc.gz", 0, 100),
        ],
        "url string, ts string, digest string, filename string, "
        "off long, len long",
    ).select(
        cdxj_line(
            surt_urlkey(F.col("url")), F.col("ts"), F.col("url"),
            F.lit("text/html"), F.lit("200"), F.col("digest"),
            F.col("len"), F.col("off"), F.col("filename"),
        ).alias("line")
    ).union(spark.createDataFrame([("garbage",)], "line string"))
    base.write.parquet(str(tmp_path / "cdx"))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO_ROOT, "jobs", "run_cdx_plan.py"),
            "--input", str(tmp_path / "cdx"),
            "--output", str(tmp_path / "spans"),
            "--collapse", "latest", "--dedup-digest",
            "--gap", "300", "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    s = json.loads(line)
    assert s["n_lines"] == 5 and s["n_malformed"] == 1
    assert s["n_records"] == 4
    # latest collapse keeps ts3 for /a (digest d2) + /b; digest dedup
    # then keeps both (d2, d3 distinct)
    assert s["n_planned"] == 2
    assert s["n_spans"] == 2 and s["n_files"] == 2
    assert s["payload_bytes"] == 800
    assert s["dead_bytes"] == 0

    spans = {r["filename"]: r for r in spark.read.parquet(
        str(tmp_path / "spans")).collect()}
    assert spans["f1.warc.gz"]["span_start"] == 2000
    assert spans["f1.warc.gz"]["span_end"] == 2700


def test_license_signals_and_gate_compose(tmp_path, spark):
    """run_extraction --license-signals attaches (license_id,
    permissive) through the Arrow extraction passthrough; run_curation
    --license-gate permissive keeps only redistribution-safe grants."""
    import pyspark.sql.functions as F

    CC = {
        0: "https://creativecommons.org/licenses/by/4.0/",       # perm
        1: "https://creativecommons.org/licenses/by-nc-nd/2.5/", # not
        2: None,                                                 # untagged
    }
    rows = []
    for i in range(30):
        href = CC[i % 3]
        lic = f'<a rel="license" href="{href}">L</a>' if href else ""
        body = " ".join(
            f"the word{j} of page{i} is about topic{j} and value{j}."
            for j in range(40)
        )
        html = f"<html><body>{lic}<p>{body}</p></body></html>"
        rows.append((f"https://h{i % 4}.example/page{i}.html",
                     html.encode("utf-8")))
    spark.createDataFrame(rows, "url string, html binary").withColumn(
        "warc_ts", F.lit("2023-01-01 00:00:00").cast("timestamp")
    ).withColumn("text", F.lit(None).cast("string")).withColumn(
        "lang", F.lit("en")
    ).write.parquet(str(tmp_path / "pages"))

    store = str(tmp_path / "store")
    r = _run_job(["--input", str(tmp_path / "pages"), "--store", store,
                  "--license-signals", "--run-id", "lic", "--cpus", "4"])
    assert r["status"] == "committed" and r["n_docs"] == 30

    from readur_spark.operators.checkpoint import SnapshotStore

    docs = SnapshotStore(store).read(spark)
    got = {r2["license_id"] for r2 in docs.select("license_id").collect()}
    assert got == {"cc-by-4.0", "cc-by-nc-nd-2.5", None}
    assert docs.filter("permissive").count() == 10

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
            "--input", store, "--output", str(tmp_path / "shards"),
            "--license-gate", "permissive", "--min-words", "10",
            "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    s = json.loads(line)
    assert s["status"] == "written"
    assert sum(v["n_docs"] for v in s["yields"].values()) == 10

    # gate without the columns -> explicit error, not a silent no-op
    spark.createDataFrame(
        [("u1", "some text " * 30)], "url string, extracted_text string"
    ).write.parquet(str(tmp_path / "plain"))
    out2 = subprocess.run(
        [
            sys.executable, os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
            "--input", str(tmp_path / "plain"),
            "--output", str(tmp_path / "shards2"),
            "--license-gate", "permissive", "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out2.returncode == 2
    line2 = [l for l in out2.stdout.strip().splitlines() if l.startswith("{")][-1]
    assert json.loads(line2)["status"] == "error"


def test_curation_code_route(tmp_path, pages_parquet):
    """--code-route forks the corpus by the integer code-likeness
    gate: the synthetic pages are prose, so 'exclude' keeps the
    baseline yield while 'only' reduces it to the (near-empty) set of
    docs whose extracted text trips the keyword/symbol score —
    proving the routing stage is wired ahead of the prose gates."""
    store = str(tmp_path / "crstore")
    r1 = _run_job(["--input", pages_parquet, "--store", store,
                   "--run-id", "cr1", "--cpus", "8"])
    assert r1["status"] == "committed"

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")

    def run(extra, out_dir):
        out = subprocess.run(
            [sys.executable,
             os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
             "--input", store, "--output", out_dir,
             "--min-words", "5", "--cpus", "8", *extra],
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        return json.loads(line)

    base = run([], str(tmp_path / "cr_base"))
    n_base = sum(v["n_docs"] for v in base["yields"].values())
    assert n_base > 0

    prose = run(["--code-route", "exclude"], str(tmp_path / "cr_prose"))
    n_prose = sum(v["n_docs"] for v in prose["yields"].values())
    assert n_prose == n_base  # prose corpus untouched by the fork

    only = run(["--code-route", "only"], str(tmp_path / "cr_code"))
    n_only = sum(v["n_docs"] for v in only.get("yields", {}).values())
    assert n_only < n_base  # the code fork is the complement


def test_frontier_job_opic_ordering(tmp_path, spark):
    """--edges turns on OPIC importance ordering: within one host, the
    most-linked-to url takes wave 0 regardless of its hash order."""
    urls = [(f"https://h.example/p{i}",) for i in range(4)]
    spark.createDataFrame(urls, "url string").write.parquet(
        str(tmp_path / "urls")
    )
    # p3 is the link magnet: every other page points at it
    edges = [
        (f"https://h.example/p{i}", "https://h.example/p3")
        for i in range(3)
    ] + [("https://h.example/p3", "https://h.example/p0")]
    spark.createDataFrame(edges, "src string, dst string").write.parquet(
        str(tmp_path / "edges")
    )

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO_ROOT, "jobs", "run_frontier.py"),
            "--input", str(tmp_path / "urls"),
            "--output", str(tmp_path / "plan"),
            "--edges", str(tmp_path / "edges"),
            "--opic-iters", "4",
            "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    plan = {r["url"]: r for r in spark.read.parquet(
        str(tmp_path / "plan")).collect()}
    assert len(plan) == 4
    # the magnet fetches first; waves are dense 0..3 on the one host
    assert plan["https://h.example/p3"]["wave"] == 0
    assert sorted(r["wave"] for r in plan.values()) == [0, 1, 2, 3]


def test_curation_doremi_and_leakage_flags(tmp_path, pages_parquet):
    """--doremi-report writes a domain-quota table whose quotas sum
    exactly to --doremi-budget over the CURATED corpus, and
    --leakage-audit appends the per-split 4-gram leakage report to
    the summary JSON."""
    store = str(tmp_path / "dlstore")
    r1 = _run_job(["--input", pages_parquet, "--store", store,
                   "--run-id", "dl1", "--cpus", "8"])
    assert r1["status"] == "committed"

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    report = str(tmp_path / "doremi")
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO_ROOT, "jobs", "run_curation.py"),
         "--input", store, "--output", str(tmp_path / "dl_shards"),
         "--min-words", "5", "--cpus", "8",
         "--doremi-report", report, "--doremi-budget", "10000",
         "--leakage-audit"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["status"] == "written"
    # leakage report covers every non-train split with exact fields
    assert set(summary["leakage"]) <= {"valid", "test"}
    for rep in summary["leakage"].values():
        assert rep["n_docs"] > 0
        assert 0 <= rep["n_leaked_docs"] <= rep["n_docs"]
        assert rep["leaked_permille"] == (
            1000 * rep["n_leaked_docs"]) // rep["n_docs"]
    # quota table: exact-sum Hamilton over curated-domain weights
    import pyarrow.parquet as pq

    tbl = pq.read_table(report)
    assert summary["doremi_domains"] == tbl.num_rows > 0
    assert sum(tbl["quota"].to_pylist()) == 10000
    cols = set(tbl.column_names)
    assert {"domain", "loss_cbits", "excess_cbits", "score",
            "quota"} <= cols


def test_curation_secrets_gate_and_unimax_report(tmp_path):
    """--secrets-gate drops the doc carrying a flagged hex digest;
    --unimax-report writes the per-language quota table (lang re-
    joined from the raw input by url)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    secret = "0123456789abcdef0123456789abcdef"
    texts, langs = [], []
    for i in range(8):
        t = _gate_passing_text(i)
        if i == 3:
            t = t + " key " + secret
        texts.append(t)
        langs.append("en" if i % 2 == 0 else "fr")
    inp = str(tmp_path / "sin.parquet")
    pq.write_table(
        pa.table({
            "url": [f"https://h{i}.example/d{i}.txt" for i in range(8)],
            "extracted_text": texts,
            "lang": langs,
        }),
        inp,
    )
    shards = str(tmp_path / "sshards")
    report = str(tmp_path / "unimax")
    summary = _curate_plain(
        inp, shards,
        ["--min-words", "5", "--secrets-gate",
         "--unimax-report", report, "--unimax-budget", "200"],
    )
    assert summary["status"] == "written"
    assert summary["secrets_dropped"] == 1
    assert summary["unimax_langs"] == 2
    total = sum(v["n_docs"] for v in summary["yields"].values())
    assert total == 7  # 8 in, 1 dropped by the secrets gate
    import duckdb

    plan = duckdb.sql(
        f"select lang, alloc from read_parquet('{report}/*.parquet') "
        "order by lang"
    ).fetchall()
    assert [p[0] for p in plan] == ["en", "fr"]
    assert sum(p[1] for p in plan) == 200  # budget conserved


def test_curation_mirror_report(tmp_path):
    """--mirror-report surfaces host pairs sharing exact content
    (measured pre-dedup; the shipped corpus is still deduped)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    urls, texts = [], []
    for i in range(6):
        # mirror.example and copy.example carry identical docs
        urls.append(f"https://mirror.example/d{i}.txt")
        texts.append(_gate_passing_text(i) + f" tail{i}")
        urls.append(f"https://copy.example/d{i}.txt")
        texts.append(_gate_passing_text(i) + f" tail{i}")
    urls.append("https://solo.example/d9.txt")
    texts.append(_gate_passing_text(9) + " unique tail")
    inp = str(tmp_path / "min.parquet")
    pq.write_table(
        pa.table({"url": urls, "extracted_text": texts}), inp
    )
    shards = str(tmp_path / "mshards")
    summary = _curate_plain(inp, shards, ["--min-words", "5",
                                          "--mirror-report"])
    assert summary["status"] == "written"
    pairs = summary["mirror_pairs"]
    assert len(pairs) == 1
    p = pairs[0]
    assert {p["host_a"], p["host_b"]} == {"mirror.example", "copy.example"}
    assert p["mirror_permille"] == 1000 and p["is_mirror"]
    # exact dedup still collapsed the copies in the shipped corpus
    total = sum(v["n_docs"] for v in summary["yields"].values())
    assert total == 7


def test_curation_datasheet(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    inp = str(tmp_path / "din.parquet")
    pq.write_table(
        pa.table({
            "url": [f"https://h{i % 2}.example/d{i}.txt" for i in range(6)],
            "extracted_text": [_gate_passing_text(i) + f" t{i}"
                               for i in range(6)],
        }),
        inp,
    )
    shards = str(tmp_path / "dshards")
    summary = _curate_plain(inp, shards, ["--min-words", "5", "--datasheet"])
    card = summary["datasheet"]
    assert card["n_docs"] == 6
    assert card["n_sources"] == 2
    assert card["dup_permille"] == 0
    assert card["n_tokens"] > 0
