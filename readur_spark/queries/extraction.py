"""Extraction queries over the driver's `documents` table (the
oracle-checkable face of the byte-identical contract).

The documents table stands in for the text/plain backbone: mapping it
to pages (corpus.pages_from_documents) and running the full vectorized
extraction operator must reproduce, byte-for-byte, what trivial SQL
(trim + whitespace split) predicts — because that is exactly what the
reference's text path does (src/ocr/enhanced.rs:1441-1480).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.corpus import pages_from_documents
from readur_spark.operators.extract import extract_pages
from readur_spark.queries.registry import register

from readur_spark.queries.tables import SYNTH_URL_SQL as _URL_SQL  # noqa: E402


@register(
    "extract_text_passthrough",
    oracle=f"""
    SELECT {_URL_SQL} AS url,
           trim(text) AS extracted_text,
           len(string_split(trim(text), ' ')) AS word_count,
           100 AS confidence_i,
           'completed' AS status
    FROM documents
    """,
)
def extract_text_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A30 passthrough through the full Spark operator (mapInPandas) —
    the north-rule invariant, oracle-checked."""
    pages = pages_from_documents(spark, sf_dir)
    extracted = extract_pages(pages)
    return extracted.select(
        "url",
        "extracted_text",
        "word_count",
        F.col("confidence").cast("int").alias("confidence_i"),
        "status",
    )


@register(
    "extract_wordcount_by_lang",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS total_words
    FROM documents
    GROUP BY lang
    """,
)
def extract_wordcount_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang word totals (the flagship rollup shape, oracle-checked).
    lang rides the extraction UDF as a passthrough column
    (operators/extract.py _PASSTHROUGH_COLS), so the plan is
    scan → extract → partial agg — no join, and no shuffle of the
    MB-scale extracted_text payload."""
    pages = pages_from_documents(spark, sf_dir)
    extracted = extract_pages(pages)
    return extracted.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("word_count").alias("total_words"),
    )


@register("extract_mixed_corpus_rollup")  # non-SQL: exercises PDF/HTML/image/OCR branches
def extract_mixed_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full mixed-branch corpus rollup (synthetic pages): rows-only
    driver check; branch-level correctness is pinned by the golden
    pytest suite (tests/test_pipeline_e2e.py, test_ocr_ladder.py).

    Runs with the deterministic StubOcrBackend so the A13 OCR ladder
    branch produces rows (confidence 85 bucket) — scanned PDFs that
    fail the text-layer quality gate take the ladder instead of the
    byte-scrape last resort. Grouping includes the integer confidence
    so each cascade rung (100 text / 95 pdf-quick / 90 html / 85 ocr /
    50 scrape) is a distinct, countable row."""
    from readur_spark.corpus import synthetic_pages
    from readur_spark.kernels.ocr_ladder import StubOcrBackend
    from readur_spark.kernels.settings import merged_settings
    from readur_spark.pipeline import extract_corpus

    pages = synthetic_pages(spark, 500)
    settings = merged_settings(
        {"ocr_capability": True, "ocr_backend": StubOcrBackend()}
    )
    extracted = extract_corpus(pages, settings=settings)
    return (
        extracted.groupBy(
            "status", "mime_type", "failure_reason",
            F.col("confidence").cast("int").alias("confidence_i"),
        )
        .agg(F.count("*").alias("n_docs"), F.sum("word_count").alias("total_words"))
        .orderBy("status", "mime_type", "failure_reason", "confidence_i")
    )


@register(
    "wet_record_manifest",
    oracle=f"""
    WITH b AS (
      SELECT text, {_URL_SQL} AS url,
             strftime(TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id),
                      '%Y-%m-%dT%H:%M:%SZ') AS iso
      FROM documents
    ),
    h AS (SELECT url, iso, text, md5(url || iso) AS hh FROM b)
    SELECT url,
           '<urn:uuid:' || substr(hh, 1, 8) || '-' || substr(hh, 9, 4)
             || '-' || substr(hh, 13, 4) || '-' || substr(hh, 17, 4)
             || '-' || substr(hh, 21, 12) || '>' AS record_id,
           iso AS warc_date,
           CAST(octet_length(encode(trim(text))) AS BIGINT)
             AS content_length
    FROM h
    """,
)
def wet_record_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET emission headers value-hash-checked end-to-end: the REAL
    gzip members (sources/warc.py wet_members) are decompressed and
    re-parsed by the engine's own WARC walker, and the content-derived
    record id (md5 pseudo-uuid), WARC-Date, and Content-Length are
    compared against a DuckDB replay of the construction rule. The
    member BYTES stay pinned by tests/test_warc_source.py (gzip is not
    SQL-expressible); this oracle nails the framing facts that are."""
    import gzip as _gzip

    from readur_spark.sources.warc import iter_warc_records, wet_members

    pages = pages_from_documents(spark, sf_dir)
    extracted = extract_pages(pages).filter(F.col("status") == "completed")
    members = wet_members(extracted)

    def run(batches):
        import pandas as pd

        cols = ["url", "record_id", "warc_date", "content_length"]
        for pdf in batches:
            rows = []
            for url, wet in zip(pdf["url"], pdf["wet"]):
                rec = _gzip.decompress(bytes(wet))
                headers, payload = next(iter(iter_warc_records(rec)))
                rows.append(
                    {
                        "url": url,
                        "record_id": headers.get("warc-record-id"),
                        "warc_date": headers.get("warc-date"),
                        "content_length": len(payload),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return members.mapInPandas(
        run,
        schema="url string, record_id string, warc_date string,"
        " content_length long",
    )


@register("wet_emission_manifest")
def wet_emission_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET round-trip manifest (rows-only: gzip bytes are not
    SQL-expressible): extraction output re-encoded as Common-Crawl WET
    conversion records (sources/warc.py: wet_members — deterministic
    record ids, sha1 block digests, mtime-0 gzip members), reporting
    each member's size and sha256. Byte-level reproducibility and the
    write->read round-trip through the engine's own WARC walker are
    pinned in tests/test_warc_source.py."""
    from readur_spark.sources.warc import wet_members

    pages = pages_from_documents(spark, sf_dir)
    extracted = extract_pages(pages).filter(F.col("status") == "completed")
    members = wet_members(extracted)
    return members.select(
        "url",
        F.length("wet").alias("n_bytes"),
        F.sha2(F.col("wet"), 256).alias("member_sha256"),
    )


# ---- structure-preserving table extraction ---------------------------------


TABLE_MD_SCHEMA = (
    "url string, table_idx int, markdown string, n_rows int, n_cols int"
)


def table_markdown_table(pages: DataFrame) -> DataFrame:
    """(url, table_idx, markdown, n_rows, n_cols) — every <table> in
    every page as a GitHub pipe table (kernels/tables.py semantics).
    One narrow mapInPandas stage: the payload crosses the Python
    boundary once; the emitted frame is slim markdown."""

    def run(batches):
        import pandas as pd

        from readur_spark.kernels.tables import extract_tables_markdown

        cols = ["url", "table_idx", "markdown", "n_rows", "n_cols"]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                blob = bytes(html) if html is not None else b""
                for idx, md, nr, nc in extract_tables_markdown(
                    blob.decode("utf-8", "replace")
                ):
                    rows.append(
                        {"url": url, "table_idx": idx, "markdown": md,
                         "n_rows": nr, "n_cols": nc}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(run, schema=TABLE_MD_SCHEMA)


def _tabled_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages whose tables both engines can derive: a decoy EMPTY table
    (must be dropped but must still consume index 0), then a real
    key/value table carrying the doc's lang, source, and word count —
    with markup noise (a <b> inside a cell) and irregular whitespace
    the kernel must normalize."""
    from readur_spark.queries.tables import load

    docs = load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><body><p>intro</p><table class="nav"></table>'
              "<table><tr><th>key</th><th>value</th></tr>"
              "<tr><td>lang</td><td><b>"),
        F.col("lang"),
        F.lit("</b></td></tr>\n<tr><td>source</td><td>  "),
        F.col("source"),
        F.lit("\n</td></tr><tr><td>words</td><td>"),
        F.size(F.split(F.col("text"), " ")).cast("string"),
        F.lit("</td></tr></table></body></html>"),
    )
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/doc"),
        F.col("doc_id").cast("string"), F.lit(".html"),
    )
    return docs.select(
        url.alias("url"),
        F.encode(html, "utf-8").cast("binary").alias("html"),
    )


@register(
    "extract_tables_markdown",
    oracle="""
    SELECT 'https://' || source || '.example/doc' || doc_id || '.html'
             AS url,
           CAST(1 AS INT) AS table_idx,
           '| key | value |' || chr(10) || '| --- | --- |' || chr(10)
             || '| lang | ' || lang || ' |' || chr(10)
             || '| source | ' || source || ' |' || chr(10)
             || '| words | '
             || CAST(len(string_split(text, ' ')) AS VARCHAR) || ' |'
             AS markdown,
           CAST(4 AS INT) AS n_rows,
           CAST(2 AS INT) AS n_cols
    FROM documents
    """,
)
def extract_tables_markdown_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The table→markdown kernel value-hash-checked end-to-end: the
    REAL parser walks constructed HTML (decoy empty table, nested
    markup in cells, irregular whitespace) and the oracle re-derives
    the exact markdown string — header row, separator, escaping,
    row/col counts — from the construction rule."""
    return table_markdown_table(_tabled_pages(spark, sf_dir))


# ---- WebTables-style relational extraction ---------------------------------


TABLE_REL_SCHEMA = (
    "doc_id long, table_idx int, row_idx int, col_idx int, "
    "col_name string, value string, has_header boolean"
)


def table_relational(pages: DataFrame) -> DataFrame:
    """(doc_id, table_idx, row_idx, col_idx, col_name, value,
    has_header) — every data cell of every <table> as a relational
    tuple (kernels/tables.py:extract_tables_relational semantics:
    <th>-first-row header detection, positional col{i} fallback).
    This is the WDC Web Tables corpus shape — the table-QA /
    table-to-text training-data feed. One narrow mapInPandas stage."""

    def run(batches):
        import pandas as pd

        from readur_spark.kernels.tables import extract_tables_relational

        cols = ["doc_id", "table_idx", "row_idx", "col_idx", "col_name",
                "value", "has_header"]
        for pdf in batches:
            rows = []
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                blob = bytes(html) if html is not None else b""
                for t, r, c, name, val, hdr in extract_tables_relational(
                    blob.decode("utf-8", "replace")
                ):
                    rows.append(
                        {"doc_id": doc_id, "table_idx": t, "row_idx": r,
                         "col_idx": c, "col_name": name, "value": val,
                         "has_header": hdr}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("doc_id", "html").mapInPandas(
        run, schema=TABLE_REL_SCHEMA
    )


# constructed grid corpus: per doc, 1 + (doc_id % 2) tables; table t has
# 2 + ((doc_id+t) % 2) cols and 1 + ((doc_id+t) % 3) data rows; even
# (doc_id+t) gets a <th> header row (names h{t}_{c}), odd gets none
# (positional col{c} names). Both engines replay the rule exactly.
_REL_HTML_EXPR = """
concat('<html><body>',
  array_join(transform(sequence(0L, doc_id % 2), t ->
    concat('<table>',
      if((doc_id + t) % 2 = 0,
         concat('<tr>',
           array_join(transform(sequence(0L, 1 + (doc_id + t) % 2), c ->
             concat('<th>h', cast(t as string), '_', cast(c as string),
                    '</th>')), ''),
           '</tr>'),
         ''),
      array_join(transform(sequence(0L, (doc_id + t) % 3), r ->
        concat('<tr>',
          array_join(transform(sequence(0L, 1 + (doc_id + t) % 2), c ->
            concat('<td>v', cast(doc_id as string), '_',
                   cast(t as string), '_', cast(r as string), '_',
                   cast(c as string), '</td>')), ''),
          '</tr>')), ''),
      '</table>')), ''),
  '</body></html>')
"""


def _relational_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from readur_spark.queries.tables import load

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.expr(_REL_HTML_EXPR), "utf-8").cast("binary").alias(
            "html"
        ),
    )


@register(
    "table_relational_constructed",
    oracle="""
    SELECT d.doc_id,
           CAST(t.t AS INT) AS table_idx,
           CAST(r.r AS INT) AS row_idx,
           CAST(c.c AS INT) AS col_idx,
           CASE WHEN (d.doc_id + t.t) % 2 = 0
                THEN 'h' || t.t || '_' || c.c
                ELSE 'col' || c.c END AS col_name,
           'v' || d.doc_id || '_' || t.t || '_' || r.r || '_' || c.c
             AS value,
           (d.doc_id + t.t) % 2 = 0 AS has_header
    FROM documents d
    CROSS JOIN (SELECT unnest(range(0, 2)) AS t) t
    CROSS JOIN (SELECT unnest(range(0, 3)) AS r) r
    CROSS JOIN (SELECT unnest(range(0, 3)) AS c) c
    WHERE t.t <= d.doc_id % 2
      AND r.r <= (d.doc_id + t.t) % 3
      AND c.c <= 1 + (d.doc_id + t.t) % 2
    """,
)
def table_relational_constructed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WebTables relational extraction value-hash-checked end-to-end:
    the REAL parser (th tracking, header election, ragged padding)
    walks constructed variable-shape tables and the oracle re-derives
    every expected (table, row, col, name, value) tuple from the
    construction rule — header and headerless shapes both present."""
    return table_relational(_relational_pages(spark, sf_dir))


# ---- WebTables column-type inference ---------------------------------------


# the WDC typing tier: classify each cell, majority-vote the column.
# Regexes are anchored and engine-portable (RE2 ⊂ Java): integers,
# decimals, ISO dates — everything else is a string.
_INT_RE = "^-?[0-9]+$"
_DEC_RE = "^-?[0-9]+\\.[0-9]+$"
_DATE_RE = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"


def column_types(cells: DataFrame) -> DataFrame:
    """(doc_id, table_idx, col_idx, col_name, n_cells, inferred_type,
    type_share_pct) — per-column majority type over the relational
    cell tuples. Cell typing: int / decimal / date / string (empty
    cells don't vote). Majority = max count, ties broken by the fixed
    precedence int < decimal < date < string (alphabetical on the
    label, replayed identically in SQL). type_share_pct is the
    winner's integer share of voting cells.

    Scale: one projection to type each cell, two slim map-side
    -combinable aggregations — the (table, col, type) frame is
    corpus-metadata sized."""
    typed = cells.withColumn(
        "cell_type",
        F.when(F.col("value") == "", None)
        .when(F.col("value").rlike(_INT_RE), "int")
        .when(F.col("value").rlike(_DEC_RE), "decimal")
        .when(F.col("value").rlike(_DATE_RE), "date")
        .otherwise("string"),
    )
    keys = ["doc_id", "table_idx", "col_idx", "col_name"]
    votes = (
        typed.filter(F.col("cell_type").isNotNull())
        .groupBy(*keys, "cell_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # majority with deterministic tie-break: max(struct(n, -prec)) is
    # replayed in SQL as ORDER BY n DESC, cell_type ASC LIMIT 1 per
    # group — here via a single max(struct) aggregation (no window).
    # prec = alphabetical rank of the label, negated so max() takes
    # the alphabetically FIRST label among tied counts.
    prec = ("case cell_type when 'date' then 0 when 'decimal' then 1 "
            "when 'int' then 2 else 3 end")
    pick = votes.groupBy(*keys).agg(
        F.sum("n").cast("long").alias("n_cells"),
        F.max(
            F.struct(
                F.col("n"),
                F.expr(f"-({prec})").alias("neg_prec"),
                F.col("cell_type"),
            )
        ).alias("w"),
    )
    return pick.select(
        *keys,
        "n_cells",
        F.col("w.cell_type").alias("inferred_type"),
        F.expr("cast((100L * w.n) div n_cells as bigint)").alias(
            "type_share_pct"
        ),
    )


@register(
    "table_column_types",
    oracle="""
    WITH cells AS (
      SELECT d.doc_id,
             CAST(t.t AS INT) AS table_idx,
             CAST(c.c AS INT) AS col_idx,
             CASE WHEN (d.doc_id + t.t) % 2 = 0
                  THEN 'h' || t.t || '_' || c.c
                  ELSE 'col' || c.c END AS col_name,
             CASE WHEN (d.doc_id + r.r + c.c) % 4 = 0
                  THEN CAST((d.doc_id * 7 + r.r) % 1000 AS VARCHAR)
                  WHEN (d.doc_id + r.r + c.c) % 4 = 1
                  THEN CAST((d.doc_id % 100) AS VARCHAR) || '.' ||
                       CAST(r.r AS VARCHAR)
                  WHEN (d.doc_id + r.r + c.c) % 4 = 2
                  THEN '20' || lpad(CAST(d.doc_id % 25 AS VARCHAR), 2, '0')
                       || '-0' || CAST(1 + r.r % 9 AS VARCHAR) || '-1'
                       || CAST(c.c AS VARCHAR)
                  ELSE 'w' || c.c END AS value
      FROM documents d
      CROSS JOIN (SELECT unnest(range(0, 2)) AS t) t
      CROSS JOIN (SELECT unnest(range(0, 3)) AS r) r
      CROSS JOIN (SELECT unnest(range(0, 3)) AS c) c
      WHERE t.t <= d.doc_id % 2
        AND r.r <= (d.doc_id + t.t) % 3
        AND c.c <= 1 + (d.doc_id + t.t) % 2
    ), typed AS (
      SELECT doc_id, table_idx, col_idx, col_name,
             CASE WHEN regexp_matches(value, '^-?[0-9]+$') THEN 'int'
                  WHEN regexp_matches(value, '^-?[0-9]+\.[0-9]+$')
                    THEN 'decimal'
                  WHEN regexp_matches(value,
                    '^[0-9]{4}-[0-9]{2}-[0-9]{2}$') THEN 'date'
                  ELSE 'string' END AS cell_type
      FROM cells WHERE value <> ''
    ), votes AS (
      SELECT doc_id, table_idx, col_idx, col_name, cell_type,
             count(*) AS n
      FROM typed GROUP BY ALL
    ), ranked AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY doc_id, table_idx, col_idx, col_name
               ORDER BY n DESC, cell_type ASC) AS rk,
             sum(n) OVER (
               PARTITION BY doc_id, table_idx, col_idx, col_name)
               AS n_cells
      FROM votes
    )
    SELECT doc_id, table_idx, col_idx, col_name,
           CAST(n_cells AS BIGINT) AS n_cells,
           cell_type AS inferred_type,
           CAST((100 * n) // n_cells AS BIGINT) AS type_share_pct
    FROM ranked WHERE rk = 1
    """,
)
def table_column_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-type inference over a typed constructed grid — cells
    rotate through int / decimal / date / word by a modulus rule both
    engines replay; the Spark side runs the REAL parser + typing +
    max(struct) majority vote, the oracle re-derives the cells from
    the rule and votes via a window. Exercises majority, ties, and
    the share arithmetic."""
    pages = _typed_relational_pages(spark, sf_dir)
    return column_types(table_relational(pages))


def _typed_relational_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same grid shapes as `_relational_pages`, but cell values rotate
    through the four type families by (doc_id + r + c) % 4."""
    from readur_spark.queries.tables import load

    docs = load(spark, sf_dir, "documents")
    value = """
      case
        when (doc_id + r + c) % 4 = 0
          then cast((doc_id * 7 + r) % 1000 as string)
        when (doc_id + r + c) % 4 = 1
          then concat(cast(doc_id % 100 as string), '.',
                      cast(r as string))
        when (doc_id + r + c) % 4 = 2
          then concat('20', lpad(cast(doc_id % 25 as string), 2, '0'),
                      '-0', cast(1 + r % 9 as string), '-1',
                      cast(c as string))
        else concat('w', cast(c as string))
      end
    """
    html = f"""
    concat('<html><body>',
      array_join(transform(sequence(0L, doc_id % 2), t ->
        concat('<table>',
          if((doc_id + t) % 2 = 0,
             concat('<tr>',
               array_join(transform(sequence(0L, 1 + (doc_id + t) % 2),
                 c -> concat('<th>h', cast(t as string), '_',
                             cast(c as string), '</th>')), ''),
               '</tr>'),
             ''),
          array_join(transform(sequence(0L, (doc_id + t) % 3), r ->
            concat('<tr>',
              array_join(transform(sequence(0L, 1 + (doc_id + t) % 2),
                c -> concat('<td>', {value}, '</td>')), ''),
              '</tr>')), ''),
          '</table>')), ''),
      '</body></html>')
    """
    return docs.select(
        "doc_id",
        F.encode(F.expr(html), "utf-8").cast("binary").alias("html"),
    )


# ---- full-page markdown rendering -------------------------------------------


def markdown_table(pages: DataFrame) -> DataFrame:
    """(url, markdown, n_chars) — every page rendered to GitHub-flavored
    markdown (kernels/markdown.py). One narrow mapInPandas stage."""

    def run(batches):
        import pandas as pd

        from readur_spark.kernels.markdown import html_to_markdown

        cols = ["url", "markdown", "n_chars"]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                blob = bytes(html) if html is not None else b""
                m = html_to_markdown(blob.decode("utf-8", "replace"))
                rows.append({"url": url, "markdown": m, "n_chars": len(m)})
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(
        run, schema="url string, markdown string, n_chars long"
    )


def _markdown_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages whose markdown both engines can derive: heading, emphasized
    paragraph with a link, a two-item list, a blockquote, and a <pre>
    with interior whitespace the renderer must keep verbatim — plus a
    <nav> that must vanish."""
    from readur_spark.queries.tables import load

    docs = load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>skip</title></head><body>"
              "<nav>boilerplate menu</nav><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>Language <b>"),
        F.col("lang"),
        F.lit("</b> from <a href=\"https://"),
        F.col("source"),
        F.lit(".example/\">"),
        F.col("source"),
        F.lit("</a></p><ul><li>first</li><li>"),
        F.col("lang"),
        F.lit("</li></ul><blockquote><p>q "),
        F.col("lang"),
        F.lit("</p></blockquote><pre>raw  "),
        F.col("source"),
        F.lit("</pre></body></html>"),
    )
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/doc"),
        F.col("doc_id").cast("string"), F.lit(".html"),
    )
    return docs.select(
        url.alias("url"),
        F.encode(html, "utf-8").cast("binary").alias("html"),
    )


@register(
    "extract_markdown",
    oracle="""
    WITH m AS (
      SELECT 'https://' || source || '.example/doc' || doc_id || '.html'
               AS url,
             '# Doc ' || doc_id
               || chr(10) || chr(10)
               || 'Language **' || lang || '** from ['
               || source || '](https://' || source || '.example/)'
               || chr(10) || chr(10)
               || '- first' || chr(10) || '- ' || lang
               || chr(10) || chr(10)
               || '> q ' || lang
               || chr(10) || chr(10)
               || chr(96) || chr(96) || chr(96) || chr(10)
               || 'raw  ' || source || chr(10)
               || chr(96) || chr(96) || chr(96)
               AS markdown
      FROM documents
    )
    SELECT url, markdown,
           CAST(length(markdown) AS BIGINT) AS n_chars
    FROM m
    """,
)
def extract_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HTML→markdown renderer value-hash-checked end-to-end: the
    REAL parser walks constructed pages (killed nav/title, heading,
    bold + link inlines, list grouping, blockquote prefixing, verbatim
    <pre> fencing) and the oracle re-derives the exact markdown string
    — every byte of it — from the construction rule."""
    return markdown_table(_markdown_pages(spark, sf_dir))


# ---------------------------------------------------------------------------
# main-content span offsets (north-rule contract: extracted text AND spans)
# ---------------------------------------------------------------------------

def span_table(pages: DataFrame) -> DataFrame:
    """(url, pos, src_start, src_end, block_text) — one row per KEPT
    content block with its source char range from
    kernels/html_extract.py: extract_main_content_spans. One narrow
    mapInPandas stage; joining block_text by newline per url
    reproduces extract_main_content byte-for-byte."""

    def run(batches):
        import pandas as pd

        from readur_spark.kernels.html_extract import (
            extract_main_content_spans,
        )

        cols = ["url", "pos", "src_start", "src_end", "block_text"]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                blob = bytes(html) if html is not None else b""
                spans = extract_main_content_spans(
                    blob.decode("utf-8", "replace")
                )
                for i, (s, e, t) in enumerate(spans):
                    rows.append({
                        "url": url, "pos": i, "src_start": s,
                        "src_end": e, "block_text": t,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(
        run,
        schema=(
            "url string, pos int, src_start long, src_end long,"
            " block_text string"
        ),
    )


_SPAN_P1 = '<html><body><nav>Nav menu links listed here</nav><p>'
_SPAN_MID = "</p><p>"
_SPAN_TAIL_PRE = "Appendix note for "
_SPAN_TAIL_POST = " readers."
_SPAN_END = "</p></body></html>"


def _span_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from readur_spark.queries.tables import load

    docs = load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(_SPAN_P1), F.col("text"), F.lit(_SPAN_MID),
        F.lit(_SPAN_TAIL_PRE), F.col("lang"), F.lit(_SPAN_TAIL_POST),
        F.lit(_SPAN_END),
    )
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/doc"),
        F.col("doc_id").cast("string"), F.lit(".html"),
    )
    return docs.select(
        url.alias("url"),
        F.encode(html, "utf-8").cast("binary").alias("html"),
    )


@register(
    "extract_spans_constructed",
    oracle=f"""
    WITH c AS (
      SELECT 'https://' || source || '.example/doc' || doc_id || '.html'
               AS url,
             text, lang, length(text) AS lt
      FROM documents
    ),
    b1 AS (
      SELECT url, CAST(0 AS INT) AS pos,
             CAST({len(_SPAN_P1)} AS BIGINT) AS src_start,
             CAST({len(_SPAN_P1)} + lt AS BIGINT) AS src_end,
             text AS block_text
      FROM c
    ),
    b2 AS (
      SELECT url, CAST(1 AS INT) AS pos,
             CAST({len(_SPAN_P1)} + lt + {len(_SPAN_MID)} AS BIGINT)
               AS src_start,
             CAST({len(_SPAN_P1)} + lt + {len(_SPAN_MID)}
                  + length('{_SPAN_TAIL_PRE}' || lang
                           || '{_SPAN_TAIL_POST}') AS BIGINT) AS src_end,
             '{_SPAN_TAIL_PRE}' || lang || '{_SPAN_TAIL_POST}'
               AS block_text
      FROM c
    )
    SELECT * FROM b1 UNION ALL SELECT * FROM b2
    """,
)
def extract_spans_constructed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-offset contract, value-hash-checked end-to-end: the REAL
    extractor (kill-tag nav, two kept blocks) walks constructed pages
    and the oracle re-derives every block's exact (src_start, src_end)
    char range and text from the construction-rule lengths — the
    SQL-expressible twin of the frozen-golden span pins."""
    return span_table(_span_pages(spark, sf_dir))
