"""Publication-date extraction — the htmldate recipe, Catalyst-native.

Training-data pipelines need document dates for recency weighting
(ml/recency.py), temporal decontamination (is this page older than the
eval set?), and dump-level mixture accounting — but Common-Crawl pages
carry their FETCH time, not their publication time. The published
extraction recipe (Barbaresi, "htmldate: A Python package for fast and
robust document date extraction", JOSS 2020) is a precedence ladder
over redundant in-page signals:

  1. <meta property="article:published_time" content="...">  (OpenGraph)
  2. <meta name="date" content="...">
  3. <time datetime="...">
  4. a /YYYY/MM[/DD]/ segment in the URL path
  5. none -> NULL

Everything here is JVM/Catalyst expression-level — regexp_extract +
try_to_date + coalesce/CASE — the same stance as ml/templates.py: the
operator applies to REAL page HTML with zero Python, DuckDB replays it
token-for-token (RE2-compatible patterns, no lookaround), and the
whole ladder is a pure projection fused into the scan (no shuffle, no
UDF). Candidate strings that fail date validation (month 15, Feb 30)
fall through to the next rung via try_to_date/TRY_CAST null semantics,
which the two engines share.

Reference tie-in: the reference's metadata tier extracts per-format
timestamps (src/metadata_extraction.rs — EXIF dates, PDF creation
dates); this is the HTML analogue its extraction tier lacks, shaped
for 10^12 rows.

The registered query runs the ladder over a CONSTRUCTED corpus where
each doc's date and signal placement derive from doc_id (class 0 also
plants a DIFFERENT decoy date in the URL, so rung precedence — not
just extraction — is value-hashed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# RE2-safe patterns, shared verbatim with the DuckDB twin. The quote
# class [\"'] tolerates either attribute quoting; attribute ORDER is a
# documented heuristic (property before content), same stance as
# ml/templates.py's tag regex — not a DOM parse.
_META_ARTICLE_RE = (
    "<meta[^>]*property=[\"']article:published_time[\"']"
    "[^>]*content=[\"'](\\d{4}-\\d{2}-\\d{2})"
)
_META_DATE_RE = (
    "<meta[^>]*name=[\"']date[\"'][^>]*content=[\"'](\\d{4}-\\d{2}-\\d{2})"
)
_TIME_RE = "<time[^>]*datetime=[\"'](\\d{4}-\\d{2}-\\d{2})"
# URL path: /YYYY/MM/ or /YYYY/MM/DD/ with a century guard; day
# defaults to 01 when absent.
_URL_RE = "/((?:19|20)\\d{2})/(\\d{2})(?:/(\\d{2}))?/"

_SOURCES = ("meta-article", "meta-date", "time-tag", "url-path")


def _date_of(s: Column) -> Column:
    # '' (regexp_extract's no-match) and invalid calendar dates both
    # become NULL — the rung falls through.
    return F.try_to_date(F.nullif(s, F.lit("")))


def publication_date_cols(
    html_str: Column, url: Column
) -> tuple[Column, Column]:
    """(pub_date DATE, date_source STRING) from the ladder; both NULL
    when no rung fires."""
    lower = F.lower(html_str)
    cands = [
        _date_of(F.regexp_extract(lower, _META_ARTICLE_RE, 1)),
        _date_of(F.regexp_extract(lower, _META_DATE_RE, 1)),
        _date_of(F.regexp_extract(lower, _TIME_RE, 1)),
        _date_of(
            F.concat_ws(
                "-",
                F.nullif(F.regexp_extract(url, _URL_RE, 1), F.lit("")),
                F.regexp_extract(url, _URL_RE, 2),
                F.coalesce(
                    F.nullif(F.regexp_extract(url, _URL_RE, 3), F.lit("")),
                    F.lit("01"),
                ),
            )
        ),
    ]
    pub = F.coalesce(*cands)
    src = F.lit(None).cast("string")
    for cand, name in reversed(list(zip(cands, _SOURCES))):
        src = F.when(cand.isNotNull(), F.lit(name)).otherwise(src)
    return pub, src


def publication_dates(
    pages: DataFrame, *, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, pub_date, date_source) from a binary html column — pure
    projection, zero Python, fuses into the scan."""
    html_str = F.decode(F.col(html_col), "UTF-8")
    pub, src = publication_date_cols(html_str, F.col(url_col))
    return pages.select(
        F.col(url_col).alias("url"),
        pub.alias("pub_date"),
        src.alias("date_source"),
    )


# ---- constructed-corpus driver query ---------------------------------------

# rule: date D = 2015-01-01 + (doc_id * 37 % 3650) days (37 is
# coprime to 3650, spreading small doc_id ranges over all ten years);
# class = doc_id % 5
# places D behind exactly one rung. Class 0's URL also carries a DECOY
# date (2001-01-01) so the oracle proves meta-article outranks
# url-path, not merely that extraction works.
_EPOCH = "2015-01-01"
_DECOY_PATH = "/2001/01/01/"


def constructed_dated_pages(docs: DataFrame) -> DataFrame:
    cls = (F.col("doc_id") % 5).cast("int")
    d = F.date_add(F.lit(_EPOCH).cast("date"), (F.col("doc_id") * 37 % 3650).cast("int"))
    ds = F.date_format(d, "yyyy-MM-dd")
    body = F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>"))
    html = (
        F.when(
            cls == 0,
            F.concat(
                F.lit('<html><head><meta property="article:published_time" '
                      'content="'),
                ds,
                F.lit('T08:00:00Z"></head><body>'),
                body,
                F.lit("</body></html>"),
            ),
        )
        .when(
            cls == 1,
            F.concat(
                F.lit('<html><head><meta name="date" content="'),
                ds,
                F.lit('"></head><body>'),
                body,
                F.lit("</body></html>"),
            ),
        )
        .when(
            cls == 2,
            F.concat(
                F.lit('<html><body><time datetime="'),
                ds,
                F.lit('">then</time>'),
                body,
                F.lit("</body></html>"),
            ),
        )
        .otherwise(
            F.concat(F.lit("<html><body>"), body, F.lit("</body></html>"))
        )
    )
    url = (
        F.when(
            cls == 0,
            F.concat(
                F.lit("https://h0.example" + _DECOY_PATH + "post-"),
                F.col("doc_id").cast("string"),
            ),
        )
        .when(
            cls == 3,
            F.concat(
                F.lit("https://h3.example/"),
                F.date_format(d, "yyyy/MM/dd"),
                F.lit("/post-"),
                F.col("doc_id").cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://h9.example/post-"),
                F.col("doc_id").cast("string"),
            )
        )
    )
    return docs.select(
        "doc_id", url.alias("url"), F.encode(html, "UTF-8").alias("html")
    )


_ORACLE = f"""
WITH b AS (
  SELECT doc_id, CAST(doc_id % 5 AS INT) AS cls,
         DATE '{_EPOCH}' + CAST(doc_id * 37 % 3650 AS INT) AS d
  FROM documents
), u AS (
  SELECT doc_id, cls, d,
    CASE
      WHEN cls = 0 THEN 'https://h0.example{_DECOY_PATH}post-' || doc_id
      WHEN cls = 3 THEN 'https://h3.example/' || strftime(d, '%Y/%m/%d')
                        || '/post-' || doc_id
      ELSE 'https://h9.example/post-' || doc_id
    END AS url
  FROM b
)
SELECT url,
       CASE WHEN cls <= 3 THEN strftime(d, '%Y-%m-%d') ELSE '' END
         AS pub_date,
       CASE cls WHEN 0 THEN 'meta-article' WHEN 1 THEN 'meta-date'
                WHEN 2 THEN 'time-tag' WHEN 3 THEN 'url-path'
                ELSE 'none' END AS date_source
FROM u
"""


# ---- time-decay mixture plan (composes the ladder into planning) -----------

# Dump-age mixture weighting (the CommonCrawl-mixture recipe used by
# C4/RefinedWeb-style corpora: fresher dumps get larger shares):
# per publication year, weight = token mass decayed by a one-year
# half-life (integer bit-shift, exact both engines), then the existing
# largest-remainder apportionment (ml/apportion.py) turns weights into
# INTEGER token quotas summing exactly to the budget. Chain:
# date ladder -> year rollup -> decay -> Hamilton quotas; a wrong date
# anywhere moves a year's whole quota, so the composed oracle is a
# sharp end-to-end check of all four stages.
_ANCHOR_YEAR = 2025  # construction bound: epoch 2015 + 3650d < 2025
_TOKEN_BUDGET = 1_000_000


def _time_decay_oracle() -> str:
    return f"""
    WITH b AS (
      SELECT doc_id, CAST(doc_id % 5 AS INT) AS cls,
             DATE '{_EPOCH}' + CAST(doc_id * 37 % 3650 AS INT) AS d,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ), y AS (
      SELECT CAST(year(d) AS INT) AS pub_year,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM b WHERE cls <= 3 GROUP BY 1
    ), s AS (
      SELECT *, n_tokens // (CAST(1 AS BIGINT)
                             << ({_ANCHOR_YEAR} - pub_year)) AS weight
      FROM y
    ), t AS (
      SELECT CAST(sum(weight) AS BIGINT) AS S FROM s WHERE weight > 0
    ), d2 AS (
      SELECT pub_year, n_docs, n_tokens, weight,
             ({_TOKEN_BUDGET} * weight) // t.S AS fl,
             ({_TOKEN_BUDGET} * weight) % t.S AS rem
      FROM s, t WHERE weight > 0
    ), lo AS (
      SELECT {_TOKEN_BUDGET} - CAST(sum(fl) AS BIGINT) AS k FROM d2
    ), r AS (
      SELECT pub_year,
             row_number() OVER (ORDER BY rem DESC, pub_year) AS rk
      FROM d2
    )
    SELECT d2.pub_year, d2.n_docs, d2.n_tokens,
           CAST(d2.weight AS BIGINT) AS weight,
           CAST(fl + CASE WHEN r.rk <= lo.k THEN 1 ELSE 0 END AS BIGINT)
             AS token_quota
    FROM d2 JOIN r USING (pub_year), lo
    UNION ALL
    SELECT pub_year, n_docs, n_tokens, CAST(weight AS BIGINT),
           CAST(0 AS BIGINT)
    FROM s WHERE weight <= 0
    """


@register("mixture_time_decay_plan", oracle=_time_decay_oracle())
def mixture_time_decay_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publication-year token quotas under one-year-half-life decay:
    the date ladder runs on REAL (constructed) page bytes, the rollup /
    decay / largest-remainder stages run on its output, and the oracle
    re-derives every quota from the construction rule — dates, token
    masses, bit-shift weights, floors, remainders, and the leftover
    seat election."""
    from readur_spark.ml.apportion import apportion_budget

    docs = load(spark, sf_dir, "documents")
    pages = constructed_dated_pages(docs)
    pub, _src = publication_date_cols(
        F.decode(F.col("html"), "UTF-8"), F.col("url")
    )
    dated = pages.select("doc_id", pub.alias("pub_date")).where(
        pub.isNotNull()
    )
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    per_year = (
        dated.join(toks, "doc_id")
        .groupBy(F.year("pub_date").cast("int").alias("pub_year"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
    scored = per_year.withColumn(
        "weight",
        F.expr(
            f"n_tokens div shiftleft(cast(1 as bigint),"
            f" {_ANCHOR_YEAR} - pub_year)"
        ).cast("long"),
    )
    plan = apportion_budget(
        scored.select("pub_year", "weight"),
        _TOKEN_BUDGET,
        host_col="pub_year",
        score_col="weight",
    )
    return (
        scored.select("pub_year", "n_docs", "n_tokens")
        .join(plan, "pub_year")
        .select(
            "pub_year",
            "n_docs",
            "n_tokens",
            F.col("weight").cast("long").alias("weight"),
            F.col("quota").alias("token_quota"),
        )
    )


@register("pubdate_extract", oracle=_ORACLE)
def pubdate_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """htmldate-style publication-date ladder over the constructed
    dated corpus: per-rung extraction, calendar validation, and the
    precedence order (class 0's decoy URL date must LOSE to the meta
    tag) are all value-hashed against the construction rule. Dateless
    rows surface as ''/'none' sentinels — the driver's row sort cannot
    order NULL against str; the library API (publication_dates) keeps
    honest NULLs."""
    docs = load(spark, sf_dir, "documents")
    out = publication_dates(constructed_dated_pages(docs))
    return out.select(
        "url",
        F.coalesce(
            F.date_format("pub_date", "yyyy-MM-dd"), F.lit("")
        ).alias("pub_date"),
        F.coalesce("date_source", F.lit("none")).alias("date_source"),
    )
