"""RSS/Atom feed parsing — fresh-URL discovery for the frontier.

Sitemaps (sources/sitemap.py) enumerate a site; feeds announce what
is NEW. A freshness-oriented crawl polls feeds instead of re-walking
hosts, so the discovery tier needs (feed host, item url, title,
published ts) rows from both wire formats: RSS 2.0 (`<item>` with
`<link>text</link>` and an RFC-822-style `pubDate`) and Atom RFC 4287
(`<entry>` with `<link href=".."/>` and an ISO-8601 `updated`).

Parsing is pure Catalyst — regexp_extract_all block explosion plus
per-field regexp pulls, the same documented-heuristic stance as
ml/templates.py and ml/headmeta.py: tag-shaped text inside CDATA or
escaped examples perturbs both engines identically, and DuckDB (RE2)
replays every expression token-for-token, so the whole parse is
value-hashable. Timestamp parsing exercises BOTH formats' ladders:
RFC-822 day-month-year through try_to_timestamp/try_strptime (the
optional weekday omitted — its presence adds a locale cross-check
with no information), ISO-8601 'Z' through the plain timestamp cast
(session tz pinned UTC in readur_spark.session).

Scale design (10^9 feeds/day poll tier):
  - one projection per feed document: the explode multiplies rows by
    items-per-feed (bounded small by convention), never by content
    size; no shuffle at all until the caller aggregates;
  - discovered urls feed straight into sources/cdx.py's
    cdx_frontier_diff (is this url already captured?) and
    queries/crawl.py's politeness scheduler — the composed path is
    the crawl loop's freshness leg.

Reference tie-in: the reference's source-sync tier polls WebDAV
mounts for new files on an interval (src/services/webdav/,
src/scheduling/source_scheduler.rs); the feed poll is the open-web
twin of that loop, with the same "discover, diff against seen,
enqueue" shape.

Relation to ml/structured.py: that module's `feed_items_parse` is the
head-scan field pull (RSS only, dates as raw strings) that belongs to
the structured-metadata family; THIS module is the discovery tier's
full parse — both wire formats, href vs text link shapes, and typed
timestamps through two parse ladders — the form the frontier diff and
revisit scheduler consume.

Construction rule for the driver query (SQL-replayable): each
document becomes ONE feed file on its source host carrying TWO items
(the post and its comments page); doc_id parity picks the wire format
(even = RSS, odd = Atom); the calendar fields derive from doc_id
(month = doc_id%12+1, day = doc_id%28+1, seconds = doc_id%60), so
every parsed timestamp is a value-checkable round trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

_BLOCK_RE = "(?s)<(?:item|entry)>(.*?)</(?:item|entry)>"
_TITLE_RE = "<title>([^<]*)</title>"
_RSS_LINK_RE = "<link>([^<]*)</link>"
_ATOM_LINK_RE = '<link href="([^"]*)"'
_RSS_DATE_RE = "<pubDate>([^<]*)</pubDate>"
_ATOM_DATE_RE = "<updated>([^<]*)</updated>"
_RFC822_FMT = "dd MMM yyyy HH:mm:ss 'GMT'"


def feed_kind(xml: Column) -> Column:
    return F.when(xml.startswith("<rss"), "rss").otherwise("atom")


def feed_items(
    feeds: DataFrame, *, xml_col: str = "xml", host_col: str = "feed_host"
) -> DataFrame:
    """Explode feed documents into (feed_host, kind, item_url, title,
    pub_ts) rows. One projection + explode, zero Python."""
    blocks = feeds.select(
        F.col(host_col),
        feed_kind(F.col(xml_col)).alias("kind"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_BLOCK_RE), 1)
        ).alias("block"),
    )
    rss_url = F.regexp_extract("block", _RSS_LINK_RE, 1)
    atom_url = F.regexp_extract("block", _ATOM_LINK_RE, 1)
    rss_ts = F.try_to_timestamp(
        F.nullif(F.regexp_extract("block", _RSS_DATE_RE, 1), F.lit("")),
        F.lit(_RFC822_FMT),
    )
    atom_ts = F.nullif(
        F.regexp_extract("block", _ATOM_DATE_RE, 1), F.lit("")
    ).cast("timestamp")
    return blocks.select(
        host_col,
        "kind",
        F.nullif(
            F.when(F.col("kind") == "rss", rss_url).otherwise(atom_url),
            F.lit(""),
        ).alias("item_url"),
        F.nullif(
            F.regexp_extract("block", _TITLE_RE, 1), F.lit("")
        ).alias("title"),
        F.when(F.col("kind") == "rss", rss_ts)
        .otherwise(atom_ts)
        .alias("pub_ts"),
    )


# ---- constructed-corpus driver query --------------------------------------


def constructed_feeds(df: DataFrame) -> DataFrame:
    """(feed_host, xml) under the module docstring's rule."""
    host = F.concat(F.col("source"), F.lit(".example"))
    base = F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("doc_id"))
    d = F.make_date(
        F.lit(2024), F.col("doc_id") % 12 + 1, F.col("doc_id") % 28 + 1
    )
    ss = F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0")
    rfc = F.concat(
        F.date_format(d, "dd MMM yyyy"), F.lit(" 12:00:"), ss, F.lit(" GMT")
    )
    iso = F.concat(d.cast("string"), F.lit("T08:30:"), ss, F.lit("Z"))

    def rss_item(title: Column, url: Column) -> Column:
        return F.concat(
            F.lit("<item><title>"), title, F.lit("</title><link>"), url,
            F.lit("</link><pubDate>"), rfc, F.lit("</pubDate></item>"),
        )

    def atom_item(title: Column, url: Column) -> Column:
        return F.concat(
            F.lit("<entry><title>"), title, F.lit('</title><link href="'),
            url, F.lit('"/><updated>'), iso, F.lit("</updated></entry>"),
        )

    post_t = F.concat(F.lit("Post "), F.col("doc_id"))
    cmt_t = F.concat(F.lit("Comments "), F.col("doc_id"))
    cmt_u = F.concat(base, F.lit("/comments"))
    rss = F.concat(
        F.lit('<rss version="2.0"><channel><title>'), F.col("source"),
        F.lit("</title>"), rss_item(post_t, base), rss_item(cmt_t, cmt_u),
        F.lit("</channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom"><title>'),
        F.col("source"), F.lit("</title>"), atom_item(post_t, base),
        atom_item(cmt_t, cmt_u), F.lit("</feed>"),
    )
    return df.select(
        host.alias("feed_host"),
        F.when(F.col("doc_id") % 2 == 0, rss).otherwise(atom).alias("xml"),
    )


_CONSTRUCT_SQL = """
  SELECT source || '.example' AS feed_host,
         CASE WHEN doc_id % 2 = 0 THEN
           '<rss version="2.0"><channel><title>' || source || '</title>'
           || '<item><title>Post ' || doc_id || '</title><link>'
           || 'https://' || source || '.example/p/' || doc_id
           || '</link><pubDate>' || rfc || '</pubDate></item>'
           || '<item><title>Comments ' || doc_id || '</title><link>'
           || 'https://' || source || '.example/p/' || doc_id
           || '/comments</link><pubDate>' || rfc || '</pubDate></item>'
           || '</channel></rss>'
         ELSE
           '<feed xmlns="http://www.w3.org/2005/Atom"><title>' || source
           || '</title>'
           || '<entry><title>Post ' || doc_id
           || '</title><link href="https://' || source || '.example/p/'
           || doc_id || '"/><updated>' || iso || '</updated></entry>'
           || '<entry><title>Comments ' || doc_id
           || '</title><link href="https://' || source || '.example/p/'
           || doc_id || '/comments"/><updated>' || iso
           || '</updated></entry></feed>'
         END AS xml
  FROM (
    SELECT doc_id, source,
           strftime(make_date(2024, CAST(doc_id % 12 AS INT) + 1,
                              CAST(doc_id % 28 AS INT) + 1),
                    '%d %b %Y')
             || ' 12:00:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
             || ' GMT' AS rfc,
           CAST(make_date(2024, CAST(doc_id % 12 AS INT) + 1,
                          CAST(doc_id % 28 AS INT) + 1) AS VARCHAR)
             || 'T08:30:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
             || 'Z' AS iso
    FROM documents
  )
"""


@register(
    "feed_discover_items",
    oracle=f"""
    WITH c AS ({_CONSTRUCT_SQL}),
    blocks AS (
      SELECT feed_host,
             CASE WHEN starts_with(xml, '<rss') THEN 'rss'
                  ELSE 'atom' END AS kind,
             b.block
      FROM c, UNNEST(regexp_extract_all(xml,
          '(?s)<(?:item|entry)>(.*?)</(?:item|entry)>', 1)) AS b(block)
    )
    SELECT feed_host, kind,
           nullif(CASE WHEN kind = 'rss'
                  THEN regexp_extract(block, '{_RSS_LINK_RE}', 1)
                  ELSE regexp_extract(block, '{_ATOM_LINK_RE.replace("'", "''")}', 1)
                  END, '') AS item_url,
           nullif(regexp_extract(block, '{_TITLE_RE}', 1), '') AS title,
           CASE WHEN kind = 'rss'
                THEN try_strptime(nullif(regexp_extract(block,
                       '{_RSS_DATE_RE}', 1), ''),
                     '%d %b %Y %H:%M:%S GMT')
                ELSE TRY_CAST(nullif(regexp_extract(block,
                       '{_ATOM_DATE_RE}', 1), '') AS TIMESTAMP)
           END AS pub_ts
    FROM blocks
    """,
)
def feed_discover_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-format feed parse over the constructed per-document feeds:
    block explosion, both link shapes, both timestamp ladders — every
    field value-hashed (two item rows per document)."""
    feeds = constructed_feeds(load(spark, sf_dir, "documents"))
    return feed_items(feeds)
