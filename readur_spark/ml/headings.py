"""Heading-path chunking — structure-aware passage extraction.

RAG pipelines and long-context packers split pages into passages at
HEADING boundaries and prefix each passage with its heading
breadcrumb ("Title > Section"), because a section body stripped of
its headings loses the context that made it retrievable (the
markdown-header-splitter convention; contrast ml/* chunk_for_embedding,
which windows by character count and knows nothing about structure).
This module does that split directly on page HTML:

  token stream  = every <h1>/<h2>/<p> block in document order
                  (one regexp_extract_all + posexplode);
  heading state = running last-h1 / last-h2 via ignore-null window
                  LAST over the per-page position order — an h2 only
                  applies while it is NEWER than the current h1
                  (position comparison, no per-row Python state);
  chunks        = paragraphs grouped by their governing heading
                  position, text joined in order, breadcrumb
                  'h1 > h2' (or bare 'h1' for preamble paragraphs).

Scale design (10^12 pages): all state is PER PAGE — the window and
the group-by both key on (url, position), so the operator is
embarrassingly parallel over pages and never builds cross-page state;
the payload is consumed by the one tokenizing projection and what
shuffles afterwards is the slim token frame. Both shuffles share the
url key, so AQE coalesces them onto one exchange.

Reference tie-in: the reference splits PDF extraction output per page
and carries (page, span) provenance (src/ocr/enhanced.rs page loop);
the breadcrumb here is the HTML-native form of that provenance.

Construction rule (SQL-restatable, over ``documents``):
h1 'Title <doc_id>'; a preamble paragraph 'pre <doc_id>' when
doc_id % 4 == 0; n = doc_id % 3 + 1 sections, section s headed
'Sec <doc_id>_<s>' holding m = doc_id % 2 + 1 paragraphs
'para <doc_id>_<s>_<p>'.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load, synthetic_url

_TOKEN_RE = "<h1>[^<]*</h1>|<h2>[^<]*</h2>|<p>[^<]*</p>"
_INNER_RE = ">([^<]*)<"


def heading_chunks(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(url, chunk_idx, heading_path, chunk_text, n_paras) — one row
    per heading-governed passage, paragraphs joined in order."""
    toks = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_TOKEN_RE), 0)
        ).alias("pos", "tok"),
    ).select(
        "url", "pos",
        F.when(F.col("tok").startswith("<h1>"), F.lit("h1"))
        .when(F.col("tok").startswith("<h2>"), F.lit("h2"))
        .otherwise(F.lit("p"))
        .alias("kind"),
        F.regexp_extract("tok", _INNER_RE, 1).alias("content"),
    )
    w = (
        Window.partitionBy("url")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def running(kind: str, col: Column) -> Column:
        return F.last(
            F.when(F.col("kind") == kind, col), ignorenulls=True
        ).over(w)

    placed = toks.select(
        "url", "pos", "kind", "content",
        running("h1", F.col("content")).alias("h1_text"),
        running("h1", F.col("pos")).alias("h1_pos"),
        running("h2", F.col("content")).alias("h2_text"),
        running("h2", F.col("pos")).alias("h2_pos"),
    ).filter(F.col("kind") == "p")
    h2_live = F.col("h2_pos").isNotNull() & (
        F.col("h2_pos") > F.coalesce(F.col("h1_pos"), F.lit(-1))
    )
    paras = placed.select(
        "url", "pos", "content",
        F.greatest(
            F.coalesce(F.col("h1_pos"), F.lit(-1)),
            F.coalesce(F.col("h2_pos"), F.lit(-1)),
        ).alias("grp"),
        F.when(
            h2_live,
            F.concat_ws(
                " > ",
                F.coalesce(F.col("h1_text"), F.lit("")),
                F.col("h2_text"),
            ),
        )
        .otherwise(F.coalesce(F.col("h1_text"), F.lit("")))
        .alias("heading_path"),
    )
    grouped = paras.groupBy("url", "grp", "heading_path").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "content"))),
                lambda x: x.getField("content"),
            ),
            " ",
        ).alias("chunk_text"),
        F.count(F.lit(1)).cast("long").alias("n_paras"),
    )
    idx = Window.partitionBy("url").orderBy("grp")
    return grouped.select(
        "url",
        (F.row_number().over(idx) - 1).cast("long").alias("chunk_idx"),
        "heading_path", "chunk_text", "n_paras",
    )


# ---- constructed corpus (module-docstring rule) ------------------------------


def constructed_sectioned_pages(docs: DataFrame) -> DataFrame:
    """(url, html_str) under the construction rule."""
    n = F.col("doc_id") % 3 + 1
    m = F.col("doc_id") % 2 + 1

    def para(s: int, p: int) -> Column:
        return F.concat(
            F.lit("<p>para "), F.col("doc_id"), F.lit(f"_{s}_{p}</p>")
        )

    def section(s: int) -> Column:
        body = F.concat(
            para(s, 0), F.when(m >= 2, para(s, 1)).otherwise(F.lit(""))
        )
        return F.concat(
            F.lit("<h2>Sec "), F.col("doc_id"), F.lit(f"_{s}</h2>"), body
        )

    pre = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(F.lit("<p>pre "), F.col("doc_id"), F.lit("</p>")),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<h1>Title "), F.col("doc_id"), F.lit("</h1>"), pre,
        section(0),
        F.when(n >= 2, section(1)).otherwise(F.lit("")),
        F.when(n >= 3, section(2)).otherwise(F.lit("")),
    )
    return docs.select(synthetic_url().alias("url"), html.alias("html_str"))


@register(
    "heading_path_chunks",
    oracle="""
    WITH base AS (
      SELECT doc_id, source,
             doc_id % 3 + 1 AS n, doc_id % 2 + 1 AS m,
             CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS has_pre
      FROM documents
    ),
    pre AS (
      SELECT doc_id, source, 0 AS chunk_idx,
             'Title ' || doc_id AS heading_path,
             'pre ' || doc_id AS chunk_text,
             CAST(1 AS BIGINT) AS n_paras
      FROM base WHERE has_pre = 1
    ),
    sections AS (
      SELECT doc_id, source, has_pre + s AS chunk_idx,
             'Title ' || doc_id || ' > Sec ' || doc_id || '_' || s
               AS heading_path,
             'para ' || doc_id || '_' || s || '_0'
               || CASE WHEN m = 2
                       THEN ' para ' || doc_id || '_' || s || '_1'
                       ELSE '' END AS chunk_text,
             CAST(m AS BIGINT) AS n_paras
      FROM base, unnest(range(n)) AS t(s)
    ),
    allc AS (SELECT * FROM pre UNION ALL SELECT * FROM sections)
    SELECT 'https://' || source || '.example/doc' || doc_id || '.txt'
             AS url,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           heading_path, chunk_text, n_paras
    FROM allc
    """,
)
def heading_path_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk the constructed sectioned corpus — the oracle restates
    every breadcrumb, chunk body, order index, and paragraph count
    straight from the rule, independent of the tokenizer, window
    state, and grouping under test."""
    pages = constructed_sectioned_pages(load(spark, sf_dir, "documents"))
    return heading_chunks(pages)


# ---- composed chain: heading chunks -> concat-and-chunk packing ------------

PACK_SHARDS = 8
PACK_CHUNK_TOKENS = 16
_PACK_SALT_LEN = 8


@register(
    "chunk_packing_plan",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source,
             doc_id % 3 + 1 AS n, doc_id % 2 + 1 AS m,
             CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS has_pre
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, source, 0 AS chunk_idx, 2 AS n_tokens
      FROM base WHERE has_pre = 1
      UNION ALL
      SELECT doc_id, source, has_pre + s, 2 * m
      FROM base, unnest(range(n)) AS t(s)
    ),
    u AS (
      SELECT 'https://' || source || '.example/doc' || doc_id || '.txt'
               AS url, chunk_idx, n_tokens
      FROM chunks
    ),
    keyed AS (
      SELECT url || '#' || lpad(CAST(chunk_idx AS VARCHAR), 3, '0')
               AS chunk_uid,
             CAST(concat('0x', substr(md5(url), 1, {_PACK_SALT_LEN}))
                  AS BIGINT) % {PACK_SHARDS} AS shard,
             n_tokens
      FROM u
    ),
    o AS (
      SELECT shard, chunk_uid, n_tokens,
             CAST(COALESCE(sum(n_tokens) OVER
               (PARTITION BY shard ORDER BY chunk_uid
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_offset
      FROM keyed
    )
    SELECT CAST(shard AS BIGINT) AS shard, chunk_uid, start_offset,
           CAST(start_offset // {PACK_CHUNK_TOKENS} AS BIGINT)
             AS chunk_first,
           CAST((start_offset + n_tokens - 1) // {PACK_CHUNK_TOKENS}
                AS BIGINT) AS chunk_last,
           CAST((start_offset + n_tokens - 1) // {PACK_CHUNK_TOKENS}
                > start_offset // {PACK_CHUNK_TOKENS} AS INT)
             AS spans_boundary
    FROM o
    """,
)
def chunk_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed chain: the heading-path chunker feeding
    ml/packing.py's concat-and-chunk assignment — structure-aware
    passages, not raw documents, are what actually enters a context
    window, and the packer's shard-local prefix sums don't care which
    unit they pack. Chunk ids are (url # zero-padded idx) so in-page
    breadcrumb order is preserved inside each shard; shards are
    content-addressed off the page url (all of a page's chunks pack
    contiguously). The oracle restates chunk token counts from the
    construction rule (pre = 2 tokens, section = 2·m) and replays the
    prefix-sum window — parse, chunking, sharding, and packing checked
    in one value hash.

    Scale: same plan family as pack_sequences — one per-shard window
    over the slim (shard, uid, n_tokens) frame."""
    from readur_spark.ml.packing import pack_concat_chunks

    pages = constructed_sectioned_pages(load(spark, sf_dir, "documents"))
    chunks = heading_chunks(pages)
    keyed = chunks.select(
        F.concat(
            F.col("url"), F.lit("#"),
            F.lpad(F.col("chunk_idx").cast("string"), 3, "0"),
        ).alias("chunk_uid"),
        (
            F.conv(
                F.substring(
                    F.md5(F.encode(F.col("url"), "UTF-8")), 1, _PACK_SALT_LEN
                ),
                16, 10,
            ).cast("long")
            % PACK_SHARDS
        ).alias("shard"),
        F.size(F.split(F.col("chunk_text"), r"\s+")).alias("n_tokens"),
    )
    packed = pack_concat_chunks(
        keyed, id_col="chunk_uid", tokens_col="n_tokens",
        shard_col="shard", chunk_tokens=PACK_CHUNK_TOKENS,
    )
    return packed.withColumnRenamed("doc_id", "chunk_uid")
