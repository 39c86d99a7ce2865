"""Corpus-wide paragraph-level exact dedup (MassiveText / Gopher).

Published recipe (Rae et al., Gopher appendix; reused by RefinedWeb and
Dolma): paragraphs that appear verbatim in more than one document are
boilerplate or syndication — remove every occurrence EXCEPT the first,
where "first" is the globally smallest (doc_id, position). This is the
paragraph-granularity sibling of ml/linefilters.py's line dedup (which
drops by document-frequency threshold instead of keep-first) and of
ml/decontam.py's repeated-substring spans (which work below paragraph
granularity). The reference engine's analogue is its duplicate-document
policy (src/services/file_service.rs dedup paths); this generalizes it
below document granularity the way large-corpus curation recipes do.

Scale design (10^12 docs):
  - winner election happens on a SLIM frame: posexplode projects
    (doc_id, pos, md5-prefix hash) immediately — the paragraph TEXT
    never crosses the shuffle. One hash-partitioned window
    (row_number over (hash) ordered by (doc_id, pos)) elects winners;
    rows with rn > 1 are the drop set.
  - the drop set is naturally small (only duplicated paragraphs), is
    rolled up to one (doc_id, drop_pos array) row per affected doc,
    and joins back to the payload on doc_id — the payload crosses
    exactly one co-partitioned join, never the window shuffle.
  - reassembly is a pure projection: an index-aware array filter +
    array_join, no second explode of the payload.
  - ties are impossible: (doc_id, pos) is unique, so the election is
    deterministic under any partitioning.

The registered query runs over a CONSTRUCTED multi-paragraph corpus
(the synthetic documents table is single-line), built with
SQL-expressible rules so the DuckDB oracle replays construction,
election, and reassembly end-to-end and value-hashes the cleaned text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

PARA_SEP = "\n\n"
_HASH_PREFIX = 16  # md5 hex chars per paragraph key (64 bits)

# constructed-corpus boilerplate (shared across docs by modulo rule)
_NAV = "NAVIGATION Home About Contact Search"
_FOOTER = "Copyright footer variant "


def paragraph_drop_positions(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SLIM (doc_id, drop_pos: array<int>) frame: for every paragraph
    that is an exact duplicate of an earlier (doc_id, pos) occurrence
    anywhere in the corpus, the 0-based positions to remove from that
    document. Blank paragraphs are never dropped (they are separator
    artifacts, not content). Only the 16-byte hash crosses the shuffle."""
    exploded = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), PARA_SEP)).alias("pos", "_p"),
        )
        .filter(F.trim(F.col("_p")) != "")
        .select(
            id_col,
            "pos",
            F.substring(
                F.md5(F.encode(F.col("_p"), "UTF-8")), 1, _HASH_PREFIX
            ).alias("h"),
        )
    )
    w = Window.partitionBy("h").orderBy(F.col(id_col), F.col("pos"))
    return (
        exploded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("drop_pos"))
    )


def _filter_by_index(arr: Column, drop: Column) -> Column:
    """Index-aware array filter: keep arr[i] unless i ∈ drop."""
    return F.filter(arr, lambda x, i: ~F.array_contains(drop, i))


def paragraph_dedup_keep_first(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
) -> DataFrame:
    """Remove every non-first occurrence of each corpus-duplicated
    paragraph; adds n_paras / n_paras_kept counters and `out_col`.
    The payload joins the slim drop frame once on doc_id and is
    reassembled by projection."""
    drops = paragraph_drop_positions(df, text_col=text_col, id_col=id_col)
    paras = F.split(F.col(text_col), PARA_SEP)
    drop = F.coalesce(F.col("drop_pos"), F.array().cast("array<int>"))
    kept = _filter_by_index(paras, drop)
    return (
        df.join(drops, on=id_col, how="left")
        .withColumn("n_paras", F.size(paras))
        .withColumn("n_paras_kept", F.size(kept))
        .withColumn(out_col, F.array_join(kept, PARA_SEP))
        .drop("drop_pos")
    )


def constructed_paragraph_pages(df: DataFrame) -> DataFrame:
    """Deterministic multi-paragraph corpus from the single-line
    documents table: every doc_id % 3 == 0 page gets a shared nav
    header, every page gets one of 5 shared copyright footers, the
    page's own text sits between them. SQL-expressible (the DuckDB
    oracle replays it verbatim), and it creates real cross-document
    duplicates with known keep-first winners."""
    return df.select(
        "doc_id",
        F.concat_ws(
            PARA_SEP,
            F.when(F.col("doc_id") % 3 == 0, F.lit(_NAV)),
            F.col("text"),
            F.concat(F.lit(_FOOTER), (F.col("doc_id") % 5).cast("string")),
        ).alias("text"),
    )


_CONSTRUCT_SQL = f"""
  SELECT doc_id,
         concat_ws(chr(10) || chr(10),
           CASE WHEN doc_id % 3 = 0 THEN '{_NAV}' END,
           text,
           '{_FOOTER}' || CAST(doc_id % 5 AS VARCHAR)) AS text
  FROM documents
"""


@register(
    "paragraph_dedup_keep_first",
    oracle=f"""
    WITH c AS ({_CONSTRUCT_SQL}),
    p AS (
      SELECT doc_id,
             unnest(string_split(text, chr(10) || chr(10))) AS para,
             unnest(range(1, len(string_split(text, chr(10) || chr(10))) + 1))
               AS pos
      FROM c
    ),
    r AS (
      SELECT doc_id, para, pos,
             row_number() OVER (
               PARTITION BY substr(md5(para), 1, {_HASH_PREFIX})
               ORDER BY doc_id, pos) AS rn
      FROM p WHERE trim(para) <> ''
    ),
    keep AS (
      SELECT doc_id, para, pos FROM r WHERE rn = 1
      UNION ALL
      SELECT doc_id, para, pos FROM p WHERE trim(para) = ''
    ),
    k AS (
      SELECT doc_id, count(*) AS n_paras_kept,
             string_agg(para, chr(10) || chr(10) ORDER BY pos) AS clean_text
      FROM keep GROUP BY doc_id
    )
    SELECT c.doc_id,
           len(string_split(c.text, chr(10) || chr(10))) AS n_paras,
           coalesce(k.n_paras_kept, 0) AS n_paras_kept,
           coalesce(k.clean_text, '') AS clean_text
    FROM c LEFT JOIN k ON c.doc_id = k.doc_id
    """,
)
def paragraph_dedup_keep_first_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText keep-first paragraph dedup over a constructed
    multi-paragraph corpus — winner election, drop positions, and the
    reassembled cleaned text all value-hashed against a DuckDB twin
    that replays construction + window election + ordered reassembly."""
    docs = constructed_paragraph_pages(load(spark, sf_dir, "documents"))
    out = paragraph_dedup_keep_first(docs)
    return out.select(
        "doc_id",
        F.col("n_paras").cast("long").alias("n_paras"),
        F.col("n_paras_kept").cast("long").alias("n_paras_kept"),
        "clean_text",
    )


@register(
    "paragraph_dup_stats",
    oracle=f"""
    WITH c AS ({_CONSTRUCT_SQL}),
    p AS (
      SELECT doc_id, unnest(string_split(text, chr(10) || chr(10))) AS para
      FROM c
    )
    SELECT substr(md5(para), 1, {_HASH_PREFIX}) AS h,
           count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs,
           min(doc_id) AS first_doc
    FROM p WHERE trim(para) <> ''
    GROUP BY h HAVING count(*) > 1
    """,
)
def paragraph_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-paragraph census over the constructed corpus: per
    paragraph hash its occurrence count, document frequency, and the
    winning (first) document — the monitoring view a curation run
    publishes alongside the cleaned text."""
    docs = constructed_paragraph_pages(load(spark, sf_dir, "documents"))
    exploded = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), PARA_SEP)).alias("_p"),
        )
        .filter(F.trim(F.col("_p")) != "")
        .select(
            "doc_id",
            F.substring(
                F.md5(F.encode(F.col("_p"), "UTF-8")), 1, _HASH_PREFIX
            ).alias("h"),
        )
    )
    return (
        exploded.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_occurrences") > 1)
    )
