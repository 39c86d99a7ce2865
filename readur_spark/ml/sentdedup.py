"""Sentence-level corpus dedup (CCNet / Dolma recipe tier).

Published recipe family: CCNet and Dolma deduplicate below the
paragraph, at SENTENCE granularity — syndicated promos, cookie
notices, and share-bar copy repeat across hosts as single sentences
glued into otherwise-unique paragraphs, where ml/paradedup.py
(paragraph keep-first) and ml/linefilters.py (line document-frequency
dedup) both miss them. Policy here: a sentence whose corpus document
frequency reaches `SENT_DF_THRESHOLD` is boilerplate and EVERY
occurrence is removed, but only when it carries at least
`SENT_MIN_WORDS` words — short formulaic sentences ("Thanks.",
"Yes.") are legitimate content and are spared. The reference engine's
analogue is its duplicate-document policy
(src/services/file_service.rs dedup paths); this pushes the same idea
below document granularity the way web-corpus curation does.

The segmentation kernel is expression-level (zero Python) and
abbreviation-guarded: periods that terminate "Dr.", "e.g.", etc. must
not split. Three replayable steps, identical in Spark and DuckDB:

  1. protect: each "<abbrev> " becomes "<abbrev>\\x02" (literal
     replaces, chained);
  2. split: regexp_replace '([.!?])[ \\t\\n\\r]+' -> '$1\\x01', then
     split on \\x01 — the sentence keeps its terminal punctuation;
  3. restore: \\x02 -> ' ' inside each piece, then trim.

Scale design (10^12 docs):
  - document frequency is computed on a SLIM frame: posexplode
    projects (doc_id, pos, md5-prefix, n_words) immediately; sentence
    text never crosses the shuffle (16-hex-char keys only).
  - the frequent set is naturally bounded (each member repeats >=
    threshold times => at most corpus_sentences/threshold entries);
    it joins back to the slim frame to elect per-doc DROP POSITIONS,
    one (doc_id, drop_pos array) row per affected doc.
  - the payload joins that drop frame once on doc_id and is
    reassembled by an index-aware array filter — a pure projection;
    the page text itself never shuffles (ml/paradedup.py's shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

SENT_DF_THRESHOLD = 3  # a sentence in >= this many docs is boilerplate
SENT_MIN_WORDS = 3  # shorter sentences are spared
_HASH_PREFIX = 16  # md5 hex chars per sentence key (64 bits)
_SPLIT = "\x01"  # sentence-boundary marker
_GUARD = "\x02"  # protected-abbreviation space

# Abbreviations whose trailing period never ends a sentence. Literal
# chained replaces keep the kernel SQL-replayable (no lookbehind — RE2
# has none, so the oracle could not follow a lookbehind split).
ABBREVIATIONS = ("Mr.", "Mrs.", "Dr.", "St.", "vs.", "e.g.", "i.e.",
                 "Fig.", "No.")

_BOUNDARY_RE = r"([.!?])[ \t\n\r]+"


def split_sentences(text: Column) -> Column:
    """array<string> of trimmed sentences (terminal punctuation kept,
    abbreviation periods guarded). Empty pieces are preserved so array
    positions stay aligned with the slim explode — drop them at use."""
    protected = text
    for a in ABBREVIATIONS:
        protected = F.replace(protected, F.lit(a + " "), F.lit(a + _GUARD))
    marked = F.regexp_replace(protected, _BOUNDARY_RE, "$1" + _SPLIT)
    return F.transform(
        F.split(marked, _SPLIT),
        lambda s: F.trim(F.replace(s, F.lit(_GUARD), F.lit(" "))),
    )


def _word_count(s: Column) -> Column:
    return F.size(F.filter(F.split(s, r"\s+"), lambda w: w != F.lit("")))


def sentence_drop_positions(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = SENT_DF_THRESHOLD,
    min_words: int = SENT_MIN_WORDS,
) -> DataFrame:
    """SLIM (doc_id, drop_pos: array<int>) frame: positions (0-based
    over the FULL sentence array, blanks included) of every occurrence
    of a corpus-frequent sentence. Only hashes cross the shuffle."""
    exploded = (
        df.select(
            F.col(id_col),
            F.posexplode(split_sentences(F.col(text_col))).alias(
                "pos", "_s"
            ),
        )
        .filter(F.col("_s") != "")
        .select(
            id_col,
            "pos",
            F.substring(
                F.md5(F.encode(F.col("_s"), "UTF-8")), 1, _HASH_PREFIX
            ).alias("h"),
            _word_count(F.col("_s")).alias("n_words"),
        )
    )
    frequent = (
        exploded.filter(F.col("n_words") >= min_words)
        .groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("h")
    )
    return (
        exploded.join(F.broadcast(frequent), "h")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("drop_pos"))
    )


def sentence_dedup(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
    min_df: int = SENT_DF_THRESHOLD,
    min_words: int = SENT_MIN_WORDS,
) -> DataFrame:
    """Remove every occurrence of each corpus-frequent (>= min_df
    docs, >= min_words words) sentence; adds n_sents / n_sents_kept
    and `out_col` (kept sentences joined by a single space — the
    recipe's normalized reassembly). Payload joins the slim drop
    frame once and is rebuilt by projection."""
    drops = sentence_drop_positions(
        df, text_col=text_col, id_col=id_col,
        min_df=min_df, min_words=min_words,
    )
    sents = split_sentences(F.col(text_col))
    drop = F.coalesce(F.col("drop_pos"), F.array().cast("array<int>"))
    nonblank = F.filter(sents, lambda s: s != F.lit(""))
    kept = F.filter(
        sents, lambda s, i: (s != F.lit("")) & ~F.array_contains(drop, i)
    )
    return (
        df.join(drops, on=id_col, how="left")
        .withColumn("n_sents", F.size(nonblank))
        .withColumn("n_sents_kept", F.size(kept))
        .withColumn(out_col, F.array_join(kept, " "))
        .drop("drop_pos")
    )


# ---- constructed-corpus driver query ------------------------------------

# Construction rule (SQL-replayable): every doc_id % 4 == 0 page opens
# with a shared promo sentence (df ~ n/4 >> threshold, 6 words ->
# dropped); every page carries one unique content sentence exercising
# the abbreviation guard (df = 1 -> kept); every page closes with one
# of 3 shared disclaimers (df ~ n/3 -> dropped); every even page adds
# "Thanks." (df ~ n/2 but 1 word < SENT_MIN_WORDS -> SPARED).
_PROMO = "Subscribe to the newsletter today!"
_DISCLAIMER = "All rights reserved variant "


def constructed_sentence_pages(df: DataFrame) -> DataFrame:
    content = F.concat(
        F.lit("See Dr. Smith about "),
        F.col("lang"),
        F.lit(" documents e.g. doc "),
        F.col("doc_id").cast("string"),
        F.lit("."),
    )
    return df.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.when(F.col("doc_id") % 4 == 0, F.lit(_PROMO)),
            content,
            F.concat(
                F.lit(_DISCLAIMER), (F.col("doc_id") % 3).cast("string"),
                F.lit("."),
            ),
            F.when(F.col("doc_id") % 2 == 0, F.lit("Thanks.")),
        ).alias("text"),
        "lang",
    )


_CONSTRUCT_SQL = f"""
  SELECT doc_id,
         concat_ws(' ',
           CASE WHEN doc_id % 4 = 0 THEN '{_PROMO}' END,
           'See Dr. Smith about ' || lang || ' documents e.g. doc '
             || CAST(doc_id AS VARCHAR) || '.',
           '{_DISCLAIMER}' || CAST(doc_id % 3 AS VARCHAR) || '.',
           CASE WHEN doc_id % 2 = 0 THEN 'Thanks.' END) AS text
  FROM documents
"""

def _sents_sql(col: str) -> str:
    """The segmentation kernel as a DuckDB expression over `col` —
    protect / split / restore+trim, step-for-step `split_sentences`."""
    protected = col
    for a in ABBREVIATIONS:
        protected = f"replace({protected}, '{a} ', '{a}' || chr(2))"
    return (
        "list_transform(string_split(regexp_replace("
        + protected
        + r", '([.!?])[ \t\n\r]+', '\1' || chr(1), 'g'), chr(1)),"
        " s -> trim(replace(s, chr(2), ' ')))"
    )


_WORDS_SQL = (
    "len(list_filter(regexp_split_to_array(s, '\\s+'), w -> w <> ''))"
)


_SENT_ORACLE = f"""
    WITH c AS ({_CONSTRUCT_SQL}),
    sa AS (
      SELECT doc_id, {{SENTS}} AS sents
      FROM c
    ),
    e AS (
      SELECT doc_id, s, pos FROM (
        SELECT doc_id, unnest(sents) AS s,
               unnest(range(1, len(sents) + 1)) AS pos
        FROM sa
      ) WHERE s <> ''
    ),
    freq AS (
      SELECT substr(md5(s), 1, {_HASH_PREFIX}) AS h
      FROM e
      WHERE {_WORDS_SQL} >= {SENT_MIN_WORDS}
      GROUP BY substr(md5(s), 1, {_HASH_PREFIX})
      HAVING count(DISTINCT doc_id) >= {SENT_DF_THRESHOLD}
    ),
    kept AS (
      SELECT e.doc_id, e.s, e.pos
      FROM e LEFT JOIN freq
        ON substr(md5(e.s), 1, {_HASH_PREFIX}) = freq.h
      WHERE freq.h IS NULL
    ),
    k AS (
      SELECT doc_id, count(*) AS n_sents_kept,
             string_agg(s, ' ' ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id
    ),
    n AS (
      SELECT doc_id, count(*) AS n_sents FROM e GROUP BY doc_id
    )
    SELECT c.doc_id,
           coalesce(n.n_sents, 0) AS n_sents,
           coalesce(k.n_sents_kept, 0) AS n_sents_kept,
           coalesce(k.clean_text, '') AS clean_text
    FROM c LEFT JOIN n USING (doc_id) LEFT JOIN k USING (doc_id)
    """.replace("{SENTS}", _sents_sql("text"))


@register("sentence_dedup_clean", oracle=_SENT_ORACLE)
def sentence_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/Dolma-style corpus-frequency sentence dedup over a
    constructed corpus — abbreviation-guarded segmentation, slim
    document-frequency election (min-words spare rule), and the
    reassembled cleaned text all value-hashed against a DuckDB twin
    that replays every step."""
    docs = constructed_sentence_pages(load(spark, sf_dir, "documents"))
    out = sentence_dedup(docs)
    return out.select(
        "doc_id",
        F.col("n_sents").cast("long").alias("n_sents"),
        F.col("n_sents_kept").cast("long").alias("n_sents_kept"),
        "clean_text",
    )
