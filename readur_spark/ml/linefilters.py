"""Line-level curation: C4 line gates + corpus-frequency line dedup.

Two public-recipe stages that operate on LINES inside each document
(distinct from the doc-level C4/Gopher gates in ml/webfilters.py):

  1. C4 line filters (Raffel et al., C4): keep only lines that end in
     terminal punctuation, have >= 5 words, and don't contain
     "javascript" or a curly brace — the cheap pass that strips nav
     bars, cookie banners, and code fragments from extracted pages.

  2. Duplicated-line removal (Gopher / RefinedWeb): lines that repeat
     verbatim across many documents are boilerplate; drop every line
     whose corpus document-frequency exceeds a threshold.

The reference engine's analogue is its extraction-quality text
cleanup (src/ocr/enhanced.rs:1487-1558 quality heuristics); these
generalize it to corpus-statistical line hygiene.

Scale design:
  - the C4 gate is a PURE PROJECTION: split -> array filter ->
    array_join, all higher-order Catalyst functions — zero shuffle,
    zero explode, zero Python (plan-pinned); at 10^12 docs the stage
    fuses into the scan;
  - line dedup needs cross-doc document frequency, computed on a SLIM
    (line-hash) explode — the line text is dropped before the only
    shuffle (16-byte md5 prefixes through the agg). The frequent set
    (boilerplate lines, naturally bounded: each entry repeats >= N
    times, so there are at most corpus_lines/N of them) comes back as
    a broadcast literal, and the removal pass is again a pure
    projection — the payload never crosses the wire. Same
    broadcast-the-small-side shape as ml/decontam.py's eval shingles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

MIN_LINE_WORDS = 5
TERMINAL_PUNCT_RE = '[.!?"]$'
LINE_DF_THRESHOLD = 5  # a line in >= this many docs is boilerplate
_HASH_PREFIX = 16  # md5 hex chars per line key (64 bits)


def _line_keep(
    ln: Column,
    *,
    min_words: int = MIN_LINE_WORDS,
    require_punct: bool = True,
) -> Column:
    """The C4 line gate as an expression over one line. `min_words`
    and `require_punct` parameterize the two tunable rules (C4's paper
    values are 5 and True); the javascript / curly-brace code gates
    are unconditional."""
    words = F.size(F.filter(F.split(F.trim(ln), r"\s+"), lambda w: w != F.lit("")))
    keep = (
        (words >= min_words)
        & ~F.lower(ln).contains("javascript")
        & ~ln.contains("{")
    )
    if require_punct:
        keep = keep & F.rtrim(ln).rlike(TERMINAL_PUNCT_RE)
    return keep


def c4_line_filter(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "clean_text",
    min_words: int = MIN_LINE_WORDS,
    require_punct: bool = True,
) -> DataFrame:
    """Apply the C4 line gates inside each document; adds `out_col`
    plus n_lines / n_lines_kept counters. Pure projection."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda ln: _line_keep(
            ln, min_words=min_words, require_punct=require_punct
        ),
    )
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn(out_col, F.array_join(kept, "\n"))
    )


def frequent_line_hash_frame(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = LINE_DF_THRESHOLD,
) -> DataFrame:
    """DISTRIBUTED frequent-line set: one-column (h) frame of md5-prefix
    hashes of lines whose corpus DOCUMENT frequency (distinct docs, so
    a line repeated inside one page doesn't count) reaches min_df.
    Slim explode: only the hash survives to the agg. This is the
    scale-path representation — it never touches the driver."""
    h = F.substring(F.md5(F.encode(F.col("_line"), "UTF-8")), 1, _HASH_PREFIX)
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), "\n")).alias("_line"),
        )
        .filter(F.trim(F.col("_line")) != "")
        .select(id_col, h.alias("h"))
        .groupBy("h")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("h")
    )


def frequent_line_hashes(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_df: int = LINE_DF_THRESHOLD,
) -> list[str]:
    """Driver-side list form of `frequent_line_hash_frame` — only for
    sets small enough to inline as a plan literal (see `line_dedup`'s
    dispatch; above MAX_LITERAL_HASHES use the join path instead)."""
    rows = frequent_line_hash_frame(df, text_col=text_col, min_df=min_df).collect()
    return sorted(r["h"] for r in rows)


def remove_frequent_lines(
    df: DataFrame,
    frequent: list[str],
    *,
    text_col: str = "text",
    out_col: str = "clean_text",
) -> DataFrame:
    """Drop every line whose hash is in `frequent`; blank lines are
    preserved (they carry structure, not boilerplate). Pure
    projection against the broadcast literal set."""
    freq = F.lit(frequent).cast("array<string>")
    lines = F.split(F.col(text_col), "\n")

    def keep(ln: Column) -> Column:
        h = F.substring(F.md5(F.encode(ln, "UTF-8")), 1, _HASH_PREFIX)
        return (F.trim(ln) == "") | ~F.array_contains(freq, h)

    kept = F.filter(lines, keep)
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn(out_col, F.array_join(kept, "\n"))
    )


def remove_frequent_lines_join(
    df: DataFrame,
    frequent: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "clean_text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Scale path of `remove_frequent_lines`: the frequent set stays a
    DataFrame (one `h` column) and removal is a hash join, not an
    array_contains over a plan literal — at 10^12 docs the corpus-
    frequent-line set is millions of entries, and inlining it would
    ship a multi-MB literal to every task and scan it linearly per
    line.

    Shape: posexplode lines → broadcast-left-join the hash set (the
    set is bounded by corpus_lines/min_df; if it ever outgrows
    broadcast memory, drop the hint and pre-shuffle both sides on `h`,
    or probe a Bloom filter built from it — operators/bloom.py) →
    re-assemble each doc with array_sort(collect_list(struct(pos,
    line)))). The payload crosses one shuffle (the per-doc regroup);
    blank lines are preserved unconditionally, matching the literal
    path byte-for-byte."""
    h = F.substring(F.md5(F.encode(F.col("_line"), "UTF-8")), 1, _HASH_PREFIX)
    lines = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "_line"),
    ).withColumn("h", h)
    marked = lines.join(
        F.broadcast(frequent.select("h").withColumn("_freq", F.lit(True))),
        "h",
        "left",
    )
    keep = (F.trim(F.col("_line")) == "") | F.col("_freq").isNull()
    kept_struct = F.when(keep, F.struct("pos", "_line"))
    rebuilt = marked.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_lines"),
        F.array_join(
            # collect_list skips the NULLs `when` leaves for dropped
            # lines; the struct sorts on its leading pos field, so
            # original line order survives the shuffle.
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias(out_col),
        F.sum(keep.cast("int")).cast("int").alias("n_lines_kept"),
    )
    return df.join(rebuilt, id_col)


MAX_LITERAL_HASHES = 10_000  # above this, the literal is a plan smell


def line_dedup(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "clean_text",
    id_col: str = "doc_id",
    min_df: int = LINE_DF_THRESHOLD,
    max_literal: int = MAX_LITERAL_HASHES,
) -> DataFrame:
    """End-to-end corpus-frequency line dedup with the scale dispatch:
    compute the frequent set ONCE (persisted through the count), then
    — small set (≤ max_literal): inline as a sorted literal, removal
    is a pure projection, zero extra join; large set: keep it
    distributed and remove via `remove_frequent_lines_join`. The
    default the 100 TB run takes is decided by the data, not the
    caller."""
    freq = frequent_line_hash_frame(
        df, text_col=text_col, id_col=id_col, min_df=min_df
    ).persist()
    n = freq.count()
    if n <= max_literal:
        hashes = sorted(r["h"] for r in freq.collect())
        freq.unpersist()
        return remove_frequent_lines(
            df, hashes, text_col=text_col, out_col=out_col
        )
    # join path: leave `freq` persisted — the returned plan references
    # it and the cache serves the broadcast build side; LRU evicts it
    # after the action completes.
    return remove_frequent_lines_join(
        df, freq, text_col=text_col, out_col=out_col, id_col=id_col
    )


def with_dup_line_stats(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signal: the fraction of
    non-blank lines that are duplicates of an earlier line in the SAME
    document (the paper drops docs above ~0.3). Pure projection —
    array_distinct over the split, no shuffle."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != F.lit("")
    )
    n = F.size(lines)
    d = F.size(F.array_distinct(lines))
    return (
        df.withColumn("n_lines_nonblank", n)
        .withColumn("n_lines_distinct", d)
        .withColumn(
            "dup_line_fraction",
            F.when(n > 0, (n - d) / n).otherwise(F.lit(0.0)),
        )
    )


# ---- driver-contract queries -------------------------------------------

def gate_sql(min_words: int = MIN_LINE_WORDS, require_punct: bool = True) -> str:
    """DuckDB twin of `_line_keep` at the same operating point (the
    oracle fragments must track the expression parameterization)."""
    punct = (
        "regexp_matches(rtrim(x), '[.!?\"]$') AND " if require_punct else ""
    )
    return (
        punct
        + "len(list_filter(regexp_split_to_array(trim(x), '\\s+'), "
        + f"w -> w <> '')) >= {min_words} "
        + "AND NOT contains(lower(x), 'javascript') "
        + "AND NOT contains(x, '{')"
    )


_GATE_SQL = gate_sql()


@register(
    "c4_line_filter_clean",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, chr(10))) AS n_lines,
           len(list_filter(string_split(text, chr(10)),
               x -> {_GATE_SQL})) AS n_lines_kept,
           coalesce(array_to_string(list_filter(string_split(text, chr(10)),
               x -> {_GATE_SQL}), chr(10)), '') AS clean_text
    FROM documents
    """,
)
def c4_line_filter_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line gates over documents — cleaned text value-hashed
    byte-for-byte against DuckDB's list_filter twin."""
    docs = load(spark, sf_dir, "documents")
    out = c4_line_filter(docs)
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
        "clean_text",
    )


@register(
    "line_dedup_clean",
    oracle=f"""
    WITH lines AS (
      SELECT doc_id, t.ln
      FROM documents, UNNEST(string_split(text, chr(10))) AS t(ln)
      WHERE trim(t.ln) <> ''
    ),
    freq AS (
      SELECT substr(md5(ln), 1, {_HASH_PREFIX}) AS h
      FROM lines
      GROUP BY substr(md5(ln), 1, {_HASH_PREFIX})
      HAVING count(DISTINCT doc_id) >= {LINE_DF_THRESHOLD}
    ),
    fl AS (SELECT coalesce(list(h), []) AS hs FROM freq)
    SELECT d.doc_id,
           len(string_split(d.text, chr(10))) AS n_lines,
           len(list_filter(string_split(d.text, chr(10)),
               x -> trim(x) = '' OR NOT list_contains(fl.hs,
                    substr(md5(x), 1, {_HASH_PREFIX})))) AS n_lines_kept,
           coalesce(array_to_string(list_filter(string_split(d.text, chr(10)),
               x -> trim(x) = '' OR NOT list_contains(fl.hs,
                    substr(md5(x), 1, {_HASH_PREFIX}))), chr(10)), '')
             AS clean_text
    FROM documents d, fl
    """,
)
def line_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency line dedup over documents — frequent-line set
    recomputed in DuckDB from the same md5 prefixes; cleaned text
    value-hashed byte-for-byte. Routed through `line_dedup`'s scale
    dispatch (literal below MAX_LITERAL_HASHES, hash join above)."""
    docs = load(spark, sf_dir, "documents")
    out = line_dedup(docs)
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
        "clean_text",
    )


@register(
    "qc_dup_line_fraction",
    oracle="""
    WITH l AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)),
                         x -> trim(x) <> '') AS ls
      FROM documents
    )
    SELECT doc_id,
           len(ls) AS n_lines_nonblank,
           len(list_distinct(ls)) AS n_lines_distinct,
           CASE WHEN len(ls) > 0
                THEN CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE)
                     / len(ls)
                ELSE 0.0 END AS dup_line_fraction
    FROM l
    """,
)
def qc_dup_line_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate-line fraction (Gopher repetition
    rule) — exact IEEE division of small ints, value-hash-stable."""
    docs = load(spark, sf_dir, "documents")
    out = with_dup_line_stats(docs)
    return out.select(
        "doc_id",
        F.col("n_lines_nonblank").cast("long").alias("n_lines_nonblank"),
        F.col("n_lines_distinct").cast("long").alias("n_lines_distinct"),
        F.col("dup_line_fraction").cast("double").alias("dup_line_fraction"),
    )


# ---- Gopher bullet / ellipsis line rules ---------------------------------

# Rae et al. (Gopher) document gates: drop when > 90 % of lines start
# with a bullet marker or > 30 % end with an ellipsis. Integer-exact
# comparisons (10·n_bullet > 9·n_lines; 10·n_ellipsis > 3·n_lines).
_BULLET_PREFIXES = ("- ", "* ", "• ")
_ELLIPSIS_SUFFIX = "..."


def gopher_line_flags(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_lines, n_bullet, n_ellipsis, flag_bullet,
    flag_ellipsis) per document — the two Gopher line-shape gates as
    pure array-HOF projections (no explode, no shuffle: the per-line
    predicates aggregate inside the row)."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != F.lit("")
    )
    bullet = F.aggregate(
        lines,
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.when(
            x.startswith(_BULLET_PREFIXES[0])
            | x.startswith(_BULLET_PREFIXES[1])
            | x.startswith(_BULLET_PREFIXES[2]),
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    ell = F.aggregate(
        lines,
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.when(x.endswith(_ELLIPSIS_SUFFIX), F.lit(1).cast("long"))
        .otherwise(F.lit(0).cast("long")),
    )
    return (
        df.select(
            F.col(id_col),
            F.size(lines).cast("long").alias("n_lines"),
            bullet.alias("n_bullet"),
            ell.alias("n_ellipsis"),
        )
        .withColumn(
            "flag_bullet",
            (F.col("n_bullet") * 10 > F.col("n_lines") * 9).cast("int"),
        )
        .withColumn(
            "flag_ellipsis",
            (F.col("n_ellipsis") * 10 > F.col("n_lines") * 3).cast("int"),
        )
    )


# constructed multi-line corpus: the synthetic documents are single-
# line, so modulo rules build known line shapes (paradedup pattern)
_GOPHER_CONSTRUCT_SQL = """
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN '- alpha' || chr(10) || '- beta' || chr(10) || '- gamma'
              WHEN doc_id % 4 = 0 THEN '- menu' || chr(10) || text
              ELSE text END
         || CASE WHEN doc_id % 7 = 0
                 THEN chr(10) || 'more soon...' || chr(10) || 'details...'
                 ELSE '' END AS text
  FROM documents
"""


def constructed_gopher_pages(docs: DataFrame) -> DataFrame:
    """SQL-replayable line-shape injection: doc % 10 == 0 becomes pure
    bullets (trips the 90 % rule), doc % 4 == 0 gains one bullet line
    (stays under it), doc % 7 == 0 gains two ellipsis teasers (trips
    the 30 % rule on short docs)."""
    body = (
        F.when(
            F.col("doc_id") % 10 == 0, F.lit("- alpha\n- beta\n- gamma")
        )
        .when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("- menu\n"), F.col("text")),
        )
        .otherwise(F.col("text"))
    )
    tail = F.when(
        F.col("doc_id") % 7 == 0, F.lit("\nmore soon...\ndetails...")
    ).otherwise(F.lit(""))
    return docs.select("doc_id", F.concat(body, tail).alias("text"))


@register(
    "gopher_line_flags",
    oracle=f"""
    WITH c AS ({_GOPHER_CONSTRUCT_SQL}),
    l AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)),
                         x -> trim(x) <> '') AS ls
      FROM c
    ),
    m AS (
      SELECT doc_id,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(len(list_filter(ls, x ->
               starts_with(x, '- ') OR starts_with(x, '* ')
               OR starts_with(x, '• '))) AS BIGINT) AS n_bullet,
             CAST(len(list_filter(ls, x -> ends_with(x, '...')))
                  AS BIGINT) AS n_ellipsis
      FROM l
    )
    SELECT doc_id, n_lines, n_bullet, n_ellipsis,
           CAST(n_bullet * 10 > n_lines * 9 AS INT) AS flag_bullet,
           CAST(n_ellipsis * 10 > n_lines * 3 AS INT) AS flag_ellipsis
    FROM m
    """,
)
def gopher_line_flags_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher bullet-/ellipsis-line gates over the constructed
    line-shape corpus — construction, per-line predicates, and the
    integer threshold comparisons all value-hashed in DuckDB."""
    docs = constructed_gopher_pages(load(spark, sf_dir, "documents"))
    return gopher_line_flags(docs)
