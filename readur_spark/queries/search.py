"""Search operators (SURVEY.md §2 B4-B6, B9-B10, B19).

The reference's Postgres FTS (tsvector @@ tsquery, pg_trgm) becomes
token-array predicates and trigram-set Jaccard — all expressible as
Catalyst expressions (JVM-side, codegen'd); only snippet generation
(B10, complex struct output) uses a pandas UDF.

Scale notes: token predicates are scan+filter (pushdown-friendly,
no shuffle). For repeated interactive search at 10^12 rows one would
materialize a posting-list table (SURVEY.md §4); for batch analytics
the full scan is the right plan — Parquet min/max pruning doesn't help
on text, but column pruning keeps the scan to the text column only.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# ---- B4: simple mode = AND of terms over the token set --------------------


def tokens(col: Column) -> Column:
    return F.split(col, " ")


def match_all_terms(text_col: Column, terms: list[str]) -> Column:
    """plainto_tsquery-style: every term present as a token
    (src/db/documents/search.rs:100-106, simple mode)."""
    cond = F.lit(True)
    for t in terms:
        cond = cond & F.array_contains(tokens(text_col), t)
    return cond


@register(
    "search_simple_and",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE list_contains(string_split(text, ' '), 'spark')
      AND list_contains(string_split(text, ' '), 'join')
    """,
)
def search_simple_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.filter(match_all_terms(F.col("text"), ["spark", "join"])).select(
        "doc_id", "lang", "n_chars"
    )


# ---- B4: phrase mode -------------------------------------------------------


@register(
    "search_phrase",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE strpos(text, 'window vector') > 0
    """,
)
def search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """phraseto_tsquery analog: exact substring on normalized text
    (search.rs:108-113)."""
    docs = load(spark, sf_dir, "documents")
    return docs.filter(F.col("text").contains("window vector")).select("doc_id", "lang")


# ---- B5: ranking -----------------------------------------------------------


@register(
    "search_rank_tf",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS rank_tf
    FROM documents
    WHERE len(list_filter(string_split(text, ' '), x -> x = 'spark')) > 0
    """,
)
def search_rank_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts_rank approximation documented in SURVEY.md §2 B5: term
    frequency over the token array (JVM-side higher-order function)."""
    docs = load(spark, sf_dir, "documents")
    tf = F.size(F.filter(tokens(F.col("text")), lambda x: x == F.lit("spark")))
    return docs.select("doc_id", tf.alias("rank_tf")).filter(F.col("rank_tf") > 0)


_TSRANK_AND_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE list_contains(string_split(text, ' '), 'spark')
        AND list_contains(string_split(text, ' '), 'join')
    ), pos AS (
      SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS p
      FROM toks
    ), clamped AS (
      SELECT DISTINCT doc_id, tok, least(p, 16383) AS p
      FROM pos WHERE tok IN ('spark', 'join')
    ), capped AS (
      SELECT doc_id, tok, p FROM (
        SELECT doc_id, tok, p,
               row_number() OVER (PARTITION BY doc_id, tok ORDER BY p) AS rn
        FROM clamped
      ) WHERE rn <= 256
    ), pairs AS (
      SELECT a.doc_id, abs(a.p - b.p) AS dist
      FROM capped a JOIN capped b
        ON a.doc_id = b.doc_id AND a.tok = 'spark' AND b.tok = 'join'
    ), curw AS (
      SELECT doc_id,
             0.1 * sqrt(CASE WHEN dist > 100 THEN 1e-30
                        ELSE 1.0 / (1.005 + 0.05 * exp(dist * dist / 1500.0))
                        END) AS w
      FROM pairs
    )
    SELECT doc_id, round(1.0 - product(1.0 - w), 6) AS rank_ts
    FROM curw GROUP BY doc_id
"""


@register("search_rank_tsrank", oracle=_TSRANK_AND_ORACLE)
def search_rank_tsrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 with REAL ts_rank semantics (tsrank.c calc_rank_and — see
    kernels/tsrank.py): the reference's default Simple-mode ranking,
    ts_rank(tsvector, plainto_tsquery('spark join')), for documents
    matching both terms. The oracle replays the full algorithm in SQL:
    tsvector position rules (clamp 16383, dedup, cap 256), the
    word_distance proximity kernel over all cross-term position pairs,
    and the 1−Π(1−curw) OR-combination. search_rank_tf remains the
    documented cheap approximation."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    matched = docs.filter(
        match_all_terms(F.col("text"), ["spark", "join"])
    ).select("doc_id", "text")

    def rank(batches):
        from readur_spark.kernels.tsrank import ts_rank_simple

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "rank_ts": [
                        round(ts_rank_simple(t, ["spark", "join"]), 6)
                        for t in pdf["text"]
                    ],
                }
            )

    return matched.mapInPandas(rank, schema="doc_id long, rank_ts double")


_TSRANK_OR_ORACLE = """
    WITH m AS (
      SELECT doc_id,
             least(len(list_filter(string_split(text, ' '),
                                   x -> x = 'spark')), 256) AS n
      FROM documents
      WHERE list_contains(string_split(text, ' '), 'spark')
    ), h AS (
      SELECT doc_id, sum(1.0 / (j * j)) AS h2
      FROM (SELECT doc_id, unnest(range(1, n + 1)) AS j FROM m)
      GROUP BY doc_id
    )
    SELECT doc_id, round(0.1 * h2 / 1.64493406685, 6) AS rank_ts
    FROM h
"""


@register("search_rank_tsrank_single", oracle=_TSRANK_OR_ORACLE)
def search_rank_tsrank_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-term ts_rank (tsrank.c calc_rank_or): occurrences decay
    quadratically — the closed form 0.1·Σ_{j≤n} j⁻² / (π²/6), n capped
    at the tsvector position limit. Distinguishes documents the raw-tf
    rank treats monotonically but with ts_rank's saturation curve."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    matched = docs.filter(
        match_all_terms(F.col("text"), ["spark"])
    ).select("doc_id", "text")

    def rank(batches):
        from readur_spark.kernels.tsrank import ts_rank_simple

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "rank_ts": [
                        round(ts_rank_simple(t, ["spark"]), 6)
                        for t in pdf["text"]
                    ],
                }
            )

    return matched.mapInPandas(rank, schema="doc_id long, rank_ts double")


# ---- B4/B5 'english' text-search config (VERDICT r3 item 4) ----------------
#
# The reference's actual config is 'english'
# (to_tsvector('english', content) / plainto_tsquery('english', q),
# src/db/documents/search.rs:100-129): Snowball stemming + stopword
# removal, so "queries" matches documents containing "query". The
# kernels live in kernels/stem.py (from-spec Porter2, pinned against
# the algorithm's published sample vocabulary in tests/test_stem.py).
#
# Oracle strategy: DuckDB has no offline stemmer, so the oracle replays
# lexeme assignment through a LITERAL (token → lexeme) map over the
# fixture's closed 31-token vocabulary. The map is generated by the
# same kernel — deliberately: the driver hash then pins the
# Spark-vs-SQL PLUMBING (tsvector storage rules, position arithmetic,
# rank formula), while the stemmer itself is pinned non-circularly by
# the published-vocabulary goldens. Unmapped tokens fall back to
# themselves (the identity stem), which is exact for this corpus.

_FIXTURE_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]


def _stem_values_sql() -> str:
    from readur_spark.kernels.stem import ENGLISH_STOPWORDS, porter2_stem

    pairs = [
        f"('{w}', '{porter2_stem(w)}')"
        for w in _FIXTURE_VOCAB
        if w not in ENGLISH_STOPWORDS
    ]
    return ", ".join(pairs)


def english_lexemes_udf():
    """array<string> of DISTINCT english-config lexemes per text —
    Arrow-batched with a per-batch memo cache (Zipf vocabulary ⇒ the
    stemmer runs once per distinct token, not once per occurrence).
    The production scan-path primitive for english FTS predicates; at
    posting-index build time the same lexemes feed operators/posting."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def english_lexemes(texts: pd.Series) -> pd.Series:
        from readur_spark.kernels.stem import ENGLISH_STOPWORDS, porter2_stem
        from readur_spark.kernels.tsrank import _TOKEN_RE

        cache: dict[str, str] = {}

        def lex(t):
            if t is None:
                return None
            out = set()
            for tok in _TOKEN_RE.findall(t.lower()):
                if tok in ENGLISH_STOPWORDS:
                    continue
                s = cache.get(tok)
                if s is None:
                    s = cache[tok] = porter2_stem(tok)
                out.add(s)
            return sorted(out)

        return texts.map(lex)

    return english_lexemes


@register(
    "search_simple_and_english",
    oracle=f"""
    WITH stems(tok, lex) AS (VALUES {_stem_values_sql()}),
    lx AS (
      SELECT p.doc_id, coalesce(s.lex, p.tok) AS lex
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents) p
      LEFT JOIN stems s ON p.tok = s.tok
    )
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id IN (SELECT doc_id FROM lx WHERE lex = 'queri')
      AND doc_id IN (SELECT doc_id FROM lx WHERE lex = 'tabl')
    """,
)
def search_simple_and_english(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 at the reference's real config: plainto_tsquery('english',
    'The queries table!') = 'queri' & 'tabl' — the INFLECTED query
    terms match documents containing the base forms "query"/"table",
    which 'simple' config misses entirely. Stopword 'The' drops out of
    the tsquery (search.rs:100-106)."""
    from readur_spark.kernels.stem import plainto_tsquery_english

    lexemes = plainto_tsquery_english("The queries table!")
    docs = load(spark, sf_dir, "documents")
    lex = english_lexemes_udf()
    matched = docs.withColumn("_lex", lex(F.col("text")))
    for lx in lexemes:
        matched = matched.filter(F.array_contains("_lex", lx))
    return matched.select("doc_id", "lang", "n_chars")


_TSRANK_ENGLISH_ORACLE = f"""
    WITH stems(tok, lex) AS (VALUES {_stem_values_sql()}),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pos AS (
      SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS p
      FROM toks
    ), lexpos AS (
      SELECT p.doc_id, coalesce(s.lex, p.tok) AS lex, p.p
      FROM pos p LEFT JOIN stems s ON p.tok = s.tok
    ), clamped AS (
      SELECT DISTINCT doc_id, lex, least(p, 16383) AS p
      FROM lexpos WHERE lex IN ('queri', 'join')
    ), capped AS (
      SELECT doc_id, lex, p FROM (
        SELECT doc_id, lex, p,
               row_number() OVER (PARTITION BY doc_id, lex ORDER BY p) AS rn
        FROM clamped
      ) WHERE rn <= 256
    ), pairs AS (
      SELECT a.doc_id, abs(a.p - b.p) AS dist
      FROM capped a JOIN capped b
        ON a.doc_id = b.doc_id AND a.lex = 'queri' AND b.lex = 'join'
    ), curw AS (
      SELECT doc_id,
             0.1 * sqrt(CASE WHEN dist > 100 THEN 1e-30
                        ELSE 1.0 / (1.005 + 0.05 * exp(dist * dist / 1500.0))
                        END) AS w
      FROM pairs
    )
    SELECT doc_id, round(1.0 - product(1.0 - w), 6) AS rank_ts
    FROM curw GROUP BY doc_id
"""


@register("search_rank_tsrank_english", oracle=_TSRANK_ENGLISH_ORACLE)
def search_rank_tsrank_english(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 at the reference's real config: ts_rank(
    to_tsvector('english', text), plainto_tsquery('english',
    'the queries join')) — search.rs:69-93 verbatim call shape.
    Document positions count stopwords (to_tsvector keeps numbering
    through them); query stopwords vanish; 'queries' ranks documents
    containing 'query'. Oracle replays tsvector storage rules and the
    calc_rank_and pair walk over the literal lexeme map."""
    import pandas as pd

    query = "the queries join"
    from readur_spark.kernels.stem import plainto_tsquery_english

    lexemes = plainto_tsquery_english(query)
    docs = load(spark, sf_dir, "documents")
    lex = english_lexemes_udf()
    matched = docs.withColumn("_lex", lex(F.col("text")))
    for lx in lexemes:
        matched = matched.filter(F.array_contains("_lex", lx))
    matched = matched.select("doc_id", "text")

    def rank(batches):
        from readur_spark.kernels.tsrank import ts_rank_english

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "rank_ts": [
                        round(ts_rank_english(t, query), 6)
                        for t in pdf["text"]
                    ],
                }
            )

    return matched.mapInPandas(rank, schema="doc_id long, rank_ts double")


# ---- B6: fuzzy trigram similarity ------------------------------------------


def trigram_set(col: Column, padded: bool = True) -> Column:
    """Distinct character trigrams of a string as a Catalyst expression
    (no UDF).

    padded=True (default) is pg_trgm parity (contrib/pg_trgm
    trgm_op.c): the string lowercases and splits into alphanumeric
    words; each word pads with TWO leading and ONE trailing space, so a
    word of length n yields n+1 trigrams ('  w', ' wo', ..., 'rd ') and
    similarity VALUES — and 0.3-threshold crossings — match what
    Postgres computes. padded=False keeps the round-2 raw sliding
    window (substring windows over 1..len-2) for callers that want
    plain character shingles."""
    if not padded:
        idx = F.sequence(F.lit(1), F.greatest(F.length(col) - 2, F.lit(0)))
        return F.array_distinct(
            F.transform(idx, lambda i: col.substr(i, F.lit(3)))
        )
    words = F.filter(
        F.split(F.lower(col), r"[^a-z0-9]+"), lambda w: w != F.lit("")
    )

    def word_trigrams(w):
        padded_w = F.concat(F.lit("  "), w, F.lit(" "))
        idx = F.sequence(F.lit(1), F.length(w) + 1)
        return F.transform(idx, lambda i: padded_w.substr(i, F.lit(3)))

    return F.array_distinct(F.flatten(F.transform(words, word_trigrams)))


def fuzzy_match(
    df: DataFrame,
    col: str,
    query: str,
    threshold: float | None = None,
    settings: dict | None = None,
) -> DataFrame:
    """Fuzzy trigram filter over a column. The reference hardcodes the
    SQL predicate at 0.3 (src/db/documents/search.rs:126) while the
    per-user fuzzy_search_threshold knob (settings.rs:328, default 0.8)
    exists as API surface it never reads — here the knob is honored as
    the default and an explicit threshold reproduces the hardcoded
    behavior."""
    from readur_spark.kernels.settings import DEFAULT_SETTINGS

    if threshold is None:
        threshold = float(
            (settings or {}).get(
                "fuzzy_search_threshold",
                DEFAULT_SETTINGS["fuzzy_search_threshold"],
            )
        )
    sim = trigram_similarity(trigram_set(F.col(col)), trigram_set(F.lit(query)))
    return df.withColumn("sim", F.round(sim, 3)).filter(sim > threshold)


def trigram_similarity(a: Column, b: Column) -> Column:
    """pg_trgm formula |∩| / |∪| over trigram sets
    (src/db/documents/search.rs:85-89; threshold 0.3 at :123-127).
    With the padded default of trigram_set this now reproduces
    pg_trgm's similarity() VALUES (round-2's unpadded deviation is
    retired; the raw window remains via trigram_set(col, padded=False))."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


@register(
    "search_fuzzy_trigram",
    oracle="""
    WITH trg AS (
      SELECT doc_id,
             list_distinct([('  ' || lower(source) || ' ')[i:i+2]
                            FOR i IN range(1, len(source) + 2)]) AS tg
      FROM documents
    ), q AS (
      SELECT list_distinct([('  src1 ')[i:i+2] FOR i IN range(1, 6)]) AS qt
    )
    SELECT doc_id,
           round(CAST(len(list_intersect(tg, qt)) AS DOUBLE) /
                 (len(tg) + len(qt) - len(list_intersect(tg, qt))), 3) AS sim
    FROM trg, q
    WHERE CAST(len(list_intersect(tg, qt)) AS DOUBLE) /
          (len(tg) + len(qt) - len(list_intersect(tg, qt))) > 0.3
    """,
)
def search_fuzzy_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy match of the query 'src1' against the short `source`
    strings — the reference applies pg_trgm similarity to filename-
    length fields (src/db/documents/search.rs:85-89, threshold 0.3 at
    :123-127). PADDED trigrams as of round 3 (pg_trgm's 2-leading/
    1-trailing space rule), so similarity VALUES match what Postgres
    computes: exact source 1.0, same-prefix siblings graded by shared
    padded trigrams. The oracle re-derives the padded sets (sources are
    single alphanumeric words, so the word split reduces to the bare
    string there; multi-word padding is pinned against pg_trgm's
    documented similarity('word','two words')=0.363636 in pytest)."""
    docs = load(spark, sf_dir, "documents")
    doc_tg = trigram_set(F.col("source"))
    q_tg = trigram_set(F.lit("src1"))
    inter = F.size(F.array_intersect(doc_tg, q_tg))
    union = F.size(doc_tg) + F.size(q_tg) - inter
    sim = inter.cast("double") / union
    return (
        docs.select("doc_id", F.round(sim, 3).alias("sim"), sim.alias("_raw"))
        .filter(F.col("_raw") > 0.3)
        .drop("_raw")
    )


# ---- B19: filename / url search --------------------------------------------


@register(
    "search_filename",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE contains('https://' || source || '.example/doc' || doc_id || '.txt', 'src1')
    """,
)
def search_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ILIKE-on-filename analog (src/db/documents/crud.rs:136-160) over
    the derived url."""
    from readur_spark.queries.tables import synthetic_url

    docs = load(spark, sf_dir, "documents")
    return docs.filter(synthetic_url().contains("src1")).select("doc_id", "source")


# ---- index-accelerated search (posting lists, SURVEY.md §4) ----------------


@register(
    "posting_df_top",
    oracle="""
    SELECT token, count(DISTINCT doc_id) AS df
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    HAVING count(DISTINCT doc_id) > 300
    """,
)
def posting_df_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list build + document-frequency statistics (the GIN
    index's term dictionary, materialized)."""
    from readur_spark.operators.posting import build_postings, document_frequencies

    docs = load(spark, sf_dir, "documents")
    dfreq = document_frequencies(build_postings(docs, "doc_id", "text"))
    return dfreq.filter(F.col("df") > 300)


@register(
    "search_via_postings",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x = 'spark'))
         + len(list_filter(string_split(text, ' '), x -> x = 'join')) AS rank_tf
    FROM documents
    WHERE list_contains(string_split(text, ' '), 'spark')
      AND list_contains(string_split(text, ' '), 'join')
    """,
)
def search_via_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same AND query as search_simple_and answered from the
    posting index instead of a text scan — the oracle proves the index
    path returns identical results with tf ranking."""
    from readur_spark.operators.posting import build_postings, search_postings_and

    docs = load(spark, sf_dir, "documents")
    postings = build_postings(docs, "doc_id", "text")
    return search_postings_and(postings, ["spark", "join"])


def _stopword_tokens_sql() -> str:
    from readur_spark.kernels.stem import ENGLISH_STOPWORDS

    stops = sorted(w for w in _FIXTURE_VOCAB if w in ENGLISH_STOPWORDS)
    return ", ".join("'%s'" % w for w in stops)


@register(
    "search_via_postings_english",
    oracle=f"""
    WITH stems(tok, lex) AS (VALUES {_stem_values_sql()}),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), lexed AS (
      SELECT t.doc_id, coalesce(s.lex, t.tok) AS lexeme
      FROM toks t LEFT JOIN stems s ON t.tok = s.tok
      WHERE t.tok <> '' AND t.tok NOT IN ({_stopword_tokens_sql()})
    ), tf AS (
      SELECT doc_id, lexeme, CAST(count(*) AS BIGINT) AS tf
      FROM lexed WHERE lexeme IN ('queri', 'join')
      GROUP BY doc_id, lexeme
    )
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS rank_tf
    FROM tf GROUP BY doc_id HAVING count(DISTINCT lexeme) = 2
    """,
)
def search_via_postings_english(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ACTUAL index shape: GIN over
    to_tsvector('english', content) (initial_schema.sql:41-43 +
    search.rs:100-129), materialized as an english-lexeme posting
    table. plainto_tsquery('english', 'the queries join') = 'queri' &
    'join' — the index answers the inflected query from base-form
    postings; the tsquery's stopword vanishes. Build shape:
    dictionary-stemming over the distinct vocabulary only
    (operators/posting.py: build_postings_english)."""
    from readur_spark.kernels.stem import plainto_tsquery_english
    from readur_spark.operators.posting import (
        build_postings_english,
        search_postings_and,
    )

    docs = load(spark, sf_dir, "documents")
    postings = build_postings_english(docs, "doc_id", "text")
    lexemes = plainto_tsquery_english("the queries join")
    return search_postings_and(postings, lexemes)


@register(
    "search_rank_bm25",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.token
      FROM documents,
           UNNEST(list_filter(string_split(text, ' '), x -> x <> ''))
             AS t(token)
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT (SELECT count(*) FROM documents) AS n,
             greatest((1000 * (SELECT count(*) FROM toks))
                      // greatest((SELECT count(*) FROM documents), 1), 1)
               AS avgdl_mfp
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks
      WHERE token IN ('spark', 'join') GROUP BY doc_id, token
    ), idf_arg AS (
      SELECT token,
             ((2 * (SELECT n FROM stats) - 2 * count(*) + 1) * 256)
               // (2 * count(*) + 1) + 256 AS arg
      FROM tf GROUP BY token
    ), _l0 AS (
      SELECT token, length(bin(arg)) - 1 AS e,
             (arg * 256) //
               (CAST(1 AS BIGINT) << (length(bin(arg)) - 1)) AS m,
             0 AS fb
      FROM idf_arg
    ),
    _l1 AS (
      SELECT token, e,
             CASE WHEN (m * m) // 256 >= 512
                  THEN ((m * m) // 256) // 2
                  ELSE (m * m) // 256 END AS m,
             fb * 2 + CASE WHEN (m * m) // 256 >= 512
                           THEN 1 ELSE 0 END AS fb
      FROM _l0
    ),
    _l2 AS (
      SELECT token, e,
             CASE WHEN (m * m) // 256 >= 512
                  THEN ((m * m) // 256) // 2
                  ELSE (m * m) // 256 END AS m,
             fb * 2 + CASE WHEN (m * m) // 256 >= 512
                           THEN 1 ELSE 0 END AS fb
      FROM _l1
    ),
    _l3 AS (
      SELECT token, e,
             CASE WHEN (m * m) // 256 >= 512
                  THEN ((m * m) // 256) // 2
                  ELSE (m * m) // 256 END AS m,
             fb * 2 + CASE WHEN (m * m) // 256 >= 512
                           THEN 1 ELSE 0 END AS fb
      FROM _l2
    ),
    _l4 AS (
      SELECT token, e,
             CASE WHEN (m * m) // 256 >= 512
                  THEN ((m * m) // 256) // 2
                  ELSE (m * m) // 256 END AS m,
             fb * 2 + CASE WHEN (m * m) // 256 >= 512
                           THEN 1 ELSE 0 END AS fb
      FROM _l3
    ), _lout AS (SELECT token, e * 16 + fb AS sbits FROM _l4),
    idf AS (
      SELECT token, sbits - 128 AS idf_sbits FROM _lout
    ), scored AS (
      SELECT tf.doc_id, tf.token, idf.idf_sbits,
             (11 * tf.tf * 1000000000000)
             // (5 * (1000000 * tf.tf + 300000
                      + (9 * ((1000000000 * dl.dl)
                              // (SELECT avgdl_mfp FROM stats))) // 10))
               AS tfpart_fp
      FROM tf JOIN dl USING (doc_id) JOIN idf USING (token)
    )
    SELECT doc_id,
           CAST(sum(tfpart_fp * idf_sbits) AS BIGINT) AS rank_bm25_fp
    FROM scored GROUP BY doc_id
    HAVING count(DISTINCT token) = 2
    """,
)
def search_rank_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AND query ranked by fixed-point Okapi BM25 from the posting
    index (tf saturation + doc-length norms; sixteenth-bit idf via the
    exact mantissa-squaring log) — the production ranking function
    next to B5's ts_rank and the linear tf-idf variant. N comes from
    the parquet footer statistic; dl/L are index statistics (Lucene's
    "norms"), recomputed here from the postings frame. Every division
    is a floor div and the log is integer mantissa squaring, so DuckDB
    replays ranks bit-for-bit."""
    from readur_spark.operators.posting import (
        build_postings,
        search_postings_bm25,
    )
    from readur_spark.queries.tables import table_row_count

    docs = load(spark, sf_dir, "documents")
    postings = build_postings(docs, "doc_id", "text")
    return search_postings_bm25(
        postings, ["spark", "join"], table_row_count(sf_dir, "documents")
    )


@register(
    "search_tfidf_postings",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), tf AS (
      SELECT doc_id, 'spark' AS token,
             len(list_filter(toks, x -> x = 'spark')) AS tf
      FROM toks WHERE list_contains(toks, 'spark')
      UNION ALL
      SELECT doc_id, 'join' AS token,
             len(list_filter(toks, x -> x = 'join')) AS tf
      FROM toks WHERE list_contains(toks, 'join')
    ), dfreq AS (
      SELECT token, count(*) AS df FROM tf GROUP BY token
    )
    SELECT tf.doc_id,
           CAST(sum(tf.tf * ((n.n_docs * 1000000) // dfreq.df)) AS BIGINT)
             AS rank_fp
    FROM tf JOIN dfreq USING (token) CROSS JOIN n
    GROUP BY tf.doc_id
    HAVING count(DISTINCT tf.token) = 2
    """,
)
def search_tfidf_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AND query ranked by exact fixed-point tf-idf from the
    posting index (rarer terms dominate; value-hash-checked because the
    weighting is integer math, not libm floats). N comes from the
    parquet footer statistic (tables.table_row_count) — no extra
    full-table job per query."""
    from readur_spark.operators.posting import (
        build_postings,
        search_postings_tfidf,
    )
    from readur_spark.queries.tables import table_row_count

    docs = load(spark, sf_dir, "documents")
    postings = build_postings(docs, "doc_id", "text")
    return search_postings_tfidf(
        postings, ["spark", "join"], table_row_count(sf_dir, "documents")
    )


# ---- B12: search suggestions (driver-side pure function) -------------------


def search_suggestions(query: str) -> list[str]:
    """src/routes/search.rs:144-165 — quoted-phrase, wildcard, and
    refinement rewrites; at most 3. Pure driver-side (no table scan),
    matching the reference's in-handler computation."""
    q = query.strip()
    if not q:
        return []
    out: list[str] = []
    words = q.split()
    if len(words) > 1 and not (q.startswith('"') and q.endswith('"')):
        out.append('"%s"' % q)  # exact phrase
    if len(words) == 1 and len(q) > 2 and not q.endswith("*"):
        out.append(q + "*")  # prefix wildcard
    if len(words) == 1:
        out.append(q + " document")  # refinement
    else:
        out.append(words[0])  # broaden to first term
    return out[:3]


# ---- B10: snippets (pandas UDF, full multi-snippet oracle r4) --------------


@register(
    "search_snippets",
    oracle="""
    WITH p AS (
      SELECT doc_id, text, string_split(text, 'spark') AS parts
      FROM documents WHERE strpos(text, 'spark') > 0
    ), occ AS (
      SELECT doc_id, text, parts,
             unnest(range(1, least(len(parts), 4))) AS k
      FROM p
    ), m AS (
      SELECT doc_id, text,
             CAST(list_sum(list_transform(parts[1:k], x -> len(x)))
                  + (k - 1) * 5 AS BIGINT) AS mp
      FROM occ
    ), s AS (
      SELECT doc_id, text, mp,
        CASE WHEN mp >= 30 THEN
          (CASE WHEN strpos(reverse(substr(text, 1, mp - 29)), ' ') > 0
                THEN (mp - 29) - strpos(reverse(substr(text, 1, mp - 29)), ' ')
                ELSE 0 END)
        ELSE 0 END AS ss
      FROM m
    ), e AS (
      SELECT doc_id, text, mp, ss,
        CASE WHEN ss + 60 < len(text) THEN
          (CASE WHEN strpos(substr(text, ss + 61), ' ') > 0
                THEN ss + 60 + strpos(substr(text, ss + 61), ' ') - 1
                ELSE len(text) END)
        ELSE len(text) END AS se
      FROM s
    )
    SELECT doc_id,
           substr(text, ss + 1, se - ss) AS snippet,
           CAST(ss AS INT) AS start_offset,
           CAST(se AS INT) AS end_offset,
           CAST(mp - ss AS INT) AS hl_start,
           CAST(mp - ss + 5 AS INT) AS hl_end
    FROM e
    """,
)
def search_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snippet generation with highlight offsets — kernel semantics
    (src/db/documents/search.rs:188-258) over matching documents; the
    FULL surface (every occurrence, ≤3/term via the reference's
    global-count check inside the per-term loop, ≤5 total) is oracle-
    checked since r4. The DuckDB replay recovers the iterative `find`
    walk from string_split prefix sums — exact because 'spark' has no
    self-overlap and match advance is match_pos + len(term) — then
    applies the same word-boundary CASE walk as search_snippets_first.
    Exact offsets are additionally pinned by tests/test_kernels_misc.py."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    matched = docs.filter(match_all_terms(F.col("text"), ["spark"]))

    def gen(batches):
        from readur_spark.kernels.snippets import generate_snippets

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                snips = generate_snippets([("content", text)], "spark", 60)
                for s in snips:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "snippet": s.text,
                            "start_offset": s.start_offset,
                            "end_offset": s.end_offset,
                            "hl_start": s.highlight_ranges[0][0],
                            "hl_end": s.highlight_ranges[0][1],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "snippet", "start_offset", "end_offset",
                    "hl_start", "hl_end",
                ],
            )

    return matched.select("doc_id", "text").mapInPandas(
        gen,
        schema="doc_id long, snippet string, start_offset int, end_offset int,"
        " hl_start int, hl_end int",
    )


@register(
    "search_snippets_first",
    oracle="""
    WITH m AS (
      SELECT doc_id, text, strpos(text, 'spark') - 1 AS mp
      FROM documents WHERE strpos(text, 'spark') > 0
    ), s AS (
      SELECT doc_id, text, mp,
        CASE WHEN mp >= 30 THEN
          (CASE WHEN strpos(reverse(substr(text, 1, mp - 29)), ' ') > 0
                THEN (mp - 29) - strpos(reverse(substr(text, 1, mp - 29)), ' ')
                ELSE 0 END)
        ELSE 0 END AS ss
      FROM m
    ), e AS (
      SELECT doc_id, text, mp, ss,
        CASE WHEN ss + 60 < len(text) THEN
          (CASE WHEN strpos(substr(text, ss + 61), ' ') > 0
                THEN ss + 60 + strpos(substr(text, ss + 61), ' ') - 1
                ELSE len(text) END)
        ELSE len(text) END AS se
      FROM s
    )
    SELECT doc_id,
           substr(text, ss + 1, se - ss) AS snippet,
           CAST(ss AS INT) AS start_offset,
           CAST(se AS INT) AS end_offset,
           CAST(mp - ss AS INT) AS hl_start,
           CAST(mp - ss + 5 AS INT) AS hl_end
    FROM e
    """,
)
def search_snippets_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10's span contract, value-hash-checked: the FIRST snippet per
    matching document, through the real kernel (generate_snippets), vs
    a DuckDB re-derivation of the same word-boundary walk. The corpus
    text is strictly [a-z0-9 ] so the kernel's boundary set (whitespace
    + ASCII punctuation, helpers.rs:80-82) reduces to spaces, which
    strpos/reverse can express exactly — making the snippet offsets an
    oracle-checked surface instead of rows-only."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    matched = docs.filter(F.col("text").contains("spark"))

    def gen(batches):
        from readur_spark.kernels.snippets import generate_snippets

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                s = generate_snippets([("content", text)], "spark", 60)[0]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "snippet": s.text,
                        "start_offset": s.start_offset,
                        "end_offset": s.end_offset,
                        "hl_start": s.highlight_ranges[0][0],
                        "hl_end": s.highlight_ranges[0][1],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "snippet", "start_offset", "end_offset",
                    "hl_start", "hl_end",
                ],
            )

    return matched.select("doc_id", "text").mapInPandas(
        gen,
        schema="doc_id long, snippet string, start_offset int, end_offset int,"
        " hl_start int, hl_end int",
    )


# ---- cascade retrieval → rerank (r5s11) ------------------------------------

CASCADE_C = 100  # stage-1 candidate budget
CASCADE_K = 10   # stage-2 published results


@register(
    "search_cascade_rerank",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x = 'spark'))
               AS rank_tf,
             text
      FROM documents
      WHERE len(list_filter(string_split(text, ' '), x -> x = 'spark'))
            > 0
    ), cand AS (
      SELECT doc_id, rank_tf, text,
             row_number() OVER (ORDER BY rank_tf DESC, doc_id) AS tf_pos
      FROM tf
    ), pool AS (
      SELECT * FROM cand WHERE tf_pos <= {CASCADE_C}
    ), m AS (
      SELECT doc_id, rank_tf, tf_pos,
             least(len(list_filter(string_split(text, ' '),
                                   x -> x = 'spark')), 256) AS n
      FROM pool
    ), h AS (
      SELECT doc_id, sum(1.0 / (j * j)) AS h2
      FROM (SELECT doc_id, unnest(range(1, n + 1)) AS j FROM m)
      GROUP BY doc_id
    ), scored AS (
      SELECT m.doc_id, m.rank_tf, CAST(m.tf_pos AS INT) AS tf_pos,
             round(0.1 * h.h2 / 1.64493406685, 6) AS rank_ts
      FROM m JOIN h USING (doc_id)
    )
    SELECT doc_id, rank_tf, tf_pos, rank_ts,
           CAST(row_number() OVER (ORDER BY rank_ts DESC, doc_id)
                AS INT) AS final_pos
    FROM scored
    QUALIFY final_pos <= {CASCADE_K}
    """,
)
def search_cascade_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage cascade ranking — the scale pattern every production
    search stack runs (cheap retrieval bounds the expensive scorer's
    work): stage 1 retrieves the top-{CASCADE_C} by raw term
    frequency (codegen HOF, no positions materialized); stage 2
    reranks ONLY that candidate pool with the real ts_rank harmonic
    formula and publishes the top-{CASCADE_K}. The oracle replays the
    tf ranking, the candidate cut, the harmonic rerank, and both
    position assignments.

    Scale: stage 1 is a filter + TakeOrdered (no positions, no
    shuffle of text); stage 2's per-doc cost is paid for C docs, not
    the corpus — C is a constant, so the expensive tier's work is
    O(C) regardless of corpus size."""
    docs = load(spark, sf_dir, "documents")
    tf = F.size(
        F.filter(tokens(F.col("text")), lambda x: x == F.lit("spark"))
    )
    stage1 = (
        docs.select("doc_id", tf.alias("rank_tf"), "text")
        .filter(F.col("rank_tf") > 0)
    )
    # stage-1 cut via TakeOrdered (distributed top-C; the ONLY global
    # window runs on the ≤C-row pool, never on the corpus)
    pool = stage1.orderBy(F.desc("rank_tf"), F.asc("doc_id")).limit(
        CASCADE_C
    )
    w1 = Window.orderBy(F.desc("rank_tf"), F.asc("doc_id"))
    pool = pool.withColumn("tf_pos", F.row_number().over(w1))
    # harmonic ts_rank (single-term OR formula), pure Catalyst
    h2 = F.expr(
        "aggregate(sequence(1, cast(least(rank_tf, 256) as int)), "
        "cast(0 as double), (a, j) -> a + 1.0 / (j * j))"
    )
    scored = pool.select(
        "doc_id",
        "rank_tf",
        F.col("tf_pos").cast("int").alias("tf_pos"),
        F.round(F.lit(0.1) * h2 / F.lit(1.64493406685), 6).alias(
            "rank_ts"
        ),
    )
    w2 = Window.orderBy(F.desc("rank_ts"), F.asc("doc_id"))
    return (
        scored.withColumn("final_pos", F.row_number().over(w2).cast("int"))
        .filter(F.col("final_pos") <= CASCADE_K)
    )
