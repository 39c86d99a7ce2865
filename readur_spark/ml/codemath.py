"""Code and math content detection — the source-routing stage of a
web training corpus.

Code-LM corpora (The Stack, StarCoder's preprocessing) and math
corpora (OpenWebMath, ProofPile) both start from the same two web-side
primitives this module provides:

  1. ``extract_code_blocks`` — pull fenced ``<pre><code
     class="language-X">`` blocks out of page HTML with their declared
     language hint (the highlight.js / GitHub-render convention that
     survives into Common Crawl), so code can be ROUTED to a code
     pipeline instead of being mangled by prose filters;
  2. ``code_likeness`` — an integer surface-feature score (keyword
     hits + symbol density per kilochar) that flags code-bearing TEXT
     even when the markup was already stripped — the C4/Gopher prose
     gates systematically delete code (symbol ratio, "no terminal
     punctuation" rules), so a corpus that wants code must detect it
     BEFORE those gates run;
  3. ``math_signals`` — LaTeX inline/display/environment counts plus a
     MathML flag (the OpenWebMath "math-score" prefilter shape): pages
     with real math get routed around lossy text normalization.

Everything is a pure Catalyst projection (substring counting via the
length-difference identity, fenced-block pulls via one
``regexp_extract_all``): no shuffle, no Python, whole-stage codegen
end to end — at 10^12 documents these run at scan speed and the only
cost is the payload read the extraction pass already pays. Scores are
exact integers (milli-units via integer ``div``), so the DuckDB
oracles replay them bit-for-bit.

Reference tie-in: the reference routes by detected MIME into per-type
extraction ladders (src/ocr/enhanced.rs dispatch; src/mime detection);
this is the same routing decision one level down — CONTENT-type
detection inside text/html payloads that all share one MIME type.

Construction rules (SQL-restatable, over ``documents``):
  * code pages: doc_id % 3 == 0 carries k = doc_id % 2 + 1 fenced
    blocks, language hint cycling ['python','sql','c'] by
    (doc_id div 3) % 3, block j's code text
    'def f<doc_id>_<j>(): return <n_chars>';
  * code-likeness corpus: doc_id % 5 == 0 appends doc_id % 4 + 1
    copies of '{ x = f(y); } ' plus 'import os; def main(): return 0'
    to the document text;
  * math corpus: doc_id % 4 == 1 appends doc_id % 3 + 1 copies of
    ' $x_<doc_id>$'; doc_id % 8 == 5 appends one display equation
    ' $$\\sum_i x_i$$' and one ' \\begin{equation} E=mc^2
    \\end{equation}'; doc_id % 16 == 3 appends '<math><mi>x</mi></math>'.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load, synthetic_url

# ---- substring counting (the replace-trick identity) ------------------------


def count_occurrences(col: Column, sub: str) -> Column:
    """Exact non-overlapping occurrence count of a literal substring:
    (len(s) - len(replace(s, sub, ''))) / len(sub). Pure codegen; the
    DuckDB twin is the same identity, so counts match bit-for-bit."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(sub), F.lit(""))))
        / len(sub)
    ).cast("long")


def _count_sql(expr: str, sub_sql: str, sublen: int) -> str:
    """DuckDB twin of count_occurrences (sub_sql is a quoted literal)."""
    return (
        f"(length({expr}) - length(replace({expr}, {sub_sql}, '')))"
        f" // {sublen}"
    )


# ---- code-likeness scoring ---------------------------------------------------

# Surface features: language keywords that survive markup stripping,
# and the statement/block symbols prose essentially never carries.
# Weights are fixed integers so the score is exact in both engines.
CODE_KEYWORDS = ["def ", "return", "import ", "function ", "void "]
CODE_SYMBOLS = ["{", "}", ";", "=", "(", ")"]
KW_WEIGHT = 400
SYM_WEIGHT = 20
CODE_SCORE_THRESHOLD_MILLI = 30


def code_likeness(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append (n_code_kw, n_code_sym, code_score_milli, is_code):
    score = (kw*400 + sym*20) * 1000 div len — milli-units of weighted
    code-token mass per character. One projection, no shuffle."""
    t = F.col(text_col)
    kw = sum(
        (count_occurrences(t, k) for k in CODE_KEYWORDS), F.lit(0)
    ).cast("long")
    sym = sum(
        (count_occurrences(t, s) for s in CODE_SYMBOLS), F.lit(0)
    ).cast("long")
    score = F.expr(
        f"(_n_kw * {KW_WEIGHT} + _n_sym * {SYM_WEIGHT}) * 1000"
        f" div greatest(length({text_col}), 1)"
    )
    return (
        docs.withColumn("_n_kw", kw)
        .withColumn("_n_sym", sym)
        .withColumn("n_code_kw", F.col("_n_kw"))
        .withColumn("n_code_sym", F.col("_n_sym"))
        .withColumn("code_score_milli", score)
        .withColumn(
            "is_code",
            F.col("code_score_milli") >= CODE_SCORE_THRESHOLD_MILLI,
        )
        .drop("_n_kw", "_n_sym")
    )


# ---- math signals ------------------------------------------------------------

MATH_SCORE_THRESHOLD_MILLI = 2


def math_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append (n_display_eq, n_inline_eq, n_latex_envs, has_mathml,
    math_score_milli): display = '$$' pair count, inline = leftover
    '$' pair count, envs = '\\begin{' count, weighted per-char density
    in milli-units. Construction never abuts two display markers, so
    the non-overlapping replace count is exact."""
    t = F.col(text_col)
    dollars = count_occurrences(t, "$")
    ddollars = count_occurrences(t, "$$")
    envs = count_occurrences(t, "\\begin{")
    return (
        docs.withColumn("_nd", (ddollars / 2).cast("long"))
        .withColumn(
            "n_inline_eq",
            ((dollars - F.col("_nd") * 4) / 2).cast("long"),
        )
        .withColumn("n_display_eq", F.col("_nd"))
        .withColumn("n_latex_envs", envs)
        .withColumn("has_mathml", t.contains("<math"))
        .withColumn(
            "math_score_milli",
            F.expr(
                "(n_inline_eq + 3 * n_display_eq + 5 * n_latex_envs)"
                f" * 1000 div greatest(length({text_col}), 1)"
            ),
        )
        .drop("_nd")
    )


# ---- fenced code-block extraction --------------------------------------------

# Code payloads are HTML-escaped by the render convention, so [^<]*
# is the correct (and parity-safe: no non-greedy semantics to match
# across regex engines) body pattern.
_FENCE_RE = '<pre><code class="language-([a-z]+)">([^<]*)</code></pre>'


def extract_code_blocks(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(url, block_idx, lang_hint, code, n_code_chars) — every fenced
    block in document order. One regexp_extract_all projection over
    the payload plus a posexplode: the payload crosses no shuffle and
    the emitted frame is slim."""
    hits = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_FENCE_RE), 0)
        ).alias("block_idx", "tag"),
    )
    return hits.select(
        "url",
        F.col("block_idx").cast("long").alias("block_idx"),
        F.regexp_extract("tag", _FENCE_RE, 1).alias("lang_hint"),
        F.regexp_extract("tag", _FENCE_RE, 2).alias("code"),
        F.length(F.regexp_extract("tag", _FENCE_RE, 2))
        .cast("long")
        .alias("n_code_chars"),
    )


# ---- constructed corpora (module-docstring rules) ----------------------------

_LANGS = ["python", "sql", "c"]


def constructed_code_pages(docs: DataFrame) -> DataFrame:
    """(url, html_str) under the fenced-block construction rule."""
    lang = F.element_at(
        F.array(*[F.lit(x) for x in _LANGS]),
        (F.expr("doc_id div 3") % 3 + 1).cast("int"),
    )

    def block(j: Column) -> Column:
        return F.concat(
            F.lit('<pre><code class="language-'), lang, F.lit('">'),
            F.lit("def f"), F.col("doc_id"), F.lit("_"), j,
            F.lit("(): return "), F.col("n_chars"),
            F.lit("</code></pre>"),
        )

    k = F.col("doc_id") % 2 + 1
    blocks = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(block(F.lit(0)), F.when(k == 2, block(F.lit(1))).otherwise(F.lit(""))),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><body>"), blocks, F.lit("<p>"), F.col("text"),
        F.lit("</p></body></html>"),
    )
    return docs.select(synthetic_url().alias("url"), html.alias("html_str"))


def constructed_codey_text(docs: DataFrame) -> DataFrame:
    """documents with code appended per the code-likeness rule."""
    inj = F.concat(
        F.repeat(F.lit("{ x = f(y); } "), (F.col("doc_id") % 4 + 1).cast("int")),
        F.lit("import os; def main(): return 0"),
    )
    return docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" "), inj)
        ).otherwise(F.col("text")),
    )


def constructed_mathy_text(docs: DataFrame) -> DataFrame:
    """documents with math appended per the math rule."""
    inline = F.repeat(
        F.concat(F.lit(" $x_"), F.col("doc_id"), F.lit("$")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    t = F.col("text")
    t = F.when(F.col("doc_id") % 4 == 1, F.concat(t, inline)).otherwise(t)
    t = F.when(
        F.col("doc_id") % 8 == 5,
        F.concat(
            t,
            F.lit(" $$\\sum_i x_i$$ \\begin{equation} E=mc^2 \\end{equation}"),
        ),
    ).otherwise(t)
    t = F.when(
        F.col("doc_id") % 16 == 3,
        F.concat(t, F.lit("<math><mi>x</mi></math>")),
    ).otherwise(t)
    return docs.withColumn("text", t)


# ---- driver queries ----------------------------------------------------------


@register(
    "code_block_extract",
    oracle="""
    WITH coded AS (
      SELECT doc_id, source, n_chars,
             ['python','sql','c'][(doc_id // 3) % 3 + 1] AS lang,
             doc_id % 2 + 1 AS k
      FROM documents WHERE doc_id % 3 = 0
    ),
    blocks AS (
      SELECT doc_id, source, lang, j AS block_idx,
             'def f' || doc_id || '_' || j || '(): return ' || n_chars
               AS code
      FROM coded, unnest(range(k)) AS t(j)
    )
    SELECT 'https://' || source || '.example/doc' || doc_id || '.txt'
             AS url,
           CAST(block_idx AS BIGINT) AS block_idx,
           lang AS lang_hint,
           code,
           CAST(length(code) AS BIGINT) AS n_code_chars
    FROM blocks
    """,
)
def code_block_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fenced-block pull over the constructed corpus — the oracle
    restates every block (language hint, body, order) straight from
    the construction rule, independent of the regex path under test."""
    pages = constructed_code_pages(load(spark, sf_dir, "documents"))
    return extract_code_blocks(pages)


@register(
    "code_likeness_score",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN text || ' ' || repeat('{{ x = f(y); }} ',
                                             CAST(doc_id % 4 + 1 AS INT))
                       || 'import os; def main(): return 0'
                  ELSE text END AS text
      FROM documents
    ),
    feats AS (
      SELECT doc_id,
             ({" + ".join(_count_sql("text", "'" + k + "'", len(k)) for k in CODE_KEYWORDS)})
               AS n_code_kw,
             ({" + ".join(_count_sql("text", "'" + s + "'", len(s)) for s in CODE_SYMBOLS)})
               AS n_code_sym,
             length(text) AS n_len
      FROM aug
    )
    SELECT doc_id,
           CAST(n_code_kw AS BIGINT) AS n_code_kw,
           CAST(n_code_sym AS BIGINT) AS n_code_sym,
           CAST((n_code_kw * {KW_WEIGHT} + n_code_sym * {SYM_WEIGHT})
                  * 1000 // greatest(n_len, 1) AS BIGINT)
             AS code_score_milli,
           (n_code_kw * {KW_WEIGHT} + n_code_sym * {SYM_WEIGHT}) * 1000
             // greatest(n_len, 1) >= {CODE_SCORE_THRESHOLD_MILLI}
             AS is_code
    FROM feats
    """,
)
def code_likeness_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer code-likeness over the injected corpus: keyword and
    symbol counts, milli-score, and the routing gate, all replayed by
    the oracle from the same rule + the replace-trick identity."""
    docs = constructed_codey_text(load(spark, sf_dir, "documents"))
    return code_likeness(docs).select(
        "doc_id", "n_code_kw", "n_code_sym", "code_score_milli", "is_code"
    )


@register(
    "math_content_detect",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 4 = 1
                       THEN repeat(' $x_' || doc_id || '$',
                                   CAST(doc_id % 3 + 1 AS INT))
                       ELSE '' END
               || CASE WHEN doc_id % 8 = 5
                       THEN ' $$\\sum_i x_i$$ \\begin{equation}'
                            || ' E=mc^2 \\end{equation}'
                       ELSE '' END
               || CASE WHEN doc_id % 16 = 3
                       THEN '<math><mi>x</mi></math>' ELSE '' END
               AS text
      FROM documents
    ),
    feats AS (
      SELECT doc_id, length(text) AS n_len,
             (length(text) - length(replace(text, '$$', ''))) // 2 // 2
               AS n_display_eq,
             (length(text) - length(replace(text, '$', ''))) AS n_dollar,
             (length(text) - length(replace(text, '\\begin{', ''))) // 7
               AS n_latex_envs,
             contains(text, '<math') AS has_mathml
      FROM aug
    )
    SELECT doc_id,
           CAST(n_display_eq AS BIGINT) AS n_display_eq,
           CAST((n_dollar - n_display_eq * 4) // 2 AS BIGINT)
             AS n_inline_eq,
           CAST(n_latex_envs AS BIGINT) AS n_latex_envs,
           has_mathml,
           CAST(((n_dollar - n_display_eq * 4) // 2 + 3 * n_display_eq
                 + 5 * n_latex_envs) * 1000 // greatest(n_len, 1)
                AS BIGINT) AS math_score_milli
    FROM feats
    """,
)
def math_content_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LaTeX/MathML signal extraction over the injected corpus —
    inline/display/environment counts and the milli-density score,
    value-hashed against the oracle's replay of the same counting
    identities."""
    docs = constructed_mathy_text(load(spark, sf_dir, "documents"))
    return math_signals(docs).select(
        "doc_id", "n_display_eq", "n_inline_eq", "n_latex_envs",
        "has_mathml", "math_score_milli",
    )
