"""Gopher duplicate-n-gram character coverage — the repetition gate.

Rae et al. (Gopher, 2021, Table A1) drop documents where too large a
fraction of CHARACTERS sits inside duplicated n-grams (thresholds per
n in 5..10, e.g. dup-5-gram chars > 0.15). The repo's qc_repetition /
qc_dup_line_fraction cover the top-bigram and duplicate-line rules;
this module adds the remaining family member: for a given n, the
fraction of a document's characters covered by the union of every
n-gram that occurs at least twice IN THE SAME document — overlapping
duplicate grams counted once (gaps-and-islands union, the same span
semantics as ml/decontam.py's repeated_ngram_spans, but within-doc
and measured in characters).

Relational shape (scale stance):
  - the payload is split ONCE; everything after the posexplode is slim
    (doc_id, pos, token) rows — the text column never shuffles;
  - char offsets come from a running sum over the per-doc window
    (token i starts at sum(len+1) of its predecessors — exact because
    split-on-' ' preserves empty tokens, so offsets reconstruct the
    original string even under repeated spaces);
  - gram identity via n-1 lead()s over the SAME window (no join);
    duplicate grams via one count() window keyed (doc_id, gram);
  - island merge + per-doc sum are two more doc-keyed passes; all
    shuffles carry slim rows with uniform doc keys (same class as
    ml/paradedup.py's winner election).

The DuckDB oracle replays every stage — offsets, gram spans, the
duplicate census, and the island union — with the same window
functions, so the whole chain is value-hashed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

_N = 5  # the registered family member; the operator takes any n >= 2


def dup_ngram_char_stats(
    docs: DataFrame,
    *,
    n: int = _N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_chars, dup_chars, dup_ngram_char_frac) per document."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    # cum = char offset just PAST token i's trailing separator;
    # token i spans [cum - len - 1, cum - 2].
    c = toks.select(
        id_col,
        "pos",
        "tok",
        F.sum(F.length("tok") + 1).over(w).alias("cum"),
    )
    gram = F.concat_ws(
        " ", F.col("tok"), *[F.lead("tok", k).over(w) for k in range(1, n)]
    )
    g = c.select(
        id_col,
        gram.alias("gram"),
        (F.col("cum") - F.length("tok") - 1).alias("s"),
        (F.lead("cum", n - 1).over(w) - 2).alias("e"),
    ).where(F.col("e").isNotNull())
    dup = (
        g.withColumn(
            "c", F.count(F.lit(1)).over(Window.partitionBy(id_col, "gram"))
        )
        .where(F.col("c") >= 2)
        .select(id_col, "s", "e")
    )
    wo = Window.partitionBy(id_col).orderBy("s")
    prev_max = F.max("e").over(wo.rowsBetween(Window.unboundedPreceding, -1))
    marked = dup.withColumn(
        "ni",
        F.when(F.col("s") > F.coalesce(prev_max, F.lit(-1)), 1).otherwise(0),
    ).withColumn("grp", F.sum("ni").over(wo))
    islands = marked.groupBy(id_col, "grp").agg(
        F.min("s").alias("is_"), F.max("e").alias("ie")
    )
    per_doc = islands.groupBy(id_col).agg(
        F.sum(F.col("ie") - F.col("is_") + 1).alias("dup_chars")
    )
    return (
        docs.select(id_col, F.length(text_col).alias("n_chars"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.col("n_chars").cast("long").alias("n_chars"),
            F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
            F.when(
                F.col("n_chars") > 0,
                F.coalesce("dup_chars", F.lit(0)).cast("double")
                / F.col("n_chars"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_ngram_char_frac"),
        )
    )


_LEADS = " || ' ' || ".join(
    f"lead(tok, {k}) OVER w" for k in range(1, _N)
)

_ORACLE = f"""
WITH src AS (
  SELECT doc_id, text FROM documents
), tok AS (
  SELECT doc_id,
         ts[CAST(i AS INT)] AS tok,
         CAST(i AS INT) AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM src) d,
       unnest(range(1, len(ts) + 1)) AS u(i)
), c AS (
  SELECT doc_id, pos, tok,
         sum(length(tok) + 1) OVER
           (PARTITION BY doc_id ORDER BY pos) AS cum
  FROM tok
), g AS (
  SELECT doc_id,
         tok || ' ' || {_LEADS} AS gram,
         cum - length(tok) - 1 AS s,
         lead(cum, {_N - 1}) OVER w - 2 AS e
  FROM c
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), dup AS (
  SELECT doc_id, s, e FROM (
    SELECT doc_id, s, e,
           count(*) OVER (PARTITION BY doc_id, gram) AS cnt
    FROM g WHERE e IS NOT NULL
  ) WHERE cnt >= 2
), marked AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER
             (PARTITION BY doc_id ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         THEN 1 ELSE 0 END AS ni
  FROM dup
), grped AS (
  SELECT doc_id, s, e,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY s) AS grp
  FROM marked
), isl AS (
  SELECT doc_id, grp, min(s) AS i_s, max(e) AS i_e
  FROM grped GROUP BY doc_id, grp
), agg AS (
  SELECT doc_id, sum(i_e - i_s + 1) AS dup_chars FROM isl GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS n_chars,
       CAST(coalesce(agg.dup_chars, 0) AS BIGINT) AS dup_chars,
       CASE WHEN length(d.text) > 0
            THEN CAST(coalesce(agg.dup_chars, 0) AS DOUBLE) / length(d.text)
            ELSE 0.0 END AS dup_ngram_char_frac
FROM src d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""


# The synthetic corpus has (almost) no naturally repeated 5-grams —
# an uninjected run is vacuously all-zero on both engines (the same
# trap VERDICT r3 flagged for 0-row chains). Injection rule, replayed
# in SQL: doc_id%3==0 plants one phrase twice with a gap (two disjoint
# islands... actually one island per copy); doc_id%3==1 appends a run
# of identical tokens whose overlapping duplicate grams must merge
# into ONE island; doc_id%3==2 stays untouched (zero-coverage path).
_PHRASE = " q1 q2 q3 q4 q5 gapword q1 q2 q3 q4 q5"
_RUN = " rep rep rep rep rep rep rep rep"


def _inject(docs: DataFrame) -> DataFrame:
    m = F.col("doc_id") % 3
    text = (
        F.when(m == 0, F.concat(F.col("text"), F.lit(_PHRASE)))
        .when(m == 1, F.concat(F.col("text"), F.lit(_RUN)))
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", text.alias("text"))


_INJECT_SQL = f"""SELECT doc_id,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN text || '{_PHRASE}'
           WHEN 1 THEN text || '{_RUN}'
           ELSE text END AS text
  FROM documents"""


@register(
    "qc_dup_ngram_chars",
    oracle=_ORACLE.replace("SELECT doc_id, text FROM documents", _INJECT_SQL),
)
def qc_dup_ngram_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher dup-{n}-gram character coverage over the repetition-
    injected corpus: char offsets, duplicate-gram census, and the
    island union (the identical-token run must collapse to ONE island)
    are replayed stage-for-stage by the DuckDB twin and value-hashed."""
    return dup_ngram_char_stats(_inject(load(spark, sf_dir, "documents")), n=_N)
