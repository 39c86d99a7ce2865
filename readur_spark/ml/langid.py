"""Character-trigram language identification, integer-exact.

The production web-pipeline langid stage (CCNet / cld3 / fasttext's
langid model) is a linear classifier over character n-gram features.
This re-expresses it as the repo's integer-exact multinomial NB
(ml/quality_classifier.py's device, multi-class): per-language
trigram surprisal bits via `floor(log2(T_lang div (c+1)))`, document
score = summed bits, prediction = argmin surprisal with a
deterministic language tie-break. No libm anywhere, so the DuckDB
oracle replays training, scoring, and the argmin bit-for-bit.

The synthetic corpus draws every language from ONE shared vocabulary
(no lexical signal — the qc_nb_classifier fixture note), so the
registered query prepends per-language marker phrases by a CASE rule
both engines replay: the classifier then separates the constructed
corpus perfectly, and the value hash pins the whole round trip.

Scale design (10^12 docs):
  - the probe is CAPPED at the first 256 chars per document — langid
    needs a prefix, not the payload; the explode is 254 rows/doc of
    (doc_id, 3-char string) regardless of document size;
  - training counts are ONE map-side-combinable (tri, lang) aggregate;
    per-language totals are a |langs|-row agg over that same grouped
    frame (the quality_lm single-pass convention);
  - scoring joins the trigram stream against the model keyed by
    (tri, lang) — the model is trigram-vocab-sized (Zipf-compact,
    ≤ |alphabet|^3), so AQE elects broadcast; the argmin is a window
    over |langs| rows per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.ml.quality_lm import int_log2
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

PREFIX_CAP = 256

# per-language marker phrases (common function words), prepended so
# they land inside the prefix cap
LANG_MARKERS = {
    "en": "the and of to in ",
    "de": "der die und das ist ",
    "es": "el la los de y ",
    "fr": "le la les et des ",
    "zh": "de shi zai le bu ",
}


def char_trigrams(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    cap: int = PREFIX_CAP,
) -> DataFrame:
    """(doc_id, tri) occurrence stream over the lowercased first `cap`
    characters — every occurrence, not types (NB weighs evidence by
    count)."""
    s = F.lower(F.substring(F.col(text_col), 1, cap))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.when(
                F.length(s) >= 3,
                F.sequence(F.lit(1), F.length(s) - 2),
            ).otherwise(F.expr("array()").cast("array<int>"))
        ).alias("i"),
        s.alias("_s"),
    ).select("doc_id", F.expr("substring(_s, i, 3)").alias("tri"))


def langid_nb(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Train on the corpus's own (text, lang) pairs and classify every
    document: (doc_id, lang, pred_lang, correct). In-corpus accuracy —
    the deployment shape trains on a labelled seed set and broadcasts
    the model; the arithmetic is identical."""
    tris = char_trigrams(docs, id_col=id_col, text_col=text_col).persist()
    labeled = tris.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(lang_col)),
        "doc_id",
    )
    counts = labeled.groupBy("tri", lang_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = counts.groupBy(lang_col).agg(
        F.sum("cnt").cast("long").alias("t")
    )
    model = counts.join(tot, lang_col).select(
        "tri",
        lang_col,
        int_log2(F.expr("t div (cnt + 1L)")).alias("bits"),
    )
    langs = tot.select(
        lang_col, (int_log2(F.col("t") + 1)).alias("prior_bits")
    )
    scored = (
        tris.crossJoin(F.broadcast(langs))
        .join(model, ["tri", lang_col], "left")
        .select(
            "doc_id",
            lang_col,
            F.coalesce(F.col("bits"), F.col("prior_bits")).alias("b"),
        )
        .groupBy("doc_id", lang_col)
        .agg(F.sum("b").cast("long").alias("sbits"))
    )
    w = Window.partitionBy("doc_id").orderBy("sbits", lang_col)
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col(lang_col).alias("pred_lang"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(lang_col))
        .join(pred, "doc_id")
        .select(
            "doc_id",
            lang_col,
            "pred_lang",
            (F.col(lang_col) == F.col("pred_lang")).cast("int").alias(
                "correct"
            ),
        )
    )


def langid_margin(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(doc_id, pred_lang, margin_bits): the CCNet-style confidence
    signal — how many surprisal bits separate the best language from
    the runner-up. A production langid gate keeps a document only when
    the margin clears a threshold (ambiguous pages are worth less than
    the misrouting risk); margin 0 = a tie the tie-break resolved.

    Same slim frames as `langid_nb`: the margin is one conditional agg
    over the top-2 window rows per document — no extra corpus pass."""
    tris = char_trigrams(docs, id_col=id_col, text_col=text_col).persist()
    labeled = tris.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(lang_col)),
        "doc_id",
    )
    counts = labeled.groupBy("tri", lang_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = counts.groupBy(lang_col).agg(
        F.sum("cnt").cast("long").alias("t")
    )
    model = counts.join(tot, lang_col).select(
        "tri",
        lang_col,
        int_log2(F.expr("t div (cnt + 1L)")).alias("bits"),
    )
    langs = tot.select(
        lang_col, (int_log2(F.col("t") + 1)).alias("prior_bits")
    )
    scored = (
        tris.crossJoin(F.broadcast(langs))
        .join(model, ["tri", lang_col], "left")
        .select(
            "doc_id",
            lang_col,
            F.coalesce(F.col("bits"), F.col("prior_bits")).alias("b"),
        )
        .groupBy("doc_id", lang_col)
        .agg(F.sum("b").cast("long").alias("sbits"))
    )
    w = Window.partitionBy("doc_id").orderBy("sbits", lang_col)
    top2 = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 2
    )
    return top2.groupBy("doc_id").agg(
        F.min(F.when(F.col("rn") == 1, F.col(lang_col))).alias("pred_lang"),
        (
            F.min(F.when(F.col("rn") == 2, F.col("sbits")))
            - F.min(F.when(F.col("rn") == 1, F.col("sbits")))
        ).cast("long").alias("margin_bits"),
    )


_MARKER_CASE_SQL = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN '{m}'" for lang, m in sorted(LANG_MARKERS.items())
) + " ELSE '' END"

_CONSTRUCT_SQL = f"""
  SELECT doc_id, lang, {_MARKER_CASE_SQL} || text AS text
  FROM documents
"""


def constructed_langid_pages(docs: DataFrame) -> DataFrame:
    """Prepend the per-language marker phrase (inside the prefix cap)
    — SQL-replayable construction giving the shared-vocabulary corpus
    a real lexical language signal."""
    marker = F.lit("")
    expr = None
    for lang, m in sorted(LANG_MARKERS.items()):
        cond = F.when(F.col("lang") == lang, F.lit(m))
        expr = cond if expr is None else expr.when(
            F.col("lang") == lang, F.lit(m)
        )
    expr = expr.otherwise(marker)
    return docs.select(
        "doc_id", "lang", F.concat(expr, F.col("text")).alias("text")
    )


@register(
    "langid_chartrigram_nb",
    oracle=f"""
    WITH c AS ({_CONSTRUCT_SQL}),
    s AS (
      SELECT doc_id, lang, lower(substr(text, 1, {PREFIX_CAP})) AS s
      FROM c
    ),
    tris AS (
      SELECT doc_id, lang, substr(s, i.i, 3) AS tri
      FROM s, UNNEST(range(1, greatest(len(s) - 2, 0) + 1)) AS i(i)
    ),
    counts AS (
      SELECT tri, lang, count(*) AS cnt FROM tris GROUP BY tri, lang
    ),
    tot AS (
      SELECT lang, CAST(sum(cnt) AS BIGINT) AS t FROM counts GROUP BY lang
    ),
    model AS (
      SELECT tri, counts.lang,
             length(bin(t // (cnt + 1))) - 1 AS bits
      FROM counts JOIN tot USING (lang)
    ),
    scored AS (
      SELECT dt.doc_id, l.lang,
             CAST(sum(coalesce(m.bits, length(bin(l.t + 1)) - 1))
                  AS BIGINT) AS sbits
      FROM (SELECT doc_id, tri FROM tris) dt
      CROSS JOIN tot l
      LEFT JOIN model m ON m.tri = dt.tri AND m.lang = l.lang
      GROUP BY dt.doc_id, l.lang
    ),
    pred AS (
      SELECT doc_id, lang AS pred_lang,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY sbits, lang) AS rn
      FROM scored
    )
    SELECT d.doc_id, d.lang, p.pred_lang,
           CAST(d.lang = p.pred_lang AS INT) AS correct
    FROM documents d JOIN pred p ON d.doc_id = p.doc_id AND p.rn = 1
    """,
)
def langid_chartrigram_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram NB language ID over the marker-constructed corpus
    — training counts, per-language totals, integer surprisal bits,
    and the argmin prediction all value-hashed in DuckDB."""
    docs = constructed_langid_pages(load(spark, sf_dir, "documents"))
    return langid_nb(docs)


# demo threshold elected to split the sf0.01 constructed corpus
# (margins there span 43-98 bits; production calibrates per corpus,
# e.g. via quality_threshold_by_lang's histogram-CDF election)
MIN_MARGIN_BITS = 64


@register(
    "langid_margin_gate",
    oracle=f"""
    WITH c AS ({_CONSTRUCT_SQL}),
    s AS (
      SELECT doc_id, lang, lower(substr(text, 1, {PREFIX_CAP})) AS s
      FROM c
    ),
    tris AS (
      SELECT doc_id, lang, substr(s, i.i, 3) AS tri
      FROM s, UNNEST(range(1, greatest(len(s) - 2, 0) + 1)) AS i(i)
    ),
    counts AS (
      SELECT tri, lang, count(*) AS cnt FROM tris GROUP BY tri, lang
    ),
    tot AS (
      SELECT lang, CAST(sum(cnt) AS BIGINT) AS t FROM counts GROUP BY lang
    ),
    model AS (
      SELECT tri, counts.lang,
             length(bin(t // (cnt + 1))) - 1 AS bits
      FROM counts JOIN tot USING (lang)
    ),
    scored AS (
      SELECT dt.doc_id, l.lang,
             CAST(sum(coalesce(m.bits, length(bin(l.t + 1)) - 1))
                  AS BIGINT) AS sbits
      FROM (SELECT doc_id, tri FROM tris) dt
      CROSS JOIN tot l
      LEFT JOIN model m ON m.tri = dt.tri AND m.lang = l.lang
      GROUP BY dt.doc_id, l.lang
    ),
    ranked AS (
      SELECT doc_id, lang, sbits,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY sbits, lang) AS rn
      FROM scored
    )
    SELECT doc_id,
           min(CASE WHEN rn = 1 THEN lang END) AS pred_lang,
           CAST(min(CASE WHEN rn = 2 THEN sbits END)
              - min(CASE WHEN rn = 1 THEN sbits END) AS BIGINT)
             AS margin_bits,
           CAST(min(CASE WHEN rn = 2 THEN sbits END)
              - min(CASE WHEN rn = 1 THEN sbits END)
              >= {MIN_MARGIN_BITS} AS INT) AS kept
    FROM ranked WHERE rn <= 2 GROUP BY doc_id
    """,
)
def langid_margin_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-confidence gate: keep a document only when
    the best language beats the runner-up by ≥ MIN_MARGIN_BITS of
    summed trigram surprisal. Prediction, margin, and the gate verdict
    are all value-hashed in DuckDB."""
    docs = constructed_langid_pages(load(spark, sf_dir, "documents"))
    m = langid_margin(docs)
    return m.select(
        "doc_id",
        "pred_lang",
        "margin_bits",
        (F.col("margin_bits") >= MIN_MARGIN_BITS).cast("int").alias("kept"),
    )


# ---- paragraph-level language segmentation ---------------------------------

# CCNet splits documents into paragraphs BEFORE langid (its unit of
# dedup and LM scoring is the paragraph), because multilingual pages —
# boilerplate in one language wrapping content in another — are common
# at crawl scale and a doc-level label mislabels half the page. This
# operator trains the NB model on labelled documents and classifies
# PARAGRAPH units: same integer arithmetic, unit keys (doc_id, p).

_LANGS_SORTED = sorted(LANG_MARKERS)
_NEXT_LANG = {
    l: _LANGS_SORTED[(i + 1) % len(_LANGS_SORTED)]
    for i, l in enumerate(_LANGS_SORTED)
}
_PARA_SLICE = 120


def _case_over_lang(mapping: dict[str, str]):
    expr = None
    for lang, v in sorted(mapping.items()):
        expr = (
            F.when(F.col("lang") == lang, F.lit(v))
            if expr is None
            else expr.when(F.col("lang") == lang, F.lit(v))
        )
    return expr.otherwise(F.lit(""))


def _sql_case_over_lang(mapping: dict[str, str]) -> str:
    return (
        "CASE lang "
        + " ".join(
            f"WHEN '{lang}' THEN '{v}'" for lang, v in sorted(mapping.items())
        )
        + " ELSE '' END"
    )


def constructed_paragraph_units(docs: DataFrame) -> DataFrame:
    """(doc_id, p, para_lang, ptext): paragraph 1 in the document's own
    language, paragraph 2 in the cyclic-successor language — every doc
    is multilingual by construction, so per-paragraph prediction must
    DISAGREE with the doc label exactly once. Both slices carry their
    language's marker phrase inside the prefix cap."""
    p1 = docs.select(
        "doc_id",
        F.lit(1).alias("p"),
        F.col("lang").alias("para_lang"),
        F.concat(
            _case_over_lang(LANG_MARKERS),
            F.substring("text", 1, _PARA_SLICE),
        ).alias("ptext"),
    )
    next_marker = {
        l: LANG_MARKERS[_NEXT_LANG[l]] for l in _LANGS_SORTED
    }
    p2 = docs.select(
        "doc_id",
        F.lit(2).alias("p"),
        _case_over_lang(_NEXT_LANG).alias("para_lang"),
        F.concat(
            _case_over_lang(next_marker),
            F.substring("text", _PARA_SLICE + 1, _PARA_SLICE),
        ).alias("ptext"),
    )
    return p1.unionByName(p2)


def langid_units(
    train_docs: DataFrame, units: DataFrame
) -> DataFrame:
    """Train the trigram NB on (text, lang)-labelled documents, then
    classify arbitrary text UNITS keyed (doc_id, p). Identical model
    arithmetic to langid_nb; the scoring stream explodes the unit
    prefix instead of the document prefix."""
    tris = char_trigrams(train_docs).persist()
    labeled = tris.join(
        train_docs.select("doc_id", "lang"), "doc_id"
    )
    counts = labeled.groupBy("tri", "lang").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = counts.groupBy("lang").agg(F.sum("cnt").cast("long").alias("t"))
    model = counts.join(tot, "lang").select(
        "tri", "lang", int_log2(F.expr("t div (cnt + 1L)")).alias("bits")
    )
    langs = tot.select("lang", int_log2(F.col("t") + 1).alias("prior_bits"))

    s = F.lower(F.substring(F.col("ptext"), 1, PREFIX_CAP))
    utris = units.select(
        "doc_id",
        "p",
        F.explode(
            F.when(
                F.length(s) >= 3, F.sequence(F.lit(1), F.length(s) - 2)
            ).otherwise(F.expr("array()").cast("array<int>"))
        ).alias("i"),
        s.alias("_s"),
    ).select("doc_id", "p", F.expr("substring(_s, i, 3)").alias("tri"))
    scored = (
        utris.crossJoin(F.broadcast(langs))
        .join(model, ["tri", "lang"], "left")
        .select(
            "doc_id",
            "p",
            "lang",
            F.coalesce(F.col("bits"), F.col("prior_bits")).alias("b"),
        )
        .groupBy("doc_id", "p", "lang")
        .agg(F.sum("b").cast("long").alias("sbits"))
    )
    w = Window.partitionBy("doc_id", "p").orderBy("sbits", "lang")
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "p", F.col("lang").alias("pred_lang"))
    )
    return units.select("doc_id", "p", "para_lang").join(
        pred, ["doc_id", "p"]
    )


def _paragraph_oracle() -> str:
    next_case = _sql_case_over_lang(_NEXT_LANG)
    next_marker_case = _sql_case_over_lang(
        {l: LANG_MARKERS[_NEXT_LANG[l]] for l in _LANGS_SORTED}
    )
    return f"""
    WITH c AS ({_CONSTRUCT_SQL}),
    s AS (
      SELECT doc_id, lang, lower(substr(text, 1, {PREFIX_CAP})) AS s
      FROM c
    ),
    tris AS (
      SELECT doc_id, lang, substr(s, i.i, 3) AS tri
      FROM s, UNNEST(range(1, greatest(len(s) - 2, 0) + 1)) AS i(i)
    ),
    counts AS (
      SELECT tri, lang, count(*) AS cnt FROM tris GROUP BY tri, lang
    ),
    tot AS (
      SELECT lang, CAST(sum(cnt) AS BIGINT) AS t FROM counts GROUP BY lang
    ),
    model AS (
      SELECT tri, counts.lang,
             length(bin(t // (cnt + 1))) - 1 AS bits
      FROM counts JOIN tot USING (lang)
    ),
    pu AS (
      SELECT doc_id, 1 AS p, lang AS para_lang,
             {_MARKER_CASE_SQL} || substr(text, 1, {_PARA_SLICE}) AS ptext
      FROM documents
      UNION ALL
      SELECT doc_id, 2 AS p, {next_case} AS para_lang,
             {next_marker_case}
               || substr(text, {_PARA_SLICE + 1}, {_PARA_SLICE}) AS ptext
      FROM documents
    ),
    su AS (
      SELECT doc_id, p, para_lang,
             lower(substr(ptext, 1, {PREFIX_CAP})) AS s
      FROM pu
    ),
    ptris AS (
      SELECT doc_id, p, substr(s, i.i, 3) AS tri
      FROM su, UNNEST(range(1, greatest(len(s) - 2, 0) + 1)) AS i(i)
    ),
    pscored AS (
      SELECT t.doc_id, t.p, l.lang,
             CAST(sum(coalesce(m.bits, length(bin(l.t + 1)) - 1))
                  AS BIGINT) AS sbits
      FROM ptris t
      CROSS JOIN tot l
      LEFT JOIN model m ON m.tri = t.tri AND m.lang = l.lang
      GROUP BY t.doc_id, t.p, l.lang
    ),
    ppred AS (
      SELECT doc_id, p, lang AS pred_lang,
             row_number() OVER (PARTITION BY doc_id, p
                                ORDER BY sbits, lang) AS rn
      FROM pscored
    )
    SELECT su.doc_id, su.p, su.para_lang, pp.pred_lang
    FROM su JOIN ppred pp
      ON su.doc_id = pp.doc_id AND su.p = pp.p AND pp.rn = 1
    """


@register("langid_by_paragraph", oracle=_paragraph_oracle())
def langid_by_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level language ID over a constructed multilingual
    corpus (every doc's second paragraph is in the cyclic-successor
    language): model training, per-paragraph scoring, and the argmin
    are all value-hashed — the sharp check is that prediction FLIPS
    between paragraphs of the same document."""
    docs = load(spark, sf_dir, "documents")
    train = constructed_langid_pages(docs)
    units = constructed_paragraph_units(docs)
    return langid_units(train, units)
