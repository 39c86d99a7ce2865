"""DSIR-style data selection via hashed n-gram importance weights.

Re-expresses the public DSIR recipe (Xie et al., "Data Selection for
Language Models via Importance Resampling", NeurIPS 2023) with the
engine's integer-exact conventions: features are hashed unigram + word-
bigram buckets, the target and raw bag-of-words models are unigram
count tables over the bucket space, and the per-document importance
weight

    log w(x) = sum_f n_f(x) * (log p_target(f) - log p_raw(f))

is computed as an EXACT integer difference of floor-log2 surprisals
(`int_log2(T div (c+1))`, the same no-libm primitive as the CCNet LM in
ml/quality_lm.py), so the score is bit-identical on every engine. A
document is `selected` when sum_dbits > 0 — the likelihood-ratio test
w(x) > 1, "looks more like the target distribution than the raw crawl".
(The paper's Gumbel top-k resampling adds per-doc Gumbel noise before a
global top-k; the deterministic analogue at fixed k is `ORDER BY
sum_dbits DESC, doc_id LIMIT k` — a distributed TakeOrderedAndProject.)

Deliberate deviations from the paper, for exactness:
  - log2 instead of ln (a positive constant factor; orderings and the
    w > 1 test are unchanged);
  - add-one smoothing as `T div (c+1)` on both models, mirroring the
    LM tier, instead of fractional Laplace smoothing;
  - no score division anywhere: Spark's `div` truncates toward zero
    while DuckDB's `//` floors, so a mean over the (possibly negative)
    sum would diverge cross-engine — the exact sum is the score.

The reference engine (yonasBSD/readur) has no data-selection tier; this
extends the training-pipeline family (nearest reference analogue: the
OCR confidence gate, src/ocr/enhanced.rs:1487-1558, also a keep/drop
quality decision per document).

Scale design (10^12 docs):
  - ONE slim explode of (doc_id, is_target, bucket) — the md5 bucket
    space is fixed at 16^4 = 65,536, so BOTH models come from a single
    map-side-combinable groupBy(bucket) with a conditional count: no
    second corpus pass for the target model;
  - the joint model table (<= 65,536 rows of (string, long, long)) is
    collected and rebuilt as a local relation, so the scoring join
    broadcasts a literal — the corpus-side stream never shuffles on the
    bucket key;
  - per-doc aggregation partial-combines on doc_id before the only
    wide shuffle (slim longs);
  - at fixed selection budget k, selection is `orderBy(...).limit(k)`
    (TakeOrderedAndProject — no global sort materializes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.ml.quality_lm import int_log2, tokenize_alpha
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# 4 hex chars of md5 = 65,536 feature buckets, computable identically
# in every engine that has md5 (the repo's cross-engine hash, see
# ml/webfilters.py hash-split).
BUCKET_HEX_LEN = 4


def feature_buckets(text: Column) -> Column:
    """Array of hashed n-gram features: unigrams + word bigrams, each
    mapped to a `BUCKET_HEX_LEN`-hex-char md5 bucket id."""
    t = tokenize_alpha(text)
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(t, bigrams),
        lambda g: F.substring(
            F.md5(F.encode(g, "UTF-8")), 1, BUCKET_HEX_LEN
        ),
    )


def dsir_scores(
    docs: DataFrame,
    target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance score over hashed n-gram features.

    `target` is a boolean Column over `docs` defining the target
    distribution (the paper's high-quality corpus — here a predicate,
    since both distributions are materialized in one table). Output:
    (id_col, n_feats, sum_dbits, selected), where
    sum_dbits = sum over feature instances of
    bits_raw(f) - bits_target(f), bits_m(f) = int_log2(T_m div (c_m+1)).
    Documents with zero alphabetic tokens carry no evidence and are
    excluded (the C4 gates own that decision)."""
    feats = docs.select(
        F.col(id_col),
        target.alias("is_target"),
        F.explode(feature_buckets(F.col(text_col))).alias("b"),
    )
    # one grouped pass builds BOTH models: raw = every instance,
    # target = instances from target docs.
    model = feats.groupBy("b").agg(
        F.count("*").alias("c_r"),
        F.count(F.when(F.col("is_target"), 1)).alias("c_t"),
    )
    schema = model.schema
    rows = model.collect()  # bounded: <= 16^BUCKET_HEX_LEN rows
    t_r = sum(r["c_r"] for r in rows)
    t_t = sum(r["c_t"] for r in rows)
    local = docs.sparkSession.createDataFrame(rows, schema=schema)
    scored = feats.join(F.broadcast(local), "b").select(
        F.col(id_col),
        (
            int_log2(F.expr(f"{t_r}L div (c_r + 1L)"))
            - int_log2(F.expr(f"{t_t}L div (c_t + 1L)"))
        ).alias("dbits"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_feats"),
        F.sum("dbits").alias("sum_dbits"),
    )
    return agg.select(
        id_col,
        "n_feats",
        "sum_dbits",
        (F.col("sum_dbits") > 0).alias("selected"),
    )


def dsir_top_k(
    docs: DataFrame,
    target: Column,
    k: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic top-k selection by importance weight (the fixed-
    budget analogue of the paper's Gumbel top-k): orderBy + limit is a
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    return (
        dsir_scores(docs, target, text_col=text_col, id_col=id_col)
        .orderBy(F.col("sum_dbits").desc(), id_col)
        .limit(k)
    )


# ---- driver-contract query ---------------------------------------------


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang = 'en' AS is_target,
             list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    grams AS (
      SELECT doc_id, is_target, u.g
      FROM t, UNNEST(ts) AS u(g)
      UNION ALL
      SELECT doc_id, is_target, ts[r.i] || ' ' || ts[r.i + 1] AS g
      FROM t, UNNEST(range(1, len(ts))) AS r(i)
      WHERE len(ts) >= 2
    ),
    feats AS (
      SELECT doc_id, is_target, substr(md5(g), 1, {BUCKET_HEX_LEN}) AS b
      FROM grams
    ),
    model AS (
      SELECT b, count(*) AS c_r,
             count(*) FILTER (WHERE is_target) AS c_t
      FROM feats GROUP BY b
    ),
    tot AS (
      SELECT CAST(sum(c_r) AS BIGINT) AS t_r,
             CAST(sum(c_t) AS BIGINT) AS t_t
      FROM model
    ),
    scored AS (
      SELECT f.doc_id,
             (length(bin((SELECT t_r FROM tot) // (m.c_r + 1))) - 1)
           - (length(bin((SELECT t_t FROM tot) // (m.c_t + 1))) - 1)
               AS dbits
      FROM feats f JOIN model m USING (b)
    )
    SELECT doc_id, count(*) AS n_feats,
           CAST(sum(dbits) AS BIGINT) AS sum_dbits,
           CAST(sum(dbits) AS BIGINT) > 0 AS selected
    FROM scored GROUP BY doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights over the documents table with the
    English subcorpus as the target distribution, value-hash-checked:
    the DuckDB twin replays the hashed-bigram features, the joint
    count model, and the integer-log2 weight exactly."""
    docs = load(spark, sf_dir, "documents")
    return dsir_scores(docs, F.col("lang") == "en").select(
        "doc_id", "n_feats", "sum_dbits", "selected"
    )
