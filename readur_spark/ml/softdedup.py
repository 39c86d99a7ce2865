"""Soft deduplication — duplicate-aware TRAINING WEIGHTS, not removal.

Published recipe (He et al. 2024, "SoftDedup: an Efficient Data
Reweighting Method for Speeding Up Language Model Pre-training",
re-implemented from the paper's description): instead of dropping
near-duplicates outright (MinHash/SemDeDup in ml/dedup.py and
ml/semdedup.py), measure each document's *commonness* — how often its
content n-grams recur across the corpus — and DOWN-WEIGHT common
documents in the sampling distribution. Removal is the degenerate
weight-0 case; soft weights keep the long tail of partially-duplicated
evidence while flattening the over-represented head. The reference
engine's analogue is its duplicate-document policy
(src/services/file_service.rs dedup paths); this is the continuous
generalization the LLM-data literature uses.

Semantics (integer-exact so the DuckDB oracle value-hashes it):
  - a document's gram set = its DISTINCT word-8-gram hashes
    (60-bit md5-prefix, the same family as ml/winnow.py fingerprints);
  - gram document-frequency df(g) = number of documents containing g;
  - commonness_mfp(d) = (1000 · Σ_g df(g)) div |grams(d)|  — the mean
    corpus frequency of the document's grams, in milli-units (1000 =
    "all my grams are unique to me");
  - weight_ufp(d) = 10^9 div commonness_mfp(d) — the SoftDedup
    sampling weight 1/commonness in micro-units (10^6 = full weight,
    an exact k-fold duplicate gets ≈ 10^6/k).
  Documents with fewer than 8 words have no grams and carry full
  weight (nothing to dedup on).

Scale design (10^12 docs):
  - the payload is projected to slim (doc_id, gram-hash) pairs at the
    scan; the TEXT never crosses a shuffle (same discipline as
    ml/paradedup.py);
  - df is one map-side-combinable aggregate over the distinct pairs;
    its join back onto the pairs is co-partitioned on `gh` (both sides
    come out of the same shuffle partitioning — no extra exchange);
  - the per-doc rollup is a second map-side-combinable aggregate; the
    weights frame is slim (doc_id, 3 longs) and broadcast-joins back
    to the payload wherever the mixture planner consumes it
    (ml/mixing.py's samplers take it as a weight column).
  - milli/micro fixed-point keeps every intermediate under BIGINT
    even at 10^12 docs (Σ df ≤ |grams|·N ≈ 5·10^14; ×1000 < 2^63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import SYNTH_URL_SQL, load

K_GRAM = 8  # word 8-grams, the Lee-et-al/SoftDedup granularity
_HASH_HEX = 15  # md5 hex chars -> 60-bit BIGINT-safe hash


def gram_type_hashes(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_GRAM,
) -> DataFrame:
    """SLIM (doc_id, gh) frame: the DISTINCT word-k-gram hashes of
    each document. Whitespace words, space-rejoined grams, 60-bit
    md5-prefix hash — replayed verbatim by the DuckDB twin."""
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    d = docs.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    grams = d.select(
        "doc_id",
        F.explode(
            # sequence(1, 0) counts DOWN — short docs must yield no
            # grams, not phantom positions (same guard as ml/winnow.py)
            F.when(
                F.size("_w") >= k,
                F.sequence(F.lit(1), F.size("_w") - (k - 1)),
            ).otherwise(F.expr("array()").cast("array<int>"))
        ).alias("i"),
        "_w",
    ).select(
        "doc_id",
        F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.expr(f"array_join(slice(_w, i, {k}), ' ')"),
                        "UTF-8",
                    )
                ),
                1,
                _HASH_HEX,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("gh"),
    )
    return grams.distinct()


def soft_dedup_weights(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_GRAM,
) -> DataFrame:
    """(doc_id, n_gram_types, commonness_mfp, weight_ufp) for every
    document. Exact duplicates share every gram, so a k-fold duplicate
    cluster gets commonness ≈ k·1000 and weight ≈ 10^6/k — the soft
    analogue of keep-one-of-k."""
    # persist the slim (doc_id, gh) frame: it feeds BOTH the df agg
    # and the per-doc rollup, and its lineage (payload explode + md5 +
    # distinct) is the expensive part — unpersisted, Spark recomputes
    # that subtree twice (two full Generate spans in the physical
    # plan). Two longs per gram, a small fraction of corpus size;
    # LRU evicts it (the ml/winnow.py posting-frame pattern).
    pairs = gram_type_hashes(
        docs, id_col=id_col, text_col=text_col, k=k
    ).persist()
    dfreq = pairs.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        pairs.join(dfreq, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_gram_types"),
            F.sum("df").alias("_sum_df"),
        )
        .withColumn(
            "commonness_mfp", F.expr("(1000L * _sum_df) div n_gram_types")
        )
        .withColumn("weight_ufp", F.expr("1000000000L div commonness_mfp"))
        .drop("_sum_df")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_gram_types"), F.lit(0).cast("long")).alias(
                "n_gram_types"
            ),
            F.coalesce(
                F.col("commonness_mfp"), F.lit(1000).cast("long")
            ).alias("commonness_mfp"),
            F.coalesce(
                F.col("weight_ufp"), F.lit(1000000).cast("long")
            ).alias("weight_ufp"),
        )
    )


_GRAMS_SQL = f"""
  w AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\\s+'),
                       x -> x <> '') AS ws
    FROM documents
  ),
  pairs AS (
    SELECT DISTINCT doc_id,
           CAST(concat('0x', substr(md5(
             array_to_string(ws[i.i : i.i + {K_GRAM - 1}], ' ')),
             1, {_HASH_HEX})) AS BIGINT) AS gh
    FROM w,
         UNNEST(range(1, greatest(len(ws) - {K_GRAM - 1}, 0) + 1)) AS i(i)
  )
"""


# the full weights chain as composable CTEs: wts(doc_id, n_gram_types,
# commonness_mfp, weight_ufp) over every document
_WEIGHTS_SQL = f"""{_GRAMS_SQL},
    dfreq AS (
      SELECT gh, count(*) AS df FROM pairs GROUP BY gh
    ),
    per_doc AS (
      SELECT p.doc_id,
             count(*) AS n_gram_types,
             CAST((1000 * sum(d.df)) // count(*) AS BIGINT)
               AS commonness_mfp
      FROM pairs p JOIN dfreq d USING (gh)
      GROUP BY p.doc_id
    ),
    wts AS (
      SELECT doc.doc_id,
             CAST(coalesce(per_doc.n_gram_types, 0) AS BIGINT)
               AS n_gram_types,
             CAST(coalesce(per_doc.commonness_mfp, 1000) AS BIGINT)
               AS commonness_mfp,
             CAST(1000000000 // coalesce(per_doc.commonness_mfp, 1000)
                  AS BIGINT) AS weight_ufp
      FROM documents doc LEFT JOIN per_doc USING (doc_id)
    )"""


@register(
    "dedup_soft_weights",
    oracle=f"""
    WITH {_WEIGHTS_SQL}
    SELECT doc_id, n_gram_types, commonness_mfp, weight_ufp FROM wts
    """,
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDedup commonness + sampling weights over the documents
    table — gram hashing, document frequencies, and both fixed-point
    divisions replayed exactly in DuckDB."""
    return soft_dedup_weights(load(spark, sf_dir, "documents"))


SOFT_SAMPLE_K = 100


@register(
    "dedup_soft_sample",
    oracle=f"""
    WITH {_WEIGHTS_SQL},
    u AS (
      SELECT doc_id, {SYNTH_URL_SQL} AS url FROM documents
    ),
    pr AS (
      SELECT w.doc_id, w.weight_ufp,
             CAST(concat('0x', substr(md5(u.url), 1, 15)) AS BIGINT)
               // w.weight_ufp AS priority,
             md5(u.url) AS h
      FROM wts w JOIN u USING (doc_id)
      WHERE w.weight_ufp > 0
    )
    SELECT doc_id, weight_ufp, priority
    FROM pr ORDER BY priority, h LIMIT {SOFT_SAMPLE_K}
    """,
)
def dedup_soft_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed chain the SoftDedup recipe exists for: sample the
    corpus proportional to the soft-dedup weight (duplicated content
    down-weighted, unique content at full mass) with the deterministic
    bottom-k priority sampler from ml/webfilters.py. Winning set,
    weights, and priorities all value-hashed end-to-end.

    Scale: the weights frame is slim; the sampler is one
    TakeOrderedAndProject — no window, no global sort; the payload is
    never touched after the gram projection."""
    from readur_spark.ml.webfilters import weighted_priority_sample
    from readur_spark.queries.tables import synthetic_url

    docs = load(spark, sf_dir, "documents")
    wts = soft_dedup_weights(docs).join(
        docs.select("doc_id", synthetic_url().alias("url")), "doc_id"
    )
    return weighted_priority_sample(
        wts, "weight_ufp", "url", SOFT_SAMPLE_K
    ).select("doc_id", "weight_ufp", "priority")


# ---- split leakage (train -> val n-gram contamination) -------------------


@register(
    "split_leakage_report",
    oracle=f"""
    WITH {_GRAMS_SQL},
    u AS (
      SELECT doc_id, {SYNTH_URL_SQL} AS url FROM documents
    ),
    sp AS (
      SELECT doc_id,
             CASE WHEN CAST(concat('0x', substr(md5('split1' || url), 1, 15))
                       AS BIGINT) % 1000 < 900 THEN 'train'
                  WHEN CAST(concat('0x', substr(md5('split1' || url), 1, 15))
                       AS BIGINT) % 1000 < 950 THEN 'val'
                  ELSE 'test' END AS split
      FROM u
    ),
    train_g AS (
      SELECT DISTINCT p.gh FROM pairs p JOIN sp USING (doc_id)
      WHERE sp.split = 'train'
    ),
    ev AS (
      SELECT p.doc_id, sp.split, p.gh,
             CASE WHEN t.gh IS NOT NULL THEN 1 ELSE 0 END AS leaked
      FROM pairs p
      JOIN sp USING (doc_id)
      LEFT JOIN train_g t ON p.gh = t.gh
      WHERE sp.split <> 'train'
    )
    SELECT doc_id, split,
           count(*) AS n_gram_types,
           CAST(sum(leaked) AS BIGINT) AS n_leaked,
           CAST((1000000 * sum(leaked)) // count(*) AS BIGINT)
             AS leakage_ufp
    FROM ev GROUP BY doc_id, split
    """,
)
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval n-gram contamination under the content-addressed
    split: for every val/test document, the fraction of its word-8-gram
    types that also occur in ANY train document — the leakage metric a
    benchmark-decontamination audit publishes (Lee et al. dedup paper's
    split-overlap analysis; the reason dedup must precede splitting).
    Composes ml/mixing.py's dataset_split with the softdedup gram
    projection; value-hashed end-to-end.

    Scale: the train gram set is DISTINCT slim hashes; the probe is a
    left join co-partitioned on `gh` with the pairs frame — the same
    shuffle class as the df aggregate. Nothing corpus-sized reaches
    the driver."""
    from readur_spark.ml.mixing import dataset_split
    from readur_spark.queries.tables import synthetic_url

    docs = load(spark, sf_dir, "documents").withColumn(
        "url", synthetic_url()
    )
    split = dataset_split(docs).select("doc_id", "split")
    # persist: the split-tagged pairs feed the train gram set AND the
    # eval probe — one explode pass, not two (winnow posting pattern)
    pairs = gram_type_hashes(docs).join(split, "doc_id").persist()
    train_g = (
        pairs.filter(F.col("split") == "train").select("gh").distinct()
        .withColumn("_in_train", F.lit(True))
    )
    ev = pairs.filter(F.col("split") != "train").join(
        train_g, "gh", "left"
    )
    return (
        ev.groupBy("doc_id", "split")
        .agg(
            F.count(F.lit(1)).alias("n_gram_types"),
            F.sum(F.col("_in_train").isNotNull().cast("long")).alias(
                "n_leaked"
            ),
        )
        .withColumn(
            "leakage_ufp",
            F.expr("(1000000L * n_leaked) div n_gram_types"),
        )
    )


# ---- per-host commonness rollup (boilerplate-heavy host detection) ------


@register(
    "host_commonness_rollup",
    oracle=f"""
    WITH {_WEIGHTS_SQL}
    SELECT d.source || '.example' AS host,
           count(*) AS n_docs,
           CAST(sum(w.commonness_mfp) // count(*) AS BIGINT)
             AS mean_commonness_mfp,
           CAST(sum(CASE WHEN w.commonness_mfp >= 2000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_heavy
    FROM wts w JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
)
def host_commonness_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host SoftDedup commonness rollup — the crawl-budget view:
    a host whose documents average ≥2× gram commonness is serving
    templated/syndicated content and earns a lower recrawl budget
    (composes with ml/urlfilters.py domain caps and the crawl tier's
    host_quality_rollup). One slim join + one map-side-combinable agg
    over the weights frame."""
    docs = load(spark, sf_dir, "documents")
    wts = soft_dedup_weights(docs)
    return (
        wts.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy(
            F.concat(F.col("source"), F.lit(".example")).alias("host")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(
                "CAST(sum(commonness_mfp) div count(1) AS BIGINT)"
            ).alias("mean_commonness_mfp"),
            F.sum((F.col("commonness_mfp") >= 2000).cast("long")).alias(
                "n_heavy"
            ),
        )
    )


# ---- incremental soft-dedup (delta probe vs stored gram-df table) --------


def incremental_soft_weights(
    stored_df: DataFrame,
    delta_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_GRAM,
) -> DataFrame:
    """SoftDedup weights for a DELTA batch against a STORED (gh, df)
    gram-frequency table — the continuous-crawl shape (the soft
    sibling of ml/dedup.py's incremental_neardup_plan): probe cost
    scales with the delta, not the corpus, and because document
    frequency is additive over disjoint document sets
    (df_full = df_stored + df_delta exactly), the incremental result
    is BIT-IDENTICAL to re-running the batch computation on
    stored ∪ delta. A crawl maintains the (gh, df) table as a
    map-side-mergeable rollup and upserts the delta's counts after
    each probe."""
    pairs = gram_type_hashes(
        delta_docs, id_col=id_col, text_col=text_col, k=k
    ).persist()
    delta_df = pairs.groupBy("gh").agg(F.count(F.lit(1)).alias("df_delta"))
    merged = delta_df.join(
        stored_df.select("gh", F.col("df").alias("df_stored")), "gh", "left"
    ).select(
        "gh",
        (
            F.coalesce(F.col("df_stored"), F.lit(0).cast("long"))
            + F.col("df_delta")
        ).alias("df"),
    )
    per_doc = (
        pairs.join(merged, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_gram_types"),
            F.sum("df").alias("_sum_df"),
        )
        .withColumn(
            "commonness_mfp", F.expr("(1000L * _sum_df) div n_gram_types")
        )
        .withColumn("weight_ufp", F.expr("1000000000L div commonness_mfp"))
        .drop("_sum_df")
    )
    return (
        delta_docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_gram_types"), F.lit(0).cast("long")).alias(
                "n_gram_types"
            ),
            F.coalesce(
                F.col("commonness_mfp"), F.lit(1000).cast("long")
            ).alias("commonness_mfp"),
            F.coalesce(
                F.col("weight_ufp"), F.lit(1000000).cast("long")
            ).alias("weight_ufp"),
        )
    )


# deterministic 80/20 corpus/delta split by id hash (no percentile agg
# — the incremental_neardup lesson from VERDICT r4)
_DELTA_PRED_SQL = "doc_id % 5 = 4"


@register(
    "incremental_soft_weights",
    oracle=f"""
    WITH {_WEIGHTS_SQL}
    SELECT doc_id, n_gram_types, commonness_mfp, weight_ufp
    FROM wts WHERE {_DELTA_PRED_SQL}
    """,
)
def incremental_soft_weights_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta-batch soft weights via the stored-df probe, checked
    against the ORACLE'S BATCH SEMANTICS: DuckDB computes the
    full-corpus weights and restricts to the delta — the additivity of
    document frequency makes the incremental plan provably equal, and
    the value hash enforces it. Corpus/delta split is a deterministic
    id cut (doc_id % 5 == 4), never a percentile aggregate."""
    docs = load(spark, sf_dir, "documents")
    stored_docs = docs.filter(~F.expr(_DELTA_PRED_SQL))
    delta_docs = docs.filter(F.expr(_DELTA_PRED_SQL))
    stored_df = gram_type_hashes(stored_docs).groupBy("gh").agg(
        F.count(F.lit(1)).alias("df")
    )
    return incremental_soft_weights(stored_df, delta_docs)
