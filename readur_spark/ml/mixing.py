"""Data-mixture planning: sample a corpus to target bucket proportions.

A training-data pipeline rarely feeds the raw crawl distribution to the
trainer; it resamples to a target mixture (per language, per domain,
per quality tier), downsampling over-represented buckets and repeating
("epoch-ing") under-represented ones up to a cap — the standard recipe
in the public LLM-data literature (the Pile / ROOTS / Llama data-mix
descriptions all publish per-source weights and epoch caps).

The reference engine (yonasBSD/readur) has no mixing tier — this is
part of the engine's training-pipeline extension, alongside dedup and
decontamination.

Design for 10^12 rows:
  - the plan is derived from ONE slim aggregation (bucket -> count,
    K rows for K buckets) broadcast back onto the corpus — the payload
    is never shuffled;
  - membership is content-addressed (md5 of a stable key, the same
    convention as webfilters.with_hash_split): reproducible across
    engines, partitionings, and incremental runs — no RNG state;
  - up-sampling replicates rows with a bounded `epoch` index via one
    explode whose fan-out is capped by max_epochs, so the output size
    is plan-bounded, not data-dependent.

Determinism contract: row (key) survives at fractional epoch e iff
unit(key) < frac(e), where unit(key) = int(md5(key)[:8], 16) / 2^32 —
both sides of the oracle compute the identical double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import (
    SYNTH_URL_SQL,
    load,
    synthetic_url,
    table_row_count,
)


def hash_unit(key: Column) -> Column:
    """Deterministic unit-interval value from a key: first 8 md5 hex
    chars as an integer over 2^32. Exact in double (2^32 < 2^53)."""
    return (
        F.conv(F.substring(F.md5(F.encode(key, "UTF-8")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )


def plan_mixture(
    counts: dict[str, int],
    targets: dict[str, float],
    budget_rows: int,
    max_epochs: float = 4.0,
) -> dict[str, float]:
    """Pure planning step: bucket -> fractional epochs.

    wanted_b = budget * target_b (targets are taken as given, not
    renormalized — a target map summing to <1 reserves budget);
    epochs_b = min(max_epochs, wanted_b / count_b). epochs < 1 is a
    downsampling rate; epochs > 1 replicates. Buckets absent from
    `targets` get 0 (excluded)."""
    plan: dict[str, float] = {}
    for bucket, n in counts.items():
        target = targets.get(bucket, 0.0)
        if n <= 0 or target <= 0.0:
            plan[bucket] = 0.0
            continue
        plan[bucket] = min(max_epochs, (budget_rows * target) / n)
    return plan


def with_mixture_epochs(
    df: DataFrame,
    bucket_col: str,
    targets: dict[str, float],
    budget_rows: int,
    *,
    key_col: str = "url",
    max_epochs: float = 4.0,
) -> DataFrame:
    """Resample `df` to the target mixture; adds `epoch` (1-based copy
    index). Fully distributed: slim count agg -> broadcast plan join ->
    projection + capped explode. The payload columns ride along
    untouched (never shuffled — the only exchange carries K bucket
    counts)."""
    counts = df.groupBy(bucket_col).agg(F.count("*").alias("_n"))
    tmap = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in kv]
    )
    # coalesce the map lookup: a bucket absent from `targets` yields NULL,
    # and Spark's least() SKIPS nulls (least(4.0, NULL) = 4.0) — without
    # the coalesce an untargeted bucket would be max-epoch'd, not dropped.
    target = F.coalesce(tmap[F.col(bucket_col)], F.lit(0.0))
    plan = counts.select(
        F.col(bucket_col),
        F.least(
            F.lit(float(max_epochs)),
            (F.lit(budget_rows) * target) / F.col("_n"),
        ).alias("_epochs"),
    )
    joined = df.join(F.broadcast(plan), bucket_col, "inner")
    u = hash_unit(F.col(key_col))
    whole = F.floor(F.col("_epochs")).cast("long")
    frac = F.col("_epochs") - F.floor(F.col("_epochs"))
    n_copies = whole + F.when(u < frac, F.lit(1)).otherwise(F.lit(0))
    return (
        joined.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
        .drop("_epochs", "_n_copies")
    )


def with_training_order(
    df: DataFrame,
    seed: str,
    n_shards: int,
    *,
    key_col: str = "url",
) -> DataFrame:
    """Deterministic seeded global shuffle into training shards.

    Training dataloaders need a reproducible random-looking order that
    changes per epoch/seed. This assigns every row a content-addressed
    order hash (md5 of seed || key — 15 hex chars, so the value fits a
    BIGINT on every engine), a shard = hash mod n_shards, and a
    within-shard position. Adds columns: `shard`, `pos`.

    Scale: one shuffle on `shard` (uniform by construction — the hash
    is uniform, so no skew), then a per-shard sort; choose n_shards so
    a shard fits a task (10^12 rows / 10^6 shards = 10^6 rows/shard).
    No global sort, no driver collect; re-seeding changes only the
    hash column, not the plan shape.
    """
    order_hash = F.conv(
        F.substring(
            F.md5(F.encode(F.concat(F.lit(seed), F.col(key_col)), "UTF-8")),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("_oh", key_col)
    return (
        df.withColumn("_oh", order_hash)
        .withColumn("shard", F.pmod(F.col("_oh"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_oh")
    )


# ---- driver-contract query ---------------------------------------------


_TARGETS = {"en": 0.4, "zh": 0.25, "de": 0.15, "fr": 0.15, "es": 0.05}
_MAX_EPOCHS = 4.0

# SQL twin of the targets map; CASTs keep DuckDB in double arithmetic
# (bare 0.4 is DECIMAL there, which rounds differently from Spark).
_TARGET_SQL = (
    "CASE lang WHEN 'en' THEN CAST(0.4 AS DOUBLE)"
    " WHEN 'zh' THEN CAST(0.25 AS DOUBLE)"
    " WHEN 'de' THEN CAST(0.15 AS DOUBLE)"
    " WHEN 'fr' THEN CAST(0.15 AS DOUBLE)"
    " WHEN 'es' THEN CAST(0.05 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"
)


@register(
    "mixture_sample_by_lang",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, lang, {SYNTH_URL_SQL} AS url FROM documents
    ),
    plan AS (
      SELECT lang,
             LEAST(CAST(4.0 AS DOUBLE),
                   ((SELECT count(*) FROM documents) * {_TARGET_SQL})
                     / count(*)) AS epochs
      FROM u GROUP BY lang
    ),
    j AS (
      SELECT u.doc_id, u.lang,
             CAST(floor(p.epochs) AS BIGINT)
             + CASE WHEN CAST(concat('0x', substr(md5(u.url), 1, 8)) AS UBIGINT)
                         / 4294967296.0
                       < p.epochs - floor(p.epochs)
                    THEN 1 ELSE 0 END AS n_copies
      FROM u JOIN plan p USING (lang)
    )
    SELECT j.doc_id, j.lang, CAST(r.u + 1 AS BIGINT) AS epoch
    FROM j, UNNEST(range(j.n_copies)) AS r(u)
    """,
)
def mixture_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample `documents` to a fixed language mixture (en 40 / zh 25 /
    de 15 / fr 15 / es 5) at budget = |documents|: zh is up-sampled
    past 1 epoch, es down-sampled to ~a third — both arms of the
    planner exercised and value-hash-checked against DuckDB."""
    docs = load(spark, sf_dir, "documents").withColumn("url", synthetic_url())
    budget = table_row_count(sf_dir, "documents")
    out = with_mixture_epochs(
        docs, "lang", _TARGETS, budget, key_col="url", max_epochs=_MAX_EPOCHS
    )
    return out.select(
        "doc_id", "lang", F.col("epoch").cast("long").alias("epoch")
    )


@register(
    "training_order_shuffle",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {SYNTH_URL_SQL} AS url FROM documents
    ),
    h AS (
      SELECT doc_id, url,
             CAST(concat('0x', substr(md5('ep1' || url), 1, 15)) AS BIGINT)
               AS oh
      FROM u
    )
    SELECT doc_id, CAST(oh % 8 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY oh % 8 ORDER BY oh, url)
                AS BIGINT) AS pos
    FROM h
    """,
)
def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic training-order shuffle into 8 shards —
    shard + within-shard position value-hash-checked against DuckDB's
    identical md5 order hash."""
    docs = load(spark, sf_dir, "documents").withColumn("url", synthetic_url())
    out = with_training_order(docs, "ep1", 8, key_col="url")
    return out.select("doc_id", "shard", "pos")


# ---- token-budget planning (the published data-mix table) --------------

# per-mille target weights for the planning query (integer so the
# whole plan is BIGINT-exact on every engine)
_TOKEN_TARGETS_MILLI = {"en": 500, "zh": 200, "de": 100, "es": 100, "fr": 100}
_TOKEN_MAX_EPOCHS_MILLI = 4000


def plan_token_mixture(
    docs: DataFrame,
    bucket_col: str,
    targets_milli: dict[str, int],
    budget_tokens: int,
    *,
    text_col: str = "text",
    max_epochs_milli: int = _TOKEN_MAX_EPOCHS_MILLI,
) -> DataFrame:
    """The data-mix table every LLM-data paper publishes (Pile / ROOTS
    / Llama): per bucket, how many tokens exist, what fraction of the
    token budget the mixture assigns, and the resulting sampling rate
    in milli-epochs (epochs*1000; <1000 downsamples, >1000 repeats,
    capped). All integer arithmetic:

      epochs_milli_b = min(cap, (budget * target_milli_b) div tokens_b)
      planned_tokens_b = (tokens_b * epochs_milli_b) div 1000

    Output: (bucket, n_docs, n_tokens, target_milli, epochs_milli,
    planned_tokens). Scale: ONE map-side-combinable aggregation over a
    slim (bucket, token-count) projection — K output rows; the payload
    never shuffles. Token counts are the whitespace convention
    (`ml/textqc.py: token_count`)."""
    from readur_spark.ml.textqc import token_count

    agg = (
        docs.select(
            F.col(bucket_col).alias("bucket"),
            token_count(F.col(text_col)).cast("long").alias("_t"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_t").alias("n_tokens"),
        )
    )
    return plan_over_token_agg(
        agg, targets_milli, budget_tokens,
        max_epochs_milli=max_epochs_milli,
    )


def plan_over_token_agg(
    agg: DataFrame,
    targets_milli: dict[str, int],
    budget_tokens: int,
    *,
    max_epochs_milli: int = _TOKEN_MAX_EPOCHS_MILLI,
) -> DataFrame:
    """The plan arithmetic over an already-aggregated (bucket, n_docs,
    n_tokens) frame — shared by the whitespace-token and BPE-token
    planners (the token-counting convention is the caller's choice;
    the budget must be denominated in the same unit)."""
    tmap = F.create_map(
        *[F.lit(x) for kv in targets_milli.items() for x in kv]
    )
    target = F.coalesce(tmap[F.col("bucket")], F.lit(0)).cast("long")
    return (
        agg.withColumn("target_milli", target)
        .withColumn(
            "epochs_milli",
            F.when(
                (F.col("n_tokens") > 0) & (F.col("target_milli") > 0),
                F.least(
                    F.lit(int(max_epochs_milli)).cast("long"),
                    F.expr(
                        f"({int(budget_tokens)}L * target_milli)"
                        " div n_tokens"
                    ),
                ),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "planned_tokens",
            F.expr("(n_tokens * epochs_milli) div 1000L"),
        )
    )


@register(
    "mixture_token_plan",
    oracle=f"""
    WITH c AS (
      SELECT lang AS bucket, count(*) AS n_docs,
             CAST(sum(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)
               AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    t(bucket, target_milli) AS (VALUES
      {", ".join(f"('{b}', {m})" for b, m in _TOKEN_TARGETS_MILLI.items())}
    ),
    p AS (
      SELECT c.bucket, c.n_docs, c.n_tokens,
             CAST(coalesce(t.target_milli, 0) AS BIGINT) AS target_milli
      FROM c LEFT JOIN t USING (bucket)
    )
    SELECT bucket, n_docs, n_tokens, target_milli,
           CAST(CASE WHEN n_tokens > 0 AND target_milli > 0
                THEN least({_TOKEN_MAX_EPOCHS_MILLI},
                           (100000 * target_milli) // n_tokens)
                ELSE 0 END AS BIGINT) AS epochs_milli,
           CAST((n_tokens * (CASE WHEN n_tokens > 0 AND target_milli > 0
                THEN least({_TOKEN_MAX_EPOCHS_MILLI},
                           (100000 * target_milli) // n_tokens)
                ELSE 0 END)) // 1000 AS BIGINT) AS planned_tokens
    FROM p
    """,
)
def mixture_token_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture plan over `documents` by language at a
    100k-token budget — counts, milli-epoch rates, and planned yields
    value-hash-checked (integer-exact on both engines)."""
    docs = load(spark, sf_dir, "documents")
    return plan_token_mixture(
        docs, "lang", _TOKEN_TARGETS_MILLI, 100_000
    ).select(
        "bucket", "n_docs", "n_tokens", "target_milli",
        "epochs_milli", "planned_tokens",
    )


# ---- fertility-adjusted plan: budget in MODEL tokens -------------------

# A mixture planned in whitespace words misprices languages whose BPE
# fertility differs (the same word budget costs more model tokens in a
# high-fertility language). This variant counts each document in BPE
# tokens under the corpus-learned vocab, so the budget is denominated
# in what the trainer actually consumes (`ml/bpe.py:
# bpe_fertility_by_lang` measures the per-language price; this plans
# with it).

_BPE_BUDGET_TOKENS = 150_000


def _bpe_plan_oracle() -> str:
    from readur_spark.ml.bpe import DEFAULT_NUM_MERGES, _oracle_chain

    targets_values = ", ".join(
        f"('{b}', {m})" for b, m in _TOKEN_TARGETS_MILLI.items()
    )
    return _oracle_chain(DEFAULT_NUM_MERGES) + f""",
    per_word AS MATERIALIZED (
      SELECT w, CAST(len(list_filter(string_split(rep, '  '),
                                     x -> x <> '')) AS INT) AS n_tok
      FROM w{DEFAULT_NUM_MERGES}
    ),
    doc_words AS (
      SELECT doc_id, lang, t.w AS w
      FROM documents,
           UNNEST(list_filter(
             regexp_split_to_array(lower(text), '[^a-z]+'),
             x -> x <> '')) AS t(w)
    ),
    dc AS (
      SELECT doc_id, any_value(lang) AS lang,
             CAST(sum(n_tok) AS BIGINT) AS t
      FROM doc_words JOIN per_word USING (w)
      GROUP BY doc_id
    ),
    c AS (
      SELECT lang AS bucket, count(*) AS n_docs,
             CAST(sum(t) AS BIGINT) AS n_tokens
      FROM dc GROUP BY lang
    ),
    tg(bucket, target_milli) AS (VALUES {targets_values}),
    p AS (
      SELECT c.bucket, c.n_docs, c.n_tokens,
             CAST(coalesce(tg.target_milli, 0) AS BIGINT) AS target_milli
      FROM c LEFT JOIN tg USING (bucket)
    )
    SELECT bucket, n_docs, n_tokens, target_milli,
           CAST(CASE WHEN n_tokens > 0 AND target_milli > 0
                THEN least({_TOKEN_MAX_EPOCHS_MILLI},
                           ({_BPE_BUDGET_TOKENS} * target_milli) // n_tokens)
                ELSE 0 END AS BIGINT) AS epochs_milli,
           CAST((n_tokens * (CASE WHEN n_tokens > 0 AND target_milli > 0
                THEN least({_TOKEN_MAX_EPOCHS_MILLI},
                           ({_BPE_BUDGET_TOKENS} * target_milli) // n_tokens)
                ELSE 0 END)) // 1000 AS BIGINT) AS planned_tokens
    FROM p
    """


def _register_bpe_plan() -> None:
    @register("mixture_bpe_token_plan", oracle=_bpe_plan_oracle())
    def mixture_bpe_token_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The data-mix table denominated in BPE tokens: vocab learned
        from the corpus, every doc token-accounted under it, then the
        same capped milli-epoch plan arithmetic — learn, encode, and
        plan all replayed exactly in DuckDB."""
        from readur_spark.ml.bpe import (
            DEFAULT_NUM_MERGES,
            encode_token_counts,
            learn_bpe_merges,
        )

        docs = load(spark, sf_dir, "documents")
        _, vocab = learn_bpe_merges(docs, DEFAULT_NUM_MERGES)
        counts = encode_token_counts(docs, vocab, id_col="doc_id")
        sized = docs.select("doc_id", "lang").join(counts, "doc_id")
        agg = sized.groupBy(F.col("lang").alias("bucket")).agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bpe_tokens").alias("n_tokens"),
        )
        return plan_over_token_agg(
            agg, _TOKEN_TARGETS_MILLI, _BPE_BUDGET_TOKENS
        ).select(
            "bucket", "n_docs", "n_tokens", "target_milli",
            "epochs_milli", "planned_tokens",
        )


_register_bpe_plan()


# ---- temperature-scaled plan: targets derived from the corpus ----------

# The multilingual-pretraining recipe (exponentiated / "temperature"
# sampling, published with mBERT and XLM-R): instead of hand-picked
# targets, sample bucket b with probability ∝ p_b^α for α ∈ (0, 1) —
# flattening the raw distribution so head languages stop drowning the
# tail. This implementation fixes α = 1/2 (square-root smoothing, the
# classic instance): sqrt admits an exact INTEGER formulation
# (isqrt = floor(sqrt(n)) with a ±1 ulp correction), so the whole
# plan stays BIGINT-exact and engine-identical like every other plan
# in this module — a general-α variant would need libm pow doubles
# and a tolerance-based oracle.

_TEMP_BUDGET_TOKENS = 100_000


def _isqrt(col: Column) -> Column:
    """floor(sqrt(n)) exactly: libm sqrt is correctly rounded, but the
    floor of a correctly-rounded double can still be off by one at
    ulp boundaries — correct with integer comparisons."""
    s0 = F.floor(F.sqrt(col.cast("double"))).cast("long")
    return (
        F.when((s0 + 1) * (s0 + 1) <= col, s0 + 1)
        .when(s0 * s0 > col, s0 - 1)
        .otherwise(s0)
    )


def plan_temperature_mixture(
    docs: DataFrame,
    bucket_col: str,
    budget_tokens: int,
    *,
    text_col: str = "text",
    max_epochs_milli: int = _TOKEN_MAX_EPOCHS_MILLI,
) -> DataFrame:
    """Token-budget mixture plan whose targets are DERIVED from the
    corpus by square-root smoothing:

      w_b           = isqrt(n_tokens_b)
      target_milli  = (1000 * w_b) div Σ w
      epochs_milli  = min(cap, (budget * target_milli) div n_tokens_b)

    Output: (bucket, n_docs, n_tokens, weight, target_milli,
    epochs_milli, planned_tokens). Scale: the same ONE slim
    aggregation as plan_token_mixture; the Σw total joins back as a
    1-row broadcast cross join (K rows × 1 row — constant work)."""
    from readur_spark.ml.textqc import token_count

    agg = (
        docs.select(
            F.col(bucket_col).alias("bucket"),
            token_count(F.col(text_col)).cast("long").alias("_t"),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"), F.sum("_t").alias("n_tokens"))
        .withColumn("weight", _isqrt(F.col("n_tokens")))
    )
    total = agg.agg(F.sum("weight").alias("_tw"))
    planned = (
        agg.crossJoin(F.broadcast(total))
        .withColumn(
            "target_milli", F.expr("(1000L * weight) div _tw").cast("long")
        )
        .withColumn(
            "epochs_milli",
            F.when(
                (F.col("n_tokens") > 0) & (F.col("target_milli") > 0),
                F.least(
                    F.lit(int(max_epochs_milli)).cast("long"),
                    F.expr(
                        f"({int(budget_tokens)}L * target_milli)"
                        " div n_tokens"
                    ),
                ),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "planned_tokens", F.expr("(n_tokens * epochs_milli) div 1000L")
        )
    )
    return planned.select(
        "bucket", "n_docs", "n_tokens", "weight", "target_milli",
        "epochs_milli", "planned_tokens",
    )


@register(
    "mixture_temperature_plan",
    oracle=f"""
    WITH c AS (
      SELECT lang AS bucket, count(*) AS n_docs,
             CAST(sum(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)
               AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    w AS (
      SELECT bucket, n_docs, n_tokens,
             CASE WHEN (s0 + 1) * (s0 + 1) <= n_tokens THEN s0 + 1
                  WHEN s0 * s0 > n_tokens THEN s0 - 1
                  ELSE s0 END AS weight
      FROM (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)))
                           AS BIGINT) AS s0 FROM c)
    ),
    t AS (SELECT sum(weight) AS tw FROM w),
    p AS (
      SELECT w.*, CAST((1000 * w.weight) // t.tw AS BIGINT)
               AS target_milli
      FROM w, t
    )
    SELECT bucket, n_docs, n_tokens, weight, target_milli,
           CAST(CASE WHEN n_tokens > 0 AND target_milli > 0
                THEN least({_TOKEN_MAX_EPOCHS_MILLI},
                           ({_TEMP_BUDGET_TOKENS} * target_milli) // n_tokens)
                ELSE 0 END AS BIGINT) AS epochs_milli,
           CAST((n_tokens * (CASE WHEN n_tokens > 0 AND target_milli > 0
                THEN least({_TOKEN_MAX_EPOCHS_MILLI},
                           ({_TEMP_BUDGET_TOKENS} * target_milli) // n_tokens)
                ELSE 0 END)) // 1000 AS BIGINT) AS planned_tokens
    FROM p
    """,
)
def mixture_temperature_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square-root-temperature mixture plan over `documents` by
    language — corpus-derived targets, integer-exact isqrt weights,
    milli-epoch rates and planned yields all value-hash-checked."""
    docs = load(spark, sf_dir, "documents")
    return plan_temperature_mixture(docs, "lang", _TEMP_BUDGET_TOKENS)


# ---- deterministic dataset split (train/val/test) ------------------------

SPLIT_SEED = "split1"
SPLIT_TRAIN_PERMILLE = 900
SPLIT_VAL_PERMILLE = 950  # val = [900, 950), test = [950, 1000)


def dataset_split(
    df: DataFrame,
    *,
    seed: str = SPLIT_SEED,
    key_col: str = "url",
    train_permille: int = SPLIT_TRAIN_PERMILLE,
    val_permille: int = SPLIT_VAL_PERMILLE,
) -> DataFrame:
    """Adds (bucket, split): content-addressed train/val/test
    assignment by md5(seed || key) mod 1000 — the standard leakage-safe
    split (the same URL lands in the same split on every engine, every
    re-run, every shard union; near-duplicates should be collapsed
    FIRST — compose with the dedup tier — or they straddle splits).

    Pure projection: no shuffle, no state; re-seeding re-splits
    without replanning. Exact md5 semantics shared with
    with_training_order so one hash recipe covers order + split."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.encode(F.concat(F.lit(seed), F.col(key_col)), "UTF-8")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    return df.withColumn("bucket", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < train_permille, F.lit("train"))
        .when(F.col("bucket") < val_permille, F.lit("val"))
        .otherwise(F.lit("test")),
    )


@register(
    "dataset_split_assign",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {SYNTH_URL_SQL} AS url FROM documents
    ),
    b AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5('{SPLIT_SEED}' || url), 1, 15))
                  AS BIGINT) % 1000 AS bucket
      FROM u
    )
    SELECT doc_id, bucket,
           CASE WHEN bucket < {SPLIT_TRAIN_PERMILLE} THEN 'train'
                WHEN bucket < {SPLIT_VAL_PERMILLE} THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document train/val/test assignment, value-hashed: DuckDB
    replays the seeded md5 bucket and the permille thresholds."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "url", synthetic_url()
    )
    return dataset_split(docs).select("doc_id", "bucket", "split")


# ---- temperature-scaled language sampling (alpha = 1/2) --------------------

ALPHA_BUDGET = 1_000_000


def isqrt_col(x: Column) -> Column:
    """Exact integer sqrt of a non-negative long: float sqrt, then a
    ±1 correction so the result is floor(sqrt(x)) EXACTLY even where
    double rounding drifts at perfect-square boundaries. Pure
    projection; DuckDB replays the identical correction."""
    s = F.floor(F.sqrt(x.cast("double"))).cast("long")
    s = F.when((s + 1) * (s + 1) <= x, s + 1).otherwise(s)
    return F.when(s * s > x, s - 1).otherwise(s)


def plan_alpha_mixture(
    docs: DataFrame,
    budget: int = ALPHA_BUDGET,
    *,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled multilingual sampling, alpha = 1/2 (the XLM
    recipe, Lample & Conneau 2019: sample language l with probability
    proportional to p_l^alpha — flattening the head so low-resource
    languages keep signal; alpha=0.5 is their BPE-sampling setting and
    the one alpha with an EXACT integer form, weight = isqrt(tokens)).
    Quotas via the largest-remainder apportionment (ml/apportion.py),
    so per-language integer token budgets sum exactly."""
    from readur_spark.ml.apportion import apportion_budget

    per_lang = (
        docs.select(
            lang_col, F.size(F.split(F.col(text_col), " ")).alias("n_tok")
        )
        .groupBy(lang_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
    scored = per_lang.withColumn("weight", isqrt_col(F.col("n_tokens")))
    plan = apportion_budget(
        scored.select(lang_col, "weight"),
        budget,
        host_col=lang_col,
        score_col="weight",
    )
    return (
        scored.select(lang_col, "n_docs", "n_tokens")
        .join(plan, lang_col)
        .select(
            lang_col,
            "n_docs",
            "n_tokens",
            F.col("weight").cast("long").alias("weight"),
            F.col("quota").alias("token_quota"),
        )
    )


@register(
    "mixture_alpha_plan",
    oracle=f"""
    WITH y AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ), s AS (
      SELECT *,
        CASE
          WHEN (CAST(floor(sqrt(n_tokens::DOUBLE)) AS BIGINT) + 1)
               * (CAST(floor(sqrt(n_tokens::DOUBLE)) AS BIGINT) + 1)
               <= n_tokens
            THEN CAST(floor(sqrt(n_tokens::DOUBLE)) AS BIGINT) + 1
          WHEN CAST(floor(sqrt(n_tokens::DOUBLE)) AS BIGINT)
               * CAST(floor(sqrt(n_tokens::DOUBLE)) AS BIGINT) > n_tokens
            THEN CAST(floor(sqrt(n_tokens::DOUBLE)) AS BIGINT) - 1
          ELSE CAST(floor(sqrt(n_tokens::DOUBLE)) AS BIGINT)
        END AS weight
      FROM y
    ), t AS (
      SELECT CAST(sum(weight) AS BIGINT) AS S FROM s WHERE weight > 0
    ), d AS (
      SELECT lang, n_docs, n_tokens, weight,
             ({ALPHA_BUDGET} * weight) // t.S AS fl,
             ({ALPHA_BUDGET} * weight) % t.S AS rem
      FROM s, t WHERE weight > 0
    ), lo AS (
      SELECT {ALPHA_BUDGET} - CAST(sum(fl) AS BIGINT) AS k FROM d
    ), r AS (
      SELECT lang, row_number() OVER (ORDER BY rem DESC, lang) AS rk FROM d
    )
    SELECT d.lang, d.n_docs, d.n_tokens,
           CAST(d.weight AS BIGINT) AS weight,
           CAST(d.fl + CASE WHEN r.rk <= lo.k THEN 1 ELSE 0 END AS BIGINT)
             AS token_quota
    FROM d JOIN r USING (lang), lo
    UNION ALL
    SELECT lang, n_docs, n_tokens, CAST(weight AS BIGINT),
           CAST(0 AS BIGINT)
    FROM s WHERE weight <= 0
    """,
)
def mixture_alpha_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """alpha=0.5 language-sampling quotas over the real corpus lang
    column: token rollup, exact integer sqrt (including the boundary
    correction), floors, remainders, and the leftover election all
    replayed in DuckDB."""
    return plan_alpha_mixture(load(spark, sf_dir, "documents"))


# ---- UniMax language sampling (r5s11) --------------------------------------

UNIMAX_EPOCH_CAP = 3          # per-language epoch ceiling E
UNIMAX_BUDGET_DIV = 2         # demo budget B = total tokens div 2


def plan_unimax(
    df: DataFrame,
    *,
    budget: Column | None = None,
    epoch_cap: int = UNIMAX_EPOCH_CAP,
) -> DataFrame:
    """UniMax language-sampling quotas (Chung et al. 2023): distribute
    a token budget UNIFORMLY over languages, capping each language at
    `epoch_cap` epochs of its corpus — the fairness-first alternative
    to temperature/alpha tilting that never over-repeats a low-
    resource language.

    Exact-integer closed form of the paper's iterative waterfill:
    sort languages by capacity cap_l = n_tokens·E ascending; language
    i (1-based, L langs) is CAPPED iff every j ≤ i satisfies
    cap_j ≤ (B − prefix_cap(j−1)) div (L − j + 1) (the fair share at
    its turn); the first uncapped language freezes the share tier:
    share = (B − prefix_cap(k)) div (L − k) with the Hamilton
    remainder (+1 to the first `rem` uncapped languages in sort
    order). Σ alloc == min(B, Σ cap) exactly.

    Scale: ONE grouped corpus pass for token counts; everything after
    runs on the |langs|-row frame (two windows, no payload).
    """
    counts = (
        df.select(
            "lang",
            F.size(
                F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
            ).cast("long").alias("t"),
        )
        .groupBy("lang")
        .agg(F.sum("t").alias("n_tokens"))
    )
    total = counts.agg(
        F.sum("n_tokens").alias("tot"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    b = (
        budget
        if budget is not None
        else F.expr(f"tot div {UNIMAX_BUDGET_DIV}")
    )
    base = counts.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_tokens",
        (F.col("n_tokens") * epoch_cap).alias("cap"),
        b.cast("long").alias("budget"),
        F.col("n_langs").cast("long").alias("n_langs"),
    )
    w = Window.orderBy("cap", "lang")
    ranked = base.select(
        "*",
        F.row_number().over(w).alias("i"),
        (F.sum("cap").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ) - F.col("cap")).alias("pref"),
    )
    # capped iff fair share at its turn still exceeds its cap, AND all
    # cheaper languages are capped (monotone: the predicate itself is
    # monotone in i because caps are sorted — a min-prefix window
    # makes the cut explicit and exactly SQL-replayable)
    flagged = ranked.withColumn(
        "is_capped_here",
        F.expr("cap <= (budget - pref) div (n_langs - i + 1)"),
    ).withColumn(
        "capped",
        F.min(F.when(F.col("is_capped_here"), 1).otherwise(0)).over(
            Window.orderBy("cap", "lang").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        == 1,
    )
    agg_capped = flagged.agg(
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("cap"))), F.lit(0)
        ).alias("cap_sum"),
        F.coalesce(
            F.sum(F.when(F.col("capped"), 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("k"),
    )
    out = flagged.crossJoin(F.broadcast(agg_capped)).select(
        "lang",
        "n_tokens",
        "cap",
        "capped",
        "i",
        "k",
        F.col("budget"),
        F.expr(
            "if(n_langs = k, 0L, (budget - cap_sum) div (n_langs - k))"
        ).alias("share"),
        F.expr(
            "if(n_langs = k, 0L, (budget - cap_sum) % (n_langs - k))"
        ).alias("rem"),
    )
    return out.select(
        "lang",
        "n_tokens",
        "cap",
        "capped",
        F.expr(
            "if(capped, cap, share + if(i - k <= rem, 1L, 0L))"
        ).alias("alloc"),
    ).withColumn(
        "epochs_milli", F.expr("(1000L * alloc) div n_tokens")
    )


_UNIMAX_ORACLE = f"""
WITH counts AS (
  SELECT lang,
         CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                  t -> t <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
         count(*) AS n_langs
  FROM counts
), base AS (
  SELECT lang, n_tokens, n_tokens * {UNIMAX_EPOCH_CAP} AS cap,
         tot // {UNIMAX_BUDGET_DIV} AS budget, n_langs
  FROM counts CROSS JOIN tot
), ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY cap, lang) AS i,
         CAST(coalesce(sum(cap) OVER (ORDER BY cap, lang
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS pref
  FROM base
), flagged AS (
  SELECT *,
         min(CASE WHEN cap <= (budget - pref) // (n_langs - i + 1)
                  THEN 1 ELSE 0 END)
           OVER (ORDER BY cap, lang ROWS UNBOUNDED PRECEDING) = 1
           AS capped
  FROM ranked
), kk AS (
  SELECT CAST(coalesce(sum(CASE WHEN capped THEN cap END), 0) AS BIGINT)
           AS cap_sum,
         CAST(coalesce(sum(CASE WHEN capped THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS k
  FROM flagged
)
SELECT lang, n_tokens, CAST(cap AS BIGINT) AS cap, capped,
       CAST(CASE WHEN capped THEN cap
            ELSE (budget - cap_sum) // (n_langs - k)
                 + CASE WHEN i - k <= (budget - cap_sum) % (n_langs - k)
                        THEN 1 ELSE 0 END END AS BIGINT) AS alloc,
       CAST((1000 * CASE WHEN capped THEN cap
            ELSE (budget - cap_sum) // (n_langs - k)
                 + CASE WHEN i - k <= (budget - cap_sum) % (n_langs - k)
                        THEN 1 ELSE 0 END END) // n_tokens AS BIGINT)
         AS epochs_milli
FROM flagged CROSS JOIN kk
"""


@register("mixture_unimax_plan", oracle=_UNIMAX_ORACLE)
def mixture_unimax_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax quotas over the real corpus lang column, value-hashed:
    DuckDB replays the token rollup, the sorted waterfill cut, the
    share tier, and the Hamilton remainder."""
    return plan_unimax(load(spark, sf_dir, "documents"))
