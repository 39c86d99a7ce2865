"""Distributed BPE merge learning over the corpus word-count table.

Byte-pair-encoding tokenizer training (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016 — the recipe
behind GPT-2/RoBERTa vocabularies) re-expressed as iterated Catalyst
aggregations. The reference engine (yonasBSD/readur) counts words for
OCR quality (src/ocr/enhanced.rs word-count sampling, mirrored in
kernels/text.py A31); training a subword vocabulary over the extracted
corpus is the training-pipeline extension of the same counting surface.

Algorithm, exactly the published one:
  1. ONE corpus pass builds the word-frequency table (map-side
     combinable groupBy — the classic BPE-from-word-counts reduction:
     every subsequent step runs over the COMPACT (word, n) vocabulary,
     never the corpus);
  2. each word is represented as its symbol sequence, initially
     characters;
  3. per merge step: count adjacent symbol pairs weighted by word
     frequency, take the most frequent pair (ties broken
     deterministically: count desc, then left/right symbol asc), and
     fuse every left-to-right non-overlapping occurrence.

Cross-engine exactness comes from the REPRESENTATION: a word's symbol
sequence is a single string with two-space separators and two-space
boundaries ("abc" -> "  a  b  c  "). Fusing pair (a, b) is then the
plain literal replace of " a  b " with " ab " — and because each match
consumes ONE space from each flank of the double separator, the
double-separator invariant survives every replacement, and the engines'
shared left-to-right non-overlapping replace() semantics implement
greedy BPE application exactly (" a  b  a  b " -> " ab  ab ";
"  a  a  a  " under (a,a) -> "  aa  a  ", the canonical greedy result).
Symbols are [a-z]+ so the space separator can never collide.

Scale design (10^12 docs):
  - the corpus is touched ONCE (the word-count groupBy, partial-agg
    combinable); the iteration state is the distinct-word table —
    millions of rows, not trillions — persisted so step k does not
    re-run the corpus scan;
  - each merge step is two narrow shuffles over that compact table
    (pair explode + groupBy(a, b), then a 1-row TakeOrdered argmax);
    the merge application is a pure projection (no shuffle);
  - K nested replace() projections grow the lineage linearly; for
    production-size K (tens of thousands) the loop would checkpoint
    every ~64 steps — here K stays small and lineage is bounded;
  - encoding documents with a learned table is a broadcast join of the
    final (word -> token count / tokens) vocabulary onto the slim
    (doc_id, word) stream — the payload never rides the explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from readur_spark.ml.quality_lm import tokenize_alpha
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# default merge budget for the registered queries: small enough that
# the DuckDB oracle (K chained CTEs) stays cheap, large enough that
# merges cascade (later merges consume earlier merged symbols).
DEFAULT_NUM_MERGES = 8

_PAIR_STRUCT = "array<struct<a:string,b:string>>"


def word_to_rep(word: Column) -> Column:
    """Initial symbol representation: two-space separators/boundaries
    ("abc" -> "  a  b  c  ")."""
    return F.concat(F.lit("  "), F.regexp_replace(word, "(.)", "$1  "))


def rep_symbols(rep: Column) -> Column:
    """Symbol array from a representation string."""
    return F.filter(F.split(rep, "  "), lambda x: x != F.lit(""))


def _adjacent_pairs(rep: Column) -> Column:
    syms = rep_symbols(rep)
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast(_PAIR_STRUCT))


def apply_merge(rep: Column, left: str, right: str) -> Column:
    """Fuse every left-to-right non-overlapping (left, right) pair —
    the literal replace described in the module docstring."""
    return F.replace(
        rep,
        F.lit(f" {left}  {right} "),
        F.lit(f" {left}{right} "),
    )


def word_counts(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(w, n) corpus word-frequency table — the one corpus pass."""
    return (
        docs.select(F.explode(tokenize_alpha(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )


def learn_bpe_merges(
    docs: DataFrame,
    num_merges: int = DEFAULT_NUM_MERGES,
    *,
    text_col: str = "text",
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn `num_merges` BPE merges from the corpus.

    Returns (merges, final_vocab): merges as [(step, left, right,
    pair_count)] and the final (w, rep, n) word table with all merges
    applied (the encoder's lookup table). Stops early only if the
    vocabulary runs out of adjacent pairs entirely."""
    vocab = docs.sparkSession.createDataFrame([], "w string, rep string, n long")
    base = word_counts(docs, text_col=text_col).select(
        "w", word_to_rep(F.col("w")).alias("rep"), "n"
    )
    base = base.persist()
    # right-size the iteration layout: a compact vocabulary on the
    # default shuffle partitioning pays per-task scheduling K times
    # over; ~100k rows/partition keeps each merge round one short task
    # per core (and one task total for small corpora).
    n_words = base.count()
    parts = max(1, n_words // 100_000)
    if parts < base.rdd.getNumPartitions():
        packed = base.coalesce(parts).persist()
        packed.count()
        base.unpersist()
        base = packed
    try:
        cur = base
        merges: list[tuple[int, str, str, int]] = []
        for step in range(1, num_merges + 1):
            top = (
                cur.select(F.explode(_adjacent_pairs(F.col("rep"))).alias("p"), "n")
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("n").alias("cnt"))
                .orderBy(F.col("cnt").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
            merges.append((step, a, b, cnt))
            cur = cur.select(
                "w", apply_merge(F.col("rep"), a, b).alias("rep"), "n"
            )
        vocab = cur
        return merges, vocab
    finally:
        # NOTE: `vocab` still reads through `base`; the caller consumes
        # it within the same lineage. unpersist() only drops the cache
        # hint, it does not invalidate the plan.
        base.unpersist()


def encode_token_counts(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    count_oov: bool = False,
) -> DataFrame:
    """Per-document word and BPE-token counts under a learned vocab:
    (id_col, n_words, n_bpe_tokens). The per-word token count is
    precomputed on the compact vocab and BROADCAST onto the slim
    (id, word) stream — the corpus-side explode never shuffles on the
    word key. Documents with zero alphabetic words carry no tokens and
    are excluded (consistent with the LM tier's evidence rule).

    `count_oov=True` scores words outside the learned vocab at their
    base (character-level) symbol count — real BPE semantics, since
    every single character is in the base vocabulary. The default
    drops them, matching the registered oracle twins (whose corpus IS
    the training corpus, so OOV cannot occur there)."""
    per_word = vocab.select(
        "w", F.size(rep_symbols(F.col("rep"))).alias("n_tok")
    )
    words = docs.select(
        F.col(id_col), F.explode(tokenize_alpha(F.col(text_col))).alias("w")
    )
    if count_oov:
        scored = words.join(F.broadcast(per_word), "w", "left").select(
            id_col,
            F.coalesce(F.col("n_tok"), F.length("w")).alias("n_tok"),
        )
    else:
        scored = words.join(F.broadcast(per_word), "w")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tok").alias("n_bpe_tokens"),
        )
    )


# ---- oracle twins --------------------------------------------------------


def _oracle_chain(num_merges: int) -> str:
    """Shared CTE prefix: words, w0, then (p_k, m_k, w_k) per step —
    the DuckDB replay of the exact learn loop (same representation,
    same replace, same tie-break)."""
    sql = r"""
    WITH words AS MATERIALIZED (
      SELECT t.w AS w, count(*) AS n
      FROM documents,
           UNNEST(list_filter(
             regexp_split_to_array(lower(text), '[^a-z]+'),
             x -> x <> '')) AS t(w)
      GROUP BY t.w
    ),
    w0 AS MATERIALIZED (
      SELECT w, '  ' || regexp_replace(w, '(.)', '\1  ', 'g') AS rep, n
      FROM words
    )"""
    for s in range(1, num_merges + 1):
        p = s - 1
        sql += f""",
    p{s} AS MATERIALIZED (
      SELECT s.syms[r.i] AS a, s.syms[r.i + 1] AS b,
             CAST(sum(n) AS BIGINT) AS cnt
      FROM (SELECT list_filter(string_split(rep, '  '), x -> x <> '')
              AS syms, n FROM w{p}) s,
           UNNEST(range(1, len(s.syms))) AS r(i)
      GROUP BY a, b
    ),
    m{s} AS MATERIALIZED (SELECT a, b, cnt FROM p{s} ORDER BY cnt DESC, a, b LIMIT 1),
    w{s} AS MATERIALIZED (
      -- the CASE mirrors the learner's early break: when the corpus
      -- runs out of adjacent pairs before num_merges steps, m{s} is
      -- empty and its scalar subqueries are NULL — an unguarded
      -- replace would then nullify every rep and diverge from Spark.
      SELECT w, CASE WHEN (SELECT count(*) FROM m{s}) = 0 THEN rep
               ELSE replace(rep,
               ' ' || (SELECT a FROM m{s}) || '  '
                   || (SELECT b FROM m{s}) || ' ',
               ' ' || (SELECT a FROM m{s})
                   || (SELECT b FROM m{s}) || ' ') END AS rep, n
      FROM w{p}
    )"""
    return sql


def _merges_oracle(num_merges: int) -> str:
    union = " UNION ALL ".join(
        f"SELECT {s} AS step, a AS left_sym, b AS right_sym,"
        f" cnt AS pair_count FROM m{s}"
        for s in range(1, num_merges + 1)
    )
    return _oracle_chain(num_merges) + f"\n    SELECT * FROM ({union})"


def _encode_oracle(num_merges: int) -> str:
    return _oracle_chain(num_merges) + f""",
    per_word AS MATERIALIZED (
      SELECT w, CAST(len(list_filter(string_split(rep, '  '),
                                     x -> x <> '')) AS INT) AS n_tok
      FROM w{num_merges}
    ),
    doc_words AS (
      SELECT doc_id, t.w AS w
      FROM documents,
           UNNEST(list_filter(
             regexp_split_to_array(lower(text), '[^a-z]+'),
             x -> x <> '')) AS t(w)
    )
    SELECT doc_id, count(*) AS n_words,
           CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens
    FROM doc_words JOIN per_word USING (w)
    GROUP BY doc_id
    """


# ---- driver-contract queries ----------------------------------------------


@register("bpe_learn_merges", oracle=_merges_oracle(DEFAULT_NUM_MERGES))
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First `DEFAULT_NUM_MERGES` BPE merges learned from the documents
    corpus, value-hash-checked: the DuckDB twin replays the word-count
    reduction, the double-space representation, the argmax tie-break,
    and every greedy replace, step for step."""
    docs = load(spark, sf_dir, "documents")
    merges, _ = learn_bpe_merges(docs, DEFAULT_NUM_MERGES)
    schema = T.StructType(
        [
            T.StructField("step", T.IntegerType()),
            T.StructField("left_sym", T.StringType()),
            T.StructField("right_sym", T.StringType()),
            T.StructField("pair_count", T.LongType()),
        ]
    )
    return spark.createDataFrame(merges, schema=schema)


@register("bpe_doc_token_counts", oracle=_encode_oracle(DEFAULT_NUM_MERGES))
def bpe_doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token counts under the corpus-learned merge
    table — the tokenizer-aware cost model a mixture planner needs
    (tokens, not words, are the training budget unit)."""
    docs = load(spark, sf_dir, "documents")
    _, vocab = learn_bpe_merges(docs, DEFAULT_NUM_MERGES)
    return encode_token_counts(docs, vocab).select(
        "doc_id", "n_words", "n_bpe_tokens"
    )


def _fertility_oracle(num_merges: int) -> str:
    return _oracle_chain(num_merges) + f""",
    per_word AS MATERIALIZED (
      SELECT w, CAST(len(list_filter(string_split(rep, '  '),
                                     x -> x <> '')) AS BIGINT) AS n_tok
      FROM w{num_merges}
    ),
    doc_words AS (
      SELECT doc_id, lang, t.w AS w
      FROM documents,
           UNNEST(list_filter(
             regexp_split_to_array(lower(text), '[^a-z]+'),
             x -> x <> '')) AS t(w)
    )
    SELECT lang, count(*) AS n_words,
           CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
           CAST((100 * sum(n_tok)) // count(*) AS BIGINT)
             AS fertility_centi
    FROM doc_words JOIN per_word USING (w)
    GROUP BY lang
    """


@register("bpe_fertility_by_lang", oracle=_fertility_oracle(DEFAULT_NUM_MERGES))
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (BPE tokens per word, in centi-tokens) per
    language under the corpus-learned merge table — the per-language
    cost signal a token-budgeted mixture planner prices languages with
    (a high-fertility language consumes more budget per word). Exact:
    integer ratio over the same broadcast vocab as the encode path."""
    docs = load(spark, sf_dir, "documents")
    _, vocab = learn_bpe_merges(docs, DEFAULT_NUM_MERGES)
    per_word = vocab.select(
        "w", F.size(rep_symbols(F.col("rep"))).cast("long").alias("n_tok")
    )
    words = docs.select(
        "lang", F.explode(tokenize_alpha(F.col("text"))).alias("w")
    )
    return (
        words.join(F.broadcast(per_word), "w")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tok").alias("n_bpe_tokens"),
        )
        .select(
            "lang",
            "n_words",
            "n_bpe_tokens",
            F.expr("(100L * n_bpe_tokens) div n_words").alias(
                "fertility_centi"
            ),
        )
    )
