"""Distributed unigram-LM (SentencePiece-style) subword tokenizer.

The unigram language-model tokenizer (Kudo, "Subword Regularization:
Improving Neural Network Translation Models with Multiple Subword
Candidates", ACL 2018 — the model behind SentencePiece/T5/LLaMA
vocabularies) as the sibling of `ml/bpe.py`: where BPE grows a
vocabulary bottom-up by merging, unigram starts from a large seed
vocabulary and alternates (segment under current piece scores) /
(re-score pieces from usage) — hard-EM with Viterbi segmentation, the
documented variant of Kudo's E-M. The reference engine counts words
for OCR quality (src/ocr/enhanced.rs sampling, kernels/text.py A31);
training a subword vocabulary over the extracted corpus is the
training-pipeline extension of that counting surface.

Algorithm (every constant pinned so the DuckDB oracle replays it):
  1. ONE corpus pass builds the word-frequency table (reused from
     ml/bpe.word_counts — map-side combinable);
  2. seed vocabulary: every substring of length <= MAX_PIECE_LEN,
     scored by occurrence-weighted corpus frequency; keep the top
     SEED_MULTI multi-char pieces (score desc, piece asc) plus ALL
     single characters (so every word stays segmentable);
  3. piece weight w_p = L2(c_p) - L2(C) where L2 is the EXACT
     integer 16.log2 (the mantissa-squaring kernel shared with
     operators/posting.log2_sixteenths) and C = sum of vocab counts —
     fixed-point log-probabilities, no libm anywhere;
  4. EM_ROUNDS rounds of hard EM:
       E: Viterbi-best segmentation of each distinct word
          (argmax of sum(w_p); ties -> lexicographically smallest
          space-joined segmentation — per-position pruning is exact
          for this order because two same-position prefixes are never
          string-prefixes of each other);
       M: usage counts from the best segmentations (occurrence x word
          frequency); next vocab = top KEEP_MULTI multi-char pieces
          by (used desc, piece asc) + all corpus single chars at
          max(used, 1) (add-one floor keeps dropped chars encodable);
  5. encode: per-word piece counts under the final vocab, broadcast
     onto the exploded (doc_id, word) stream.

Scale design (10^12 docs): the corpus is touched once (word counts)
plus once at encode (the broadcast join); ALL iteration state lives on
the compact distinct-word table. The Viterbi DP is per-row Python by
nature (an O(len x MAX_PIECE_LEN) loop), so it runs ONLY on that
compact table inside one Arrow-batched mapInPandas — never on the
corpus — with the <=(SEED_MULTI+26)-entry vocab dict shipped in the
closure. The M-step usage aggregate is a slim groupBy; the collected
frames are vocab-bounded (<=80 rows) by construction.

Correctness: the oracles replay the WHOLE pipeline in DuckDB — seed
scoring via substring UNNEST, the 16.log2 CTE chain bit-for-bit, and
each round's segmentation by exhaustive recursive-CTE path enumeration
with the same (score desc, seg asc) argmax. Exhaustive enumeration is
tractable because segmentation runs on DISTINCT WORDS (compositions of
len<=8 with parts<=4 -> <=108 paths/word), not documents.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.ml.bpe import word_counts
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

MAX_PIECE_LEN = 4
SEED_MULTI = 48
KEEP_MULTI = 32
EM_ROUNDS = 2


def log2_16(x: int) -> int:
    """Exact floor(16.log2(x)) for x >= 1 — the Python twin of
    operators/posting.log2_sixteenths (same mantissa-squaring steps,
    same rounding at every bit)."""
    e = x.bit_length() - 1
    m = (x * 256) // (1 << e)
    fb = 0
    for _ in range(4):
        m = m * m // 256
        b = 1 if m >= 512 else 0
        if b:
            m //= 2
        fb = fb * 2 + b
    return e * 16 + fb


def piece_weights(counts: dict[str, int]) -> dict[str, int]:
    """Fixed-point log-prob weights: w_p = L2(c_p) - L2(sum c)."""
    total = sum(counts.values())
    lt = log2_16(total)
    return {p: log2_16(c) - lt for p, c in counts.items()}


def candidate_pieces(
    words: DataFrame, max_len: int = MAX_PIECE_LEN
) -> DataFrame:
    """(piece, score): every substring occurrence of length <= max_len
    weighted by word frequency — pure Catalyst (position x length
    span table per word, exploded and aggregated)."""
    spans = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.lit(max_len)),
                    lambda l: F.when(
                        i + l - F.lit(1) <= F.length("w"),
                        F.col("w").substr(i, l),
                    ),
                ),
                lambda x: x.isNotNull(),
            ),
        )
    )
    return (
        words.select(F.explode(spans).alias("piece"), "n")
        .groupBy("piece")
        .agg(F.sum("n").alias("score"))
    )


def viterbi_best(
    word: str, weights: dict[str, int], max_len: int = MAX_PIECE_LEN
) -> tuple[int, str]:
    """(score_fp, segmentation) maximizing sum(w_p), ties broken by
    the lexicographically smallest space-joined segmentation. Exact
    per-position pruning (see module docstring)."""
    best: list[tuple[int, str] | None] = [None] * (len(word) + 1)
    best[0] = (0, "")
    for j in range(1, len(word) + 1):
        cand: tuple[int, str] | None = None
        for l in range(1, min(max_len, j) + 1):
            prev = best[j - l]
            if prev is None:
                continue
            p = word[j - l : j]
            wp = weights.get(p)
            if wp is None:
                continue
            sc = prev[0] + wp
            seg = p if prev[1] == "" else prev[1] + " " + p
            if (
                cand is None
                or sc > cand[0]
                or (sc == cand[0] and seg < cand[1])
            ):
                cand = (sc, seg)
        best[j] = cand
    out = best[len(word)]
    if out is None:  # unreachable while single chars stay in vocab
        raise ValueError(f"unsegmentable word: {word!r}")
    return out


def viterbi_segment(
    words: DataFrame, weights: dict[str, int]
) -> DataFrame:
    """(w, n, seg, n_pieces, score_fp) over the DISTINCT-WORD table —
    the one Python stage, Arrow-batched, vocab dict in the closure."""
    wts = dict(weights)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            segs, nps, scs = [], [], []
            for w in pdf["w"]:
                sc, seg = viterbi_best(w, wts)
                segs.append(seg)
                nps.append(seg.count(" ") + 1)
                scs.append(sc)
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "n": pdf["n"],
                    "seg": segs,
                    "n_pieces": nps,
                    "score_fp": scs,
                }
            )

    return words.mapInPandas(
        run, "w string, n long, seg string, n_pieces long, score_fp long"
    )


def learn_unigram_vocab(
    docs: DataFrame,
    *,
    rounds: int = EM_ROUNDS,
    seed_multi: int = SEED_MULTI,
    keep_multi: int = KEEP_MULTI,
    text_col: str = "text",
) -> tuple[dict[str, int], dict[str, int], DataFrame]:
    """Run seed + `rounds` hard-EM rounds; returns (counts, weights,
    words) where counts/weights are the final vocabulary (piece ->
    count / fixed-point weight) and words is the persisted
    distinct-word frame for downstream encode."""
    words = word_counts(docs, text_col=text_col).persist()
    cand = candidate_pieces(words).persist()
    try:
        singles = {
            r["piece"]: int(r["score"])
            for r in cand.filter(F.length("piece") == 1).collect()
        }
        multi = cand.filter(F.length("piece") > 1).orderBy(
            F.col("score").desc(), "piece"
        ).limit(seed_multi)
        counts = {
            **{r["piece"]: int(r["score"]) for r in multi.collect()},
            **singles,
        }
        for _ in range(rounds):
            seg = viterbi_segment(words, piece_weights(counts))
            usage = {
                r["piece"]: int(r["used"])
                for r in seg.select(
                    F.explode(F.split("seg", " ")).alias("piece"), "n"
                )
                .groupBy("piece")
                .agg(F.sum("n").alias("used"))
                .collect()
            }
            kept = sorted(
                ((p, u) for p, u in usage.items() if len(p) > 1),
                key=lambda t: (-t[1], t[0]),
            )[:keep_multi]
            counts = {
                **dict(kept),
                **{p: max(usage.get(p, 0), 1) for p in singles},
            }
        return counts, piece_weights(counts), words
    finally:
        cand.unpersist()


def encode_doc_token_counts(
    docs: DataFrame,
    words_seg: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_pieces): per-word piece counts precomputed on
    the compact word table and BROADCAST onto the exploded corpus
    stream — the corpus side never shuffles on the word key and never
    enters Python."""
    from readur_spark.ml.quality_lm import tokenize_alpha

    per_word = words_seg.select("w", "n_pieces")
    stream = docs.select(
        F.col(id_col), F.explode(tokenize_alpha(F.col(text_col))).alias("w")
    )
    return (
        stream.join(F.broadcast(per_word), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle: full-pipeline replay
# ---------------------------------------------------------------------------


def _l2_chain(pfx: str, src: str) -> str:
    """CTE chain: {src}(piece, cnt) -> {pfx}w(piece, pl, w_fp) via the
    exact 16.log2 algorithm; the vocab total rides along as a chr(1)
    pseudo-row (chr(1) sorts below every [a-z] piece and cannot occur
    as a piece)."""
    steps = [
        f"""{pfx}t AS (
      SELECT piece, cnt FROM {src}
      UNION ALL SELECT chr(1), (SELECT sum(cnt) FROM {src})
    ),
    {pfx}0 AS (
      SELECT piece, length(bin(cnt)) - 1 AS e,
             (cnt * 256) // (CAST(1 AS BIGINT)
               << (length(bin(cnt)) - 1)) AS m,
             0 AS fb
      FROM {pfx}t
    )"""
    ]
    for i in range(4):
        steps.append(
            f"""{pfx}{i + 1} AS (
      SELECT piece, e,
             CASE WHEN (m * m) // 256 >= 512
                  THEN ((m * m) // 256) // 2
                  ELSE (m * m) // 256 END AS m,
             fb * 2 + CASE WHEN (m * m) // 256 >= 512
                           THEN 1 ELSE 0 END AS fb
      FROM {pfx}{i}
    )"""
        )
    steps.append(
        f"""{pfx}s AS (SELECT piece, e * 16 + fb AS sb FROM {pfx}4),
    {pfx}w AS (
      SELECT s.piece, length(s.piece) AS pl,
             s.sb - (SELECT sb FROM {pfx}s WHERE piece = chr(1)) AS w_fp
      FROM {pfx}s AS s WHERE s.piece <> chr(1)
    )"""
    )
    return ",\n    ".join(steps)


def _paths(pfx: str, vocab_w: str) -> str:
    """Recursive exhaustive segmentation of every word under
    {vocab_w}(piece, pl, w_fp) -> {pfx}seg(w, n, seg, score_fp)."""
    return f"""{pfx}paths AS (
      SELECT w, n, 0 AS pos, CAST(0 AS BIGINT) AS sc, '' AS seg
      FROM words
      UNION ALL
      SELECT p.w, p.n, p.pos + v.pl, p.sc + v.w_fp,
             CASE WHEN p.seg = '' THEN v.piece
                  ELSE p.seg || ' ' || v.piece END
      FROM {pfx}paths p JOIN {vocab_w} v
        ON substr(p.w, p.pos + 1, v.pl) = v.piece
      WHERE p.pos < length(p.w)
    ),
    {pfx}best AS (
      SELECT w, n, sc, seg,
             row_number() OVER (
               PARTITION BY w ORDER BY sc DESC, seg ASC
             ) AS rn
      FROM {pfx}paths WHERE pos = length(w)
    ),
    {pfx}seg AS (
      SELECT w, n, seg, sc AS score_fp FROM {pfx}best WHERE rn = 1
    )"""


def _oracle_prefix() -> str:
    """words -> seed vocab -> EM_ROUNDS replays -> final vocab v2c/v2w
    and final segmentation r2seg (named for EM_ROUNDS = 2)."""
    sql = f"""
    WITH RECURSIVE
    words AS MATERIALIZED (
      SELECT t.w AS w, count(*) AS n
      FROM documents,
           UNNEST(list_filter(
             regexp_split_to_array(lower(text), '[^a-z]+'),
             x -> x <> '')) AS t(w)
      GROUP BY t.w
    ),
    cand AS MATERIALIZED (
      SELECT substr(w, ii, ll) AS piece, CAST(sum(n) AS BIGINT) AS score
      FROM words,
           UNNEST(range(1, length(w) + 1)) AS i(ii),
           UNNEST(range(1, {MAX_PIECE_LEN + 1})) AS l(ll)
      WHERE ii + ll - 1 <= length(w)
      GROUP BY piece
    ),
    v0c AS MATERIALIZED (
      SELECT piece, score AS cnt FROM (
        SELECT piece, score FROM cand WHERE length(piece) > 1
        ORDER BY score DESC, piece LIMIT {SEED_MULTI})
      UNION ALL
      SELECT piece, score FROM cand WHERE length(piece) = 1
    ),
    {_l2_chain("v0l", "v0c")},
    {_paths("r0", "v0lw")}"""
    for r in range(1, EM_ROUNDS + 1):
        prev = f"r{r - 1}seg"
        sql += f""",
    u{r} AS MATERIALIZED (
      SELECT t.p AS piece, CAST(sum(n) AS BIGINT) AS used
      FROM {prev}, UNNEST(string_split(seg, ' ')) AS t(p)
      GROUP BY t.p
    ),
    v{r}c AS MATERIALIZED (
      SELECT piece, used AS cnt FROM (
        SELECT piece, used FROM u{r} WHERE length(piece) > 1
        ORDER BY used DESC, piece LIMIT {KEEP_MULTI})
      UNION ALL
      SELECT c.piece, greatest(coalesce(u.used, 0), CAST(1 AS BIGINT))
        AS cnt
      FROM (SELECT piece FROM cand WHERE length(piece) = 1) c
      LEFT JOIN u{r} u USING (piece)
    ),
    {_l2_chain(f"v{r}l", f"v{r}c")},
    {_paths(f"r{r}", f"v{r}lw")}"""
    return sql


_FINAL_VOCAB = f"v{EM_ROUNDS}c"
_FINAL_W = f"v{EM_ROUNDS}lw"
_FINAL_SEG = f"r{EM_ROUNDS}seg"


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

_CACHE: dict[str, tuple[dict[str, int], dict[str, int], DataFrame]] = {}


def _learned(spark: SparkSession, sf_dir: str):
    if sf_dir not in _CACHE:
        docs = load(spark, sf_dir, "documents")
        _CACHE[sf_dir] = learn_unigram_vocab(docs)
    return _CACHE[sf_dir]


@register(
    "unigram_learn_vocab",
    oracle=_oracle_prefix()
    + f"""
    SELECT c.piece, c.cnt, w.w_fp
    FROM {_FINAL_VOCAB} c JOIN {_FINAL_W} w USING (piece)
    """,
)
def unigram_learn_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final unigram vocabulary after seed + 2 hard-EM rounds:
    (piece, cnt, w_fp). The oracle replays seeding, both rounds'
    exhaustive-path segmentations, usage re-scoring, and the 16.log2
    chain bit-for-bit."""
    counts, weights, _ = _learned(spark, sf_dir)
    rows = [(p, counts[p], weights[p]) for p in sorted(counts)]
    return spark.createDataFrame(rows, "piece string, cnt long, w_fp long")


@register(
    "unigram_word_segmentation",
    oracle=_oracle_prefix()
    + f"""
    SELECT w, seg,
           CAST(length(seg) - length(replace(seg, ' ', '')) + 1
                AS BIGINT) AS n_pieces,
           score_fp
    FROM {_FINAL_SEG}
    """,
)
def unigram_word_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi segmentation of every distinct corpus word under the
    final vocabulary — the DP itself value-hashed against exhaustive
    path enumeration."""
    _, weights, words = _learned(spark, sf_dir)
    return viterbi_segment(words, weights).select(
        "w", "seg", "n_pieces", "score_fp"
    )


@register(
    "unigram_doc_token_counts",
    oracle=_oracle_prefix()
    + f"""
    , np AS (
      SELECT w,
             CAST(length(seg) - length(replace(seg, ' ', '')) + 1
                  AS BIGINT) AS n_pieces
      FROM {_FINAL_SEG}
    ),
    dw AS (
      SELECT doc_id, t.w AS w
      FROM documents,
           UNNEST(list_filter(
             regexp_split_to_array(lower(text), '[^a-z]+'),
             x -> x <> '')) AS t(w)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(np.n_pieces) AS BIGINT) AS n_pieces
    FROM dw JOIN np USING (w)
    GROUP BY doc_id
    """,
)
def unigram_doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document word and unigram-piece counts under the learned
    vocabulary (the BPE fertility surface's unigram twin)."""
    _, weights, words = _learned(spark, sf_dir)
    seg = viterbi_segment(words, weights)
    docs = load(spark, sf_dir, "documents")
    return encode_doc_token_counts(docs, seg)


@register(
    "unigram_fertility_by_lang",
    oracle=_oracle_prefix()
    + f"""
    , np AS (
      SELECT w,
             CAST(length(seg) - length(replace(seg, ' ', '')) + 1
                  AS BIGINT) AS n_pieces
      FROM {_FINAL_SEG}
    ),
    dw AS (
      SELECT lang, t.w AS w
      FROM documents,
           UNNEST(list_filter(
             regexp_split_to_array(lower(text), '[^a-z]+'),
             x -> x <> '')) AS t(w)
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(np.n_pieces) AS BIGINT) AS n_unigram_tokens,
           CAST((100 * sum(np.n_pieces)) // count(*) AS BIGINT)
             AS fertility_centi
    FROM dw JOIN np USING (w)
    GROUP BY lang
    """,
)
def unigram_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-tokenizer fertility per language (centi-tokens/word) —
    ml/bpe.bpe_fertility_by_lang's twin under the EM-learned vocab, so
    a token-budgeted mixture planner can price languages under either
    tokenizer and compare."""
    _, weights, words = _learned(spark, sf_dir)
    per_word = viterbi_segment(words, weights).select("w", "n_pieces")
    docs = load(spark, sf_dir, "documents")
    from readur_spark.ml.quality_lm import tokenize_alpha

    stream = docs.select(
        "lang", F.explode(tokenize_alpha(F.col("text"))).alias("w")
    )
    return (
        stream.join(F.broadcast(per_word), "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_unigram_tokens"),
        )
        .select(
            "lang", "n_words", "n_unigram_tokens",
            F.expr("(100L * n_unigram_tokens) div n_words").alias(
                "fertility_centi"
            ),
        )
    )
