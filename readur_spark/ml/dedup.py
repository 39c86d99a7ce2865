"""Deduplication families for training-data pipelines.

Exact (hash groupBy), n-gram/unigram Jaccard via posting-list joins,
MinHash+LSH (band/bucket-join), SimHash — the standard web-corpus
dedup toolbox, each built shuffle-consciously:

  - exact: one hash-agg on a uniform key (sha256/md5) — no skew.
  - Jaccard posting join: explode tokens → self-join on token →
    per-pair intersection counts → join doc sizes. Frequency cap on
    tokens (stopword-like posting lists explode quadratically —
    dropping tokens with df > cap bounds the join fanout; at 10^12
    docs this cap is what keeps the operator feasible).
  - MinHash/LSH: k permutations → b bands of r rows → exact-match
    bucket join per band → candidate pairs → optional exact verify.
    Permutation hashing is vectorized numpy inside a pandas UDF.
  - SimHash: 64-bit fingerprint from token hashes ± weights; near-dup
    = small Hamming distance; bucketable by bit-blocks (Charikar).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# ---- exact ---------------------------------------------------------------


def exact_duplicate_groups(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("content_hash"))
        .agg(F.count("*").alias("n"), F.min(id_col).alias("keeper"))
        .filter(F.col("n") > 1)
    )


@register(
    "dedup_exact_groups",
    oracle="""
    SELECT md5(props) AS content_hash, count(*) AS n, min(event_id) AS keeper
    FROM events
    GROUP BY md5(props)
    HAVING count(*) > 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicate_groups(load(spark, sf_dir, "events"), "props", "event_id")


# ---- token-Jaccard via posting-list self-join ------------------------------


def jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float = 0.8,
    df_cap: int | None = None,
    n_shingle: int = 1,
) -> DataFrame:
    """All pairs within the same block with token-set Jaccard ≥
    threshold. Posting-list formulation: shuffle keys are
    (block, token); the pair agg key is (id_a, id_b).

    n_shingle > 1 tokenizes into word n-grams (pure Catalyst:
    transform over a sequence of slice starts) — shingles are far more
    discriminative than unigrams and keep posting lists short, which is
    what bounds the token self-join's fanout at corpus scale. df_cap
    drops tokens whose posting list exceeds the cap (quadratic-fanout
    guard; see module docstring)."""
    t = F.split(F.col(text_col), " ")
    if n_shingle > 1:
        n_out = F.size(t) - (n_shingle - 1)
        shingles = F.when(
            n_out >= 1,
            F.transform(
                F.sequence(F.lit(1), n_out),
                lambda i: F.array_join(F.slice(t, i, n_shingle), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    else:
        shingles = t
    toks = docs.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        F.explode(F.array_distinct(shingles)).alias("token"),
    )
    if df_cap is not None:
        freq = toks.groupBy("token").count().filter(F.col("count") <= df_cap)
        toks = toks.join(F.broadcast(freq.select("token")), "token", "left_semi")

    sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))

    a = toks.alias("a")
    b = toks.alias("b")
    join_cond = [F.col("a.token") == F.col("b.token")] + [
        F.col("a." + c) == F.col("b." + c) for c in block_cols
    ]
    pairs = (
        a.join(b, join_cond)
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select(
        "id_a", "id_b", F.round("jaccard", 3).alias("jaccard_r")
    )


@register(
    "dedup_jaccard_pairs",
    oracle="""
    WITH t0 AS (
      SELECT doc_id AS id, lang, source, string_split(text, ' ') AS t FROM documents
    ), toks0 AS (
      SELECT id, lang, source,
             unnest(list_distinct(list_transform(
               range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
             ))) AS token
      FROM t0
    ), capped AS (
      SELECT token FROM (SELECT token, count(*) AS c FROM toks0 GROUP BY token)
      WHERE c <= 1000
    ), toks AS (
      SELECT toks0.* FROM toks0 SEMI JOIN capped USING (token)
    ), sizes AS (
      SELECT id, count(*) AS sz FROM toks GROUP BY id
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
      FROM toks a JOIN toks b
        ON a.token = b.token AND a.lang = b.lang AND a.source = b.source
      WHERE a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT p.id_a, p.id_b,
           round(CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter), 3) AS jaccard_r
    FROM pairs p
    JOIN sizes sa ON sa.id = p.id_a
    JOIN sizes sb ON sb.id = p.id_b
    WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter) >= 0.8
    """,
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered with the scale-safe defaults the module docstring
    promises: 3-word shingles (short, discriminative posting lists —
    the synthetic corpus' 31-word unigram vocabulary makes unigram
    posting lists near-full-corpus, the textbook join explosion) and a
    df cap bounding any single posting list's self-join fanout."""
    docs = load(spark, sf_dir, "documents")
    return jaccard_pairs(
        docs, "doc_id", "text", ["lang", "source"],
        threshold=0.8, df_cap=1000, n_shingle=3,
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
    df_cap: int | None = None,
    n_shingle: int = 3,
) -> DataFrame:
    """Asymmetric shingle containment C(A→B) = |A∩B| / |A|: the
    quote/subset-duplicate detector Jaccard misses. A short page fully
    embedded in a long one (syndicated excerpt, quoted post, boilerplate
    wrapper) has high containment from the short side but low Jaccard —
    Broder's original resemblance/containment split (SEQUENCES '97).

    Emits (id_a, id_b, contain_a_r, contain_b_r) for ordered pairs
    where EITHER direction clears the threshold; the consumer keeps
    the superset doc and drops the contained one. Identical posting
    shape (and df-cap fanout guard) as `jaccard_pairs` — the shuffle
    keys are (block, token), never payloads."""
    t = F.split(F.col(text_col), " ")
    if n_shingle > 1:
        n_out = F.size(t) - (n_shingle - 1)
        shingles = F.when(
            n_out >= 1,
            F.transform(
                F.sequence(F.lit(1), n_out),
                lambda i: F.array_join(F.slice(t, i, n_shingle), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    else:
        shingles = t
    toks = docs.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        F.explode(F.array_distinct(shingles)).alias("token"),
    )
    if df_cap is not None:
        freq = toks.groupBy("token").count().filter(F.col("count") <= df_cap)
        toks = toks.join(F.broadcast(freq.select("token")), "token", "left_semi")

    sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))

    a = toks.alias("a")
    b = toks.alias("b")
    join_cond = [F.col("a.token") == F.col("b.token")] + [
        F.col("a." + c) == F.col("b." + c) for c in block_cols
    ]
    pairs = (
        a.join(b, join_cond)
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("contain_a", F.col("inter") / F.col("sz_a"))
        .withColumn("contain_b", F.col("inter") / F.col("sz_b"))
        .filter(
            F.greatest(F.col("contain_a"), F.col("contain_b")) >= threshold
        )
    )
    return out.select(
        "id_a",
        "id_b",
        F.round("contain_a", 3).alias("contain_a_r"),
        F.round("contain_b", 3).alias("contain_b_r"),
    )


@register(
    "dedup_containment_pairs",
    oracle="""
    WITH t0 AS (
      SELECT doc_id AS id, lang, source, string_split(text, ' ') AS t FROM documents
    ), toks0 AS (
      SELECT id, lang, source,
             unnest(list_distinct(list_transform(
               range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
             ))) AS token
      FROM t0
    ), capped AS (
      SELECT token FROM (SELECT token, count(*) AS c FROM toks0 GROUP BY token)
      WHERE c <= 1000
    ), toks AS (
      SELECT toks0.* FROM toks0 SEMI JOIN capped USING (token)
    ), sizes AS (
      SELECT id, count(*) AS sz FROM toks GROUP BY id
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
      FROM toks a JOIN toks b
        ON a.token = b.token AND a.lang = b.lang AND a.source = b.source
      WHERE a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT p.id_a, p.id_b,
           round(CAST(p.inter AS DOUBLE) / sa.sz, 3) AS contain_a_r,
           round(CAST(p.inter AS DOUBLE) / sb.sz, 3) AS contain_b_r
    FROM pairs p
    JOIN sizes sa ON sa.id = p.id_a
    JOIN sizes sb ON sb.id = p.id_b
    WHERE greatest(CAST(p.inter AS DOUBLE) / sa.sz,
                   CAST(p.inter AS DOUBLE) / sb.sz) >= 0.5
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-duplicate pairs at containment ≥ 0.5 (3-word shingles,
    df-capped postings): both directional containments value-hashed,
    so the asymmetry itself — not just pair membership — is checked."""
    docs = load(spark, sf_dir, "documents")
    return containment_pairs(
        docs, "doc_id", "text", ["lang", "source"],
        threshold=0.5, df_cap=1000, n_shingle=3,
    )


# ---- MinHash + LSH ----------------------------------------------------------


def _perm_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Multiply-shift universal family h_i(x) = a_i*x + b_i (mod 2^64,
    a odd) — exact in uint64 wraparound arithmetic, unlike a Mersenne
    modulus pushed through float64 (53-bit mantissa loses the low bits
    of 61-bit products)."""
    rs = np.random.RandomState(seed)
    a = (rs.randint(1, 1 << 62, size=n_perm, dtype=np.int64).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rs.randint(0, 1 << 62, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _token_hashes(
    text: str, n_shingle: int, cache: dict | None = None
) -> np.ndarray:
    """Stable 64-bit shingle hashes via blake2b (C speed; the previous
    per-character FNV in numpy scalars was the profile's top cost).
    `cache` memoizes across a batch — natural-language token/shingle
    vocabularies repeat heavily."""
    from hashlib import blake2b

    toks = text.split()
    if n_shingle > 1:
        items = [
            " ".join(toks[i : i + n_shingle])
            for i in range(max(len(toks) - n_shingle + 1, 0))
        ]
    else:
        items = toks
    if not items:
        return np.zeros(1, dtype=np.uint64)
    if cache is None:
        cache = {}

    def h(it: str) -> int:
        v = cache.get(it)
        if v is None:
            v = int.from_bytes(blake2b(it.encode(), digest_size=8).digest(), "little")
            cache[it] = v
        return v

    return np.fromiter((h(it) for it in items), dtype=np.uint64, count=len(items))


def minhash_signatures(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_perm: int = 64,
    n_shingle: int = 3,
    seed: int = 42,
) -> DataFrame:
    """doc → minhash signature array<long>, computed batch-at-a-time
    (uint64 (a*h+b) min-reduce over the shingle-hash vector, outer
    product form)."""
    a, b = _perm_params(n_perm, seed)

    def sig_batches(batches):
        for pdf in batches:
            cache: dict = {}
            sigs = []
            for text in pdf[text_col]:
                hs = _token_hashes(text or "", n_shingle, cache)
                vals = a[:, None] * hs[None, :] + b[:, None]  # uint64 wrap
                sigs.append(vals.min(axis=1).view(np.int64).tolist())
            yield pd.DataFrame({"id": pdf[id_col], "signature": sigs})

    # a single-file table scans as one split; the signature stage is
    # CPU-bound Python, so spread the slim (id, text) projection first
    slim = docs.select(F.col(id_col).alias(id_col), text_col)
    par = docs.sparkSession.sparkContext.defaultParallelism
    if slim.rdd.getNumPartitions() < par:
        slim = slim.repartition(par)
    return slim.mapInPandas(
        sig_batches, schema=f"id long, signature array<long>"
    )


def lsh_candidate_pairs(
    signatures: DataFrame, n_bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures and bucket-join: docs agreeing on all rows
    of any band become candidates. The join key (band_id, band_hash)
    is uniform — no skew; fanout is bounded by bucket sizes."""
    bands = signatures.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda band: F.slice(
                    "signature", band * rows_per_band + 1, rows_per_band
                ),
            )
        ).alias("band_id", "band_sig"),
    ).select("id", "band_id", F.hash("band_sig").alias("band_hash"))

    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_perm: int = 64,
    n_bands: int = 16,
    n_shingle: int = 3,
    seed: int = 42,
) -> DataFrame:
    sigs = minhash_signatures(docs, id_col, text_col, n_perm, n_shingle, seed)
    return lsh_candidate_pairs(sigs, n_bands, n_perm // n_bands)


@register("dedup_minhash_lsh")  # non-SQL: algorithmic; pytest-verified vs exact Jaccard
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n_perm=64, n_bands=16, n_shingle=1)
    return pairs.groupBy().agg(
        F.count("*").alias("n_candidate_pairs"),
        F.countDistinct("id_a").alias("n_docs_with_candidates"),
    )


# ---- SimHash ---------------------------------------------------------------


def simhash_signatures(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Charikar 64-bit simhash over unigram FNV hashes."""

    def batches(it):
        for pdf in it:
            out = []
            cache: dict = {}
            for text in pdf[text_col]:
                hs = _token_hashes(text or "", 1, cache)
                if len(hs) == 0:
                    out.append(0)
                    continue
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                    np.int64
                )
                v = (2 * bits - 1).sum(axis=0)
                sh = int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
                out.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
            yield pd.DataFrame({"id": pdf[id_col], "simhash": out})

    slim = docs.select(F.col(id_col), text_col)
    par = docs.sparkSession.sparkContext.defaultParallelism
    if slim.rdd.getNumPartitions() < par:
        slim = slim.repartition(par)
    return slim.mapInPandas(batches, schema="id long, simhash long")


def simhash_near_pairs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Block on 4 × 16-bit chunks (any pair within Hamming ≤3 of a
    64-bit key agrees exactly on ≥1 of 4 chunks) → verify distance."""
    chunks = sig.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    (F.shiftrightunsigned("simhash", k * 16).bitwiseAND(F.lit(0xFFFF)))
                    for k in range(4)
                ]
            )
        ).alias("chunk_id", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


@register("dedup_simhash")  # non-SQL: algorithmic; pytest-verified
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered at max_hamming=3 — the regime where 4×16-bit chunk
    blocking is provably complete (≤3 flipped bits leave ≥1 chunk
    intact), pinned exact vs brute-force XOR popcount in
    tests/test_lsh_recall.py. Beyond the bound, blocking recall decays
    (~0.68 at h≤8 measured) and would need more chunks/permuted
    tables."""
    docs = load(spark, sf_dir, "documents")
    sigs = simhash_signatures(docs, "doc_id", "text")
    pairs = simhash_near_pairs(sigs, max_hamming=3)
    return pairs.groupBy().agg(F.count("*").alias("n_near_pairs"))


# ---- MinHash entirely in Catalyst (no Python in the signature path) --------

def minhash_signatures_jvm(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_perm: int = 64,
    n_shingle: int = 3,
) -> DataFrame:
    """MinHash signatures as pure codegen: explode distinct word
    shingles, hash each with `xxhash64(shingle, i)` for i in 0..n_perm
    (seeded xxhash64 as the independent-hash family — no overflow
    arithmetic, so it survives ANSI mode), and take per-doc mins in ONE
    map-side-combinable aggregate. Versus the Arrow/blake2b path
    (minhash_signatures): no Python workers, no batch serialization —
    the whole signature stage lives inside whole-stage codegen, and at
    10^12 docs the only shuffle is the partial-agg combine on doc id.

    Signature family differs from the blake2b path (different hashes),
    but the MinHash guarantee — P[min collision] = Jaccard — holds for
    any independent family; the recall test pins it against exact
    Jaccard just like the Python path."""
    t = F.split(F.col(text_col), " ")
    if n_shingle > 1:
        n_out = F.size(t) - (n_shingle - 1)
        shingles = F.when(
            n_out >= 1,
            F.transform(
                F.sequence(F.lit(1), n_out),
                lambda i: F.array_join(F.slice(t, i, n_shingle), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    else:
        shingles = t
    # partition-floor: a few parquet input splits would otherwise run
    # the whole (rows × n_perm) hash computation on a handful of tasks
    # (the same fix the Arrow path's signature stage carries)
    slim = docs.select(F.col(id_col).alias("id"), F.col(text_col)).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    # hash each shingle string ONCE to a long; the n_perm family then
    # mixes the fixed-width long (xxhash64(h, i)) instead of re-hashing
    # the string n_perm times
    toks = slim.select(
        "id", F.explode(F.array_distinct(shingles)).alias("sh")
    ).select("id", F.xxhash64("sh").alias("h"))
    mins = toks.groupBy("id").agg(
        *[
            F.min(F.xxhash64("h", F.lit(i))).alias("h%d" % i)
            for i in range(n_perm)
        ]
    )
    return mins.select(
        "id", F.array(*[F.col("h%d" % i) for i in range(n_perm)]).alias("sig")
    )


def minhash_band_table_jvm(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_perm: int = 64,
    n_bands: int = 16,
    n_shingle: int = 3,
) -> DataFrame:
    """(id, band_id, band_hash) band table over the JVM signatures:
    band hash = xxhash64 of the band's slice rendered to one string.
    This is the MATERIALIZABLE artifact of the LSH index — a corpus
    stores it partitioned by (band_id, band_hash) so later deltas
    probe it without touching corpus text."""
    r = n_perm // n_bands
    sigs = minhash_signatures_jvm(docs, id_col, text_col, n_perm, n_shingle)
    return sigs.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band_id"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice("sig", j * r + 1, r),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("band_hash"),
                )
                for j in range(n_bands)
            ])
        ).alias("b"),
    ).select(
        "id",
        F.col("b.band_id").alias("band_id"),
        F.col("b.band_hash").alias("band_hash"),
    )


def minhash_lsh_pairs_jvm(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_perm: int = 64,
    n_bands: int = 16,
    n_shingle: int = 3,
) -> DataFrame:
    """Banded LSH over the JVM signatures: candidates = equi-join on
    (band_id, band_hash) — identical bucketed shape to the Python
    path's lsh_candidate_pairs, end-to-end JVM."""
    bands = minhash_band_table_jvm(
        docs, id_col, text_col, n_perm, n_bands, n_shingle
    )
    # pre-partition on the join key: the signature aggregate is small
    # enough that AQE would coalesce it to one partition, serializing
    # the (potentially explosive) bucket self-join into a single task
    bands = bands.repartition(F.col("band_id"), F.col("band_hash"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


@register("dedup_minhash_jvm")  # non-SQL: algorithmic; pytest recall + plan pin
def dedup_minhash_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The all-Catalyst MinHash-LSH (rows-only driver check; recall vs
    exact Jaccard and the no-Python plan property are pytest-pinned)."""
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs_jvm(
        docs, "doc_id", "text", n_perm=64, n_bands=16, n_shingle=3
    )
    return pairs.groupBy().agg(
        F.count("*").alias("n_candidate_pairs"),
        F.countDistinct("id_a").alias("n_docs_with_candidates"),
    )


def incremental_neardup_new_ids(
    new_docs: DataFrame,
    existing_bands: DataFrame,
    id_col: str,
    text_col: str,
    n_perm: int = 64,
    n_bands: int = 16,
    n_shingle: int = 3,
) -> DataFrame:
    """Ids of NEW documents that are near-dup candidates of an EXISTING
    corpus — the continuous-crawl workflow: the corpus's band table
    (minhash_band_table_jvm, stored partitioned by its key) is probed
    by the delta's bands with one slim semi-join; corpus text is never
    re-read and the delta never self-joins. At 10^12 stored docs the
    probe cost is proportional to the DELTA, not the corpus."""
    new_bands = minhash_band_table_jvm(
        new_docs, id_col, text_col, n_perm, n_bands, n_shingle
    )
    keys = existing_bands.select("band_id", "band_hash")
    return (
        new_bands.join(keys, ["band_id", "band_hash"], "left_semi")
        .select("id")
        .distinct()
    )


@register("incremental_neardup_plan")  # non-SQL: algorithmic (xxhash64
# family); equivalence to the full-corpus pair formulation is
# pytest-pinned in tests/test_incremental_dedup.py
def incremental_neardup_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-crawl triage: treat the first 80% of documents as the
    stored corpus and the rest as the incoming delta; report how many
    delta docs are exact dups (sha), near-dup candidates (band probe),
    or novel."""
    docs = load(spark, sf_dir, "documents")
    # deterministic id cut — doc_id is a dense 0..n-1 sequence in the
    # fixture, so `doc_id % 5 < 4` IS an exact 80/20 split, costs zero
    # (a pushed-down filter, no aggregate): an exact-percentile agg
    # here would be full-sort semantics collected to the driver.
    existing = docs.filter(F.col("doc_id") % 5 < 4)
    new = docs.filter(F.col("doc_id") % 5 >= 4)
    existing_bands = minhash_band_table_jvm(
        existing, "doc_id", "text", n_perm=64, n_bands=16, n_shingle=3
    )
    near_ids = incremental_neardup_new_ids(
        new, existing_bands, "doc_id", "text",
        n_perm=64, n_bands=16, n_shingle=3,
    )
    exact_ids = (
        new.withColumn("h", F.sha2(F.col("text"), 256))
        .join(
            existing.select(F.sha2(F.col("text"), 256).alias("h")).distinct(),
            "h",
            "left_semi",
        )
        .select("doc_id")
    )
    n_new = new.count()
    n_exact = exact_ids.count()
    n_near = near_ids.count()
    return spark.createDataFrame(
        [(int(n_new), int(n_exact), int(n_near))],
        "n_new long, n_exact_dup long, n_near_candidates long",
    )
