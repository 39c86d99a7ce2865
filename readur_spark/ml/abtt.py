"""All-but-the-top embedding post-processing (integer-exact).

Published recipe (Mu & Viswanath, "All-but-the-Top: Simple and
Effective Postprocessing for Word Representations", ICLR 2018,
re-implemented from the paper's description): embedding sets carry a
large common mean vector and a few dominant principal components that
encode corpus-wide frequency artifacts rather than meaning; removing
the mean and the top component(s) measurably improves similarity
search and clustering. For a web-scale pipeline this is the standard
hygiene step BETWEEN embedding generation and the similarity tier
(ml/similarity.py ANN, ml/semdedup.py SemDeDup, ml/bitext.py margin
mining) — dominant-direction noise inflates every cosine, so dedup
thresholds bite wrong without it.

Batch re-expression in EXACT integer arithmetic (so the DuckDB twin
value-hashes every stage):

  1. grid snap      q_ij = floor(e_ij * 2^14)         (the ml/kmeans.py
                    idiom — float32→double widening and the product are
                    IEEE-exact, floor is engine-identical)
  2. mean removal   mu_j = sdiv(sum_i q_ij, n); c_ij = q_ij - mu_j
  3. Gram matrix    g_jk = sum_i c_ij c_ik             (exact int64;
                    |c| <= 2^15 keeps g within long to ~10^9 rows per
                    aggregation partial)
  4. normalization  gn_jk = sdiv(g_jk * 2^20, max|g|)  (bounds every
                    later product independently of corpus size)
  5. power iteration v_0 = [2^10]*d;
                    u = gn @ v;  v' = sdiv(u * 2^10, max|u|)
                    for ABTT_ITERS rounds -> the top principal
                    direction at scale 2^10 (deterministic: no sign
                    ambiguity because v_0 is fixed all-ones)
  6. projection removal  load_i = c_i . v;
                    r_ij = c_ij - sdiv(load_i * v_j, v.v)

where sdiv(a, b) = sign(a) * (|a| div b) — the sign-abs idiom that
makes Spark's truncating `div` and DuckDB's flooring `//` agree on
negative operands (both reduce to a non-negative division).

Scale design (10^9..10^12 vectors):
  - the only corpus-wide state is d per-dimension sums (mean), the
    d x d Gram (4096 longs at d=64), and the d-vector v — all
    documented-bounded collects (same stance as ml/kmeans.py's k*d
    centroids);
  - the Gram is computed by Arrow-batched partial matmuls
    (mapInPandas: one int64 C^T C per batch, d^2 rows emitted per
    batch, map-side-combined) — the payload embedding column crosses
    NO shuffle; the shuffle carries d^2 partials per task, full stop;
  - the power iteration runs driver-side on the collected 4096-entry
    Gram in exact Python ints (cost independent of corpus size);
  - mean removal and projection removal are zip_with/aggregate HOF
    projections with (mu, v) as broadcast literals — codegen, no
    Python, no shuffle.

Reference tie-in: the reference engine stores OCR confidence-weighted
vectors per document for its similarity search surface
(src/db/documents.rs vector columns); this module is the hygiene pass
a 10^12-document embedding store runs before that search tier.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

GRID = 16384          # 2^14 component grid (ml/kmeans.py family)
PC_SCALE = 1024       # 2^10 eigenvector fixed-point scale
G_SCALE = 1 << 20     # Gram normalization scale
ABTT_ITERS = 6        # power-iteration rounds (driver query + oracle)


def _sdiv_sql(a: str, b: str) -> str:
    """sign-abs integer division — truncating div == flooring // once
    both operands are non-negative, so this exact CASE replays
    bit-for-bit in DuckDB with `//` in place of `div`."""
    return (
        f"CASE WHEN ({a}) >= 0 THEN ({a}) div ({b})"
        f" ELSE -((-({a})) div ({b})) END"
    )


def _sdiv_duck(a: str, b: str) -> str:
    return (
        f"CASE WHEN ({a}) >= 0 THEN ({a}) // ({b})"
        f" ELSE -((-({a})) // ({b})) END"
    )


def quantized_components(
    vectors: DataFrame, *, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(vid, pos 1-based, q) — the grid-snapped exploded view."""
    return vectors.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col)).alias("pos0", "e"),
    ).select(
        "vid",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("e").cast("double") * GRID).cast("long").alias("q"),
    )


def mean_vector(comps: DataFrame, n: int) -> list[int]:
    """mu_j = sdiv(sum q, n) — d longs, documented-bounded collect."""
    rows = (
        comps.groupBy("pos")
        .agg(F.sum("q").alias("s"))
        .select("pos", F.expr(_sdiv_sql("s", str(n))).alias("mu"))
        .collect()
    )
    mu = {r["pos"]: r["mu"] for r in rows}
    return [int(mu[p]) for p in sorted(mu)]


def centered_vectors(
    vectors: DataFrame, mu: list[int], *,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """(vid, c: array<long>) — grid snap + mean removal as one
    zip_with projection, mu as a broadcast literal."""
    mu_lit = F.array(*[F.lit(int(m)).cast("long") for m in mu])
    return vectors.select(
        F.col(id_col).alias("vid"),
        F.zip_with(
            F.col(vec_col),
            mu_lit,
            lambda e, m: F.floor(e.cast("double") * GRID).cast("long") - m,
        ).alias("c"),
    )


def gram_matrix(centered: DataFrame, d: int) -> DataFrame:
    """(j, k, g) 1-based — exact int64 C^T C via Arrow-batched partial
    matmuls. The embedding payload never shuffles; each batch emits
    exactly d^2 partial rows which map-side-combine before the one
    tiny shuffle."""
    import numpy as np

    jj, kk = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1),
                         indexing="ij")
    j_flat, k_flat = jj.ravel(), kk.ravel()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(pdf["c"].tolist(), dtype=np.int64)
            g = m.T @ m  # |c|<=2^15 -> exact in int64 to ~10^9 rows/batch
            yield pd.DataFrame(
                {"j": j_flat, "k": k_flat, "partial": g.ravel()}
            )

    partials = centered.select("c").mapInPandas(
        run, "j INT, k INT, partial LONG"
    )
    return partials.groupBy("j", "k").agg(F.sum("partial").alias("g"))


def gram_matrix_catalyst(comps: DataFrame, mu: list[int]) -> DataFrame:
    """Pure-Catalyst Gram twin (explode self-join on vid) — the
    oracle's shape; tests pin it exactly equal to the Arrow path."""
    centered = comps.select(
        "vid", "pos",
        (F.col("q") - F.element_at(
            F.array(*[F.lit(int(m)).cast("long") for m in mu]),
            F.col("pos"),
        )).alias("c"),
    )
    left = centered.select("vid", F.col("pos").alias("j"),
                           F.col("c").alias("cj"))
    right = centered.select("vid", F.col("pos").alias("k"),
                            F.col("c").alias("ck"))
    return (
        left.join(right, "vid")
        .groupBy("j", "k")
        .agg(F.sum(F.col("cj") * F.col("ck")).alias("g"))
    )


def power_iteration(
    gram: list[tuple[int, int, int]], d: int, iters: int = ABTT_ITERS
) -> list[int]:
    """Driver-side exact-integer power iteration on the normalized
    Gram. Input rows (j, k, g) 1-based; returns v at scale PC_SCALE.
    Pure Python ints — replayed CTE-for-CTE by the oracle."""
    g = {(j, k): int(v) for j, k, v in gram}
    gmax = max((abs(v) for v in g.values()), default=0) or 1

    def sdiv(a: int, b: int) -> int:
        return a // b if a >= 0 else -((-a) // b)

    gn = {jk: sdiv(v * G_SCALE, gmax) for jk, v in g.items()}
    v = [PC_SCALE] * d
    for _ in range(iters):
        u = [
            sum(gn.get((j, k), 0) * v[k - 1] for k in range(1, d + 1))
            for j in range(1, d + 1)
        ]
        umax = max((abs(x) for x in u), default=0) or 1
        v = [sdiv(x * PC_SCALE, umax) for x in u]
    return v


def top_direction(
    vectors: DataFrame, *, vec_col: str = "embedding",
    id_col: str = "vec_id", iters: int = ABTT_ITERS,
) -> tuple[list[int], list[int], int]:
    """(mu, v, n) — the full mean + PC1 estimation chain."""
    n = vectors.count()
    d = len(vectors.select(vec_col).first()[0])
    comps = quantized_components(vectors, vec_col=vec_col, id_col=id_col)
    mu = mean_vector(comps, n)
    centered = centered_vectors(vectors, mu, vec_col=vec_col, id_col=id_col)
    gram = [
        (r["j"], r["k"], r["g"])
        for r in gram_matrix(centered, d).collect()
    ]
    v = power_iteration(gram, d, iters)
    return mu, v, n


def abtt_project(
    vectors: DataFrame, mu: list[int], v: list[int], *,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, pc1_load, norm2_before, norm2_after) — loading on the
    top direction and exact residual norms after removing it. One HOF
    projection, (mu, v) broadcast as literals, no shuffle."""
    vv = sum(x * x for x in v) or 1
    mu_sql = "array(" + ",".join(f"{m}L" for m in mu) + ")"
    v_sql = "array(" + ",".join(f"{x}L" for x in v) + ")"
    c_sql = (
        f"zip_with({vec_col}, {mu_sql},"
        " (e, m) -> CAST(floor(CAST(e AS DOUBLE) * "
        f"{GRID}) AS BIGINT) - m)"
    )
    load_sql = (
        f"aggregate(zip_with(_c, {v_sql}, (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    resid_sql = (
        f"zip_with(_c, {v_sql}, (x, y) -> x - "
        + _sdiv_sql("_load * y", str(vv))
        + ")"
    )
    norm_sql = "aggregate({0}, CAST(0 AS BIGINT), (a, x) -> a + x * x)"
    return (
        vectors.select(F.col(id_col), F.expr(c_sql).alias("_c"))
        .select(id_col, "_c", F.expr(load_sql).alias("_load"))
        .select(
            F.col(id_col),
            F.col("_load").alias("pc1_load"),
            F.expr(norm_sql.format("_c")).cast("long")
            .alias("norm2_before"),
            F.expr(norm_sql.format(resid_sql)).cast("long")
            .alias("norm2_after"),
        )
    )


# ---- oracle twin -----------------------------------------------------------


def _abtt_cte_sql(iters: int) -> str:
    """Shared WITH-chain replaying quantization, mean removal, Gram,
    normalization, and every power-iteration round through v{iters}."""
    sql = f"""
    WITH comps AS MATERIALIZED (
      SELECT vec_id AS vid, r.pos AS pos,
             CAST(floor(embedding[r.pos]::DOUBLE * {GRID}) AS BIGINT) AS q
      FROM embeddings,
           UNNEST(range(1, len(embedding) + 1)) AS r(pos)
    ),
    nstat AS MATERIALIZED (SELECT count(DISTINCT vid) AS n FROM comps),
    mu AS MATERIALIZED (
      SELECT pos,
             {_sdiv_duck("CAST(sum(q) AS BIGINT)",
                         "(SELECT n FROM nstat)")} AS mu
      FROM comps GROUP BY pos
    ),
    cent AS MATERIALIZED (
      SELECT c.vid, c.pos, c.q - m.mu AS c
      FROM comps c JOIN mu m USING (pos)
    ),
    gram AS MATERIALIZED (
      SELECT a.pos AS j, b.pos AS k,
             CAST(sum(a.c * b.c) AS BIGINT) AS g
      FROM cent a JOIN cent b USING (vid)
      GROUP BY a.pos, b.pos
    ),
    gstat AS MATERIALIZED (
      SELECT greatest(max(abs(g)), 1) AS gmax FROM gram
    ),
    gn AS MATERIALIZED (
      SELECT j, k,
             {_sdiv_duck(f"g * {G_SCALE}", "(SELECT gmax FROM gstat)")}
               AS g
      FROM gram
    ),
    v0 AS MATERIALIZED (
      SELECT DISTINCT pos, CAST({PC_SCALE} AS BIGINT) AS v FROM comps
    )"""
    for t in range(1, iters + 1):
        p = t - 1
        sql += f""",
    u{t} AS MATERIALIZED (
      SELECT gn.j AS pos, CAST(sum(gn.g * v.v) AS BIGINT) AS u
      FROM gn JOIN v{p} v ON gn.k = v.pos
      GROUP BY gn.j
    ),
    us{t} AS MATERIALIZED (
      SELECT greatest(max(abs(u)), 1) AS umax FROM u{t}
    ),
    v{t} AS MATERIALIZED (
      SELECT pos,
             {_sdiv_duck(f"u * {PC_SCALE}", f"(SELECT umax FROM us{t})")}
               AS v
      FROM u{t}
    )"""
    return sql


def _pc1_oracle(iters: int) -> str:
    return _abtt_cte_sql(iters) + f"""
    SELECT pos AS dim, CAST(v AS BIGINT) AS v FROM v{iters}
    """


def _resid_cte_sql(iters: int) -> str:
    """The ABTT chain extended through the per-component residuals —
    shared by the projection and denoised-retrieval oracles."""
    return _abtt_cte_sql(iters) + f""",
    vv AS MATERIALIZED (
      SELECT greatest(CAST(sum(v * v) AS BIGINT), 1) AS vv FROM v{iters}
    ),
    loads AS MATERIALIZED (
      SELECT cent.vid, CAST(sum(cent.c * v.v) AS BIGINT) AS pc1_load
      FROM cent JOIN v{iters} v USING (pos)
      GROUP BY cent.vid
    ),
    resid AS MATERIALIZED (
      SELECT cent.vid, cent.pos,
             cent.c - {_sdiv_duck("l.pc1_load * v.v",
                                  "(SELECT vv FROM vv)")} AS r,
             cent.c AS c
      FROM cent JOIN v{iters} v USING (pos)
      JOIN loads l USING (vid)
    )"""


def _project_oracle(iters: int) -> str:
    return _resid_cte_sql(iters) + """
    SELECT r.vid AS vec_id, l.pc1_load,
           CAST(sum(r.c * r.c) AS BIGINT) AS norm2_before,
           CAST(sum(r.r * r.r) AS BIGINT) AS norm2_after
    FROM resid r JOIN loads l USING (vid)
    GROUP BY r.vid, l.pc1_load
    """


@register("embedding_pc1_power", oracle=_pc1_oracle(ABTT_ITERS))
def embedding_pc1_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding table by exact-integer
    power iteration — grid snap, mean removal, Gram, normalization,
    and all ABTT_ITERS rounds replayed CTE-for-CTE by DuckDB."""
    vectors = load(spark, sf_dir, "embeddings")
    _, v, _ = top_direction(vectors)
    return spark.createDataFrame(
        [(i + 1, int(x)) for i, x in enumerate(v)], "dim INT, v BIGINT"
    )


@register("embedding_abtt_project", oracle=_project_oracle(ABTT_ITERS))
def embedding_abtt_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top projection removal: per-vector PC1 loading and
    exact integer residual norms (before/after) — the hygiene pass the
    similarity tier consumes."""
    vectors = load(spark, sf_dir, "embeddings")
    mu, v, _ = top_direction(vectors)
    return abtt_project(vectors, mu, v)


# ---- composed chain: denoised maximum-inner-product retrieval --------------


def residual_vectors(
    vectors: DataFrame, mu: list[int], v: list[int], *,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """(vid, r: array<long>) — the full denoised vectors (grid snap,
    mean removal, PC1 projection removal) as one HOF projection."""
    vv = sum(x * x for x in v) or 1
    mu_sql = "array(" + ",".join(f"{m}L" for m in mu) + ")"
    v_sql = "array(" + ",".join(f"{x}L" for x in v) + ")"
    c_sql = (
        f"zip_with({vec_col}, {mu_sql},"
        f" (e, m) -> CAST(floor(CAST(e AS DOUBLE) * {GRID}) AS BIGINT) - m)"
    )
    load_sql = (
        f"aggregate(zip_with(_c, {v_sql}, (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    r_sql = (
        f"zip_with(_c, {v_sql}, (x, y) -> x - "
        + _sdiv_sql("_load * y", str(vv))
        + ")"
    )
    return (
        vectors.select(F.col(id_col).alias("vid"), F.expr(c_sql).alias("_c"))
        .select("vid", "_c", F.expr(load_sql).alias("_load"))
        .select("vid", F.expr(r_sql).alias("r"))
    )


ANN_DENOISED_K = 10


def _mips_oracle(iters: int, k: int) -> str:
    return _resid_cte_sql(iters) + f""",
    qv AS MATERIALIZED (SELECT pos, r FROM resid WHERE vid = 0)
    SELECT resid.vid AS vec_id,
           CAST(sum(resid.r * qv.r) AS BIGINT) AS dot
    FROM resid JOIN qv USING (pos)
    WHERE resid.vid <> 0
    GROUP BY resid.vid
    ORDER BY dot DESC, vec_id
    LIMIT {k}
    """


@register(
    "ann_denoised_mips_topk", oracle=_mips_oracle(ABTT_ITERS, ANN_DENOISED_K)
)
def ann_denoised_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denoised maximum-inner-product top-{k}: the ABTT residual of
    query vec_id 0 against every other residual, ranked by EXACT
    integer dot product (deterministic vec_id tie-break) — the
    hygiene pass composed into the retrieval tier, every stage
    replayed by DuckDB. Spark plan: one HOF projection for residuals,
    the query row collected (1-row bounded), dot as an aggregate HOF,
    TakeOrderedAndProject for the top-k — no window, no Python."""
    vectors = load(spark, sf_dir, "embeddings")
    mu, v, _ = top_direction(vectors)
    resid = residual_vectors(vectors, mu, v)
    q = resid.filter(F.col("vid") == 0).collect()[0]["r"]
    q_sql = "array(" + ",".join(f"{int(x)}L" for x in q) + ")"
    dot = F.expr(
        f"aggregate(zip_with(r, {q_sql}, (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    return (
        resid.filter(F.col("vid") != 0)
        .select(F.col("vid").alias("vec_id"), dot.alias("dot"))
        .orderBy(F.desc("dot"), F.asc("vec_id"))
        .limit(ANN_DENOISED_K)
    )
