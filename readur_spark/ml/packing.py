"""Sequence packing for LLM training: map documents into fixed-size
token windows.

Two packing rules, matching what production pipelines actually run:

* **concat-and-chunk** (`pack_concat_chunks`): concatenate documents in
  a deterministic order and slice the stream into fixed `chunk_tokens`
  windows (GPT-style pretraining packing; documents may straddle a
  boundary). This is expressible as a running-sum window: each doc's
  start offset is the cumulative token count before it, its first/last
  chunk ids are floor(start/size) and floor((end-1)/size). Per-shard
  windows only — the corpus is sharded by a hash key first, so at
  10^12 docs every shard computes its own prefix sums with no global
  sort and no cross-shard coordination (shard boundaries waste at most
  one partial chunk each, amortized to nothing).
* **greedy first-fit** (`pack_greedy`): whole documents only, new bin
  when the current doc doesn't fit (sample-packing for SFT where
  crossing boundaries is not allowed). Sequential per shard — runs as
  an Arrow-batched `mapInPandas` carrying the running bin state across
  batches of the partition; deterministic given the shard ordering.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load


def pack_concat_chunks(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_col: str = "shard",
    chunk_tokens: int = 512,
) -> DataFrame:
    """Per-shard concat-and-chunk assignment.

    Output: one row per doc with (shard, doc_id, start_offset,
    chunk_first, chunk_last, spans_boundary). The window partitions by
    shard and orders by doc id — prefix sums stay shard-local.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.coalesce(
        F.sum(tokens_col).over(w) - F.col(tokens_col), F.lit(0)
    ).cast("long")
    end = start + F.col(tokens_col)
    first = F.floor(start / chunk_tokens).cast("long")
    last = F.floor((end - 1) / chunk_tokens).cast("long")
    return docs.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("doc_id"),
        start.alias("start_offset"),
        first.alias("chunk_first"),
        last.alias("chunk_last"),
        (last > first).cast("int").alias("spans_boundary"),
    )


_N_SHARDS = 8
_CHUNK = 512


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             doc_id % {_N_SHARDS} AS shard,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
      FROM documents
    ), o AS (
      SELECT shard, doc_id, n_tokens,
             CAST(COALESCE(sum(n_tokens) OVER
               (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS start_offset
      FROM t
    )
    SELECT shard, doc_id, start_offset,
           CAST(floor(start_offset / {_CHUNK}.0) AS BIGINT) AS chunk_first,
           CAST(floor((start_offset + n_tokens - 1) / {_CHUNK}.0) AS BIGINT) AS chunk_last,
           CAST(floor((start_offset + n_tokens - 1) / {_CHUNK}.0)
                > floor(start_offset / {_CHUNK}.0) AS INT) AS spans_boundary
    FROM o
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing over `documents`, sharded by
    doc_id % {_N_SHARDS}, 512-token chunks — per-row hash-checked."""
    docs = load(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    n_tokens = F.when(F.length(trimmed) == 0, 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % _N_SHARDS).alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    return pack_concat_chunks(t, chunk_tokens=_CHUNK)


def pack_greedy(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_col: str = "shard",
    bin_tokens: int = 512,
) -> DataFrame:
    """Greedy first-fit sample packing: whole docs, new bin on overflow.

    Documents longer than `bin_tokens` get a bin of their own. State
    (current bin id / fill) is carried across the Arrow batches of each
    partition inside one generator — sequential per shard, parallel
    across shards, which is exactly the determinism contract real
    sample-packing jobs ship.
    """
    shuffled = docs.repartition(F.col(shard_col)).sortWithinPartitions(
        shard_col, id_col
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[int, tuple[int, int]] = {}  # shard -> (bin_id, fill)
        for pdf in batches:
            bins = []
            for shard, n in zip(pdf[shard_col], pdf[tokens_col]):
                bin_id, fill = state.get(shard, (0, 0))
                n = int(n)
                if fill > 0 and fill + n > bin_tokens:
                    bin_id, fill = bin_id + 1, 0
                bins.append(bin_id)
                state[shard] = (bin_id, fill + n)
            out = pdf[[shard_col, id_col, tokens_col]].copy()
            out["bin_id"] = pd.Series(bins, index=pdf.index, dtype="int64")
            yield out

    return shuffled.mapInPandas(
        pack,
        schema=f"{shard_col} long, {id_col} long, {tokens_col} long, bin_id long",
    )


def chunk_text(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping ~chunk_tokens windows — the
    embedding-pipeline front door (RAG chunking): each chunk gets a
    stable (doc_id, chunk_id) identity so re-runs upsert instead of
    duplicating. Pure Catalyst: a stride sequence + slice/transform,
    then one explode; no shuffle, no Python."""
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be < chunk_tokens")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(step))
    chunks = F.transform(
        starts, lambda i: F.array_join(F.slice(toks, i, chunk_tokens), " ")
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("chunk_id", "chunk")
    )
    return exploded.select(
        "doc_id", "chunk_id", "chunk",
        F.size(F.split(F.col("chunk"), " ")).alias("n_chunk_tokens"),
    )


@register(
    "chunk_for_embedding",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks,
             range(1, greatest(len(toks) - {16}, 1) + 1, {64 - 16}) AS starts
      FROM t
    ), e AS (
      SELECT doc_id,
             unnest(generate_series(1, len(starts))) - 1 AS chunk_id,
             unnest(list_transform(starts,
                    i -> array_to_string(toks[i:i + {64} - 1], ' '))) AS chunk
      FROM s
    )
    SELECT doc_id, chunk_id, chunk,
           len(string_split(chunk, ' ')) AS n_chunk_tokens
    FROM e
    """,
)
def chunk_for_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks with 16-token overlap over `documents` —
    per-chunk value-hash-checked (ids, text, and token counts)."""
    docs = load(spark, sf_dir, "documents")
    return chunk_text(docs)
