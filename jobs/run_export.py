#!/usr/bin/env python
"""spark-submit entry point for the export stage: curated shards →
packed, tokenizer-accounted training-ready layout.

The last mile of the pipeline (downstream of jobs/run_curation.py):

    curated shard layout (url, text, n_words, split=...)
    → learn a BPE vocab on the TRAIN split (ml/bpe.learn_bpe_merges —
      the tokenizer never sees held-out text)
    → per-doc BPE token counts for every split (OOV words in valid/
      test score their character-level base symbols)
    → deterministic seeded shard assignment of the train split
      (ml/mixing.with_training_order — content-addressed, no RNG)
    → greedy sample packing into --context-token bins per shard
      (ml/packing.pack_greedy — sequential per shard, parallel across
      shards)
    → partitioned write (operators/sinks.write_training_shards) + one
      JSON manifest line with per-split token accounting and train
      bin-fill efficiency

    spark-submit --py-files dist/readur_spark.zip jobs/run_export.py \
        --input /data/training_shards --output /data/packed \
        [--context 2048] [--shards 64] [--num-merges 8] [--seed ep1]

Local smoke test:
    PYTHONPATH=. python jobs/run_export.py \
        --input /tmp/shards --output /tmp/packed --cpus 8

Scale notes (10^12 docs): the tokenizer learns from ONE corpus pass
(word counts) + K compact-vocab rounds; encoding broadcasts the
per-word token table onto a slim (url, word) stream; packing state is
per-shard and rides inside one mapInPandas, so shard count — not
corpus size — bounds any single task; the final write shuffles once on
(split, shard, bucket).
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="readur_spark export job")
    p.add_argument("--input", required=True,
                   help="curated shard layout (run_curation output)")
    p.add_argument("--output", required=True, help="packed layout root")
    p.add_argument("--fmt", choices=["parquet", "json"], default="parquet")
    p.add_argument("--input-fmt", choices=["parquet", "json"], default=None,
                   help="format of the curated input layout (matches the "
                        "--fmt run_curation wrote it with; defaults to "
                        "--fmt)")
    p.add_argument("--context", type=int, default=2048,
                   help="bin size in BPE tokens")
    p.add_argument("--shards", type=int, default=8,
                   help="train shards (choose so a shard fits a task)")
    p.add_argument("--num-merges", type=int, default=8)
    p.add_argument("--seed", default="ep1",
                   help="training-order seed (re-seed per epoch)")
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from readur_spark.session import get_spark

        spark = get_spark(cpus=args.cpus)

    from readur_spark.ml.bpe import encode_token_counts, learn_bpe_merges
    from readur_spark.ml.mixing import with_training_order
    from readur_spark.ml.packing import pack_greedy
    from readur_spark.operators.sinks import (
        read_training_shards,
        write_training_shards,
    )

    docs = read_training_shards(
        spark, args.input, args.input_fmt or args.fmt
    ).select("url", "text", "split")

    # tokenizer: train-split only; the held-out splits are encoded
    # under it (their OOV words cost base symbols)
    train_docs = docs.filter(F.col("split") == "train")
    merges, vocab = learn_bpe_merges(
        train_docs, args.num_merges, text_col="text"
    )
    counts = encode_token_counts(
        docs, vocab, text_col="text", id_col="url", count_oov=True
    )
    sized = docs.join(counts, "url")

    # train split: deterministic shard order + greedy packing. The
    # packer needs a numeric id; the content hash of the url is the
    # stable choice (no monotonically_increasing_id — that changes
    # with partitioning).
    train = with_training_order(
        sized.filter(F.col("split") == "train"),
        args.seed,
        args.shards,
        key_col="url",
    ).withColumn("num_id", F.xxhash64("url"))
    bins = pack_greedy(
        train.select("shard", "num_id", "n_bpe_tokens"),
        id_col="num_id",
        tokens_col="n_bpe_tokens",
        shard_col="shard",
        bin_tokens=args.context,
    ).select("num_id", "bin_id")
    packed_train = train.join(bins, "num_id").select(
        "url", "text", "n_words", "n_bpe_tokens",
        "split", "shard", "pos", "bin_id",
    )
    rest = sized.filter(F.col("split") != "train").select(
        "url", "text", "n_words", "n_bpe_tokens", "split",
        F.lit(0).cast("int").alias("shard"),
        F.lit(0).cast("long").alias("pos"),
        F.lit(0).cast("long").alias("bin_id"),
    )
    out = packed_train.unionByName(rest)
    write_training_shards(
        out, args.output,
        partition_cols=["split", "shard"],
        id_col="url",
        fmt=args.fmt,
    )

    written = read_training_shards(spark, args.output, args.fmt)
    per_split = {
        r["split"]: r.asDict()
        for r in written.groupBy("split").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        ).collect()
    }
    tr = written.filter(F.col("split") == "train")
    n_bins = tr.select("shard", "bin_id").distinct().count()
    train_tokens = int(per_split.get("train", {}).get("n_bpe_tokens") or 0)
    fill_pct = (
        round(100.0 * train_tokens / (n_bins * args.context), 1)
        if n_bins else 0.0
    )
    print(json.dumps({
        "status": "written",
        "output": args.output,
        "num_merges_learned": len(merges),
        "context_tokens": args.context,
        "splits": {
            s: {"n_docs": int(v["n_docs"]),
                "n_bpe_tokens": int(v["n_bpe_tokens"] or 0)}
            for s, v in per_split.items()
        },
        "train_bins": n_bins,
        "train_bin_fill_pct": fill_pct,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
