"""Shard-layout sink: partition directories, bounded file sizes,
round-trip fidelity, JSONL export."""

import glob
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from readur_spark.ml.webfilters import with_hash_split
from readur_spark.operators.sinks import read_training_shards, write_training_shards


def _docs(spark, n=120):
    rows = [
        Row(doc_id=i, lang="en" if i % 3 else "de",
            url=f"https://x.example/{i}", text=f"doc {i}")
        for i in range(n)
    ]
    return with_hash_split(spark.createDataFrame(rows), "url")


def test_layout_and_roundtrip(spark, tmp_path):
    path = str(tmp_path / "shards")
    df = _docs(spark)
    write_training_shards(
        df, path, partition_cols=["split", "lang"], id_col="doc_id"
    )
    # partition directories exist for every (split, lang) present
    dirs = {
        os.path.relpath(p, path)
        for p in glob.glob(os.path.join(path, "split=*", "lang=*"))
    }
    expected = {
        f"split={r['split']}/lang={r['lang']}"
        for r in df.select("split", "lang").distinct().collect()
    }
    assert dirs == expected

    back = read_training_shards(spark, path)
    assert back.count() == 120
    # partition columns restored from directory names
    assert {"split", "lang"} <= set(back.columns)
    orig = {(r["doc_id"], r["split"], r["lang"]) for r in df.collect()}
    got = {(r["doc_id"], r["split"], r["lang"]) for r in back.collect()}
    assert got == orig


def test_max_records_per_file(spark, tmp_path):
    path = str(tmp_path / "bounded")
    df = _docs(spark, n=100).withColumn("split", F.lit("train")).withColumn(
        "lang", F.lit("en")
    )
    write_training_shards(
        df, path, partition_cols=["split", "lang"], id_col="doc_id",
        max_records_per_file=30,
    )
    files = glob.glob(os.path.join(path, "split=train", "lang=en", "*.parquet"))
    assert len(files) >= 4  # 100 rows / 30 per file
    for f in files:
        n = spark.read.parquet(f).count()
        assert n <= 30


def test_jsonl_export(spark, tmp_path):
    path = str(tmp_path / "jsonl")
    df = _docs(spark, n=30)
    write_training_shards(
        df, path, partition_cols=["split"], id_col="doc_id", fmt="json"
    )
    a_file = glob.glob(os.path.join(path, "split=*", "*.json"))[0]
    import json

    with open(a_file) as f:
        first = json.loads(f.readline())
    assert {"doc_id", "lang", "url", "text"} <= set(first)
    back = read_training_shards(spark, path, fmt="json")
    assert back.count() == 30


def test_compact_shards_preserves_rows_and_reduces_files(spark, tmp_path):
    from readur_spark.operators.sinks import compact_shards

    path = str(tmp_path / "frag")
    df = _docs(spark, n=90)
    # fragment: tiny files (10 rows each)
    write_training_shards(
        df, path, partition_cols=["split"], id_col="doc_id",
        max_records_per_file=10,
    )
    before = sum(
        1 for _r, _d, fs in os.walk(path)
        for f in fs if not f.startswith(("_", "."))
    )
    orig = {(r["doc_id"], r["split"]) for r in df.collect()}

    after = compact_shards(
        spark, path, partition_cols=["split"], id_col="doc_id",
        max_records_per_file=100_000,
    )
    assert after < before
    back = read_training_shards(spark, path)
    assert {(r["doc_id"], r["split"]) for r in back.collect()} == orig


def test_compact_recovers_from_crash_between_renames(spark, tmp_path):
    from readur_spark.operators.sinks import compact_shards

    path = str(tmp_path / "crashy")
    df = _docs(spark, n=40)
    write_training_shards(df, path, partition_cols=["split"], id_col="doc_id")
    orig = {(r["doc_id"], r["split"]) for r in df.collect()}

    # simulate a crash after `os.rename(path, old)` but before the
    # second rename: data sits at .old, nothing at path
    os.rename(path, path + ".old")
    assert not os.path.exists(path)

    compact_shards(spark, path, partition_cols=["split"], id_col="doc_id")
    back = read_training_shards(spark, path)
    assert {(r["doc_id"], r["split"]) for r in back.collect()} == orig
    assert not os.path.exists(path + ".old")
    assert not os.path.exists(path + ".compacting")
