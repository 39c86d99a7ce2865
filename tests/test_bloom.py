"""Bloom seen-set (operators/bloom.py): no false negatives ever,
false positives appear when the filter is deliberately undersized,
and the bit set stays bounded and mergeable."""

from __future__ import annotations

from pyspark.sql import functions as F

from readur_spark.operators.bloom import bloom_bits, bloom_probe


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "url string")


def test_no_false_negatives(spark):
    seen_keys = ["https://a.example/%d" % i for i in range(200)]
    bits = bloom_bits(_df(spark, seen_keys), "url")
    res = {r.key: r.is_new for r in bloom_probe(
        _df(spark, seen_keys), bits, "url").collect()}
    # every seen key must probe as seen — the Bloom contract
    assert all(v is False for v in res.values())


def test_new_keys_mostly_new_at_default_size(spark):
    seen = _df(spark, ["https://a.example/%d" % i for i in range(300)])
    bits = bloom_bits(seen, "url")
    new = _df(spark, ["https://b.example/%d" % i for i in range(300)])
    res = [r.is_new for r in bloom_probe(new, bits, "url").collect()]
    # m=65536, k=4, n=300 → fpp ≈ (1-exp(-4*300/65536))^4 ≈ 3e-7
    assert all(res)


def test_false_positives_when_undersized(spark):
    # 1 hex char → 16 slots: 200 seen keys saturate the bitmap, so new
    # keys MUST read seen (all positions occupied) — false positives
    # by construction, proving probe really tests occupancy
    seen = _df(spark, ["https://a.example/%d" % i for i in range(200)])
    bits = bloom_bits(seen, "url", hex_chars=1)
    new = _df(spark, ["https://b.example/%d" % i for i in range(50)])
    res = [r.is_new for r in bloom_probe(new, bits, "url", hex_chars=1).collect()]
    assert not any(res)


def test_bits_bounded_and_mergeable(spark):
    a = bloom_bits(_df(spark, ["u%d" % i for i in range(500)]), "url", hex_chars=2)
    b = bloom_bits(_df(spark, ["v%d" % i for i in range(500)]), "url", hex_chars=2)
    # bounded: ≤ k × 16^2 distinct positions
    assert a.count() <= 4 * 256
    # union+distinct of two shards == bits of the union corpus
    merged = a.union(b).distinct()
    both = bloom_bits(
        _df(spark, ["u%d" % i for i in range(500)]
            + ["v%d" % i for i in range(500)]), "url", hex_chars=2)
    assert {(r.salt, r.bit) for r in merged.collect()} == \
           {(r.salt, r.bit) for r in both.collect()}
