"""Unit tests for the unigram^(3/4) negative-sampling table."""

from pyspark.sql import functions as F

from readur_spark.ml.negsample import (
    PPM_TOTAL,
    negative_sampling_table,
    pow34,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestPow34:
    def test_exact_values(self, spark):
        # floor(c^0.75): 1→1, 16→8, 81→27, 100→31, 10000→1000
        df = spark.createDataFrame(
            [(1,), (16,), (81,), (100,), (10000,), (2000000,)], "c long"
        )
        got = {r["c"]: r["w"] for r in df.select(
            "c", pow34(F.col("c")).alias("w")).collect()}
        assert got[1] == 1 and got[16] == 8 and got[81] == 27
        assert got[100] == 31          # 100^0.75 = 31.62…
        assert got[10000] == 1000
        # near the int64 c³ edge (c ≤ ~2.09e6): math.isqrt twin
        assert got[2000000] == 53182


class TestTable:
    def test_head_flattening_and_ppm_sum(self, spark):
        # 'a' 256×, 'b' 16×, 'c' 1×: raw ratio a:b = 16; ^(3/4) → 64:8
        text = " ".join(["a"] * 256 + ["b"] * 16 + ["c"])
        out = negative_sampling_table(_docs(spark, [(1, text)])).collect()
        got = {r["tok"]: r for r in out}
        assert got["a"]["w34"] == 64 and got["b"]["w34"] == 8
        assert got["c"]["w34"] == 1
        assert sum(r["ppm"] for r in out) == PPM_TOTAL
        # smoothing: a's ppm share (64/73) < raw share (256/273)
        assert got["a"]["ppm"] < 256 * PPM_TOTAL // 273

    def test_top_v_cap_deterministic(self, spark):
        text = " ".join(f"t{i}" for i in range(500))
        out1 = sorted(map(tuple, negative_sampling_table(
            _docs(spark, [(1, text)]), top_v=50).collect()))
        out2 = sorted(map(tuple, negative_sampling_table(
            _docs(spark, [(1, text)]), top_v=50).collect()))
        assert out1 == out2 and len(out1) == 50
