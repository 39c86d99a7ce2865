"""Unit tests for padding-waste accounting under batch formation."""

from readur_spark.ml.batching import BATCH_SIZE, MAX_SEQ, padding_report


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestPaddingReport:
    def test_bimodal_bucketing_wins(self, spark):
        # 256 short (8 tokens) + 256 long (512 tokens): naive mixes
        # them into batches padded to ~512; bucketing separates the
        # modes (only the one boundary batch per shard still mixes)
        rows = [(i, " ".join(["s"] * 8)) for i in range(256)] + [
            (256 + i, " ".join(["l"] * 512)) for i in range(256)
        ]
        got = {r["strategy"]: r for r in padding_report(_docs(spark, rows)).collect()}
        n, b = got["naive"], got["bucketed"]
        # same docs, same token mass
        assert n["total_tokens"] == b["total_tokens"] == 256 * 8 + 256 * 512
        assert n["padded_tokens"] >= n["total_tokens"]
        # naive pads ~every batch to 512: waste ≈ (512-260)/512 ≈ 490‰
        assert n["waste_permille"] > 300
        # bucketed: ≤1 mixed boundary batch per shard → waste ≪ naive
        assert b["waste_permille"] < n["waste_permille"] - 200

    def test_uniform_lengths_no_waste(self, spark):
        rows = [(i, " ".join(["w"] * 16)) for i in range(4 * BATCH_SIZE)]
        got = {r["strategy"]: r for r in padding_report(_docs(spark, rows)).collect()}
        for r in got.values():
            assert r["waste_permille"] == 0
            assert r["padded_tokens"] == r["total_tokens"]

    def test_max_seq_cap(self, spark):
        rows = [(1, " ".join(["x"] * (MAX_SEQ + 500)))]
        [r] = [x for x in padding_report(_docs(spark, rows)).collect()
               if x["strategy"] == "naive"]
        assert r["total_tokens"] == MAX_SEQ
