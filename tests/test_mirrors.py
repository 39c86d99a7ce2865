"""Unit tests for host mirror detection."""

from readur_spark.ml.mirrors import host_mirror_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


class TestMirrors:
    def test_regimes(self, spark):
        rows = (
            # hA and hB: full mirror (3 shared blobs each)
            [("hA", f"blob{i}") for i in range(3)]
            + [("hB", f"blob{i}") for i in range(3)]
            # hC: shares 1 blob with hA → 1000·1/min(3,4) = 333
            + [("hC", "blob0")]
            + [("hC", f"own{i}") for i in range(3)]
            # hD: fully unique
            + [("hD", "solo")]
        )
        got = {(r["host_a"], r["host_b"]): r
               for r in host_mirror_pairs(_docs(spark, rows)).collect()}
        ab = got[("hA", "hB")]
        assert ab["shared"] == 3 and ab["mirror_permille"] == 1000
        assert ab["is_mirror"]
        ac = got[("hA", "hC")]
        assert ac["shared"] == 1 and ac["mirror_permille"] == 333
        assert not ac["is_mirror"]
        assert not any("hD" in k for k in got)

    def test_containment_uses_smaller_host(self, spark):
        # tiny full mirror of a big host: permille = 1000 via min()
        rows = [("big", f"doc{i}") for i in range(10)] + [
            ("tiny", "doc0"), ("tiny", "doc1"),
        ]
        [r] = host_mirror_pairs(_docs(spark, rows)).collect()
        assert r["mirror_permille"] == 1000 and r["is_mirror"]

    def test_duplicate_rows_collapse(self, spark):
        # the same (host, text) twice is ONE distinct sha holding
        rows = [("hA", "x"), ("hA", "x"), ("hB", "x")]
        [r] = host_mirror_pairs(_docs(spark, rows)).collect()
        assert r["shared"] == 1 and r["n_a"] == 1 and r["n_b"] == 1
