

class TestUniMax:
    def _plan(self, spark, lang_tokens, budget=None, epoch_cap=3):
        from pyspark.sql import functions as F

        from readur_spark.ml.mixing import plan_unimax

        rows = []
        did = 0
        for lang, n in lang_tokens.items():
            # one doc per language carrying n whitespace tokens
            rows.append((did, " ".join(["w"] * n), lang))
            did += 1
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        b = F.lit(budget).cast("long") if budget is not None else None
        return {
            r["lang"]: r
            for r in plan_unimax(df, budget=b, epoch_cap=epoch_cap).collect()
        }

    def test_low_resource_capped_high_resource_shares(self, spark):
        # caps (E=3): tiny=30, mid=3000, big=30000. B=10000:
        # tiny capped (30 ≤ 10000/3=3333); mid: remaining 9970/2=4985
        # ≥ 3000 → capped; big: 6970/1=6970 < 30000 → share 6970.
        got = self._plan(
            spark, {"tiny": 10, "mid": 1000, "big": 10000}, budget=10000
        )
        assert got["tiny"]["capped"] and got["tiny"]["alloc"] == 30
        assert got["mid"]["capped"] and got["mid"]["alloc"] == 3000
        assert not got["big"]["capped"] and got["big"]["alloc"] == 6970
        # conservation: Σ alloc == B when budget < Σ cap
        assert sum(r["alloc"] for r in got.values()) == 10000
        # epoch ceiling respected everywhere
        assert all(r["epochs_milli"] <= 3000 for r in got.values())

    def test_equal_share_with_hamilton_remainder(self, spark):
        # three equal uncapped langs, B=100 → 34/33/33 in sort order
        got = self._plan(
            spark, {"aa": 1000, "bb": 1000, "cc": 1000}, budget=100
        )
        allocs = sorted(r["alloc"] for r in got.values())
        assert allocs == [33, 33, 34]
        assert sum(allocs) == 100

    def test_budget_exceeds_caps(self, spark):
        # B ≥ Σ cap → everyone capped at E epochs exactly
        got = self._plan(spark, {"x": 10, "y": 20}, budget=10**6)
        assert all(r["capped"] for r in got.values())
        assert {r["alloc"] for r in got.values()} == {30, 60}
        assert all(r["epochs_milli"] == 3000 for r in got.values())
