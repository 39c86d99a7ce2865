"""ml/textqc.py compression-ratio signal."""

from __future__ import annotations

import zlib

from readur_spark.ml.textqc import compression_ratio_table


DOCS = [
    (1, "the " * 500),                               # boilerplate: tiny ratio
    (2, "The quick brown fox jumps over the lazy dog. " * 20),
    (3, "k9$Qz!vX2@pL7#mW4&nB8*rT5^cJ1(dF6)gH3-sY0_aE" * 12),  # gibberish
    (4, ""),                                         # empty: excluded
]


def _frame(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestCompressionRatio:
    def test_matches_zlib_exactly(self, spark):
        got = {
            r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["ratio_centi"])
            for r in compression_ratio_table(_frame(spark)).collect()
        }
        for doc_id, text in DOCS:
            if not text:
                assert doc_id not in got
                continue
            nb = len(text.encode())
            nc = len(zlib.compress(text.encode(), 6))
            assert got[doc_id] == (nb, nc, (100 * nc) // nb)

    def test_orders_boilerplate_below_prose_below_gibberish(self, spark):
        got = {
            r["doc_id"]: r["ratio_centi"]
            for r in compression_ratio_table(_frame(spark)).collect()
        }
        assert got[1] < got[2] < got[3]
