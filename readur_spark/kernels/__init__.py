"""Pure-Python reference kernels (no Spark imports allowed here).

These functions define the engine's semantic contract: the Spark
pipeline (readur_spark.operators.extract) must produce byte-identical
output to these kernels for every row. Each kernel documents the
reference behaviour it reimplements with a file:line citation into
/root/reference (yonasBSD/readur). Thresholds and fallback ladders are
part of the golden contract — do not "clean them up".
"""

from readur_spark.kernels.extract import extract_page, ExtractResult  # noqa: F401
