"""WebVTT subtitle parsing — the video-text alignment primitive.

Video-text datasets (HowTo100M, YT-Temporal, VideoCC) are built by
aligning a video's SUBTITLE TRACK with sampled frames; on the web the
track arrives as WebVTT (W3C "WebVTT: The Web Video Text Tracks
Format") — cue blocks of `HH:MM:SS.mmm --> HH:MM:SS.mmm` timing lines
followed by payload text, separated by blank lines, behind a WEBVTT
header. This module parses tracks into a (cue_idx, start_ms, end_ms,
text) frame — integer milliseconds, so downstream frame-sampling
(ml/multimodal.py's deterministic frame plan) can join cues to frames
with pure integer range predicates.

All Catalyst: one split on blank-line block boundaries + posexplode,
timestamp fields via regexp capture groups recombined with integer
arithmetic (h·3600000 + m·60000 + s·1000 + mmm). Malformed blocks
(no timing arrow) drop out via the regexp null-guard; cue payload may
span multiple lines and keeps internal newlines normalized to one
space (the inter-cue convention subtitle aligners use).

Scale design (10^12 tracks): per-track state only — the block explode
keys on (url, block position); the emitted cue frame is slim and the
track payload crosses once. Same plan family as the CDX line parse.

Reference tie-in: the reference extracts per-page OCR text with span
provenance; a cue is the time-domain twin of a span.

Construction rule (SQL-restatable, over ``documents``): each doc's
track holds n = doc_id % 3 + 1 cues; cue c starts at
(c·7 + doc_id % 5)·1000 ms, ends 1500 + c·250 ms later, with payload
'cue <doc_id>_<c>'. Timestamps render as 00:MM:SS.mmm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load, synthetic_url

_TIMING_RE = (
    "(\\d+):(\\d{2}):(\\d{2})\\.(\\d{3})"
    " --> "
    "(\\d+):(\\d{2}):(\\d{2})\\.(\\d{3})"
)


def _ts_ms(block: Column, base_group: int) -> Column:
    """Milliseconds from timing groups base_group..base_group+3."""
    g = lambda i: F.regexp_extract(block, _TIMING_RE, i).try_cast("long")
    return (
        g(base_group) * 3600000
        + g(base_group + 1) * 60000
        + g(base_group + 2) * 1000
        + g(base_group + 3)
    )


def parse_vtt_cues(
    tracks: DataFrame, *, url_col: str = "url", vtt_col: str = "vtt"
) -> DataFrame:
    """(url, cue_idx, start_ms, end_ms, text) — cue order is document
    order; blocks without a timing line (the WEBVTT header, NOTE
    blocks) are skipped without consuming a cue index."""
    blocks = tracks.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.split(F.col(vtt_col), "\\n\\n+")).alias(
            "pos", "block"
        ),
    ).filter(F.col("block").rlike(_TIMING_RE))
    w = F.col("block")
    payload = F.regexp_replace(
        F.regexp_extract(w, _TIMING_RE + "\\n([\\s\\S]*)", 9), "\\n+", " "
    )
    from pyspark.sql import Window

    idx = Window.partitionBy("url").orderBy("pos")
    return blocks.select(
        "url",
        (F.row_number().over(idx) - 1).cast("long").alias("cue_idx"),
        _ts_ms(w, 1).alias("start_ms"),
        _ts_ms(w, 5).alias("end_ms"),
        F.trim(payload).alias("text"),
    )


# ---- constructed corpus (module-docstring rule) -----------------------------


def constructed_vtt_tracks(docs: DataFrame) -> DataFrame:
    """(url, vtt) under the construction rule, including a NOTE block
    the parser must skip without consuming an index."""
    def ts(ms: Column) -> Column:
        return F.concat(
            F.lit("00:"),
            F.lpad(F.floor(ms / 60000).cast("string"), 2, "0"),
            F.lit(":"),
            F.lpad(F.floor((ms % 60000) / 1000).cast("string"), 2, "0"),
            F.lit("."),
            F.lpad((ms % 1000).cast("string"), 3, "0"),
        )

    def cue(c: int) -> Column:
        start = (F.lit(c * 7) + F.col("doc_id") % 5) * 1000
        end = start + 1500 + c * 250
        return F.concat(
            ts(start), F.lit(" --> "), ts(end), F.lit("\ncue "),
            F.col("doc_id"), F.lit(f"_{c}\n\n"),
        )

    n = F.col("doc_id") % 3 + 1
    body = F.concat(
        cue(0),
        F.when(n >= 2, cue(1)).otherwise(F.lit("")),
        F.when(n >= 3, cue(2)).otherwise(F.lit("")),
    )
    vtt = F.concat(
        F.lit("WEBVTT\n\nNOTE synthetic track\n\n"), body
    )
    return docs.select(synthetic_url().alias("url"), vtt.alias("vtt"))


@register(
    "vtt_cue_parse",
    oracle="""
    WITH cues AS (
      SELECT doc_id, source, c AS cue_idx,
             (c * 7 + doc_id % 5) * 1000 AS start_ms,
             (c * 7 + doc_id % 5) * 1000 + 1500 + c * 250 AS end_ms,
             'cue ' || doc_id || '_' || c AS text
      FROM documents, unnest(range(doc_id % 3 + 1)) AS t(c)
    )
    SELECT 'https://' || source || '.example/doc' || doc_id || '.txt'
             AS url,
           CAST(cue_idx AS BIGINT) AS cue_idx,
           CAST(start_ms AS BIGINT) AS start_ms,
           CAST(end_ms AS BIGINT) AS end_ms,
           text
    FROM cues
    """,
)
def vtt_cue_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the constructed WebVTT tracks — the oracle restates every
    cue's timing (in integer ms) and payload straight from the rule,
    independent of the block split, timing regex, and header/NOTE
    skipping under test."""
    tracks = constructed_vtt_tracks(load(spark, sf_dir, "documents"))
    return parse_vtt_cues(tracks)


# ---- cue -> sampled-frame alignment ----------------------------------------

FRAME_PERIOD_MS = 500  # the sampler's fixed clock: frame k at k*500 ms


@register(
    "cue_frame_align",
    oracle=f"""
    WITH cues AS (
      SELECT doc_id, source, c AS cue_idx,
             (c * 7 + doc_id % 5) * 1000 AS start_ms,
             (c * 7 + doc_id % 5) * 1000 + 1500 + c * 250 AS end_ms
      FROM documents, unnest(range(doc_id % 3 + 1)) AS t(c)
    )
    SELECT 'https://' || source || '.example/doc' || doc_id || '.txt'
             AS url,
           CAST(cue_idx AS BIGINT) AS cue_idx,
           CAST((start_ms + {FRAME_PERIOD_MS - 1}) // {FRAME_PERIOD_MS}
                AS BIGINT) AS first_frame,
           CAST((end_ms - 1) // {FRAME_PERIOD_MS} AS BIGINT) AS last_frame,
           CAST(greatest((end_ms - 1) // {FRAME_PERIOD_MS}
                - (start_ms + {FRAME_PERIOD_MS - 1}) // {FRAME_PERIOD_MS}
                + 1, 0) AS BIGINT) AS n_frames
    FROM cues
    """,
)
def cue_frame_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed chain: the parsed cue table aligned to a fixed-clock
    frame sampler (frame k at k·500 ms — the time-domain face of
    ml/multimodal.py's sampler stub). Coverage is CLOSED FORM in
    integer arithmetic — first covered frame = ceil(start/period),
    last = floor((end-1)/period) — so a trillion cues align with no
    join and no explode; the oracle replays the parse-side timings
    from the rule plus the same arithmetic."""
    cues = parse_vtt_cues(
        constructed_vtt_tracks(load(spark, sf_dir, "documents"))
    )
    p = FRAME_PERIOD_MS
    return cues.select(
        "url", "cue_idx",
        F.expr(f"(start_ms + {p - 1}L) div {p}L").alias("first_frame"),
        F.expr(f"(end_ms - 1L) div {p}L").alias("last_frame"),
        F.expr(
            f"greatest((end_ms - 1L) div {p}L"
            f" - (start_ms + {p - 1}L) div {p}L + 1L, 0L)"
        ).alias("n_frames"),
    )
