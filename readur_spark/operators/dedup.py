"""Content dedup — the reference's ingestion dedup policies on Spark.

Reference semantics (yonasBSD/readur):
  - SHA-256 content hash as dedup key:
    src/ingestion/document_ingestion.rs:310-316 (→ built-in F.sha2)
  - 4 policies Skip / ReturnExisting / AllowDuplicateContent /
    TrackAsDuplicate keyed on hash lookup:
    src/ingestion/document_ingestion.rs:20-29,121-169
  - duplicate-groups query (B17): src/db/documents/management.rs:87-147

Spark mapping (SURVEY.md §2 A6): the per-upload point lookup becomes a
set-at-a-time operator —
  Skip               → keep first occurrence per hash (window or
                       agg-join, see below)
  TrackAsDuplicate   → same, but duplicates survive with
                       failure_reason='duplicate_content'
  against-existing   → left_anti join on sha256 vs the already-
                       extracted table (incremental runs)

Scale notes: dedup keys are uniform SHA-256 values → no key skew by
construction; the shuffle is unavoidable (global property) but AQE
coalesces post-shuffle partitions. `dedup_skip` uses min(url)-per-hash
agg + semi-join rather than a window: a window sorts every partition
by (hash, ts, url) while the agg is a partial-aggregatable hash-agg —
cheaper at 10^12 rows, same result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POLICY_SKIP = "skip"
POLICY_ALLOW = "allow_duplicate_content"
POLICY_TRACK = "track_as_duplicate"


def with_sha256(pages: DataFrame) -> DataFrame:
    if "sha256" in pages.columns:
        return pages
    return pages.withColumn("sha256", F.sha2(F.col("html"), 256))


def _first_per_hash(pages: DataFrame) -> DataFrame:
    """One winner per sha256: earliest (warc_ts, url). Expressed as a
    map-side-combinable agg (min of a sortable struct), not a window."""
    winners = pages.groupBy("sha256").agg(
        F.min(F.struct("warc_ts", "url")).alias("w")
    ).select("sha256", F.col("w.url").alias("_winner_url"))
    return winners


def dedup_skip(pages: DataFrame) -> DataFrame:
    """Skip policy: drop all but the first occurrence of each payload."""
    pages = with_sha256(pages)
    winners = _first_per_hash(pages)
    return pages.join(
        winners,
        (pages["sha256"] == winners["sha256"])
        & (pages["url"] == winners["_winner_url"]),
        "left_semi",
    )


def dedup_track(pages: DataFrame) -> DataFrame:
    """TrackAsDuplicate policy: all rows survive; duplicates carry
    is_duplicate=true + duplicate_of (the winner url) so the extraction
    stage can emit failure_reason='duplicate_content' rows (the
    reference's TrackedAsDuplicate ingestion result —
    document_ingestion.rs:31-41)."""
    pages = with_sha256(pages)
    winners = _first_per_hash(pages)
    joined = pages.join(winners, "sha256", "left")
    return joined.withColumn(
        "is_duplicate", F.col("url") != F.col("_winner_url")
    ).withColumnRenamed("_winner_url", "duplicate_of")


def dedup_against_existing(pages: DataFrame, existing: DataFrame) -> DataFrame:
    """Incremental-run dedup: drop pages whose content hash is already
    in the extracted table (the reference's per-user hash lookup,
    src/db/documents/crud.rs:117-134, as one anti-join)."""
    pages = with_sha256(pages)
    existing_hashes = existing.select("sha256").distinct()
    return pages.join(existing_hashes, "sha256", "left_anti")


def duplicate_groups(docs: DataFrame, hash_col: str = "sha256") -> DataFrame:
    """B17 duplicate-groups — src/db/documents/management.rs:87-147.
    The reference's CTE + self-join collapses to one agg with
    collect_list (SURVEY.md §2 B17)."""
    return (
        docs.groupBy(hash_col)
        .agg(
            F.count("*").alias("duplicate_count"),
            F.sort_array(F.collect_list("url")).alias("urls"),
        )
        .filter(F.col("duplicate_count") > 1)
        .orderBy(F.desc("duplicate_count"), hash_col)
    )
