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

Scale notes (measured: payload shuffles, not kernel CPU, bound the
pipeline at sf0.1×64 replicas): dedup is structured so the MB-scale
`html` payload crosses the wire AT MOST ONCE —

  1. winner selection runs on a slim projection (sha256, warc_ts, url)
     ≈ 100 B/row: a partial-aggregatable hash-agg (not a window, which
     would sort whole partitions), shuffling ~1% of the table's bytes.
  2. the winner set joins back on `url` with a shuffle-hash hint (the
     slim side builds the hash table; no sort of the payload side).
     That one full-payload shuffle is hash(url) — exactly the url-hash
     partitioning the north rule requires for the extraction stage —
     so the pipeline reuses it and never repartitions again.

SHA-256 keys are uniform → no key skew by construction; AQE coalesces
post-shuffle partitions.
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
    """One winner per sha256: earliest (warc_ts, url). Runs on the slim
    key projection only (Catalyst prunes, but the explicit select is
    self-documenting); map-side-combinable agg (min of a sortable
    struct), not a window."""
    winners = pages.select("sha256", "warc_ts", "url").groupBy("sha256").agg(
        F.min(F.struct("warc_ts", "url")).alias("w")
    ).select(
        F.col("sha256").alias("_winner_hash"), F.col("w.url").alias("_winner_url")
    )
    return winners


def dedup_skip(pages: DataFrame) -> DataFrame:
    """Skip policy: drop all but the first occurrence of each payload.

    Semi-join on (sha256, url) — not url alone — so a repeated url with
    *different* content (a recrawl an ingest path failed to
    canonicalize, cf. sources.warc.latest_per_url) can never ride a
    winner url into the survivor set. url uniqueness is the corpus
    contract (input_hint) and read_warc_pages enforces it by default;
    the composite key makes this operator safe even when a caller
    bypasses that.

    The winner set carries an EXPLICIT broadcast hint (round 4): it is
    slim (two short strings/row) and bounded by the distinct-content
    count, while the probe side carries MB-scale payloads — leaving
    the choice to AQE's 10 MB coin-flip meant corpora a hair over the
    threshold shuffled the whole payload column (measured: the 64k-page
    scaling corpus sat exactly on the edge). With the hint the payload
    side never shuffles and extraction stays narrow over scan splits
    (the Iceberg-bucketed storage-partitioned-join analog). For winner
    sets too large even for an explicit broadcast (≫ executor memory),
    callers pass dedup_stage='post' or pre-bucket both sides."""
    pages = with_sha256(pages)
    winners = _first_per_hash(pages).select(
        F.col("_winner_hash").alias("sha256"),
        F.col("_winner_url").alias("url"),
    )
    return pages.join(F.broadcast(winners), ["sha256", "url"], "left_semi")


def dedup_track(pages: DataFrame) -> DataFrame:
    """TrackAsDuplicate policy: all rows survive; duplicates carry
    is_duplicate=true + duplicate_of (the winner url) so the extraction
    stage can emit failure_reason='duplicate_content' rows (the
    reference's TrackedAsDuplicate ingestion result —
    document_ingestion.rs:31-41)."""
    pages = with_sha256(pages)
    # slim-side work: ((url, sha256) → duplicate_of) mapping, built from
    # the key projection so the payload is not shuffled to compute it.
    # The map is deduped on its join key: a url that repeats in the
    # input (un-canonicalized ingest) must not multiply payload rows.
    keys = pages.select("sha256", "warc_ts", "url")
    winners = _first_per_hash(keys)
    url_map = (
        keys.join(winners, F.col("sha256") == F.col("_winner_hash"), "left")
        .select(
            F.col("url").alias("_map_url"),
            F.col("sha256").alias("_map_sha"),
            F.col("_winner_url").alias("duplicate_of"),
        )
        .dropDuplicates(["_map_url", "_map_sha"])
    )
    # payload-side join on (url, sha256): AQE broadcasts url_map when it
    # fits, else shuffle join (hash key == extraction partitioning)
    joined = pages.join(
        url_map,
        (F.col("url") == F.col("_map_url")) & (F.col("sha256") == F.col("_map_sha")),
    ).drop("_map_url", "_map_sha")
    return joined.withColumn(
        "is_duplicate", F.col("url") != F.col("duplicate_of")
    )


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


def filter_ignored(
    pages: DataFrame,
    ignored: DataFrame,
    *,
    by_source: bool = False,
) -> DataFrame:
    """The ignored-files gate: files a user deleted must never be
    re-ingested by source sync (src/db/ignored_files.rs:343-361,
    migrations/20250624000001). Matching is by content hash alone, or
    by (hash, source_type, source_path) when source context is given —
    the reference's two `is_file_ignored` query shapes, evaluated here
    as ONE anti-join for the whole batch instead of a per-file lookup.
    The ignore list is tiny relative to the corpus → broadcast."""
    pages = with_sha256(pages)
    keys = ["sha256"] + (["source_type", "source_path"] if by_source else [])
    ignore_keys = ignored.select(*keys).distinct()
    return pages.join(F.broadcast(ignore_keys), keys, "left_anti")
