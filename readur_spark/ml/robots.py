"""robots.txt evaluation (RFC 9309) — crawl-politeness gating.

The reference engine (yonasBSD/readur) syncs sources it is ALLOWED to
read by construction (configured webdav/local/s3 mounts,
src/services/webdav/); a Common-Crawl-style web pipeline must instead
honor per-host robots.txt. Two tiers:

  1. `parse_robots` / `robots_allowed` — a from-spec RFC 9309 kernel:
     group selection by most-specific user-agent product token ('*'
     fallback), rule matching with '*' wildcards and the '$' end
     anchor, longest-match-wins precedence measured in pattern octets,
     allow preferred on ties, unmatched paths allowed. Pure Python,
     pinned against the RFC's own examples in tests/test_robots.py.
     (No code from any robots parser; written from the RFC text.)

  2. `robots_longest_match_gate` — the engine-side gate for the
     RFC's prefix subset (the overwhelmingly common case in real
     robots files): rules live in a (host, prefix, allow) table that
     BROADCASTS onto the corpus, candidate matches are a
     `startswith` filter, and precedence is one `max(struct(len,
     allow, prefix))` aggregate — no window, no sort, the url stream
     shuffles only on its own id for the final argmax. At 10^12 pages
     the rules side is per-host (millions of rows at web scale — still
     broadcastable at ~tens of MB; if not, it becomes the build side
     of a shuffled-hash join on host with the same plan shape).

The registered query derives a deterministic md5-based rule table from
the documents corpus (one disallow + one longer allow-exception per
host) so the DuckDB twin replays rule synthesis, candidate matching,
and the longest-match/allow-wins precedence value-for-value.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load


# ---- RFC 9309 kernel -------------------------------------------------------


def parse_robots(content: str, agent: str) -> list[tuple[str, bool]]:
    """Rules (pattern, allow) of the group governing `agent`.

    Group selection per RFC 9309 §2.2.1: the group whose user-agent
    line is the LONGEST case-insensitive match for the product token;
    '*' applies only if no specific group matches. Multiple user-agent
    lines may head one group; invalid lines are ignored."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_rules = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_rules and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_rules = False
            cur_agents.append(value.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if value:  # empty disallow/allow matches nothing
                cur_rules.append((value, key == "allow"))
            elif key == "disallow":
                pass  # "Disallow:" == allow everything: no rule
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    best_len = -1
    best_rules: list[tuple[str, bool]] = []
    star_rules: list[tuple[str, bool]] | None = None
    for agents, rules in groups:
        for ua in agents:
            if ua == "*":
                if star_rules is None:
                    star_rules = rules
            elif ua in agent and len(ua) > best_len:
                best_len = len(ua)
                best_rules = rules
    if best_len >= 0:
        return best_rules
    return star_rules if star_rules is not None else []


def _pattern_matches(pattern: str, path: str) -> bool:
    """'*' matches any octet sequence; trailing '$' anchors the end;
    otherwise the pattern is a prefix match."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    rx = ".*".join(parts) + ("$" if anchored else "")
    return re.match(rx, path) is not None


def robots_allowed(rules: list[tuple[str, bool]], path: str) -> bool:
    """RFC 9309 §2.2.2 precedence: among matching rules the longest
    pattern (in octets) wins; on a tie, allow wins; no match allows."""
    best: tuple[int, bool] | None = None
    for pattern, allow in rules:
        if _pattern_matches(pattern, path):
            key = (len(pattern.encode()), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


# ---- Catalyst gate (prefix subset) + oracle twin ---------------------------


def longest_match_gate(
    urls: DataFrame,
    rules: DataFrame,
    *,
    id_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Per-url robots decision under prefix rules (host, prefix,
    allow). Output: (id_col, allowed, rule_prefix) — rule_prefix null
    when no rule matched (allowed)."""
    cand = (
        urls.join(F.broadcast(rules), host_col)
        .filter(F.col(path_col).startswith(F.col("prefix")))
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.length("prefix").alias("l"),
                    F.col("allow").alias("a"),
                    F.col("prefix").alias("p"),
                )
            ).alias("m")
        )
    )
    return urls.join(cand, id_col, "left").select(
        id_col,
        F.coalesce(F.col("m.a"), F.lit(True)).alias("allowed"),
        F.col("m.p").alias("rule_prefix"),
    )


ROBOTS_ORACLE = """
    WITH urls AS MATERIALIZED (
      SELECT doc_id, source || '.example' AS host,
             '/doc' || doc_id || '.txt' AS path
      FROM documents
    ),
    hosts AS MATERIALIZED (SELECT DISTINCT host FROM urls),
    rules AS MATERIALIZED (
      SELECT host, '/doc'
               || (CAST(concat('0x', substr(md5(host), 1, 8)) AS BIGINT)
                   % 10) AS prefix,
             false AS allow
      FROM hosts
      UNION ALL
      SELECT host, '/doc'
               || (CAST(concat('0x', substr(md5(host), 1, 8)) AS BIGINT)
                   % 10)
               || (CAST(concat('0x', substr(md5(host || '#2'), 1, 8))
                        AS BIGINT) % 10) AS prefix,
             true AS allow
      FROM hosts
    ),
    cand AS MATERIALIZED (
      SELECT u.doc_id,
             max(struct_pack(l := length(r.prefix), a := r.allow,
                             p := r.prefix)) AS m
      FROM urls u JOIN rules r USING (host)
      WHERE starts_with(u.path, r.prefix)
      GROUP BY u.doc_id
    )
    SELECT u.doc_id,
           coalesce((c.m).a, true) AS allowed,
           (c.m).p AS rule_prefix
    FROM urls u LEFT JOIN cand c USING (doc_id)
"""


def _synthetic_rules(docs: DataFrame) -> DataFrame:
    """md5-derived per-host rule table: disallow '/doc<d1>', allow the
    longer exception '/doc<d1><d2>' — exercises longest-match
    precedence. Twin of the oracle's rules CTE."""
    hosts = docs.select(
        F.concat(F.col("source"), F.lit(".example")).alias("host")
    ).distinct()

    def digit(col, salt):
        key = F.concat(col, F.lit(salt)) if salt else col
        return (
            F.conv(F.substring(F.md5(F.encode(key, "UTF-8")), 1, 8), 16, 10)
            .cast("long")
            % 10
        ).cast("string")

    d1 = digit(F.col("host"), "")
    d2 = digit(F.col("host"), "#2")
    dis = hosts.select(
        "host",
        F.concat(F.lit("/doc"), d1).alias("prefix"),
        F.lit(False).alias("allow"),
    )
    allow = hosts.select(
        "host",
        F.concat(F.lit("/doc"), d1, d2).alias("prefix"),
        F.lit(True).alias("allow"),
    )
    return dis.union(allow)


@register("robots_longest_match_gate", oracle=ROBOTS_ORACLE)
def robots_longest_match_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 longest-match robots gate over the synthetic corpus
    urls, value-hash-checked: the DuckDB twin replays rule synthesis,
    prefix candidacy, and the (length, allow) precedence exactly."""
    docs = load(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".example")).alias("host"),
        F.concat(
            F.lit("/doc"), F.col("doc_id").cast("string"), F.lit(".txt")
        ).alias("path"),
    )
    rules = _synthetic_rules(docs)
    return longest_match_gate(urls, rules).select(
        "doc_id", "allowed", "rule_prefix"
    )


def parse_crawl_delay(content: str, agent: str) -> float | None:
    """Crawl-delay (seconds) of the group governing `agent` — the
    de-facto extension most crawlers honor (not standardized by RFC
    9309; parsed with the same group-selection rules). None when the
    governing group carries no directive or the value is malformed."""
    agent = agent.lower()
    groups: list[tuple[list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_delay: float | None = None
    in_rules = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_rules and cur_agents:
                groups.append((cur_agents, cur_delay))
                cur_agents, cur_delay = [], None
                in_rules = False
            cur_agents.append(value.lower())
        elif key in ("allow", "disallow", "crawl-delay"):
            in_rules = True
            if key == "crawl-delay":
                try:
                    cur_delay = float(value)
                except ValueError:
                    pass
    if cur_agents:
        groups.append((cur_agents, cur_delay))

    best_len = -1
    best: float | None = None
    star: float | None = None
    star_seen = False
    for agents, delay in groups:
        for ua in agents:
            if ua == "*":
                if not star_seen:
                    star, star_seen = delay, True
            elif ua in agent and len(ua) > best_len:
                best_len = len(ua)
                best = delay
    return best if best_len >= 0 else star
