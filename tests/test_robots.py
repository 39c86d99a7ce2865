"""ml/robots.py — RFC 9309 kernel + Catalyst longest-match gate."""

from __future__ import annotations

import pytest

from readur_spark.ml.robots import (
    longest_match_gate,
    parse_robots,
    robots_allowed,
)

SAMPLE = """
# comment line
User-agent: ExampleBot
Disallow: /private/
Allow: /private/public$

User-agent: crawler-a
User-agent: crawler-b
Disallow: /shared/

User-agent: *
Disallow: /tmp/
Allow:
"""


class TestGroupSelection:
    def test_specific_group_wins_over_star(self):
        rules = parse_robots(SAMPLE, "ExampleBot/1.0")
        assert ("/private/", False) in rules
        assert all(p != "/tmp/" for p, _ in rules)

    def test_agent_match_is_case_insensitive_substring(self):
        rules = parse_robots(SAMPLE, "mozilla-compatible examplebot v2")
        assert ("/private/", False) in rules

    def test_multiple_agent_lines_share_group(self):
        assert parse_robots(SAMPLE, "crawler-a") == [("/shared/", False)]
        assert parse_robots(SAMPLE, "crawler-b") == [("/shared/", False)]

    def test_star_fallback(self):
        rules = parse_robots(SAMPLE, "unknown-bot")
        assert rules == [("/tmp/", False)]

    def test_longest_agent_token_wins(self):
        content = (
            "User-agent: foo\nDisallow: /a\n\n"
            "User-agent: foobar\nDisallow: /b\n"
        )
        assert parse_robots(content, "foobar/2") == [("/b", False)]

    def test_no_groups_allows_everything(self):
        assert parse_robots("", "anybot") == []
        assert robots_allowed([], "/anything") is True


class TestRuleMatching:
    """Precedence examples in the spirit of RFC 9309 §2.2.2 / §5.2."""

    @pytest.mark.parametrize(
        "rules,path,want",
        [
            # longest match wins
            ([("/p", True), ("/", False)], "/page", True),
            ([("/folder/", True), ("/folder", False)], "/folder/page", True),
            ([("/page", False), ("/*.htm", True)], "/page.htm", True),
            # tie -> allow wins
            ([("/page", False), ("/page", True)], "/page", True),
            # '$' end anchor
            ([("/*.php$", False)], "/index.php", False),
            ([("/*.php$", False)], "/index.php?x=1", True),
            # '*' wildcard spans octets
            ([("/a*b", False)], "/a-long-middle-b", False),
            ([("/a*b", False)], "/a-no-match", True),
            # unmatched -> allowed
            ([("/private/", False)], "/public/", True),
        ],
    )
    def test_precedence(self, rules, path, want):
        assert robots_allowed(rules, path) is want

    def test_length_measured_in_octets(self):
        # 2-char unicode prefix is 4 octets > 3-octet ascii prefix
        rules = [("/éé", True), ("/ée", False)]
        assert robots_allowed(rules, "/éée") is True


class TestCatalystGate:
    def test_longest_match_and_default(self, spark):
        urls = spark.createDataFrame(
            [
                (1, "h.example", "/doc17.txt"),   # allow exception /doc17
                (2, "h.example", "/doc19.txt"),   # disallow /doc1
                (3, "h.example", "/doc55.txt"),   # no rule -> allowed
                (4, "other.example", "/doc17.txt"),  # host has no rules
            ],
            "doc_id long, host string, path string",
        )
        rules = spark.createDataFrame(
            [
                ("h.example", "/doc1", False),
                ("h.example", "/doc17", True),
            ],
            "host string, prefix string, allow boolean",
        )
        got = {
            r["doc_id"]: (r["allowed"], r["rule_prefix"])
            for r in longest_match_gate(urls, rules).collect()
        }
        assert got == {
            1: (True, "/doc17"),
            2: (False, "/doc1"),
            3: (True, None),
            4: (True, None),
        }

    def test_tie_allow_wins(self, spark):
        urls = spark.createDataFrame(
            [(1, "h", "/x/page")], "doc_id long, host string, path string"
        )
        rules = spark.createDataFrame(
            [("h", "/x/", False), ("h", "/x/", True)],
            "host string, prefix string, allow boolean",
        )
        row = longest_match_gate(urls, rules).first()
        assert row["allowed"] is True


class TestCrawlDelay:
    CONTENT = (
        "User-agent: fastbot\nCrawl-delay: 0.5\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 10\nDisallow: /tmp/\n\n"
        "User-agent: nodelay\nDisallow: /y\n"
    )

    def test_specific_group(self):
        from readur_spark.ml.robots import parse_crawl_delay

        assert parse_crawl_delay(self.CONTENT, "fastbot/2.1") == 0.5

    def test_star_fallback(self):
        from readur_spark.ml.robots import parse_crawl_delay

        assert parse_crawl_delay(self.CONTENT, "unknown") == 10.0

    def test_group_without_directive_is_none(self):
        from readur_spark.ml.robots import parse_crawl_delay

        assert parse_crawl_delay(self.CONTENT, "nodelay") is None

    def test_malformed_value_ignored(self):
        from readur_spark.ml.robots import parse_crawl_delay

        assert parse_crawl_delay(
            "User-agent: *\nCrawl-delay: soon\n", "any"
        ) is None
