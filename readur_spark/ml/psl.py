"""Public-suffix-list (PSL) registered-domain extraction.

`ml/urlfilters.py` approximates the registrable domain as the last two
host labels and documents the deviation ("a public-suffix list would
refine multi-label TLDs like co.uk"). This module closes it with the
real Mozilla PSL algorithm (publicsuffix.org/list/ semantics):

  - a rule set of normal (`co.uk`), wildcard (`*.kobe.jp`) and
    exception (`!city.kobe.jp`) rules;
  - the matching rule with the MOST labels wins, except an exception
    rule beats any wildcard it punches a hole in;
  - the public suffix is the winning rule's span (wildcard: one label
    deeper than its base; exception: one label shallower than the
    rule); with no match the default rule `*` applies (public suffix =
    the bare TLD);
  - the registered domain is the public suffix plus exactly one more
    label, or '' when the host IS a public suffix.

Domain capping, blocklists, and per-site rollups should group on THIS
key: last-two-labels splits `a.co.uk` sites apart from `b.co.uk` sites
correctly but merges every `*.co.uk` site into one pseudo-domain
`co.uk`, destroying the cap.

Scale design: hosts are label-split and their suffix candidates
exploded (≤ host-depth rows per host, slim strings), joined against
the BROADCAST rule table (the full PSL is ~10k rules, trivially
broadcast), and reduced with one max(struct) argmax per host — pure
Catalyst end-to-end, no Python. At corpus scale the function belongs
on the DISTINCT-host dimension (millions of rows, not 10^12), with the
result broadcast-joined back to pages; the registered query does
exactly that.

Correctness: the registered query builds hosts from the driver's
`documents` table by an 8-branch construction rule covering every PSL
case (normal multi-label, wildcard, exception inside the wildcard,
exception at depth 1, unknown TLD default, host-is-suffix), and the
DuckDB oracle replays the SAME rule table and matching algorithm in
SQL — two independent longest-match implementations that must agree
row-for-row. The embedded rule subset mirrors the public list's test
vectors (publicsuffix.org/list/ is public data); production swaps in
the full list as a dimension table via `psl_rules_df`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load
from readur_spark.ml.urlfilters import url_host

# (rule-without-markers, kind): 'n' normal, 'w' wildcard base,
# 'x' exception. Subset of the public list covering its documented
# test shapes (publicsuffix.org/list/).
PSL_RULES: list[tuple[str, str]] = [
    ("com", "n"),
    ("org", "n"),
    ("net", "n"),
    ("io", "n"),
    ("uk", "n"),
    ("co.uk", "n"),
    ("org.uk", "n"),
    ("jp", "n"),
    ("kobe.jp", "w"),       # *.kobe.jp
    ("city.kobe.jp", "x"),  # !city.kobe.jp
    ("ck", "w"),            # *.ck
    ("www.ck", "x"),        # !www.ck
    ("au", "n"),
    ("com.au", "n"),
]


def psl_rules_df(spark: SparkSession,
                 rules: list[tuple[str, str]] | None = None) -> DataFrame:
    """The rule table as a broadcastable dimension frame."""
    return spark.createDataFrame(
        rules or PSL_RULES, "rule string, kind string"
    )


def registered_domains(hosts: DataFrame, rules: DataFrame) -> DataFrame:
    """(host, public_suffix, registered_domain) for each DISTINCT host
    in `hosts` (column `host`). Candidate suffixes exploded, broadcast
    rule join, exception-beats-wildcard-beats-length argmax."""
    h = hosts.select("host").where(F.col("host") != "").distinct()
    labels = F.split(F.col("host"), r"\.")
    n = F.size(labels)
    cand = (
        h.withColumn("labels", labels)
        .withColumn("n", n)
        .select(
            "host", "labels", "n",
            F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i"),
        )
        .select(
            "host",
            F.concat_ws(
                ".",
                F.slice(
                    F.col("labels"), F.col("i"),
                    F.col("n") - F.col("i") + 1,
                ),
            ).alias("suffix"),
            (F.col("n") - F.col("i") + 1).alias("n_labels"),
            F.when(
                F.col("i") > 1, F.element_at(F.col("labels"), F.col("i") - 1)
            ).otherwise(F.lit("")).alias("prev_label"),
        )
    )
    j = cand.join(
        F.broadcast(rules), cand["suffix"] == rules["rule"], "inner"
    )
    # effective public suffix per matched rule
    eff = (
        F.when(F.col("kind") == "x",
               F.regexp_replace(F.col("suffix"), r"^[^.]+\.", ""))
        .when(F.col("kind") == "w",
              F.concat(F.col("prev_label"), F.lit("."), F.col("suffix")))
        .otherwise(F.col("suffix"))
    )
    eff_n = (
        F.when(F.col("kind") == "x", F.col("n_labels") - 1)
        .when(F.col("kind") == "w", F.col("n_labels") + 1)
        .otherwise(F.col("n_labels"))
    )
    prio = F.when(F.col("kind") == "x", F.lit(1)).otherwise(F.lit(0))
    matched = (
        j.where((F.col("kind") != "w") | (F.col("prev_label") != ""))
        .select(
            "host",
            F.struct(
                prio.alias("prio"),
                eff_n.alias("eff_n"),
                eff.alias("eff"),
            ).alias("m"),
        )
        .groupBy("host")
        .agg(F.max("m").alias("m"))
        .select("host", F.col("m.eff").alias("ps"))
    )
    out = h.join(matched, "host", "left").select(
        "host",
        # default rule '*': the bare last label
        F.coalesce(
            F.col("ps"),
            F.element_at(F.split(F.col("host"), r"\."), -1),
        ).alias("public_suffix"),
    )
    left = F.when(
        F.col("host") != F.col("public_suffix"),
        F.substring(
            F.col("host"), F.lit(1),
            F.length("host") - F.length("public_suffix") - 1,
        ),
    ).otherwise(F.lit(""))
    reg = F.when(
        F.col("host") == F.col("public_suffix"), F.lit("")
    ).otherwise(
        F.concat(
            F.regexp_extract(left, r"([^.]+)$", 1),
            F.lit("."),
            F.col("public_suffix"),
        )
    )
    return out.select(
        "host", "public_suffix", reg.alias("registered_domain")
    )


# ---------------------------------------------------------------------------
# constructed-corpus oracle
# ---------------------------------------------------------------------------


def _constructed_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-branch construction over documents: one host per doc covering
    normal 1- and 2-label suffixes, wildcard, exception-in-wildcard,
    exception-at-TLD, unknown-TLD default, and host-is-suffix."""
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    b = F.col("doc_id") % 8
    host = (
        F.when(b == 0, F.concat(F.lit("a"), d, F.lit(".example.com")))
        .when(b == 1, F.concat(F.lit("deep.b"), d, F.lit(".co.uk")))
        .when(b == 2, F.lit("x.city.kobe.jp"))
        .when(b == 3, F.concat(F.lit("a"), d, F.lit(".foo.kobe.jp")))
        .when(b == 4, F.concat(F.lit("shop.c"), d, F.lit(".com.au")))
        .when(b == 5, F.lit("www.ck"))
        .when(b == 6, F.concat(F.lit("a"), d, F.lit(".weird")))
        .otherwise(F.lit("com"))
    )
    return docs.select(host.alias("host"))


_PSL_ORACLE = """
    WITH hosts AS (
      SELECT DISTINCT
        CASE doc_id % 8
          WHEN 0 THEN 'a' || CAST(doc_id AS VARCHAR) || '.example.com'
          WHEN 1 THEN 'deep.b' || CAST(doc_id AS VARCHAR) || '.co.uk'
          WHEN 2 THEN 'x.city.kobe.jp'
          WHEN 3 THEN 'a' || CAST(doc_id AS VARCHAR) || '.foo.kobe.jp'
          WHEN 4 THEN 'shop.c' || CAST(doc_id AS VARCHAR) || '.com.au'
          WHEN 5 THEN 'www.ck'
          WHEN 6 THEN 'a' || CAST(doc_id AS VARCHAR) || '.weird'
          ELSE 'com' END AS host
      FROM documents
    ),
    rules(rule, kind) AS (VALUES
      ('com', 'n'), ('org', 'n'), ('net', 'n'), ('io', 'n'),
      ('uk', 'n'), ('co.uk', 'n'), ('org.uk', 'n'), ('jp', 'n'),
      ('kobe.jp', 'w'), ('city.kobe.jp', 'x'),
      ('ck', 'w'), ('www.ck', 'x'), ('au', 'n'), ('com.au', 'n')),
    cand AS (
      SELECT h.host,
             array_to_string(string_split(h.host, '.')[t.i:], '.')
               AS suffix,
             len(string_split(h.host, '.')) - t.i + 1 AS n_labels,
             CASE WHEN t.i > 1
                  THEN string_split(h.host, '.')[t.i - 1]
                  ELSE '' END AS prev_label
      FROM hosts h,
           UNNEST(generate_series(1, len(string_split(h.host, '.'))))
             AS t(i)
    ),
    matched AS (
      SELECT c.host,
             CASE r.kind
               WHEN 'x' THEN regexp_replace(c.suffix, '^[^.]+\\.', '')
               WHEN 'w' THEN c.prev_label || '.' || c.suffix
               ELSE c.suffix END AS eff,
             CASE r.kind
               WHEN 'x' THEN c.n_labels - 1
               WHEN 'w' THEN c.n_labels + 1
               ELSE c.n_labels END AS eff_n,
             CASE WHEN r.kind = 'x' THEN 1 ELSE 0 END AS prio
      FROM cand c JOIN rules r ON r.rule = c.suffix
      WHERE r.kind <> 'w' OR c.prev_label <> ''
    ),
    winner AS (
      SELECT host, eff
      FROM matched
      QUALIFY row_number() OVER (
        PARTITION BY host ORDER BY prio DESC, eff_n DESC, eff) = 1
    ),
    ps AS (
      SELECT h.host,
             coalesce(w.eff,
                      string_split(h.host, '.')[-1]) AS public_suffix
      FROM hosts h LEFT JOIN winner w USING (host)
    )
    SELECT host, public_suffix,
           CASE WHEN host = public_suffix THEN ''
                ELSE regexp_extract(
                       substr(host, 1,
                              len(host) - len(public_suffix) - 1),
                       '([^.]+)$', 1) || '.' || public_suffix END
             AS registered_domain
    FROM ps
"""


@register("psl_registered_domain", oracle=_PSL_ORACLE)
def psl_registered_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PSL longest-match algorithm value-hash-checked end-to-end:
    Spark's explode-join-argmax vs an independent SQL replay of the
    same rule table, across all 8 construction branches (wildcard,
    exception, default, host-is-suffix included)."""
    hosts = _constructed_hosts(spark, sf_dir)
    return registered_domains(hosts, psl_rules_df(spark))


# ---------------------------------------------------------------------------
# PSL-keyed domain capping (the composition the module exists for)
# ---------------------------------------------------------------------------


def domain_cap_psl(
    df: DataFrame,
    max_per_domain: int,
    rules: DataFrame,
    *,
    url_col: str = "url",
) -> DataFrame:
    """`ml/urlfilters.domain_cap_sample` keyed on the REAL registered
    domain: the PSL map is computed once on the distinct-host
    dimension (tiny vs the corpus) and broadcast-joined back, then the
    cap window runs per registered domain. Under last-two-labels every
    `*.co.uk` site shares one pseudo-domain and the cap throttles the
    whole TLD; under PSL each site gets its own budget."""
    from pyspark.sql import Window

    with_host = df.withColumn("host", url_host(F.col(url_col)))
    dom = registered_domains(
        with_host.select("host"), rules
    ).select("host", "registered_domain")
    order = F.md5(F.encode(F.col(url_col), "UTF-8"))
    w = Window.partitionBy("registered_domain").orderBy(
        order.alias("o"), url_col
    )
    return (
        with_host.join(F.broadcast(dom), "host")
        .withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("domain_rank") <= max_per_domain)
    )


@register(
    "domain_cap_registered",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
               THEN 'https://u' || CAST(doc_id AS VARCHAR) || '.site'
                    || CAST(doc_id % 5 AS VARCHAR) || '.co.uk/p'
                    || CAST(doc_id AS VARCHAR)
               ELSE 'https://u' || CAST(doc_id AS VARCHAR) || '.site'
                    || CAST(doc_id % 7 AS VARCHAR) || '.example.com/p'
                    || CAST(doc_id AS VARCHAR) END AS url,
             -- independent derivation: the registered domain follows
             -- from the construction rule, not from a PSL replay
             CASE WHEN doc_id % 2 = 0
               THEN 'site' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
               ELSE 'example.com' END AS registered_domain
      FROM documents
    ),
    r AS (
      SELECT doc_id, registered_domain,
             row_number() OVER (
               PARTITION BY registered_domain ORDER BY md5(url), url
             ) AS domain_rank
      FROM u
    )
    SELECT doc_id, registered_domain,
           CAST(domain_rank AS BIGINT) AS domain_rank
    FROM r WHERE domain_rank <= 10
    """,
)
def domain_cap_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap documents at 10 per PSL registered domain over a corpus
    where last-two-labels would be WRONG: the co.uk half must key on
    site<k>.co.uk (5 separate budgets), while the .com half keys on
    example.com (subdomains u<d>.site<k>.example.com all share ONE
    registrant budget — 'site<k>' is a subdomain label there, not a
    registration). The oracle derives both keys straight from the
    construction rule, independent of the PSL join machinery."""
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    url = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("https://u"), d, F.lit(".site"),
                 (F.col("doc_id") % 5).cast("string"),
                 F.lit(".co.uk/p"), d),
    ).otherwise(
        F.concat(F.lit("https://u"), d, F.lit(".site"),
                 (F.col("doc_id") % 7).cast("string"),
                 F.lit(".example.com/p"), d),
    )
    out = domain_cap_psl(
        docs.select("doc_id", url.alias("url")), 10, psl_rules_df(spark)
    )
    return out.select("doc_id", "registered_domain", "domain_rank")
