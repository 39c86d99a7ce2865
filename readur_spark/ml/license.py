"""Content-license detection: rel=license links -> corpus gating.

Training-data curation at web scale is license-aware: Creative-Commons
publishers advertise the grant machine-readably with
`<a rel="license" href="https://creativecommons.org/licenses/...">`
(the RDFa convention CC search engines index), and a pipeline that
wants a permissively-licensed corpus gates on that signal before any
quality work runs. The reference engine manages private uploads and
has no license analogue (nearest: its per-user RBAC visibility gate,
src/db/documents.rs — the "who may use this document" role); this is
curation-tier extension surface alongside `ml/webfilters.py` and the
head-metadata family.

Components (all pure Catalyst — zero Python in any plan):

  - `license_href` / `license_id` — find the first <a>/<link> tag
    whose rel token list contains `license` (either attribute order,
    either quote style, case-insensitive), pull its href, and
    normalize Creative-Commons URLs to a compact id:
    `.../licenses/by-sa/3.0/...` -> `cc-by-sa-3.0`,
    `.../publicdomain/zero/1.0/` -> `cc0-1.0`,
    `.../publicdomain/mark/1.0/` -> `publicdomain-mark-1.0`,
    any other rel=license target -> `other`, no tag -> NULL.
  - `is_permissive` — the standard ML-corpus gate: CC0 / PD-mark /
    any cc-* grant without an NC or ND restriction token.
  - `host_license_mode` — per-host license histogram argmax (two
    map-side-combinable aggregates, no window over the payload): at
    100 TB the per-host mode is the signal used to license-classify
    the LONG TAIL of pages that do not carry the tag themselves.

Scale: detection is a codegen projection over the page bytes already
in hand at extraction time (no extra pass — compose it into the
extraction job's select list); the gate is a pushed-down filter; the
rollup shuffles one slim (host, license_id, count) row per group.

Correctness: the registered queries build pages from the driver's
`documents` table by a deterministic rule (five license postures incl.
a rel-after-href variant, a multi-token rel, and a decoy anchor with
no rel on every page) and the DuckDB oracles re-state the expected id
straight from the rule. Hostile tag shapes are pinned in
tests/test_license.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# first <a> or <link> whose rel attribute value contains the token
# `license` (word-bounded, so rel="licenses-page" does not match)
_REL_TAG_RE = (
    r"(?i)<(?:a|link)\b[^>]*\brel\s*=\s*"
    r"(?:\"[^\"]*\blicense\b[^\"]*\"|'[^']*\blicense\b[^']*')[^>]*>"
)

# the recognized CC grant shapes, as ONE alternation so license_id
# needs a single extract (expression fan-out matters: a pushed-down
# filter inlines every reference — see with_license)
_CC_FRAG_RE = (
    r"creativecommons\.org/(licenses/[a-z\-]+/[0-9]+\.[0-9]+"
    r"|publicdomain/zero/[0-9]+\.[0-9]+"
    r"|publicdomain/mark/[0-9]+\.[0-9]+)"
)

# permissive in ONE regex (single column reference): CC0 / PD-mark /
# cc-* with no token equal to nc or nd (negative lookahead over the
# '-'-separated token list; 'bynd' must NOT trip it)
_PERMISSIVE_RE = (
    r"^(?:cc0-|publicdomain-mark-|cc-(?!(?:.*-)?(?:nc|nd)(?:-|$)))"
)


def license_href(html: Column) -> Column:
    """href of the first rel=license tag; NULL when no page-level
    license link exists. Attribute order and quote style both vary in
    the wild — the tag match ignores order, and the href pull tries
    double quotes then single (empty-string extracts nullif away, so
    the no-tag and no-href cases both land on NULL)."""
    tag = F.regexp_extract(html, _REL_TAG_RE, 0)
    h1 = F.regexp_extract(tag, r"(?i)\bhref\s*=\s*\"([^\"]*)\"", 1)
    h2 = F.regexp_extract(tag, r"(?i)\bhref\s*=\s*'([^']*)'", 1)
    return F.coalesce(
        F.nullif(h1, F.lit("")), F.nullif(h2, F.lit(""))
    )


def license_id(href: Column) -> Column:
    """Normalize a rel=license target to a compact id (see module
    docstring). Unrecognized targets map to 'other' — a real corpus
    keeps them visible rather than silently unlicensed. One regexp
    pulls the grant fragment; cheap replaces reshape it
    (`licenses/by-sa/3.0` -> `cc-by-sa-3.0`, `publicdomain/zero/1.0`
    -> `cc0-1.0`, `publicdomain/mark/1.0` -> `publicdomain-mark-1.0`)."""
    frag = F.regexp_extract(F.lower(href), _CC_FRAG_RE, 1)
    shaped = F.replace(frag, F.lit("licenses/"), F.lit("cc-"))
    shaped = F.replace(
        shaped, F.lit("publicdomain/zero/"), F.lit("cc0-")
    )
    shaped = F.replace(
        shaped, F.lit("publicdomain/mark/"), F.lit("publicdomain-mark-")
    )
    shaped = F.replace(shaped, F.lit("/"), F.lit("-"))
    return F.when(href.isNull(), F.lit(None).cast("string")).otherwise(
        F.coalesce(F.nullif(shaped, F.lit("")), F.lit("other"))
    )


def is_permissive(lic: Column) -> Column:
    """True for grants a redistribution-safe corpus accepts: CC0,
    public-domain mark, and any cc-* without an NC (non-commercial)
    or ND (no-derivatives) restriction token. NULL -> false."""
    return F.coalesce(lic, F.lit("")).rlike(_PERMISSIVE_RE)


def with_license(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Attach (license_href, license_id, permissive) — STAGED
    projections, one per derived column, so each regexp evaluates once
    per row: composing the Columns into a single select would inline
    the href extraction into every one of license_id's six references
    (and that again into permissive's three), a ~100x expression
    blowup that overflows whole-stage codegen's method limit.
    CollapseProject keeps non-cheap multi-use projections apart, so
    the staging survives optimization. Still zero Python, one pass.

    The tag scan (the only regexp over the FULL page bytes) gets its
    own stage too — the href pull references it twice."""
    tag = F.regexp_extract(F.col(html_col), _REL_TAG_RE, 0)
    h1 = F.regexp_extract(
        F.col("_lic_tag"), r"(?i)\bhref\s*=\s*\"([^\"]*)\"", 1
    )
    h2 = F.regexp_extract(
        F.col("_lic_tag"), r"(?i)\bhref\s*=\s*'([^']*)'", 1
    )
    href = F.coalesce(F.nullif(h1, F.lit("")), F.nullif(h2, F.lit("")))
    return (
        df.withColumn("_lic_tag", tag)
        .withColumn("license_href", href)
        .withColumn("license_id", license_id(F.col("license_href")))
        .withColumn("permissive", is_permissive(F.col("license_id")))
        .drop("_lic_tag")
    )


def host_license_mode(df: DataFrame) -> DataFrame:
    """Per-host license posture: doc counts plus the modal license id
    among tagged pages (argmax by (count, license_id) for a
    deterministic tie-break). Two slim aggregates; the payload never
    shuffles."""
    counts = df.groupBy("host", "license_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("permissive").cast("long")).alias("n_perm"),
    )
    best = F.max_by(
        F.col("license_id"),
        F.when(
            F.col("license_id").isNotNull(),
            F.struct(F.col("n"), F.col("license_id")),
        ),
    ).alias("top_license")
    return counts.groupBy("host").agg(
        F.sum("n").alias("n_docs"),
        F.sum(
            F.when(F.col("license_id").isNotNull(), F.col("n")).otherwise(
                F.lit(0)
            )
        ).alias("n_licensed"),
        F.sum("n_perm").alias("n_permissive"),
        best,
    )


# ---------------------------------------------------------------------------
# Constructed corpus
# ---------------------------------------------------------------------------


def _constructed_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five license postures keyed on doc_id % 5 (rule restated in the
    oracles): 0 -> CC BY 4.0 anchor; 1 -> CC BY-SA 3.0 <link> with a
    deed suffix; 2 -> CC0 with rel AFTER href; 3 -> BY-NC-ND 2.5 with
    a multi-token rel; 4 -> no license tag. Every page also carries a
    decoy anchor without rel."""
    d = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 5
    lic_tag = (
        F.when(
            m == 0,
            F.lit(
                '<a rel="license" href="https://creativecommons.org'
                '/licenses/by/4.0/">CC BY</a>'
            ),
        )
        .when(
            m == 1,
            F.lit(
                '<link rel="license" href="http://creativecommons.org'
                '/licenses/by-sa/3.0/deed.en">'
            ),
        )
        .when(
            m == 2,
            F.lit(
                '<a href="https://creativecommons.org/publicdomain'
                '/zero/1.0/" rel="license">CC0</a>'
            ),
        )
        .when(
            m == 3,
            F.lit(
                '<a rel="license nofollow" href="https://'
                "creativecommons.org/licenses/by-nc-nd/2.5/"
                '">BY-NC-ND</a>'
            ),
        )
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit("<html><body><p>doc "),
        d,
        F.lit("</p>"),
        lic_tag,
        F.lit('<a href="https://example.net/plain">x</a></body></html>'),
    )
    host = F.concat(
        F.lit("h"), (F.col("doc_id") % 23).cast("string"),
        F.lit(".example.org"),
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id", host.alias("host"), html.alias("html")
    )


_SQL_LICENSE = """
    CASE doc_id % 5
      WHEN 0 THEN 'cc-by-4.0'
      WHEN 1 THEN 'cc-by-sa-3.0'
      WHEN 2 THEN 'cc0-1.0'
      WHEN 3 THEN 'cc-by-nc-nd-2.5'
      ELSE NULL END
"""

_SQL_HREF = """
    CASE doc_id % 5
      WHEN 0 THEN 'https://creativecommons.org/licenses/by/4.0/'
      WHEN 1 THEN 'http://creativecommons.org/licenses/by-sa/3.0/deed.en'
      WHEN 2 THEN 'https://creativecommons.org/publicdomain/zero/1.0/'
      WHEN 3 THEN 'https://creativecommons.org/licenses/by-nc-nd/2.5/'
      ELSE NULL END
"""

# permissive under the rule: BY and BY-SA and CC0 yes, NC-ND no
_SQL_PERMISSIVE = "(doc_id % 5 IN (0, 1, 2))"


@register(
    "license_rel_extract",
    oracle=f"""
    SELECT doc_id, {_SQL_HREF} AS license_href,
           {_SQL_LICENSE} AS license_id,
           {_SQL_PERMISSIVE} AS permissive
    FROM documents
    """,
)
def license_rel_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag detection + CC-URL normalization + permissive flag over the
    five constructed postures; the oracle states all three columns
    straight from the rule."""
    pages = _constructed_pages(spark, sf_dir)
    return with_license(pages).select(
        "doc_id", "license_href", "license_id", "permissive"
    )


@register(
    "license_permissive_gate",
    oracle=f"""
    SELECT doc_id, {_SQL_LICENSE} AS license_id
    FROM documents
    WHERE {_SQL_PERMISSIVE}
    """,
)
def license_permissive_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus gate: only CC0/PD/BY/BY-SA pages survive (NC-ND and
    untagged pages drop). A pushed-down filter at scale."""
    pages = with_license(_constructed_pages(spark, sf_dir))
    return pages.filter(F.col("permissive")).select("doc_id", "license_id")


@register(
    "host_license_mode",
    oracle=f"""
    WITH lic AS (
      SELECT doc_id,
             'h' || CAST(doc_id % 23 AS VARCHAR) || '.example.org'
               AS host,
             {_SQL_LICENSE} AS license_id,
             {_SQL_PERMISSIVE} AS permissive
      FROM documents
    ),
    c AS (
      SELECT host, license_id, count(*) AS n,
             sum(CASE WHEN permissive THEN 1 ELSE 0 END) AS n_perm
      FROM lic GROUP BY host, license_id
    ),
    ranked AS (
      SELECT host, license_id, n,
             row_number() OVER (
               PARTITION BY host
               ORDER BY n DESC, license_id DESC
             ) AS rn
      FROM c WHERE license_id IS NOT NULL
    )
    SELECT c.host,
           CAST(sum(c.n) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN c.license_id IS NOT NULL THEN c.n
                         ELSE 0 END) AS BIGINT) AS n_licensed,
           CAST(sum(c.n_perm) AS BIGINT) AS n_permissive,
           max(r.license_id) AS top_license
    FROM c LEFT JOIN (SELECT host, license_id FROM ranked WHERE rn = 1)
           AS r ON c.host = r.host
    GROUP BY c.host
    """,
)
def host_license_mode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host license posture rollup (23 hosts x 5 postures)."""
    pages = with_license(_constructed_pages(spark, sf_dir))
    return host_license_mode(pages)
