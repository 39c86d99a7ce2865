"""B5 — real ts_rank semantics (PostgreSQL tsrank.c, default config).

The reference ranks search results with
`ts_rank(to_tsvector('english', content), plainto_tsquery('english', q))`
(src/db/documents/search.rs:69-93). Round 2 shipped a documented raw
term-frequency approximation (`search_rank_tf`); this kernel implements
the actual PostgreSQL ranking algorithm so result ORDERING matches the
reference whenever document structure varies:

  - tsvector: token positions, 1-based, clamped to MAXENTRYPOS (16383),
    deduplicated after clamping, at most MAXNUMPOS (256) positions kept
    per lexeme — exactly to_tsvector's storage rules;
  - single-term queries → calc_rank_or: per occurrence j (1-based),
    resj += w/(j·j) with the max-weight correction, scaled by
    1/1.64493406685 (π²/6), divided by the query size;
  - multi-term AND queries (plainto_tsquery output) → calc_rank_and:
    for every position pair (l, p) of every query-term pair,
    curw = sqrt(w_l · w_p · word_distance(|pos_l − pos_p|)) and
    res = 1 − Π(1 − curw) (the iterative OR-combination in tsrank.c);
  - word_distance(d) = 1/(1.005 + 0.05·e^(d²/1500)), 1e-30 for d > 100;
  - no match → 1e-20 (calc_rank's floor); default normalization 0
    (no document-length scaling), default weights {D:0.1, C:0.2,
    B:0.4, A:1.0} with every to_tsvector position labeled D.

Configs: 'simple' (this module's tsvector) and 'english'
(kernels/stem.py — Snowball stemmer + stopword removal, the
reference's actual `to_tsvector('english', …)`; ts_rank_english
below). Remaining documented deviation:
  - arithmetic at float64, not Postgres float4 — same formula, ulp-
    level differences only (sub-1e-7, ordering-neutral except exact
    ties), which keeps the DuckDB oracle reproducible.
"""

from __future__ import annotations

import math
import re

MAXENTRYPOS = 16383  # ts_type.h
MAXNUMPOS = 256  # ts_type.h
_PI2_OVER_6 = 1.64493406685  # tsrank.c calc_rank_or scale constant
DEFAULT_WEIGHTS = (0.1, 0.2, 0.4, 1.0)  # tsrank.c weights[] (D, C, B, A)
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def simple_tsvector(text: str) -> dict[str, list[int]]:
    """'simple'-config tsvector: lowercase alnum tokens with 1-based
    positions, clamped/deduped/capped per to_tsvector storage rules."""
    out: dict[str, list[int]] = {}
    for i, tok in enumerate(_TOKEN_RE.findall(text.lower()), start=1):
        pos = min(i, MAXENTRYPOS)
        lst = out.setdefault(tok, [])
        if len(lst) >= MAXNUMPOS:
            continue
        if lst and lst[-1] == pos:  # clamped duplicates collapse
            continue
        lst.append(pos)
    return out


def word_distance(d: int) -> float:
    """tsrank.c word_distance."""
    if d > 100:
        return 1e-30
    return 1.0 / (1.005 + 0.05 * math.exp(float(d) * d / 1500.0))


def calc_rank_or(
    pos_lists: list[list[int] | None], weights=DEFAULT_WEIGHTS
) -> float:
    """tsrank.c calc_rank_or for unlabeled (all-D) positions: query
    terms combine additively; occurrences decay quadratically."""
    w = weights[0]
    res = 0.0
    size = len(pos_lists)
    for post in pos_lists:
        if not post:
            continue
        resj = 0.0
        wjm = -1.0
        jm = 0
        for j in range(len(post)):
            resj += w / ((j + 1) * (j + 1))
            if w > wjm:
                wjm = w
                jm = j
        res += (wjm + resj - wjm / ((jm + 1) * (jm + 1))) / _PI2_OVER_6
    if size > 0:
        res = res / size
    return res


def calc_rank_and(
    pos_lists: list[list[int] | None], weights=DEFAULT_WEIGHTS
) -> float:
    """tsrank.c calc_rank_and for unlabeled positions: proximity-scored
    OR-combination over all cross-term position pairs. A query term
    absent from the document contributes no pairs; if NO pair exists
    the result stays -1 and calc_rank floors it to 1e-20 (an AND query
    that doesn't fully match ranks at the floor — tsrank.c behavior,
    size<2 alone falls back to calc_rank_or)."""
    if len(pos_lists) < 2:
        return calc_rank_or(pos_lists, weights)
    w = weights[0]
    res = -1.0
    for i in range(len(pos_lists)):
        post = pos_lists[i]
        if not post:
            continue
        for k in range(i):
            ct = pos_lists[k]
            if not ct:
                continue
            for pl in post:  # l-major, p-minor — the C loop order
                for pp in ct:
                    dist = abs(pl - pp)
                    if dist == 0:
                        continue  # distinct lexemes never share a position
                    curw = math.sqrt(w * w * word_distance(dist))
                    res = curw if res < 0 else 1.0 - (1.0 - res) * (1.0 - curw)
    return res


def ts_rank_simple(text: str, terms: list[str], mode: str = "and") -> float:
    """ts_rank(to_tsvector('simple', text), <terms query>) with default
    normalization (0). mode='and' ≙ plainto_tsquery's & chain;
    mode='or' ≙ an | chain."""
    tsv = simple_tsvector(text)
    pos_lists = [tsv.get(t.lower()) for t in terms]
    if mode == "and" and len(terms) >= 2:
        res = calc_rank_and(pos_lists)
    else:
        res = calc_rank_or(pos_lists)
    if res < 0:
        res = 1e-20
    return res


def ts_rank_english(text: str, query: str, mode: str = "and") -> float:
    """ts_rank(to_tsvector('english', text),
    plainto_tsquery('english', query)) with default normalization —
    the reference's exact call shape (search.rs:69-93). Stopwords in
    the QUERY drop out of the tsquery; stopwords in the DOCUMENT still
    consume positions (kernels/stem.english_tsvector)."""
    from readur_spark.kernels.stem import (
        english_tsvector,
        plainto_tsquery_english,
    )

    lexemes = plainto_tsquery_english(query)
    if not lexemes:
        return 1e-20  # empty tsquery matches nothing
    tsv = english_tsvector(text)
    pos_lists = [tsv.get(lx) for lx in lexemes]
    if mode == "and" and len(lexemes) >= 2:
        res = calc_rank_and(pos_lists)
    else:
        res = calc_rank_or(pos_lists)
    if res < 0:
        res = 1e-20
    return res
