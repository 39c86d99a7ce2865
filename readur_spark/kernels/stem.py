"""'english' text-search config: Snowball (Porter2) stemmer +
PostgreSQL's english stopword list.

The reference builds its search vectors with
`to_tsvector('english', content)` and queries with
`plainto_tsquery('english', q)` (src/db/documents/search.rs:100-129).
Postgres's 'english' config = the Snowball english stemmer (the
"Porter2" algorithm, published at snowballstem.org) over lowercased
word tokens, with the Snowball english stopword list applied BEFORE
stemming; stopwords still consume token positions (to_tsvector keeps
counting through them), they are just not stored.

This module implements the algorithm from the published specification
("The English (Porter2) stemming algorithm", M.F. Porter,
snowballstem.org/algorithms/english/stemmer.html). No code is taken
from any implementation; the test goldens are sample pairs from the
algorithm's published vocabulary list.

Scale note: stemming is a per-token pure function — at 10^12 rows it
runs inside an Arrow-batched pandas UDF with a memoized token cache
(web-text vocabulary is Zipf: cache hit rates are effectively 1.0), or
once at posting-index build time. Never row-at-a-time Python.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# Words the spec stems irregularly (exceptional forms, stage 1)
_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe",
    "atlas": "atlas", "cosmos": "cosmos", "bias": "bias",
    "andes": "andes",
}

# Invariant after step 1a (exceptional forms, stage 2)
_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)

_STEP2_SUFFIXES = [  # longest-match order; (suffix, replacement)
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"),
]

_STEP3_SUFFIXES = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ful", ""), ("ness", ""),
]

_STEP4_SUFFIXES = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic",
]


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _regions(word: str) -> tuple[int, int]:
    """(r1, r2) start offsets per the spec; gener-/commun-/arsen-
    prefixed words get R1 forced past the prefix."""
    n = len(word)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """Short syllable: (a) vowel + non-vowel(not w,x,Y) preceded by a
    non-vowel, at the end; or (b) vowel + non-vowel at position 0-1."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        return (
            not _is_vowel(word, n - 3)
            and _is_vowel(word, n - 2)
            and word[n - 1] not in _VOWELS
            and word[n - 1] not in "wxY"
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _has_vowel(word: str, end: int) -> bool:
    return any(_is_vowel(word, i) for i in range(end))


def porter2_stem(word: str) -> str:
    """Snowball english stem of a lowercase word."""
    if len(word) <= 2:
        return word
    if word[0] == "'":
        word = word[1:]
        if len(word) <= 2:
            return word
    exc = _EXCEPTIONS1.get(word)
    if exc is not None:
        return exc

    # mark consonant y as Y
    if word[0] == "y":
        word = "Y" + word[1:]
    word = list(word)
    for i in range(1, len(word)):
        if word[i] == "y" and word[i - 1] in _VOWELS:
            word[i] = "Y"
    word = "".join(word)

    r1, r2 = _regions(word)

    # Step 0: 's', 's, '
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        # delete if the preceding part contains a vowel NOT immediately
        # before the s
        if _has_vowel(word, len(word) - 2):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # Step 1b
    if word.endswith(("eedly", "eed")):
        suf = "eedly" if word.endswith("eedly") else "eed"
        if len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if _has_vowel(stem, len(stem)):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # Step 1c: y -> i after a non-vowel that is not word-initial
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # Step 2 (suffix found in R1)
    for suf, rep in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            break
    else:
        if word.endswith("ogi"):
            if len(word) - 3 >= r1 and word.endswith("logi"):
                word = word[:-1]
        elif word.endswith("li"):
            if len(word) - 2 >= r1 and len(word) > 2 and word[-3] in _LI_ENDING:
                word = word[:-2]

    # Step 3 (suffix found in R1; 'ative' needs R2)
    for suf, rep in _STEP3_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            break
    else:
        if word.endswith("ative") and len(word) - 5 >= r2:
            word = word[:-5]

    # Step 4 (suffix found in R2)
    for suf in _STEP4_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                word = word[: -len(suf)]
            break
    else:
        if word.endswith("ion") and len(word) - 3 >= r2 and word[-4] in "st":
            word = word[:-3]

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


# Snowball english stopword list (snowballstem.org english stop list;
# PostgreSQL ships the identical file as english.stop) — 127 words.
ENGLISH_STOPWORDS = frozenset("""
i me my myself we our ours ourselves you your yours yourself yourselves
he him his himself she her hers herself it its itself they them their
theirs themselves what which who whom this that these those am is are
was were be been being have has had having do does did doing a an the
and but if or because as until while of at by for with about against
between into through during before after above below to from up down
in out on off over under again further then once here there when where
why how all any both each few more most other some such no nor not
only own same so than too very s t can will just don should now
""".split())


def plainto_tsquery_english(query: str) -> list[str]:
    """plainto_tsquery('english', q): lowercase word tokens, stopwords
    dropped, remainder stemmed (AND-combined by the caller)."""
    import re

    toks = re.findall(r"[a-z0-9]+", query.lower())
    return [porter2_stem(t) for t in toks if t not in ENGLISH_STOPWORDS]


def english_tsvector(text: str) -> dict[str, list[int]]:
    """to_tsvector('english', text): 1-based positions counted over
    ALL word tokens (stopwords consume positions but are not stored),
    lexemes stemmed, positions clamped to MAXENTRYPOS, deduped after
    clamping, capped at MAXNUMPOS per lexeme — the same storage rules
    as kernels.tsrank.simple_tsvector."""
    from readur_spark.kernels.tsrank import MAXENTRYPOS, MAXNUMPOS, _TOKEN_RE

    out: dict[str, list[int]] = {}
    cache: dict[str, str] = {}
    for i, tok in enumerate(_TOKEN_RE.findall(text.lower()), start=1):
        if tok in ENGLISH_STOPWORDS:
            continue
        lex = cache.get(tok)
        if lex is None:
            lex = cache[tok] = porter2_stem(tok)
        pos = min(i, MAXENTRYPOS)
        lst = out.setdefault(lex, [])
        if len(lst) >= MAXNUMPOS:
            continue
        if lst and lst[-1] == pos:
            continue
        lst.append(pos)
    return out
