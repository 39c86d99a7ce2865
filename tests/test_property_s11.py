"""Property-based checks for the session-11 exact-arithmetic kernels:
the Spark-side formulas must agree with independent pure-Python
implementations on arbitrary inputs (the per-engine oracle twins pin
cross-ENGINE equality; these pin cross-IMPLEMENTATION correctness)."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


# ---- pow34 (negative-sampling table) ---------------------------------------

# emulate the ±1-corrected isqrt chain without Spark (same algorithm)


def _isqrt_corrected(x: int) -> int:
    s = int(math.floor(math.sqrt(float(x))))
    if (s + 1) * (s + 1) <= x:
        s += 1
    if s * s > x:
        s -= 1
    return s


@given(st.integers(min_value=0, max_value=2_000_000))
@settings(max_examples=300, deadline=None)
def test_pow34_equals_math_isqrt(c):
    got = _isqrt_corrected(_isqrt_corrected(c * c * c))
    want = math.isqrt(math.isqrt(c**3))
    assert got == want


# ---- lexical richness integer identities -----------------------------------


@given(st.lists(st.sampled_from("abcde"), min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_richness_formulas(tokens):
    c = Counter(tokens)
    n = sum(c.values())
    s2 = sum(v * v for v in c.values())
    s11 = sum(v * (v - 1) for v in c.values())
    yule = (10_000_000 * (s2 - n)) // (n * n)
    assert yule >= 0
    if n > 1:
        simpson = (1_000_000 * s11) // (n * (n - 1))
        assert 0 <= simpson <= 1_000_000
    ttr = (1000 * len(c)) // n
    assert 0 < ttr <= 1000


# ---- UniMax waterfill conservation ------------------------------------------


def _unimax(caps: list[int], budget: int) -> list[int]:
    """Pure-Python twin of ml/mixing.plan_unimax's closed form."""
    order = sorted(range(len(caps)), key=lambda i: (caps[i], i))
    n = len(caps)
    alloc = [0] * n
    pref = 0
    k = 0
    capped = True
    for pos, i in enumerate(order, start=1):
        share = (budget - pref) // (n - pos + 1)
        if capped and caps[i] <= share:
            alloc[i] = caps[i]
            pref += caps[i]
            k = pos
        else:
            capped = False
    rem_budget = budget - sum(alloc)
    m = n - k
    if m:
        share, rem = divmod(rem_budget, m)
        for extra, i in enumerate(order[k:]):
            alloc[i] = share + (1 if extra < rem else 0)
    return alloc


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1,
             max_size=8),
    st.integers(min_value=0, max_value=50_000),
)
@settings(max_examples=300, deadline=None)
def test_unimax_conservation_and_caps(caps, budget):
    alloc = _unimax(caps, budget)
    # every allocation is non-negative and respects its cap
    assert all(0 <= a <= c for a, c in zip(alloc, caps))
    # budget conservation: Σ alloc == min(budget, Σ caps)
    assert sum(alloc) == min(budget, sum(caps))


# ---- span-corruption stratification -----------------------------------------


@given(st.integers(min_value=20, max_value=5000))
@settings(max_examples=300, deadline=None)
def test_span_plan_invariants(n):
    s = max(1, (n * 15) // 100 // 3)
    stratum = n // s
    assert stratum >= 3  # a 3-token span always fits its stratum
    assert s * stratum <= n
    # spans [k·L + off, +3) with off ≤ L-3 never overlap or overflow
    last_end = s * stratum - stratum + (stratum - 3) + 3
    assert last_end <= n
