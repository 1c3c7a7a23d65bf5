"""String-similarity kernels, implemented from scratch (clean room).

The reference (`/root/reference/matcher.py:24-26`) imports its kernels from
``rapidfuzz.fuzz`` (``ratio``, ``token_sort_ratio``, ``token_set_ratio``),
``Levenshtein.jaro_winkler`` and ``nltk.ngrams``.  None of those packages exist
in this environment, and the graft is clean-room, so every kernel here is
re-derived from the published algorithm definitions:

* ``ratio``            — normalized InDel similarity (LCS-based; insertions and
                         deletions only, no substitutions), scaled to 0..100.
* ``token_sort_ratio`` — ``ratio`` over whitespace-tokenized, sorted,
                         space-rejoined inputs.
* ``token_set_ratio``  — max of three InDel comparisons over the token-set
                         intersection / differences construction.
* ``jaro_winkler``     — Jaro similarity with Winkler prefix boost
                         (prefix cap 4, weight 0.1, boost threshold 0.7),
                         returning 0..1.
* ``bigrams``          — sliding 2-grams over a sequence (nltk.ngrams(s, 2)).

All kernels accept either strings (compared character-wise) or lists/tuples of
tokens (compared element-wise) because the reference calls them both ways —
e.g. ``ratio(sorted(c), sorted(d))`` on char lists (matcher.py:168) and
``token_sort_ratio([x0, x1], [y0, y1])`` on 2-token lists (matcher.py:312).

Performance: the LCS core uses the Hyyro bit-parallel algorithm (O(n*m/64))
for sequences up to 64 elements (virtually all company names), with a plain
DP fallback for longer inputs.  Pure Python by design: these are invoked
per candidate pair inside scoring actors, and candidate volume is controlled
upstream by blocking + cheap gates, not by micro-optimizing the kernel.
"""

from __future__ import annotations

from typing import Sequence

__all__ = [
    "indel_distance",
    "ratio",
    "token_sort_ratio",
    "token_set_ratio",
    "jaro",
    "jaro_winkler",
    "bigrams",
]


_MASK_CACHE: dict = {}  # short string -> (char->bitmask dict, full mask)
_MASK_CACHE_CAP = 200_000


def _char_masks(short: str) -> tuple[dict, int]:
    got = _MASK_CACHE.get(short)
    if got is None:
        match_mask: dict = {}
        for i, ch in enumerate(short):
            match_mask[ch] = match_mask.get(ch, 0) | (1 << i)
        got = (match_mask, (1 << len(short)) - 1)
        if len(_MASK_CACHE) < _MASK_CACHE_CAP:
            _MASK_CACHE[short] = got
    return got


def _lcs_len_bitparallel(short: Sequence, long: Sequence) -> int:
    """Length of the longest common subsequence, |short| <= 64 (Hyyro 2004).

    The per-string char-mask table is memoized for strings (one side of a
    ratio call recurs across millions of word-pair comparisons in the
    cascade) — list/tuple inputs build it inline."""
    m = len(short)
    if type(short) is str:
        match_mask, full = _char_masks(short)
    else:
        match_mask = {}
        for i, ch in enumerate(short):
            match_mask[ch] = match_mask.get(ch, 0) | (1 << i)
        full = (1 << m) - 1
    v = full
    get = match_mask.get
    for ch in long:
        mm = get(ch, 0)
        u = v & mm
        v = ((v + u) | (v - u)) & full
    # zeros in v (within m bits) == LCS length
    return m - bin(v).count("1")


def _lcs_len_dp(a: Sequence, b: Sequence) -> int:
    """Quadratic-space-free LCS DP fallback for long sequences."""
    if len(a) < len(b):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        append = cur.append
        best = 0
        for j, y in enumerate(b, 1):
            best = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
            append(best)
        prev = cur
    return prev[-1]


def lcs_length(a: Sequence, b: Sequence) -> int:
    if not a or not b:
        return 0
    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
    if len(short) <= 64:
        return _lcs_len_bitparallel(short, long_)
    return _lcs_len_dp(a, b)


def indel_distance(a: Sequence, b: Sequence) -> int:
    """Insert/delete edit distance: len(a) + len(b) - 2 * LCS(a, b)."""
    return len(a) + len(b) - 2 * lcs_length(a, b)


_RATIO_CACHE: dict = {}
_CACHE_CAP = 400_000  # ≈ tens of MB per actor; word-level calls repeat heavily


def ratio(a: Sequence, b: Sequence) -> float:
    """Normalized InDel similarity * 100 (rapidfuzz ``fuzz.ratio`` semantics).

    ``(lensum - indel_distance) / lensum * 100``; two empty inputs -> 100.0.
    Short string pairs are memoized (pure function; the cascade re-compares
    the same word pairs across millions of candidate pairs).
    """
    lensum = len(a) + len(b)
    if lensum == 0:
        return 100.0
    if type(a) is str and type(b) is str and lensum <= 48:
        key = (a, b)
        v = _RATIO_CACHE.get(key)
        if v is None:
            v = 100.0 * (lensum - indel_distance(a, b)) / lensum
            if len(_RATIO_CACHE) < _CACHE_CAP:
                _RATIO_CACHE[key] = v
        return v
    return 100.0 * (lensum - indel_distance(a, b)) / lensum


def _tokens(s) -> list:
    """Whitespace tokens for strings; element list for other sequences."""
    if isinstance(s, str):
        return s.split()
    return list(s)


def token_sort_ratio(a, b) -> float:
    """``ratio`` over sorted, space-rejoined whitespace tokens.

    List inputs are treated as already-tokenized (each element one token),
    matching the reference's 2-token-list call at matcher.py:312.
    """
    sa = " ".join(sorted(_tokens(a)))
    sb = " ".join(sorted(_tokens(b)))
    return ratio(sa, sb)


def token_set_ratio(a, b) -> float:
    """rapidfuzz ``fuzz.token_set_ratio`` construction.

    Compares the sorted token-set difference strings directly and each against
    the intersection-prefixed variants; returns the max similarity * 100.
    Derivation follows rapidfuzz's published pure-Python fallback.
    """
    return token_set_ratio_pre(set(_tokens(a)), set(_tokens(b)))


def token_set_ratio_pre(ta: set, tb: set) -> float:
    """``token_set_ratio`` on pre-tokenized sets (identical math) — callers
    scoring many pairs cache each name's token set once."""
    if not ta and not tb:
        return 100.0
    if not ta or not tb:
        return 0.0
    sect = ta & tb
    diff_ab = sorted(ta - tb)
    diff_ba = sorted(tb - ta)
    if sect and (not diff_ab or not diff_ba):
        return 100.0

    sect_str = " ".join(sorted(sect))
    ab_str = " ".join(diff_ab)
    ba_str = " ".join(diff_ba)
    sect_len = len(sect_str)
    ab_len = len(ab_str)
    ba_len = len(ba_str)

    # joined lengths including the separating space when both parts non-empty
    sect_ab_len = sect_len + bool(sect_len) + ab_len
    sect_ba_len = sect_len + bool(sect_len) + ba_len

    best = ratio(ab_str, ba_str)

    # distance from "sect" to "sect + ' ' + diff" is exactly the appended length
    sect_ab_dist = bool(sect_len) + ab_len
    lensum_ab = sect_len + sect_ab_len
    if lensum_ab:
        best = max(best, 100.0 * (lensum_ab - sect_ab_dist) / lensum_ab)
    sect_ba_dist = bool(sect_len) + ba_len
    lensum_ba = sect_len + sect_ba_len
    if lensum_ba:
        best = max(best, 100.0 * (lensum_ba - sect_ba_dist) / lensum_ba)
    return best


def jaro(a: Sequence, b: Sequence) -> float:
    """Classic Jaro similarity in 0..1."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and a[i] == b[j]:
                match_a[i] = True
                match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: Sequence, b: Sequence, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler with prefix cap 4 and boost threshold 0.7.

    Matches ``Levenshtein.jaro_winkler`` defaults (the maintained Levenshtein
    package delegates to rapidfuzz's JaroWinkler, which applies the prefix
    bonus only when the base Jaro similarity exceeds 0.7).  Short string
    pairs are memoized (see ``ratio``).
    """
    if (type(a) is str and type(b) is str and prefix_weight == 0.1
            and len(a) + len(b) <= 48):
        key = (a, b)
        v = _JW_CACHE.get(key)
        if v is None:
            v = _jaro_winkler_raw(a, b, 0.1)
            if len(_JW_CACHE) < _CACHE_CAP:
                _JW_CACHE[key] = v
        return v
    return _jaro_winkler_raw(a, b, prefix_weight)


_JW_CACHE: dict = {}


def _jaro_winkler_raw(a: Sequence, b: Sequence, prefix_weight: float) -> float:
    sim = jaro(a, b)
    if sim > 0.7:
        prefix = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca != cb:
                break
            prefix += 1
        sim += prefix * prefix_weight * (1.0 - sim)
        if sim > 1.0:
            sim = 1.0
    return sim


def bigrams(seq: Sequence):
    """Sliding 2-grams, nltk.ngrams(seq, 2) semantics (matcher.py:68,72)."""
    return zip(seq, seq[1:])
