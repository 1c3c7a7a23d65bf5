"""Kernel parity tests (SURVEY.md §2.5, §5a).

Golden values are the published algorithm results (Jaro/Jaro-Winkler textbook
vectors, rapidfuzz-documented InDel examples), not runs of the reference —
rapidfuzz/Levenshtein are unavailable here by design.
"""

import random

import pytest

from name_matching_ray.functions.similarity import (
    _lcs_len_dp,
    bigrams,
    indel_distance,
    jaro,
    jaro_winkler,
    lcs_length,
    ratio,
    token_set_ratio,
    token_sort_ratio,
)


def test_ratio_basic():
    assert ratio("", "") == 100.0
    assert ratio("abc", "") == 0.0
    assert ratio("abc", "abc") == 100.0
    # one char appended: (29 - 1) / 29
    assert ratio("this is a test", "this is a test!") == pytest.approx(100 * 28 / 29)
    # pure indel semantics: substitution costs 2 (delete + insert)
    assert ratio("ab", "ac") == pytest.approx(50.0)


def test_ratio_on_char_lists():
    # matcher.py:168 calls ratio(sorted(c), sorted(d)) on char lists
    assert ratio(sorted("listen"), sorted("silent")) == 100.0
    assert ratio(sorted("abc"), sorted("abd")) == pytest.approx(100 * 4 / 6)


def test_lcs_bitparallel_matches_dp():
    rng = random.Random(7)
    alphabet = "abcde"
    for _ in range(300):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30)))
        assert lcs_length(a, b) == _lcs_len_dp(a, b), (a, b)


def test_lcs_long_fallback():
    a = "x" * 100 + "abc"
    b = "abc" + "y" * 100
    assert lcs_length(a, b) == 3
    assert indel_distance(a, a) == 0


def test_token_sort_ratio():
    assert token_sort_ratio("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear") == 100.0
    assert token_sort_ratio("great gatsby", "gatsby great") == 100.0
    # list input = pre-tokenized (matcher.py:312)
    assert token_sort_ratio(["beta", "alpha"], ["alpha", "beta"]) == 100.0
    assert token_sort_ratio(["acme", "inc"], ["acme", "incx"]) == ratio(
        "acme inc", "acme incx"
    )


def test_token_set_ratio():
    # one side's tokens a subset of the other's -> 100
    assert token_set_ratio("fuzzy was a bear", "fuzzy fuzzy was a bear") == 100.0
    assert token_set_ratio("a b c", "a b c d") == 100.0
    assert token_set_ratio("", "") == 100.0
    assert token_set_ratio("abc", "") == 0.0
    # disjoint sets degenerate to plain ratio on sorted-joined tokens
    assert token_set_ratio("ab", "cd") == ratio("ab", "cd")
    # intersection present: max over the three constructions. For
    # "acme corp" vs "acme inc": best is sect("acme") vs "acme inc"
    # -> dist 4, lensum 12 -> 66.67
    assert token_set_ratio("acme corp", "acme inc") == pytest.approx(100 * 8 / 12)


def test_jaro_textbook_vectors():
    assert jaro("MARTHA", "MARHTA") == pytest.approx(0.9444444, abs=1e-6)
    assert jaro("DWAYNE", "DUANE") == pytest.approx(0.8222222, abs=1e-6)
    assert jaro("DIXON", "DICKSONX") == pytest.approx(0.7666667, abs=1e-6)
    assert jaro("abc", "abc") == 1.0
    assert jaro("", "") == 1.0
    assert jaro("a", "") == 0.0


def test_jaro_winkler_textbook_vectors():
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611111, abs=1e-6)
    assert jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-6)
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133333, abs=1e-6)
    # below the 0.7 boost threshold no prefix bonus applies
    assert jaro_winkler("abcdef", "uvwxyz") == jaro("abcdef", "uvwxyz")


def test_bigrams():
    assert list(bigrams(["a", "b", "c"])) == [("a", "b"), ("b", "c")]
    assert list(bigrams(["solo"])) == []
