"""fuzzywuzzy-semantics similarity wrappers for the legacy coname path.

The reference's legacy matcher (``/root/reference/coname.py:10``) uses
``fuzzywuzzy.fuzz`` (with the python-Levenshtein backend), whose public
behavior differs from the rapidfuzz API the canonical ``matcher.py`` uses:

* scores are INTEGER ``int(round(x))`` (``utils.intr``), so threshold
  comparisons like ``< 55`` / ``< 94`` / ``> 90`` flip at .5 boundaries;
* ``token_set_ratio`` / ``token_sort_ratio`` apply ``utils.full_process``
  by default with ``force_ascii=True``: non-string inputs are coerced via
  ``str()`` (a LIST argument becomes its repr — coname.py:150,165 rely on
  this), codepoints 128–255 are deleted (``asciidammit``; codepoints above
  255 survive — a fuzzywuzzy quirk kept as-is), ``\\W`` runs become spaces,
  and the result is lowercased and stripped;
* ``fuzz.ratio`` does NOT preprocess; it coerces non-str via ``str()`` and
  returns the python-Levenshtein ``ratio`` (the InDel ratio our
  :mod:`similarity` kernel computes), int-rounded.

Everything here is a clean-room reimplementation of those published
semantics on top of this repo's own kernels; parity is enforced by
differential tests that run the reference's coname.py with THESE functions
injected as its ``fuzzywuzzy.fuzz`` (tests/ref_harness.py pattern).
"""

from __future__ import annotations

import re

from .similarity import ratio as _indel_ratio

# fuzzywuzzy.utils: bad_chars = chr(128)..chr(255); str.translate deletes
# exactly those — higher codepoints pass through untouched.
_TRANS_128_255 = {i: None for i in range(128, 256)}

# fuzzywuzzy.StringProcessor.regex = re.compile(r"(?ui)\W") — underscore is
# a word char and is KEPT.
_NONWORD = re.compile(r"(?u)\W")


def asciidammit(s):
    """str -> delete codepoints 128-255; non-str -> ``str(s)`` then same."""
    if type(s) is str:
        return s.translate(_TRANS_128_255)
    return str(s).translate(_TRANS_128_255)


def full_process(s, force_ascii: bool = True) -> str:
    """``fuzzywuzzy.utils.full_process``: asciify, \\W->space, lower, strip."""
    if s is None:
        return ""
    if force_ascii:
        s = asciidammit(s)
    elif not isinstance(s, str):
        s = str(s)
    return _NONWORD.sub(" ", s).lower().strip()


def _intr(x: float) -> int:
    return int(round(x))


def fw_ratio(s1, s2) -> int:
    """``fuzz.ratio`` (python-Levenshtein backend): InDel ratio, int-rounded.

    ``make_type_consistent`` coerces non-str operands via ``str()``.
    """
    if not (isinstance(s1, str) and isinstance(s2, str)):
        s1, s2 = str(s1), str(s2)
    return _intr(_indel_ratio(s1, s2))


def _validate(s) -> bool:
    try:
        return len(s) > 0
    except TypeError:
        return False


def fw_token_set_ratio(s1, s2, force_ascii: bool = True) -> int:
    """``fuzz.token_set_ratio`` with default full_process, int-rounded.

    Empty / unprocessable operands return 0 (fuzzywuzzy validates both the
    raw and the processed strings).
    """
    if not _validate(s1) or not _validate(s2):
        return 0
    p1 = full_process(s1, force_ascii=force_ascii)
    p2 = full_process(s2, force_ascii=force_ascii)
    if not p1 or not p2:
        return 0
    return fw_token_set_ratio_pre(set(p1.split()), set(p2.split()))


def fw_token_set_ratio_pre(t1: set, t2: set) -> int:
    """``fw_token_set_ratio`` on PRE-TOKENIZED sets (``full_process(s).split()``
    already applied by the caller, which also guarantees the raw strings were
    non-empty iff the sets are non-empty).  Exact same result, computed with
    at most ONE short LCS: ``sect`` is a prefix of both combined strings, so
    ``ratio(sect, combined_i) = 200s/(s+c_i)`` closed-form and
    ``LCS(c1, c2) = s (+1 sep) + LCS(diff1, diff2)`` (LCS common-prefix
    lemma) — the diffs are short for similar names, empty for equal sets.
    Differentially tested against the 3-ratio construction."""
    if not t1 or not t2:
        return 0
    from .similarity import lcs_length

    sect = t1 & t2
    s = len(" ".join(sorted(sect))) if sect else 0
    d1s = " ".join(sorted(t1 - t2))
    d2s = " ".join(sorted(t2 - t1))
    l1, l2 = len(d1s), len(d2s)
    c1 = s + l1 + (1 if (s and l1) else 0)
    c2 = s + l2 + (1 if (s and l2) else 0)
    best = max(_intr(200.0 * s / (s + c1)), _intr(200.0 * s / (s + c2)))
    if best < 100:
        if l1 and l2:
            lcs = s + (1 if s else 0) + lcs_length(d1s, d2s)
        else:
            lcs = s  # one combined IS sect (a prefix of the other)
        best = max(best, _intr(200.0 * lcs / (c1 + c2)))
    return best


def fw_token_sort_ratio(s1, s2, force_ascii: bool = True) -> int:
    """``fuzz.token_sort_ratio`` with default full_process, int-rounded."""
    if s1 is None or s2 is None:
        raise TypeError("expected a string or sequence")
    a = " ".join(sorted(full_process(s1, force_ascii=force_ascii).split()))
    b = " ".join(sorted(full_process(s2, force_ascii=force_ascii).split()))
    return _intr(_indel_ratio(a, b))
