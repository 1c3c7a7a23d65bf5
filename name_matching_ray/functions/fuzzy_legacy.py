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
    t1, t2 = set(p1.split()), set(p2.split())
    sorted_sect = " ".join(sorted(t1 & t2))
    sorted_1to2 = " ".join(sorted(t1 - t2))
    sorted_2to1 = " ".join(sorted(t2 - t1))
    combined_1to2 = (sorted_sect + " " + sorted_1to2).strip()
    combined_2to1 = (sorted_sect + " " + sorted_2to1).strip()
    return max(
        _intr(_indel_ratio(sorted_sect, combined_1to2)),
        _intr(_indel_ratio(sorted_sect, combined_2to1)),
        _intr(_indel_ratio(combined_1to2, combined_2to1)),
    )


def fw_token_sort_ratio(s1, s2, force_ascii: bool = True) -> int:
    """``fuzz.token_sort_ratio`` with default full_process, int-rounded."""
    if s1 is None or s2 is None:
        raise TypeError("expected a string or sequence")
    a = " ".join(sorted(full_process(s1, force_ascii=force_ascii).split()))
    b = " ".join(sorted(full_process(s2, force_ascii=force_ascii).split()))
    return _intr(_indel_ratio(a, b))
