"""Legacy coname matcher kernels (reference ``coname.py`` — the pre-matcher.py
variant; README.md:5 says "use matcher.py", but the legacy path is part of the
reference surface and is reproduced here bit-for-bit, bugs included).

Reference parity notes (cited lines are /root/reference/coname.py):

* ``ABBR`` / ``SUFFIX`` are the legacy rewrite tables (coname.py:85-118) —
  DIFFERENT from matcher.py's ``_abbr`` tables.  The tables are the
  behavioral spec; the surrounding machinery is original.
* ``abbr_adj`` (coname.py:19-25) applies the rules SEQUENTIALLY over the
  evolving string, each as a global ``(?<!\\w)rule(?!\\w)`` IGNORECASE sub
  whose replacement carries a LEADING space; only the final result is
  stripped.  Ordering quirks are load-bearing: ``('and','')`` runs first,
  so the later ``('&','and')`` rewrite SURVIVES abbr_adj (and is then
  removed by ``suffix_adj``'s 'and' entry instead).
* ``name_preprocessing`` (coname.py:54-83) keeps the reference's
  single-letter gluing bug: every ``\\w \\w \\w`` (then ``\\w \\w``) run is
  replaced by the FIRST match's glued form (``s[0]``), not its own.
* ``match`` (coname.py:148-183) and ``permutation`` (coname.py:121-145)
  keep the asymmetric guard bug at coname.py:139-143: y's three-word glued
  variant is tried only when ``three_x`` exists (and may be None, which
  scores 0 via fuzzywuzzy's validate-and-return-0 path, never a crash).
* corpus stats (coname.py:214-240) keep the duplicate-gvkey bug: rows after
  a gvkey's first iterate ``for x in name:`` — the CHARACTERS of the raw
  name feed the single-word set, and ``pairwise`` of a 1-char string adds
  nothing to the pair set.

Similarity comes from :mod:`fuzzy_legacy` (fuzzywuzzy-with-python-Levenshtein
semantics: integer rounding, default full_process, list-repr coercion).
"""

from __future__ import annotations

import re
from collections import Counter
from itertools import tee

from .fuzzy_legacy import fw_ratio, fw_token_set_ratio

from .coname_tables import ABBR, SUFFIX

# the rules are applied sequentially, so each is compiled once per process
_ABBR_COMPILED = [
    (re.compile('(?<!\\w)' + s + '(?!\\w)', re.IGNORECASE), ' ' + adj)
    for s, adj in ABBR
]
_SUFFIX_COMPILED = [
    re.compile('(?<!\\w)' + s + '(?!\\w)', re.IGNORECASE) for s in SUFFIX
]
_NONWORD_KEEP_SPACE = re.compile(r'[^\w\s]')
_THE = re.compile('The ', re.IGNORECASE)
_TRIPLE = re.compile(r'(?<!\w)\w\s\w\s\w(?!\w)')
_DOUBLE = re.compile(r'(?<!\w)\w\s\w(?!\w)')
_WS = re.compile(r'\s+')


def pairwise(iterable):
    """s -> (s0,s1), (s1,s2), ... (coname.py:12-16)."""
    a, b = tee(iterable)
    next(b, None)
    return zip(a, b)


def abbr_adj(name: str) -> str:
    """Sequential abbreviation rewrite (coname.py:19-25)."""
    for rx, repl in _ABBR_COMPILED:
        name = rx.sub(repl, name)
    return name.strip()


def suffix_adj(name: str) -> str:
    """Suffix removal (coname.py:28-35); replacement is '' (no space)."""
    for rx in _SUFFIX_COMPILED:
        name = rx.sub('', name)
    return name.strip()


def remove_punc(name: str) -> str:
    """coname.py:38-41: six separators -> space, then strip all other punct."""
    name = (name.replace('&', ' ').replace('-', ' ').replace('.', ' ')
            .replace(',', ' ').replace('/', ' ').replace("'", ' '))
    return _NONWORD_KEEP_SPACE.sub('', name).strip()


def first_two_adj(words):
    """Glue the first two words, re-run abbr_adj (coname.py:44-46).

    Returns None for names of <= 2 words (falsy guard downstream).
    """
    if len(words) > 2:
        return abbr_adj(''.join(words[:2]) + ' ' + ' '.join(words[2:]))


def first_three_adj(words):
    if len(words) > 3:
        return abbr_adj(''.join(words[:3]) + ' ' + ' '.join(words[3:]))


def name_preprocessing(z: str):
    """coname.py:54-83 — returns the 9-tuple
    (z, words, without_suffix, two_, two_words, two_ws,
     three_, three_words, three_ws)."""
    z = z.replace('-REDH', '').replace('-OLD', '').replace('-NEW', '')
    z = abbr_adj(z)
    z = remove_punc(z)
    z = _THE.sub('', z)
    z = z.lower()
    # single-letter gluing: EVERY run is replaced with the FIRST match's
    # glued form (reference bug, coname.py:61-66)
    s = _TRIPLE.findall(z)
    if s:
        z = _TRIPLE.sub(s[0].replace(' ', ''), z)
    s = _DOUBLE.findall(z)
    if s:
        z = _DOUBLE.sub(s[0].replace(' ', ''), z)
    words = _WS.split(remove_punc(z))
    without_suffix = [x for x in _WS.split(suffix_adj(z)) if x]
    two_ = first_two_adj(words)
    three_ = first_three_adj(words)
    if two_:
        two_words = _WS.split(remove_punc(two_))
        two_ws = [x for x in _WS.split(suffix_adj(two_)) if x]
    else:
        two_words, two_ws = None, None
    if three_:
        three_words = _WS.split(remove_punc(three_))
        three_ws = [x for x in _WS.split(suffix_adj(three_)) if x]
    else:
        three_words, three_ws = None, None
    return (z, words, without_suffix, two_, two_words, two_ws,
            three_, three_words, three_ws)


def legacy_match(x, y, x_words, y_words, without_suffix_x, without_suffix_y,
                 unique_word, pair_word):
    """coname.py:148-183 — one variant-pair decision.

    ``unique_word`` / ``pair_word`` are the corpus-derived gates (any
    container supporting ``in``; the reference uses lists, membership
    semantics are identical for the sets the pipeline passes).
    """
    score = fw_token_set_ratio(without_suffix_x, without_suffix_y)
    if score < 94:
        return
    first_word_x, first_word_y = x_words[0], y_words[0]
    first_score = fw_ratio(first_word_x, first_word_y)
    set_ws_x = set(without_suffix_x)
    set_ws_y = set(without_suffix_y)
    if len(set_ws_x) == len(set_ws_y):
        if first_score > 90 and first_word_x[0] == first_word_y[0]:
            return True
        else:
            xyset = set_ws_x & set_ws_y
            xyset.discard('s')
            if xyset == set_ws_x:
                if len(xyset) == 1 and list(xyset)[0] not in unique_word:
                    if fw_token_set_ratio(x_words, y_words) > 90:
                        return True
                else:
                    return True
    else:
        if first_score > 90 and (first_word_y in unique_word):
            if first_word_x[0] == first_word_y[0]:
                return True
        if len(without_suffix_x) > 1 and len(without_suffix_y) > 1:
            y1, y2 = y_words[:2]
            x1, x2 = x_words[:2]
            if (y1, y2) in pair_word and 'of' not in (y1, y2) \
                    and 's' not in (y1, y2):
                if fw_ratio(x1, y1) > 90 and fw_ratio(x2, y2) > 90:
                    return True


def legacy_permutation(x_tuple, y_tuple, unique_word, pair_word):
    """coname.py:121-145 — char-set prefilter + glued-variant cascade.

    Keeps the reference's guard asymmetry: the (x, three_y) call is gated on
    ``three_x`` (not ``three_y``), so three_y may be None there — which
    scores 0 inside fuzzywuzzy semantics, never a crash.
    """
    (x, x_words, without_suffix_x, two_x, two_words_x, two_ws_x,
     three_x, three_words_x, three_ws_x) = x_tuple
    (y, y_words, without_suffix_y, two_y, two_words_y, two_ws_y,
     three_y, three_words_y, three_ws_y) = y_tuple
    if len(x) > 7 and len(y) > 7:
        if len(set(x) & set(y)) < 4:
            return
    if fw_token_set_ratio(x, y) < 55:
        return
    if legacy_match(x, y, x_words, y_words, without_suffix_x,
                    without_suffix_y, unique_word, pair_word):
        return True
    if two_x:
        if legacy_match(two_x, y, two_words_x, y_words, two_ws_x,
                        without_suffix_y, unique_word, pair_word):
            return True
        if three_x:
            if legacy_match(three_x, y, three_words_x, y_words, three_ws_x,
                            without_suffix_y, unique_word, pair_word):
                return True
    if two_y:
        if legacy_match(x, two_y, x_words, two_words_y, without_suffix_x,
                        two_ws_y, unique_word, pair_word):
            return True
        if three_x:
            if legacy_match(x, three_y, x_words, three_words_y,
                            without_suffix_x, three_ws_y,
                            unique_word, pair_word):
                return True


def corpus_words_exact(rows) -> tuple[set, set]:
    """Driver-side replica of the coname.py:214-240 corpus-stats loop.

    ``rows`` iterates (gvkey, name, abbrev) in file order.  Returns the
    (unique_word, pair_word) membership sets: items appearing in <= 2
    gvkeys' per-gvkey sets.  Used by tests and as the reduce of the
    distributed version in pipelines/coname.py.
    """
    gvkey_single: dict = {}
    gvkey_pair: dict = {}
    for gvkey, name, abbrev in rows:
        x = _WS.split(remove_punc(abbrev.lower()))
        if gvkey in gvkey_single:
            for x in name:  # reference bug: iterates the CHARS of name
                gvkey_single[gvkey].add(x)
                gvkey_pair[gvkey] = set(pairwise(x)) | gvkey_pair[gvkey]
        else:
            gvkey_single[gvkey] = set(x)
            gvkey_pair[gvkey] = set(pairwise(x))
    single_counts: Counter = Counter()
    pair_counts: Counter = Counter()
    for v in gvkey_single.values():
        single_counts.update(v)
    for v in gvkey_pair.values():
        pair_counts.update(v)
    unique_word = {w for w, n in single_counts.items() if n <= 2}
    pair_word = {p for p, n in pair_counts.items() if n <= 2}
    return unique_word, pair_word
