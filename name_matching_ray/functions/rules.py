"""The pairwise match decision cascade.

Re-implements the reference's ordered decision list ``match(a, b)``
(``/root/reference/matcher.py:139-366``) bit-for-bit, *including* its quirks —
they are load-bearing for decision parity (SURVEY.md §7.4 risk 1):

* the dead threshold branch at matcher.py:197-198 (the ``len==1`` value is
  always overwritten by the ``m==1``/else assignment that follows);
* rule 11 (matcher.py:337-338) is unreachable: the chained comparison
  ``x[0] in common_abbr not in intl`` evaluates ``common_abbr not in intl``
  (a set is never an element of that tuple → True) and
  ``y[0] not in common_abbr in intl`` evaluates ``common_abbr in intl``
  (always False), so the branch always falls to ``-12``;
* ``check_double`` returning ``False`` (not an int) propagates as the return
  value of ``match`` — callers only test ``> 0``, and ``False == 0``;
* ``pos_x`` keeps the LAST position of a duplicated base word, ``pos_y`` the
  FIRST of a duplicated query word (matcher.py:188, 190-191).

Conventions follow the reference: ``a`` = query-side preprocessed name,
``b`` = base-side preprocessed name, ``x = b.split()`` (base words),
``y = a.split()`` (query words).  Return int: sign is the decision
(``> 0`` means match), magnitude is the diagnostic rule code.
"""

from __future__ import annotations

import re
import string

from .assets import BAN_LIST, INTL, NA, TOO_GENERAL, Assets, default_assets
from .normalize import Normalizer
from .similarity import (
    bigrams,
    jaro_winkler,
    ratio,
    token_set_ratio,
    token_sort_ratio,
)

CUTOFF = 50  # candidate gate constant, matcher.py:33

_ALPHA_RUN = re.compile("[a-z]+")  # matcher.py:122


_PROCESS_MATCHER = None


def get_matcher() -> "Matcher":
    """Lazy per-process Matcher singleton.

    Ray reuses worker processes across tasks of a job, so task-pool stages
    (e.g. fused ``map_groups`` emit+score) get the compiled state once per
    process instead of once per task — the task-pool equivalent of actor
    ``__init__`` state.
    """
    global _PROCESS_MATCHER
    if _PROCESS_MATCHER is None:
        _PROCESS_MATCHER = Matcher()
    return _PROCESS_MATCHER


class _NamePre:
    """Per-NAME prework for the cascade, computed once per distinct
    preprocessed name and reused across every pair that name appears in
    (names recur heavily inside a blocking bucket).  Everything here is a
    pure function of one name — the pair-dependent state (good_x/good_y,
    score_x, has_bad_x) stays in :meth:`Matcher.match`.
    """

    __slots__ = ("words", "wset_ns", "na_empty", "c", "c_words", "sorted_c",
                 "sj", "sj_c", "nospace", "has_loc", "ban", "pos_first",
                 "pos_last", "dup_firsts", "remaining")

    def __init__(self, s: str, norm: Normalizer, suffix: set,
                 common_abbr: set):
        words = s.split()
        self.words = words
        wset = set(words)
        self.wset_ns = wset - suffix
        self.na_empty = not (self.wset_ns - NA)
        c = norm.remove_suffix(s)
        self.c = c
        self.c_words = set(c.split())
        self.sorted_c = "".join(sorted(c))
        self.sj = " ".join(sorted(words))
        self.sj_c = " ".join(sorted(c.split()))
        self.nospace = s.replace(" ", "")
        self.has_loc = norm.has_location(s)
        self.ban = any(w in s for w in BAN_LIST)
        pos_first: dict = {}
        pos_last: dict = {}
        for i, w in enumerate(words, start=1):
            if w not in pos_first:
                pos_first[w] = i  # first occurrence wins (matcher.py:190-191)
            pos_last[w] = i  # last occurrence wins (matcher.py:188)
        self.pos_first = pos_first
        self.pos_last = pos_last
        # qualifying repeated-word bigrams for check_double (matcher.py:66-81):
        # first elements of adjacent near-duplicate non-suffix word pairs
        self.dup_firsts = [
            w1 for w1, w2 in bigrams(words)
            if ratio(w1, w2) > 89 and w1 not in suffix and w2 not in suffix
        ]
        self.remaining = wset - common_abbr - suffix


class Matcher:
    """Compiled matcher state: one instance per process / Ray actor.

    Holds the dictionaries (eng, suffix, common_abbr sets) and a
    :class:`Normalizer` — the reference builds the same state at module import
    and shares it across fork workers (SURVEY.md §2.3).
    """

    _PRE_CACHE_CAP = 300_000  # per-name prework entries (~a few hundred B each)

    def __init__(self, assets: Assets | None = None, normalizer: Normalizer | None = None):
        self.assets = assets if assets is not None else default_assets()
        self.norm = normalizer if normalizer is not None else Normalizer(self.assets)
        self.suffix = self.assets.suffix
        self.eng = self.assets.eng
        self.common_abbr = self.assets.common_abbr
        self.common_abbr12 = self.assets.common_abbr12
        self._pre_cache: dict[str, _NamePre] = {}

    def _name_pre(self, s: str) -> _NamePre:
        got = self._pre_cache.get(s)
        if got is None:
            got = _NamePre(s, self.norm, self.suffix, self.common_abbr)
            if len(self._pre_cache) < self._PRE_CACHE_CAP:
                self._pre_cache[s] = got
        return got

    # -- check_double (matcher.py:66-81) -----------------------------------
    def _check_double(self, a_words, b_words):
        """Repeated-word guard ("BALL & BALL CARBURETOR" vs "BALL CORP").

        Returns False when a repeated near-duplicate word in ``a_words`` has
        no aligned repeated word in ``b_words``; otherwise None.
        """
        suffix = self.suffix
        for a1, a2 in bigrams(a_words):
            if ratio(a1, a2) > 89:
                if a1 in suffix or a2 in suffix:
                    continue
                found_pair = False
                for b1, b2 in bigrams(b_words):
                    if ratio(b1, b2) > 89:
                        if b1 in suffix or b2 in suffix:
                            continue
                        if ratio(a1, b1) <= 89:
                            return False
                        found_pair = True
                        break
                if not found_pair:
                    return False
        return None

    @staticmethod
    def _check_double_pre(pre_a: "_NamePre", pre_b: "_NamePre"):
        """:meth:`_check_double` on memoized qualifying-bigram lists.

        The reference's inner scan always lands on the FIRST qualifying
        ``b`` bigram (it breaks there regardless of alignment), so only
        ``pre_b.dup_firsts[0]`` matters; equivalence with the scan above is
        differential-tested (test_check_double_pre_equivalence).
        """
        firsts = pre_a.dup_firsts
        if not firsts:
            return None
        b_first = pre_b.dup_firsts[0] if pre_b.dup_firsts else None
        for a1 in firsts:
            if b_first is None:
                return False
            if ratio(a1, b_first) <= 89:
                return False
        return None

    # -- the cascade (matcher.py:139-366) ----------------------------------
    def match(self, a: str, b: str):
        suffix = self.suffix
        eng = self.eng
        common_abbr = self.common_abbr

        # rule 16: hardcoded-brand sentinel equality (matcher.py:141-146)
        if "matchit" in a and "matchit" in b:
            try:
                if a.split("matchit")[0].split()[-1] == b.split("matchit")[0].split()[-1]:
                    return 16
            except IndexError:
                pass  # reference logs and falls through (bare except)

        # per-NAME prework is memoized across pairs (see _NamePre); every
        # substitution below is exact: token_sort_ratio(a,b) == 100 ⟺ the
        # sorted-join strings compare equal; ratio(sorted(c), sorted(d))
        # == 100 ⟺ the sorted char strings compare equal; token_sort_ratio
        # itself IS ratio over the sorted joins
        pa_, pb_ = self._name_pre(a), self._name_pre(b)
        c, d = pa_.c, pb_.c
        x, y = pb_.words, pa_.words

        if len(y) - len(x) > 5:
            return -23
        if pa_.na_empty:
            return -1
        if pb_.na_empty:
            return -2

        # rule 21/-22: both names carry a location (matcher.py:160-164)
        if pa_.has_loc and pb_.has_loc:
            if ratio(pa_.sj, pb_.sj) > 95:
                return 21
            return -22

        # rule 1a: space-stripped equality (matcher.py:165-167)
        if pa_.nospace == pb_.nospace:
            if len(a) > 8:
                return 1
        # rule 1b / -21: anagram-level equality (matcher.py:168-177)
        if pa_.sj == pb_.sj or pa_.sorted_c == pb_.sorted_c:
            if a[:3] == b[:3]:
                if c in TOO_GENERAL and d in TOO_GENERAL:
                    return -21
                if len(x) >= 2 and len(y) >= 2:
                    if x[1][:3] == y[1][:3]:
                        return 1
                else:
                    return 1

        # rule -3: banned institution words, substring test (matcher.py:179-181)
        if pa_.ban:
            return -3

        # word-alignment state (matcher.py:183-223); x is the base/CRSP side.
        # pos_x (last occurrence of a base word) and pos_y (first occurrence
        # of a query word) are pure per-name functions — taken from the memo;
        # good_x / good_y / score_x are pair state, built exactly as the
        # reference builds them
        good_x, good_y = set(), set()
        has_bad_x = False
        pos_x, pos_y = pb_.pos_last, pa_.pos_first
        score_x = {}
        thr_equal_len = (len(x) == len(y)) and (len(x) > 3)
        for m, wx in enumerate(x, start=1):
            scores = []
            wx0 = wx[0]
            for wy in y:
                score = ratio(wx, wy)
                scores.append(score)
                if wy in suffix:
                    continue
                # threshold resolution incl. the dead len==1 branch
                # (matcher.py:197-205): net effect below
                if thr_equal_len:
                    threshold = 75
                elif m == 1:
                    threshold = 92
                else:
                    threshold = 89
                if score > threshold and wx0 == wy[0] and wy[-1] not in "1234567890":
                    good_x.add(wx)
                if jaro_winkler(wx, wy) > 0.92:
                    good_y.add(wy)
            if wx not in good_x and wx not in suffix:
                has_bad_x = True  # every base word must find a query match
            if wx not in good_x and m == 1:
                has_bad_x = True  # the first base word must match
            score_x[m] = max(scores) if scores else 0

        # rule 2: high token-sort similarity after suffix strip (226-231)
        if ratio(pa_.sj_c, pb_.sj_c) > 94:
            if has_bad_x is False:
                if a[0] == b[0]:
                    return 2

        # generic-name rejects (234-244)
        if len(x) == 0 or len(y) == 0:
            return -4
        if len(x) == 1:
            if x[0] in eng or len(x[0]) < 5:
                return -5
        if len(x) == 2:
            if " ".join(x[:2]) in eng:
                return -6
        if len(x) == 3:
            if " ".join(x[:3]) in eng:
                return -13

        # part 2: low-similarity salvage (246-366).  check_double is driven
        # by each name's memoized qualifying-bigram list: names with no
        # repeated near-duplicate words (the overwhelming majority) skip it
        # outright; otherwise the reference's exact first-qualifying-bigram
        # alignment logic runs (see _check_double_pre)
        if (pb_.dup_firsts or pa_.dup_firsts):
            if self._check_double_pre(pb_, pa_) is False:
                return False
            if self._check_double_pre(pa_, pb_) is False:
                return False

        # abbreviation-coverage block (252-275)
        if (
            len(pa_.c_words - common_abbr - good_y) == 0
            or len(pb_.c_words - common_abbr - good_x) == 0
        ):
            remain_good_y = set(good_y) - suffix
            if len(remain_good_y) == 1:
                alpha = _ALPHA_RUN.findall(next(iter(remain_good_y)))
                if len(alpha) > 0:
                    if alpha[0] in self.common_abbr12:
                        return -8
                else:
                    return -18
                for wy in y:
                    if wy in good_y or wy in suffix:
                        continue
                    if pos_y[wy] <= len(x):
                        return -20
                for m in range(1, min(len(y) + 1, len(x) + 1)):
                    if score_x[m] < 80:
                        return -20
            if x[0] in good_x and y[0] in good_y and x[0] not in eng and y[0] not in eng:
                if a[:3] == b[:3]:
                    return 10

        # contiguity block (277-307)
        strong_y = good_y - common_abbr - suffix
        strong_x = good_x - common_abbr - suffix
        letter_mass = len(strong_y) * len(
            [ch for w in strong_y for ch in w if ch in string.ascii_letters]
        )
        if letter_mass > 12:
            if " ".join(sorted(strong_y)) not in eng:
                if strong_x:
                    pos_sy = [pos_y[w] for w in strong_y]
                    pos_sx = [pos_x[w] for w in strong_x]
                    if (
                        len(pos_sy) == 1 + max(pos_sy) - min(pos_sy)
                        and len(pos_sx) == 1 + max(pos_sx) - min(pos_sx)
                    ):
                        if y[0] in good_y and y[0] not in eng:
                            if score_x[1] > 89 and len(score_x) == 1:
                                return 4
                            elif len(score_x) > 1:
                                if score_x[1] > 89 and score_x[2] > 89:
                                    return 4
                        else:
                            if y[0] in INTL and score_x[1] > 93:
                                if has_bad_x is True:
                                    if y[1][:3] == x[0][:3]:
                                        return 5
                                else:
                                    return 55

        # first-two-words block (309-332)
        _x = pb_.wset_ns
        _y = pa_.wset_ns
        if len(_x) > 1 and len(_y) > 1:
            if token_sort_ratio([x[0], x[1]], [y[0], y[1]]) > 84:
                if x[0] == y[0] and has_bad_x is False:
                    return 8
                if " ".join([x[0], x[1]]) not in eng and " ".join([y[0], y[1]]) not in eng:
                    if x[0] in eng and x[1] in eng and y[0] in eng and y[1] in eng:
                        if len(_y - good_y - common_abbr) > 0 and has_bad_x is True:
                            return -19
                    if jaro_winkler(x[0], y[0]) > 0.97 and jaro_winkler(x[1], y[1]) > 0.94:
                        if x[0] not in INTL and y[1] not in INTL:
                            if has_bad_x is True:
                                if len(_y - good_y) == 0:
                                    return 91
                            else:
                                return 9
                else:
                    return -9
            else:
                return -99

        # single-word names (334-349)
        if len(_x) == 1 and len(_y) == 1:
            if jaro_winkler(x[0], y[0]) > 0.97 and len(x[0]) > 7:
                if abs(len(x[0]) - len(y[0])) <= 1:
                    # rule 11 is unreachable in the reference (see module
                    # docstring); the branch always resolves to -12
                    return -12
            if len(x[0]) >= 5 and len(y[0]) >= 5:
                if x[0][:5] == y[0][:5]:
                    if x[0][-3:] == y[0][-3:]:
                        if abs(len(x[0]) - len(y[0])) <= 1:
                            return 12
                if x[0][-5:] == y[0][-5:]:
                    if x[0][:3] == y[0][:3]:
                        if abs(len(x[0]) - len(y[0])) <= 1:
                            return 13

        # tail rejects (351-366)
        if len(good_y) == 1:
            alpha = _ALPHA_RUN.findall(next(iter(good_y)))
            if len(alpha) > 0:
                if alpha[0] in self.common_abbr12:
                    return -8
                else:
                    return -18
        remaining_x = pb_.remaining
        if not remaining_x:
            return -10
        if len(remaining_x) == 1:
            if len(next(iter(remaining_x))) == 1:
                return -11

        return -15

    # -- single-pair entry (matcher.py:369-378) ----------------------------
    def match_test(self, raw_a: str, raw_b: str):
        """Preprocess both raw names, gate, then run the cascade.

        Returns the rule code, or None when preprocessing drops a side or the
        ``token_set_ratio(nosuffix) > 50`` gate fails.
        """
        a = self.norm.preprocess(raw_a)
        b = self.norm.preprocess(raw_b)
        if a and b:
            c, d = self.norm.remove_suffix(a), self.norm.remove_suffix(b)
            if token_set_ratio(c, d) > CUTOFF:
                return self.match(a, b)
        return None

    def gate(self, nosuffix_a: str, nosuffix_b: str) -> bool:
        """The cheap candidate gate (matcher.py:385, cutoff at :33)."""
        return token_set_ratio(nosuffix_a, nosuffix_b) > CUTOFF

    def score(self, nosuffix_a: str, nosuffix_b: str) -> float:
        """The emitted matching score (matcher.py:393)."""
        return token_sort_ratio(nosuffix_a, nosuffix_b)
