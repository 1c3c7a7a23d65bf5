"""Name normalization: the ordered rewrite engine + full preprocessor.

Behavioral parity targets (all cited into ``/root/reference/``):

* ``_abbr_adj`` — ``utils/_abbr.py:5-28``: for each ``(pattern, repl)`` rule,
  in order, apply one word-boundary-guarded IGNORECASE ``re.sub`` (patterns
  already containing a ``(?`` group get only the trailing ``(?!\\w)`` guard),
  then ``.replace("  ", " ").strip()``, then — whenever the replacement is
  non-empty — collapse a doubled replacement (``repl repl`` -> ``repl``,
  case-SENSITIVE); finally lowercase.  The rewrite is **sequential**: later
  rules see earlier rules' output, and a rule's doubled-collapse can fire even
  when its main pattern did not match (e.g. "x co ltd co" -> ... -> "x inc").
* ``name_preprocessing`` — ``utils/_name_pre.py:20-79``: the exact step order,
  including quirk rules (``our``->``or``, ``tt``->``t``, ``er``->``ers``),
  single-letter-run merging, the dead roman-numeral loop (a no-op in the
  reference — every pattern starts with "i" and is skipped — therefore simply
  absent here), and person-name removal returning ``None`` to drop the row.
* ``remove_suffix`` — ``matcher.py:59-63``: one alternation regex built from
  the suffix set, case-sensitive, interior double spaces left behind.
* ``_has_location`` — ``matcher.py:84-92``.

Performance: every rule's regexes are compiled once per ``Normalizer``
instance (one per Ray actor), and each rule carries a derived literal
*trigger* substring — the main sub is skipped when the trigger is absent from
the lowercased name, which skips ~95% of the ~300 regex executions per name
with identical output (the skip path still applies the reference's
double-space collapse, and the doubled-replacement collapse is still guarded
only by its own cheap substring test, preserving cross-rule collapse
semantics).
"""

from __future__ import annotations

import re

from .assets import ALL_REWRITE_RULES, Assets, default_assets

_PREFIX_STRIP = re.compile(r"^(?:\(\?<!\\w\)|\(\?!\^(?:\|\\w)?\)|\^)+")
_META = set("[](){}?*+|^$.")


def _literal_trigger(pattern: str) -> str:
    """Longest leading literal substring of a regex pattern (lowercased).

    Used only as a necessary-condition prefilter; empty/short triggers mean
    "always run the regex".
    """
    p = _PREFIX_STRIP.sub("", pattern)
    out = []
    i = 0
    while i < len(p):
        ch = p[i]
        if ch == "\\":
            if i + 1 < len(p) and p[i + 1] not in "wWdDsSbBAZ":
                out.append(p[i + 1])
                i += 2
                continue
            break
        if ch in _META:
            # a quantifier binds the preceding literal char — drop it
            if ch in "?*+{" and out:
                out.pop()
            break
        out.append(ch)
        i += 1
    return "".join(out).lower()


class _Rule:
    __slots__ = ("main", "repl", "double", "trigger", "raw_repl")

    def __init__(self, pattern: str, repl: str):
        # _abbr.py:7-23 — guard placement depends on whether the pattern
        # already contains a group construct
        if "(?" in pattern:
            self.main = re.compile(pattern + r"(?!\w)", re.IGNORECASE)
        else:
            self.main = re.compile(r"(?<!\w)" + pattern + r"(?!\w)", re.IGNORECASE)
        self.raw_repl = repl
        self.repl = " " + repl
        # _abbr.py:24-27 — collapse doubled replacement, case-sensitive
        self.double = (
            re.compile(r"\b" + repl + r"\s+" + repl + r"\b") if repl.strip() else None
        )
        t = _literal_trigger(pattern)
        self.trigger = t if len(t) >= 2 else ""


class Normalizer:
    """Compiled normalization state; build once per process/actor.

    ``matcher.py`` / ``_name_pre.py`` build the equivalent state at module
    import time and share it via fork; here it is an actor-constructor payload
    (SURVEY.md §2.3 T1/T2).
    """

    def __init__(self, assets: Assets | None = None):
        self.assets = assets if assets is not None else default_assets()
        self.rules = [_Rule(p, r) for p, r in ALL_REWRITE_RULES]

        # remove_people guard vocabulary (_name_pre.py:76): replacement words
        # of abbr1+abbr2 only (NOT hardcode), case kept verbatim — uppercase
        # entries can never match lowercased tokens, faithfully so.
        from .assets import ABBR_RULES

        self.abbr_repl_words = {b for _, b in ABBR_RULES if b != ""}

        # matcher.py:59 — suffix alternation; deterministic longest-first
        # order (the reference iterates a set; all members are \b-delimited so
        # alternation order does not change the match result).
        suf = sorted(self.assets.suffix, key=lambda s: (-len(s), s))
        self._suffix_re = re.compile(r"\b" + r"\b|\b".join(suf) + r"\b")

        # matcher.py:84 — location alternation.  The reference compiles the
        # 29k-branch pattern  locs[0]\b|\bloc\b|...|\blocs[-1]  and re.searches
        # it per call (~20 ms).  Inputs at match() time are pre_proc strings
        # (single-spaced [\w\d]+ tokens), so for phrases made only of
        # alnum+space the \b-delimited search is EXACTLY a token-window
        # equality test — done here with hash-set lookups (~µs).  Phrases with
        # regex metachars ('.', '(..)', char classes, …) go to a small
        # fallback regex, memoized per distinct name.  Boundary quirks of the
        # first/last alternative (no leading/trailing \b) are kept: first
        # phrase matches as token-suffix, last as token-prefix.
        locs = [x.strip() for x in self.assets.locations if x.strip()]
        self._loc_index = _LocationIndex(locs) if locs else None
        self._loc_memo: dict[str, bool] = {}

        # _name_pre.py compiled pieces
        self._w = re.compile(r"\w+")
        self._tok = re.compile(r"[\w\d]+")
        self._single = re.compile(r"\b\w\s\b")
        self._our = re.compile(r"(?=\w+)our\b")
        self._oldnew_end = re.compile(r"old$|new$")
        self._tt = re.compile(r"(?=\w+)tt\b")
        self._er = re.compile(r"(?=\w+)er\b")
        self._co_inc = re.compile(r"\bco\.? inc\b")
        self._co_ltd = re.compile(r"\bco\.? ltd\b")
        self._the = re.compile(r"\bthe\b")
        self._initial = re.compile(r"\b[a-z]\.(?!\w)\b")
        self._jr = re.compile(r"\bjr\.\b")
        self._sr = re.compile(r"\bsr\.\b")

    # -- ordered rewrite engine (abbr_adj) ---------------------------------
    def abbr_adj(self, name: str) -> str:
        for rule in self.rules:
            if not rule.trigger or rule.trigger in name.lower():
                name = rule.main.sub(rule.repl, name).replace("  ", " ").strip()
            else:
                # identity sub in the reference still collapses/strips
                name = name.replace("  ", " ").strip()
            if rule.double is not None and rule.raw_repl in name:
                name = rule.double.sub(rule.raw_repl, name)
        return name.replace("  ", " ").strip().lower()

    # -- full preprocessor (name_preprocessing) ----------------------------
    def preprocess(self, z: str, remove_people: bool = True) -> str | None:
        """_name_pre.py:20-79 — returns None to drop the row (person name)."""
        z = z.lower().replace("'", "")
        z = z.replace("-redh", "").replace("-old", "").replace("-new", "")
        z = (
            z.split("-pre")[0]
            .split("-adr")[0]
            .split("division of")[-1]
            .split("known as")[-1]
            .split("-consolidated")[0]
        )
        z = self._our.sub("or", z)
        z = self._oldnew_end.sub("", z)
        z = self._tt.sub("t", z)
        z = self._er.sub("ers", z)
        z = z.replace("`", "").replace("& company", "").replace("& companies", "")
        z = self._co_inc.sub("inc", z)
        z = self._co_ltd.sub("inc", z)
        z = self._the.sub("", z)
        z = self._initial.sub("", z)
        z = self._jr.sub("", z)
        z = self._sr.sub("", z)
        z = " ".join(self._tok.findall(z))
        # merge runs of single letters: "a b c" -> "abc" (replace the
        # *concatenation* of all single-letter matches — a faithful quirk:
        # non-contiguous single letters produce a no-op replace)
        a = "".join(self._single.findall(z))
        if a:
            z = z.replace(a, a.replace(" ", "") + " ")
        # (_name_pre.py:50-66 roman-numeral loop: provably a no-op — every
        # pattern starts with "i" and the loop's first branch skips it)
        z = self.abbr_adj(z)
        if remove_people:
            ws = self._w.findall(z)
            counter = 0
            if len(ws) > 1:
                names = self.assets.person_names
                for w in ws:
                    if w in names and len(w) > 1:
                        counter += 1
            if not (self.abbr_repl_words & set(ws)):
                denom = len(set(ws) - {"matchit"})
                if counter >= 2 and denom and counter / denom >= 0.6:
                    return None
        return z.strip().lower()

    # -- suffix stripping (matcher.py:62-63) -------------------------------
    def remove_suffix(self, name: str) -> str:
        return self._suffix_re.sub("", name).strip()

    # -- location detection (matcher.py:87-92) -----------------------------
    def has_location(self, name: str) -> bool:
        if self._loc_index is None:
            return False
        memo = self._loc_memo
        hit = memo.get(name)
        if hit is None:
            hit = self._loc_index.search(name)
            if len(memo) < 1_000_000:
                memo[name] = hit
        return hit


class _LocationIndex:
    """Fast equivalent of the reference's location alternation regex for
    clean (pre_proc) inputs; see Normalizer.__init__ comment."""

    def __init__(self, locs: list[str]):
        def clean(p: str) -> bool:
            return "  " not in p and all(c.isalnum() or c == " " for c in p)

        self.ngram: set[tuple[str, ...]] = set()
        self.max_n = 1
        fallback: list[str] = []
        # first alternative: no leading \b → first word may be a token suffix
        self.first = tuple(locs[0].split()) if clean(locs[0]) else None
        # last alternative: no trailing \b → last word may be a token prefix
        self.last = tuple(locs[-1].split()) if clean(locs[-1]) else None
        if self.first is None:
            fallback.append(locs[0] + r"\b")
        if self.last is None:
            fallback.append(r"\b" + locs[-1])
        for p in locs[1:-1]:
            if clean(p):
                w = tuple(p.split())
                self.ngram.add(w)
                self.max_n = max(self.max_n, len(w))
            else:
                fallback.append(r"\b" + p + r"\b")
        self._fallback_re = re.compile("|".join(fallback)) if fallback else None

    def search(self, name: str) -> bool:
        toks = name.split()
        nt = len(toks)
        ngram = self.ngram
        for n in range(1, min(self.max_n, nt) + 1):
            for i in range(nt - n + 1):
                if tuple(toks[i:i + n]) in ngram:
                    return True
        f = self.first
        if f is not None and nt >= len(f):
            k = len(f)
            for i in range(nt - k + 1):
                if toks[i].endswith(f[0]) and tuple(toks[i + 1:i + k]) == f[1:]:
                    return True
        l = self.last
        if l is not None and nt >= len(l):
            k = len(l)
            for i in range(nt - k + 1):
                if toks[i + k - 1].startswith(l[-1]) and tuple(toks[i:i + k - 1]) == l[:-1]:
                    return True
        if self._fallback_re is not None and self._fallback_re.search(name):
            return True
        return False
