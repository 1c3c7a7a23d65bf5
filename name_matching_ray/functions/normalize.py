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

        # matcher.py:84 — location alternation (29k branches; compiled once)
        locs = [x.strip() for x in self.assets.locations if x.strip()]
        self._location_re = re.compile(r"\b|\b".join(locs)) if locs else None

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
        if self._location_re is None:
            return False
        return self._location_re.search(name) is not None
