"""Dictionaries and rewrite-rule tables for name normalization + matching.

Semantics re-derived from the reference's data tables:

* rewrite rules  — ``/root/reference/utils/_abbr.py:31-296`` (``abbr1`` legal /
  uninformative suffixes, ``abbr2`` domain-word canonicalizations, ``hardcode``
  brand rewrites with the ``matchit`` sentinel).  These tables ARE the
  behavioral spec of the normalizer: each entry is ``(pattern, replacement)``
  applied as an ordered sequential regex rewrite (see normalize.Normalizer).
* ``SUFFIX``     — legal-suffix word set (``_abbr.py:298-329``).
* ``BAN_LIST`` / ``INTL`` / ``TOO_GENERAL`` / ``NA`` — matcher.py:97-136.
* dictionaries (``eng``, person names, locations) — loaded at matcher.py:40-57
  and ``_name_pre.py:13-16``.  Two of the reference's blobs are absent from its
  repo (``words_dictionary.json``, ``names_decode.csv`` — see
  ``.MISSING_LARGE_BLOBS``); substitutions documented on :func:`load_assets`.

No code is copied from the reference; the rule *data* is reproduced because
match-decision parity (BASELINE.json F1 >= 0.99) requires identical rewrite
behavior.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path

_DATA_DIR = Path(__file__).resolve().parent.parent / "data"

# --------------------------------------------------------------------------
# Brand hardcodes (_abbr.py:237-296).  Applied FIRST.  Replacements that end
# in the sentinel token "matchit" mark hard-coded brand equality consumed by
# cascade rule 16 (matcher.py:141-146).
# --------------------------------------------------------------------------
HARDCODE_RULES = [
    ("hp hood", ""),
    ("hp pelzers?", ""),
    ("HP", "HEWLETT PACKARD"),
    ("IBM", "international business machines"),
    ("DE NEMOURS", ""),
    (r"\bE I\b", ""),
    ("NE NEMOURS", ""),
    (r"\bE I\b", ""),
    (r"\bEI\b", ""),
    (r"DU PONT", "DU PONT"),
    (r"DU POND", "DU PONT"),
    (r"DUPONT", "DU PONT"),
    (r"DU PONTE", "DU PONT"),
    (r"\bDUPONT\b", "DUPONT matchit"),
    (r"\bDU PONT\b", "DUPONT matchit"),
    ("HITACHI", "HITACHI matchit"),
    ("exxon", "exxon matchit"),
    ("exxonmobil", "exxon matchit"),
    (r"\blg\b", "lg matchit"),
    (r"\bl g\b", "lg matchit"),
    (r"SIEM\w+S", "SIEMENS matchit"),
    ("GTE", "GTE matchit"),
    ("north  america philips", "philips"),
    ("toshiba", "toshiba matchit"),
    ("Tokyo Shibaura", "toshiba matchit"),
    ("toyota", "toyota matchit"),
    (r"\bhonda\b", "honda matchit"),
    ("schlumbergers", "schlumbergers matchit"),
    ("microsoft", "microsoft matchit"),
    ("^verizon", "verizon matchit"),
    ("^chevron", "chevron matchit"),
    ("^cisco", "cisco matchit"),
    ("ericsson", "ericsson matchit"),
    (r"\b3m\b", "3m matchit"),
    (r"\boracle\b", "oracle matchit"),
    (r"\bgm\b", "general motor"),
    (r"\bat t\b", "at t matchit"),
    (r"\bnokia\b", "nokia matchit"),
    ("^merck", "merck matchit"),
    (r"eastm\w+ ko\w+", "kodak"),
    ("kodak", "kodak matchit"),
    ("^canon", "canon matchit"),
    ("Aluminum Company of America", "alcoa"),
    ("^alcoa", "alcoa matchit"),
    ("hoescht", "hoechst"),
    ("Hoeschst", "hoechst"),
    ("Hoechet", "hoechst"),
    ("Hoechset", "hoechst"),
    ("hoechst", "hoechst matchit"),
    ("International Telephone and Telegraph", "IT"),
    ("nissan", "nissan matchit"),
    ("ford meter box", ""),
    ("^ford", "ford matchit"),
    ("xerox", "xerox matchit"),
    ("^texaco", "texaco matchit"),
    ("^volvo", "volvo matchit"),
    ("caterpillar", "caterpillar matchit"),
]

# --------------------------------------------------------------------------
# Corporate/legal + country suffixes and uninformative words (_abbr.py:31-121).
# Applied after HARDCODE_RULES, before ABBR2_RULES, in this exact order —
# order is load-bearing (e.g. "company incorp" can only fire before "company"
# has been rewritten if listed first... here it is listed after, so it never
# fires on fresh input: faithful to the reference).
# --------------------------------------------------------------------------
ABBR1_RULES = [
    ("the", ""),
    ("and", ""),
    ("of", ""),
    ("for", ""),
    ("llc", "llc"),
    ("ll c", "llc"),
    (r"incorp\w+", "inc"),
    ("CO", "inc"),
    ("COS", "inc"),
    ("companies", "inc"),
    ("comapany", "inc"),
    ("company", "inc"),
    ("cor", "inc"),
    ("CORP", "inc"),
    (r"corpor\w+", "inc"),
    ("LTD", "inc"),
    ("limit", "inc"),
    ("limite", "inc"),
    ("limited", "inc"),
    ("company incorp", "inc"),
    ("incorp incorp", "inc"),
    ("company limited", "inc"),
    ("incorp limited", "inc"),
    (r"inc\s+inc", "inc"),
    ("Assn", "Association"),
    ("Assoc", "Association"),
    ("intl", "international"),
    (r"interna\w+", "international"),
    ("gbl", "international"),
    ("global", "international"),
    ("natl", "national"),
    ("nat", "national"),
    ("int", "international"),
    ("&", "and"),
    (r"L\.P", "LP"),
    (r"L\.L\.P", "LLP"),
    (r"S\.A", "sa"),
    (r"(?!^) sa$", "sa"),
    (r"(?!^) s a$", "sa"),
    (r"(?!^) b v$", "bv"),
    (r"S\.p\.A", "SPA"),
    ("u s a", "usa"),
    ("usa", "usa"),
    ("u s", "usa"),
    ("us", "usa"),
    # Japanese legal forms
    (r"(?!^) kk\b", "inc"),
    (r"(?!^) gk\b", ""),
    (r"(?!^) yk\b", ""),
    (r"(?!^) gmk\b", ""),
    (r"(?!^) gsk\b", ""),
    (r"(?!^) nk\b", ""),
    (r"(?!^) tk\b", ""),
    (r"^kabus\w+ kaisha", ""),
    (r"kanus\w+ kaisha", "inc"),
    (r"kabus\w+ kaisha", "inc"),
    # German legal forms
    (r"(?!^|\w)ev", ""),
    (r"(?!^|\w)rv", ""),
    (r"(?!^|\w)kgaa", ""),
    ("gmbh co", "inc"),
    (r"(?!^|\w)ag co", "inc"),
    (r"(?!^|\w)ag$", "inc"),
    (r"(?!^|\w)a g$", "inc"),
    (r"(?!^|\w)se co", ""),
    ("gmbh$", "inc"),
    (r"\bag$", "inc"),
    (r"(?!^|\w)se", ""),
    (r"(?!^|\w)ug", ""),
    (r"aktieng\w+", "inc"),
    # French legal forms
    (r"(?!^|\w)sep", ""),
    (r"(?!^|\w)snc", ""),
    (r"(?!^|\w)scs", ""),
    (r"(?!^|\w)sca", ""),
    (r"(?!^|\w)sci", ""),
    (r"(?!^|\w)sarl", ""),
    (r"(?!^|\w)eurl", ""),
    (r"(?!^|\w)sa", ""),
    (r"(?!^|\w)s a", ""),
    (r"(?!^|\w)scop", ""),
    (r"\bsas$", ""),
    (r"\bsasu$", ""),
    # Swedish
    (r"ab$", ""),
    (r"lm$", ""),
    # Dutch
    (r"n\s+v$", "inc"),
]

# --------------------------------------------------------------------------
# Informative-word canonicalizations (_abbr.py:123-234).
# --------------------------------------------------------------------------
ABBR2_RULES = [
    ("univ", "university"),
    ("bldg", "building"),
    ("buildings", "building"),
    ("MOR", "Mortgage"),
    ("Banc", "BankCorp"),
    ("bk", "BankCorp"),
    ("bancshares ", "bankcorp"),
    ("bankshares ", "bankcorp"),
    ("BANC CORP", "bankcorp"),
    ("BANCORPORATION", "BankCorp"),
    ("bancorp", "BankCorp"),
    ("stores", "store"),
    ("brand", "brands"),
    ("gen", "general"),
    ("geneal", "general"),
    ("Gereral", "general"),
    ("Gereral", "general"),
    ("generel", "general"),
    ("solutions ", "solution"),
    ("science", "sciences"),
    ("sci", "sciences"),
    ("work", "works"),
    ("device", "devices"),
    ("operation", "operations"),
    ("tool", "tools"),
    ("network", "networks"),
    ("material", "materials"),
    ("grp", "group"),
    ("cap", "capital"),
    ("FINL", "financial"),
    ("THRU", "Through"),
    ("COMM", "Communication"),
    ("MGMT", "Management"),
    ("INVT", "investments"),
    ("INV", "investments"),
    ("investment", "investments"),
    ("PTNR", "partner"),
    ("ADVR", "advisors"),
    ("laboratory", "laboratories"),
    ("lab", "laboratories"),
    ("labs", "laboratories"),
    ("ins", "insurance"),
    ("insur", "insurance"),
    ("insure", "insurance"),
    ("technologies", "tech"),
    ("technology", "tech"),
    ("INDS", "industries"),
    ("industry", "industries"),
    ("industrial", "industries"),
    ("indl", "industries"),
    ("IND", "industries"),
    ("res", "research"),
    ("dev", "development"),
    ("IP", ""),
    ("intellectual property", ""),
    ("intellectual properties", ""),
    ("intellectual", ""),
    (r"(?!^)patents", ""),
    (r"(?!^)patent", ""),
    (r"(?!^)trademark", ""),
    (r"(?!^)trademarks", ""),
    (r"(?!^)licensing", ""),
    ("brands$", ""),
    ("property", "properties"),
    ("Mort", "Mortgage"),
    ("Thr", "Through"),
    ("Sec", "Securities"),
    ("RESOURCE", "Resources"),
    ("Holding", "Holdings"),
    ("Security", "Securities"),
    ("ENTERPRISE", "enterprises"),
    ("funding", "fundings"),
    ("chem", "chemical"),
    ("SYS", "systems"),
    ("MFG", "manufacturing"),
    ("Prod", "products"),
    ("Pharma", "Pharm"),
    ("Pharmaceu", "Pharm"),
    ("Pharmaceuti", "Pharm"),
    ("Pharmace", "Pharm"),
    ("Pharmaceut", "Pharm"),
    ("Pharmaceutical", "Pharm"),
    ("Product", "products"),
    ("svcs", "services"),
    ("service", "services"),
    ("production", "productions"),
    ("saving", "savings"),
    ("svgs", "savings"),
    ("ln", "loan"),
    ("electronic", "electronics"),
    ("elect", "electronics"),
    ("electrs", "electronics"),
    ("elec", "electric"),
    ("electrical", "electric"),
    ("inst", "institution"),
    ("motors", "motor"),
    ("jidosha", "motor"),
    ("jidosha kogyo", "motor"),
    ("machine", "machines"),
    ("machs", "machines"),
    ("teleg", "telegraph"),
    ("tel", "telephone"),
    ("tel", "telephone"),
    ("ry", "railway"),
    ("american", "america"),
    ("AMER", "america"),
    ("AMERN", "america"),
    ("phillip", "philip"),
    (r"north\w* ameri\w+", "america"),
]

ABBR_RULES = ABBR1_RULES + ABBR2_RULES          # _abbr.py:331
ALL_REWRITE_RULES = HARDCODE_RULES + ABBR_RULES  # abbr_adj composition, _abbr.py:333

# Legal-suffix word set (_abbr.py:298-329).  The two regex-shaped members are
# kept verbatim: they are used BOTH as regex alternation branches in the
# suffix-removal pattern (matcher.py:59, case-SENSITIVE there, so
# "Ka\w+ Kaisha" never fires on lowercased names — faithful quirk) AND as
# plain strings in set-membership tests inside the cascade.
SUFFIX = {
    "inc", "llc", "company", "limited", "trust", "lp", "llp", "sa", "spa",
    "usa", "holdings", "group", "enterprises", "gmbh", "kk", "and", "of",
    "north american",
    "gk", "yk", "gmk", "gsk", "nk", "tk",
    r"Ka\w+ Kaisha", r"aktieng\w+",
}

# matcher.py:97-120 — substring-membership reject list (rule -3)
BAN_LIST = (
    "organization", "organization", "academy", "university", "agency",
    "republic", "union", "21st", "commission", "council", "school",
    "community", "institute", "federation", "nations", "association",
    "church", "society", "league", "800", "24", "great america",
)

INTL = ("global", "international", "worldwide", "national")      # matcher.py:123
TOO_GENERAL = (
    "and", "of", "for", "holdings", "holding", "group",
    "enterprises", "international", "global",
)                                                                 # matcher.py:124-134
NA = {"north", "america", "great"} | set(INTL) | set(TOO_GENERAL)  # matcher.py:136

COMMON_PHRASE = ["capital market"]                                # matcher.py:40


def _read_lines(path: Path) -> list[str]:
    with open(path, encoding="utf-8", errors="replace") as f:
        return f.readlines()


def _find_asset_dir(asset_dir: str | os.PathLike | None) -> Path:
    """Resolve the dictionary directory.

    Order: explicit argument -> $NM_RAY_ASSET_DIR -> the reference checkout at
    /root/reference when present (its location.csv / firstname.txt /
    surname.txt are plain public word lists) -> the small vendored fallback
    lists under ``name_matching_ray/data``.
    """
    if asset_dir is not None:
        return Path(asset_dir)
    env = os.environ.get("NM_RAY_ASSET_DIR")
    if env:
        return Path(env)
    ref = Path("/root/reference")
    if (ref / "location.csv").exists():
        return ref
    return _DATA_DIR


@dataclass
class Assets:
    """Per-process dictionary state (actor-constructor payload, SURVEY §2.3)."""

    locations: list[str]            # lowercase location names (matcher.py:41-46)
    eng: set[str]                   # English ∪ surnames ∪ firstnames ∪ phrases
    person_names: set[str]          # person-name token set (_name_pre.py:13-16)
    common_abbr: set[str] = field(default_factory=set)
    common_abbr12: set[str] = field(default_factory=set)
    suffix: set[str] = field(default_factory=lambda: set(SUFFIX))

    def __post_init__(self):
        # matcher.py:56-57
        if not self.common_abbr:
            self.common_abbr = {b for _, b in ABBR1_RULES if b != ""}
        if not self.common_abbr12:
            self.common_abbr12 = (
                {b for _, b in ABBR_RULES if b != ""} | self.eng | self.suffix
            )


def load_assets(asset_dir: str | os.PathLike | None = None) -> Assets:
    """Build the dictionary state.

    Substitutions for the reference's two missing blobs
    (``.MISSING_LARGE_BLOBS``):

    * ``words_dictionary.json`` (English dictionary, matcher.py:51) ->
      vendored ``data/english_words.txt`` ∪ the surname/firstname lists, which
      the reference unions in anyway (matcher.py:52-53).
    * ``names_decode.csv`` (1M person-name tokens, _name_pre.py:13-16) ->
      firstname.txt ∪ surname.txt (same corpus family), plus {"ford"} exactly
      as _name_pre.py:16 does.
    """
    d = _find_asset_dir(asset_dir)

    def lines_or_fallback(fname: str, fallback: str) -> list[str]:
        p = d / fname
        if p.exists():
            return _read_lines(p)
        fb = _DATA_DIR / fallback
        return _read_lines(fb) if fb.exists() else []

    locations = [x.lower().strip() for x in lines_or_fallback("location.csv", "locations_fallback.txt")]
    surnames = {x.lower().strip() for x in lines_or_fallback("surname.txt", "surnames_fallback.txt")}
    firstnames = {x.lower().strip() for x in lines_or_fallback("firstname.txt", "firstnames_fallback.txt")}

    english = set()
    p = _DATA_DIR / "english_words.txt"
    if p.exists():
        english = {x.strip().lower() for x in _read_lines(p)}

    # matcher.py:47-49: token-sorted phrases from common_phrase + locations
    phrases = [" ".join(sorted(x.split())) for x in COMMON_PHRASE] + [
        " ".join(sorted(x.split())) for x in locations
    ]

    eng = (english | surnames | firstnames | set(phrases)) - {""}
    person = (surnames | firstnames | {"ford"}) - {""}
    return Assets(locations=locations, eng=eng, person_names=person)


_DEFAULT: Assets | None = None


def default_assets() -> Assets:
    """Process-wide cached assets (built once per worker/actor)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = load_assets()
    return _DEFAULT
