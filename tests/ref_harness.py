"""Executable-reference harness for differential testing.

Imports the reference's actual ``matcher.py`` (unmodified, via symlinks into a
/tmp tree) with:

* our clean-room kernels injected as the ``rapidfuzz.fuzz`` / ``Levenshtein``
  / ``nltk`` modules it imports (those packages are absent here);
* the two missing data blobs (``words_dictionary.json``,
  ``names_decode.csv`` — see reference ``.MISSING_LARGE_BLOBS``) generated
  from the SAME substitution sets our engine uses, so both sides see
  identical dictionaries;
* stubs for pandarallel / loguru / tqdm (driver-only conveniences).

The resulting module computes the reference's *decision logic* with shared
kernels+dictionaries — the strongest available oracle for cascade parity
(the real rapidfuzz and the real blobs cannot exist in this sandbox).
No reference code is copied: files are symlinked read-only.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import types
from pathlib import Path

REF = Path("/root/reference")
HARNESS = Path("/tmp/nm_ref_harness")


def _stub_modules():
    import name_matching_ray.functions.similarity as sim

    fuzz = types.ModuleType("rapidfuzz.fuzz")
    fuzz.ratio = sim.ratio
    fuzz.token_sort_ratio = sim.token_sort_ratio
    fuzz.token_set_ratio = sim.token_set_ratio
    rapidfuzz = types.ModuleType("rapidfuzz")
    rapidfuzz.fuzz = fuzz
    sys.modules.setdefault("rapidfuzz", rapidfuzz)
    sys.modules["rapidfuzz.fuzz"] = fuzz

    lev = types.ModuleType("Levenshtein")
    lev.jaro_winkler = sim.jaro_winkler
    sys.modules["Levenshtein"] = lev

    nltk = types.ModuleType("nltk")
    nltk.ngrams = lambda seq, n: zip(*[seq[i:] for i in range(n)])
    sys.modules["nltk"] = nltk

    pandarallel_mod = types.ModuleType("pandarallel")

    class _P:
        @staticmethod
        def initialize(*a, **k):
            pass

    pandarallel_mod.pandarallel = _P
    sys.modules["pandarallel"] = pandarallel_mod

    loguru = types.ModuleType("loguru")

    class _L:
        def info(self, *a, **k):
            pass

    loguru.logger = _L()
    sys.modules["loguru"] = loguru

    tqdm_auto = types.ModuleType("tqdm.auto")
    tqdm_auto.tqdm = lambda it, **k: it
    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.auto = tqdm_auto
    sys.modules.setdefault("tqdm", tqdm_mod)
    sys.modules["tqdm.auto"] = tqdm_auto


def build_reference_coname():
    """Import the reference's legacy ``coname.py`` (unmodified, symlinked)
    with our fuzzywuzzy-semantics wrappers injected as ``fuzzywuzzy.fuzz``
    (the real fuzzywuzzy is absent here; the wrappers reimplement its
    published behavior — int rounding, default full_process, list-repr
    coercion — on this repo's kernels, so both sides share kernels exactly
    like the matcher.py harness).  The module's ``__main__`` block does not
    run; corpus gates (``unique_word`` / ``pair_word``) must be injected by
    the caller before using ``permutation`` / ``match``."""
    from name_matching_ray.functions import fuzzy_legacy as fl

    fuzz = types.ModuleType("fuzzywuzzy.fuzz")
    fuzz.ratio = fl.fw_ratio
    fuzz.token_set_ratio = fl.fw_token_set_ratio
    fuzz.token_sort_ratio = fl.fw_token_sort_ratio
    fw = types.ModuleType("fuzzywuzzy")
    fw.fuzz = fuzz
    sys.modules["fuzzywuzzy"] = fw
    sys.modules["fuzzywuzzy.fuzz"] = fuzz

    HARNESS.mkdir(parents=True, exist_ok=True)
    dst = HARNESS / "coname.py"
    if not dst.exists():
        dst.symlink_to(REF / "coname.py")
    spec = importlib.util.spec_from_file_location("ref_coname", dst)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_coname"] = mod
    spec.loader.exec_module(mod)
    return mod


def build_reference_module():
    """Symlink tree + generated blobs + import; returns the matcher module."""
    from name_matching_ray.functions.assets import _DATA_DIR, load_assets

    utils = HARNESS / "utils"
    utils.mkdir(parents=True, exist_ok=True)
    for f in ("matcher.py", "location.csv", "surname.txt", "firstname.txt",
              "stocknames.csv"):
        dst = HARNESS / f
        if not dst.exists():
            dst.symlink_to(REF / f)
    for f in ("_abbr.py", "_name_pre.py", "__init__.py"):
        dst = utils / f
        if not dst.exists():
            dst.symlink_to(REF / "utils" / f)

    # generated substitution blobs — identical to our engine's sets
    words = (_DATA_DIR / "english_words.txt").read_text().split()
    wd = HARNESS / "words_dictionary.json"
    wd.write_text(json.dumps({w: 1 for w in words}))
    assets = load_assets()
    nd = utils / "names_decode.csv"
    nd.write_text("\n".join(sorted(assets.person_names)) + "\n")

    _stub_modules()
    cwd = os.getcwd()
    sys.path.insert(0, str(HARNESS))
    try:
        os.chdir(HARNESS)
        for mod in ("utils", "utils._abbr", "utils._name_pre", "ref_matcher"):
            sys.modules.pop(mod, None)
        spec = importlib.util.spec_from_file_location(
            "ref_matcher", HARNESS / "matcher.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_matcher"] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        os.chdir(cwd)
        sys.path.remove(str(HARNESS))
