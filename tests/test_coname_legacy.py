"""Differential parity for the legacy coname path (reference coname.py).

The oracle is the reference module itself (tests/ref_harness.py
``build_reference_coname``: unmodified coname.py with our
fuzzywuzzy-semantics wrappers injected as its ``fuzzywuzzy.fuzz``), plus a
verbatim replication of its ``__main__`` corpus-stats loop
(coname.py:214-240) — including the duplicate-gvkey char-iteration bug.
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from ref_harness import build_reference_coname  # noqa: E402

from name_matching_ray.functions import coname_legacy as cl
from name_matching_ray.functions.fuzzy_legacy import (
    full_process,
    fw_ratio,
    fw_token_set_ratio,
)

# ---------------------------------------------------------------------------
# deterministic synthetic corpus: abbreviation-heavy, punctuation, unicode,
# -REDH/-OLD markers, single-letter runs, short names, duplicate gvkeys
# ---------------------------------------------------------------------------

_FIRST = ["Advanced", "United", "American", "Global", "First", "Pioneer",
          "Smith", "Quantum", "Pacific", "Consolidated", "Café", "Nippon"]
_MID = ["Micro Devices", "Data Sys", "Chem", "Mortgage & Loan", "Tech",
        "Pharma", "Resource", "A B C", "Security", "Oil-Gas", "Invt"]
_TAIL = ["Inc", "Corp", "Corporation", "Co", "Ltd", "LLC", "Holding Corp",
         "Group", "S.A.", "L.P.", "-OLD Corp", "Enterprises"]


def _names(seed: int, n: int) -> list[str]:
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        f = _FIRST[rng.integers(len(_FIRST))]
        m = _MID[rng.integers(len(_MID))]
        t = _TAIL[rng.integers(len(_TAIL))]
        style = rng.integers(4)
        if style == 0:
            out.append(f"{f} {m} {t}")
        elif style == 1:
            out.append(f"The {f} {m} {t}")
        elif style == 2:
            out.append(f"{f} {m}")
        else:
            out.append(f"{f[:4]} {m} {t}")
    out += ["IBM", "Ab Co", "X Y Z Corp", "A M D Inc", "", "ZZZZ Unique Corp",
            "Unique Pair Holdings Inc"]
    return out


@pytest.fixture(scope="module")
def corpus():
    base_names = _names(7, 120)
    main_names = _names(11, 80)
    base = pd.DataFrame({
        "gvkey": [f"g{i % 100:03d}" for i in range(len(base_names))],  # dups
        "name": base_names,
    })
    base["row_order"] = np.arange(len(base))
    main = pd.DataFrame({
        "index": np.arange(len(main_names)),
        "name": main_names,
    })
    return base, main


@pytest.fixture(scope="module")
def ref():
    return build_reference_coname()


def _ref_corpus_words(ref, base: pd.DataFrame):
    """Verbatim semantics of coname.py:214-240 over (gvkey, name, abbr)."""
    gvkey_single_dict: dict = {}
    gvkey_pair_dict: dict = {}
    for gvkey, name, abbrev in zip(base["gvkey"], base["name"],
                                   base["name"].map(ref.abbr_adj)):
        x = re.split(r"\s+", ref.remove_punc(abbrev.lower()))
        if gvkey in gvkey_single_dict:
            for x in name:
                gvkey_single_dict[gvkey].add(x)
                gvkey_pair_dict[gvkey] = set(ref.pairwise(x)) \
                    | gvkey_pair_dict[gvkey]
        else:
            gvkey_single_dict[gvkey] = set(x)
            gvkey_pair_dict[gvkey] = set(ref.pairwise(x))
    single_list: list = []
    pair_list: list = []
    for v in gvkey_single_dict.values():
        single_list.extend(list(v))
    for v in gvkey_pair_dict.values():
        pair_list.extend(v)
    unique_word = [w for w, n in Counter(single_list).most_common() if n <= 2]
    pair_word = [p for p, n in Counter(pair_list).most_common() if n <= 2]
    return unique_word, pair_word


# ---------------------------------------------------------------------------
# kernel parity
# ---------------------------------------------------------------------------

def test_preprocessing_functions_match_reference(ref, corpus):
    base, main = corpus
    for nm in list(base["name"]) + list(main["name"]):
        assert cl.abbr_adj(nm) == ref.abbr_adj(nm), nm
        assert cl.suffix_adj(nm) == ref.suffix_adj(nm), nm
        assert cl.remove_punc(nm) == ref.remove_punc(nm), nm
        assert cl.name_preprocessing(nm) == ref.name_preprocessing(nm), nm


def test_fuzzy_legacy_list_repr_coercion():
    # fuzzywuzzy full_process(force_ascii=True) coerces a LIST via str():
    # the repr's brackets/quotes/commas become spaces
    assert full_process(["alpha", "beta"]) == "alpha    beta"
    assert fw_token_set_ratio(["alpha", "beta"], "beta alpha") == 100
    # codepoints 128-255 are deleted; above 255 survive (fuzzywuzzy quirk)
    assert full_process("café") == "caf"
    assert full_process("œuf") == "œuf"
    assert fw_ratio("abc", "abd") == 67  # int(round(66.67))
    assert fw_token_set_ratio("", "x") == 0
    assert fw_token_set_ratio("x", "") == 0


def test_corpus_words_match_reference(ref, corpus):
    base, _ = corpus
    ref_unique, ref_pair = _ref_corpus_words(ref, base)
    ours_unique, ours_pair = cl.corpus_words_exact(
        zip(base["gvkey"], base["name"], base["name"].map(cl.abbr_adj)))
    assert ours_unique == set(ref_unique)
    assert ours_pair == set(ref_pair)


def test_permutation_matches_reference(ref, corpus):
    base, main = corpus
    ref_unique, ref_pair = _ref_corpus_words(ref, base)
    ref.unique_word = ref_unique
    ref.pair_word = ref_pair
    uw, pw = set(ref_unique), set(ref_pair)

    base_prep = [ref.name_preprocessing(nm) for nm in base["name"]]
    main_prep = [ref.name_preprocessing(nm) for nm in main["name"]]
    n_decisions = n_true = 0
    for xp in main_prep:
        for yp in base_prep:
            want = ref.permutation(xp, yp)
            got = cl.legacy_permutation(xp, yp, uw, pw)
            assert got == want, (xp[0], yp[0])
            n_decisions += 1
            n_true += bool(want)
    assert n_decisions == len(main_prep) * len(base_prep)
    assert n_true > 0  # the corpus must actually exercise the accept paths


# ---------------------------------------------------------------------------
# pipeline parity (vectorized gates + distributed corpus stats)
# ---------------------------------------------------------------------------

def test_coname_pipeline_equals_reference_loop(ref, corpus, ray_session):
    import ray

    from name_matching_ray.pipelines.coname import (
        coname_corpus_words,
        coname_match,
    )

    base, main = corpus
    base_ds = ray.data.from_pandas(base.copy())
    main_ds = ray.data.from_pandas(main.copy())

    ref_unique, ref_pair = _ref_corpus_words(ref, base)
    uw, pw = coname_corpus_words(base_ds)
    assert uw == set(ref_unique)
    assert pw == set(ref_pair)
    # the distributed path (forced) must agree with the driver-side path
    uw_d, pw_d = coname_corpus_words(base_ds, driver_threshold=0)
    assert (uw_d, pw_d) == (uw, pw)

    got = coname_match(main_ds, base_ds).to_pandas()
    got_pairs = set(zip(got["main_index"], got["base_index"]))

    ref.unique_word = ref_unique
    ref.pair_word = ref_pair
    base_prep = [ref.name_preprocessing(nm) for nm in base["name"]]
    main_prep = [ref.name_preprocessing(nm) for nm in main["name"]]
    want_pairs = set()
    for mi, xp in zip(main["index"], main_prep):
        for (gv, yp) in zip(base["gvkey"], base_prep):
            if ref.permutation(xp, yp):
                want_pairs.add((mi, gv))
    assert got_pairs == want_pairs
    assert len(want_pairs) > 0


def test_coname_person_filter_tail(ray_session):
    """person_filter=True fuses the postproc-ppl.py tail onto coname output
    (wiring check: filtered == unfiltered minus person-shaped main names)."""
    import ray

    from name_matching_ray.functions.assets import load_assets
    from name_matching_ray.pipelines.coname import coname_match
    from name_matching_ray.synth import synth_coname_tables

    main_t, base_t = synth_coname_tables(40)
    # append a person-shaped main row cloned from base row 0 so it MATCHES
    # (the tail filter must then remove it); person names come from the
    # substitute dictionaries postproc-ppl.py would read
    person = sorted(load_assets().person_names)
    pname = f"{person[0]} {person[1]}"
    base = base_t.to_pandas()
    base.loc[len(base)] = ["gPPL", pname, len(base)]
    main = main_t.to_pandas()
    main.loc[len(main)] = [len(main), pname]
    kw = dict(main_index="index", base_index="gvkey")
    unfiltered = coname_match(ray.data.from_pandas(main),
                              ray.data.from_pandas(base), **kw).to_pandas()
    filtered = coname_match(ray.data.from_pandas(main),
                            ray.data.from_pandas(base),
                            person_filter=True, **kw).to_pandas()
    assert (unfiltered["main_name"] == pname).any()
    assert not (filtered["main_name"] == pname).any()
    keep = ~unfiltered["main_name"].isin({pname})
    assert set(zip(filtered["main_index"], filtered["base_index"])) == \
        set(zip(unfiltered.loc[keep, "main_index"],
                unfiltered.loc[keep, "base_index"]))


def test_coname_query_entry_nonvacuous(ref, ray_session):
    """The queries() input (planted synth variants) must actually match —
    and identically to the reference loop (dup-gvkey corpus path included)."""
    import ray

    from name_matching_ray.pipelines.coname import coname_match
    from name_matching_ray.synth import synth_coname_tables

    main_t, base_t = synth_coname_tables(60)
    got = coname_match(
        ray.data.from_arrow(main_t), ray.data.from_arrow(base_t),
        main_index="index", base_index="gvkey").to_pandas()
    assert len(got) > 0

    base = base_t.to_pandas()
    main = main_t.to_pandas()
    ref_unique, ref_pair = _ref_corpus_words(ref, base)
    ref.unique_word = ref_unique
    ref.pair_word = ref_pair
    want = set()
    for mi, nm in zip(main["index"], main["name"]):
        xp = ref.name_preprocessing(nm)
        for gv, bn in zip(base["gvkey"], base["name"]):
            if ref.permutation(xp, ref.name_preprocessing(bn)):
                want.add((mi, gv))
    assert set(zip(got["main_index"], got["base_index"])) == want
