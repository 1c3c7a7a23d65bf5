"""Normalizer conformance corpus — the reference's own 23 golden asserts
(``/root/reference/utils/test_preproc.py:3-26``), plus rewrite-engine quirks.
"""

import pytest

from name_matching_ray.functions.normalize import Normalizer

GOLDENS = [
    ("CANON KABUSHIKI KAISHA", "canon matchit inc"),
    ("SIEMENS AKTIENGESELLSCHAFT", "siemens matchit inc"),
    ("MATSUSHITA ELECTRIC INDUSTRIAL CO., LTD.", "matsushita electric industries inc"),
    ("KABUSHIKI KAISHA TOSHIBA", "toshiba matchit"),
    ("GENERAL ELECTRIC COMPANY", "general electric inc"),
    ("EASTMAN KODAK COMPANY", "kodak matchit inc"),
    ("MITSUBISHI DENKI KABUSHIKI KAISHA", "mitsubishi denki inc"),
    ("FUJITSU LIMITED", "fujitsu inc"),
    ("ROBERT BOSCH GMBH", "robert bosch inc"),
    ("BASF AKTIENGESELLSCHAFT", "basf inc"),
    ("KONINKLIJKE PHILIPS ELECTRONICS N.V.", "koninklijke philips electronics inc"),
    ("SAMSUNG ELECTRONICS CO., LTD.", "samsung electronics inc"),
    ("FUJI PHOTO FILM CO., LTD.", "fuji photo film inc"),
    ("HEWLETT-PACKARD COMPANY", "hewlet packard inc"),
    ("BAYER AG", "bayers inc"),
    ("U.S. PHILIPS CORPORATION", "usa philips inc"),
    # The reference's own test_preproc.py:20 expects "du pont inc", but its
    # CURRENT _abbr.py produces "dupont matchit inc" (verified by importing
    # /root/reference/utils/_abbr.py directly: the `\bDU PONT\b` ->
    # "DUPONT matchit" hardcode at _abbr.py:252 fires after the earlier
    # DU-PONT canonicalizations). We pin parity to the current code.
    ("E.I. DU PONT DE NEMOURS AND COMPANY", "dupont matchit inc"),
    ("PHILIPS ELECTRONICS N.V.", "philips electronics inc"),
    ("THE DOW CHEMICAL COMPANY", "dow chemical inc"),
    ("BAYER AKTIENGESELLSCHAFT", "bayers inc"),
    ("RICOH COMPANY, LTD.", "ricoh inc"),
    ("some s.a", "some sa"),
    ("some s a", "some sa"),
]


@pytest.fixture(scope="module")
def norm():
    return Normalizer()


@pytest.mark.parametrize("raw,expected", GOLDENS)
def test_goldens(norm, raw, expected):
    assert norm.preprocess(raw) == expected


def test_remove_suffix_keeps_interior_gap(norm):
    # matcher.py:62-63 leaves a double space behind — load-bearing quirk
    assert norm.remove_suffix("ball inc carburetor") == "ball  carburetor"
    assert norm.remove_suffix("acme inc") == "acme"


def test_cross_rule_doubled_collapse(norm):
    # sequential rewrite: "x co ltd co" -> CO-rule -> "x inc ltd inc"
    # -> LTD-rule -> "x inc inc inc" -> own collapse -> "x inc inc"
    # -> a LATER rule with repl "inc" collapses again even though its own
    # pattern never matched -> "x inc"
    assert norm.abbr_adj("x co ltd co") == "x inc"


def test_person_name_removed(norm):
    # two person-name tokens, no abbr replacement word present -> dropped
    assert norm.preprocess("john smith") is None
    # the abbr word "inc" protects company-shaped rows
    assert norm.preprocess("john smith inc") is not None


def test_person_removal_can_be_disabled(norm):
    assert norm.preprocess("john smith", remove_people=False) == "john smith"
