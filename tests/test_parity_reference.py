"""Differential parity vs the reference implementation (when available).

``/root/reference/utils/_abbr.py`` is pure-stdlib and importable; the rest of
the reference needs packages absent here (rapidfuzz, pandarallel) or missing
data blobs, so the rewrite engine is the one piece we can diff directly, over
the reference's own 46k-row base corpus.  Skipped when the reference checkout
is not present.
"""

import csv
import importlib.util
from pathlib import Path

import pytest

from name_matching_ray.functions.normalize import Normalizer

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REF / "utils" / "_abbr.py").exists(), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def ref_abbr():
    spec = importlib.util.spec_from_file_location("_ref_abbr", REF / "utils" / "_abbr.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def norm():
    return Normalizer()


def test_rule_tables_identical(ref_abbr):
    from name_matching_ray.functions import assets

    assert assets.HARDCODE_RULES == ref_abbr.hardcode
    assert assets.ABBR1_RULES == ref_abbr.abbr1
    assert assets.ABBR2_RULES == ref_abbr.abbr2
    assert assets.SUFFIX == ref_abbr.suffix


def test_abbr_adj_parity_on_base_corpus(ref_abbr, norm):
    """Every distinct raw base name rewrites identically."""
    names = []
    with open(REF / "stocknames.csv", newline="") as f:
        rd = csv.reader(f)
        next(rd)  # header
        for row in rd:
            if len(row) >= 2 and row[1]:
                names.append(row[1].lower())
    names = sorted(set(names))
    assert len(names) > 30000
    mismatches = [
        (n, norm.abbr_adj(n), ref_abbr.abbr_adj(n))
        for n in names
        if norm.abbr_adj(n) != ref_abbr.abbr_adj(n)
    ]
    assert not mismatches, mismatches[:10]


def test_abbr_adj_parity_on_labeled_pairs(ref_abbr, norm):
    names = set()
    for fname in ("white_list.csv", "black_list.csv"):
        with open(REF / fname, newline="") as f:
            for row in csv.reader(f):
                if len(row) >= 4:
                    names.add(row[1].lower())
                    names.add(row[3].lower())
    for n in sorted(names):
        assert norm.abbr_adj(n) == ref_abbr.abbr_adj(n), n
