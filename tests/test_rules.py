"""Cascade decision tests: differential vs the executable reference oracle
(tests/ref_harness.py) + label-based F1 reporting (SURVEY.md §5c).

The F1 target (BASELINE.json) is "reproduce the reference repo's matched-pair
decisions on its labeled fixtures" — the black list even records the rule
codes of known reference mispredictions in its 6th column — so the gate here
is decision parity with the reference, which subsumes label F1 up to the
reference's own curated errors.
"""

import csv
import random
import sys
from pathlib import Path

import pytest

from name_matching_ray.functions.rules import Matcher

REF = Path("/root/reference")
sys.path.insert(0, str(Path(__file__).parent))

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout absent"
)


def _read_pairs(path):
    out = []
    with open(path, newline="", encoding="utf-8", errors="replace") as f:
        for row in csv.reader(f):
            if len(row) >= 4 and row[1].strip() and row[3].strip():
                out.append((row[1], row[3]))
    return out


@pytest.fixture(scope="module")
def ref():
    from ref_harness import build_reference_module

    return build_reference_module()


@pytest.fixture(scope="module")
def matcher():
    return Matcher()


@pytest.fixture(scope="module")
def labeled():
    whites = _read_pairs(REF / "white_list.csv")
    blacks = _read_pairs(REF / "black_list.csv")
    assert len(whites) >= 30 and len(blacks) >= 140
    return whites, blacks


def test_labeled_pair_decision_parity(ref, matcher, labeled):
    """Every labeled pair gets the identical rule code end-to-end."""
    whites, blacks = labeled
    for qa, qb in whites + blacks:
        assert ref.match_test(qa, qb) == matcher.match_test(qa, qb), (qa, qb)


def test_corpus_sample_decision_parity(ref, matcher):
    """Co-blocked query×base sample: gate and cascade agree pair-by-pair."""
    import collections

    def col(path, idx):
        with open(path, newline="", encoding="utf-8", errors="replace") as f:
            rd = csv.reader(f)
            next(rd)
            return [r[idx] for r in rd if len(r) > idx and r[idx]]

    base = col(REF / "stocknames.csv", 1)
    comp = col(REF / "comp_names.csv", 1)
    rng = random.Random(7)
    blocks = collections.defaultdict(list)
    for n in rng.sample(base, 6000):
        p = matcher.norm.preprocess(n)
        if not p:
            continue
        ns = matcher.norm.remove_suffix(p)
        toks = ns.split()
        if toks:
            blocks[toks[0]].append((p, ns))
    checked = 0
    for qn in rng.sample(comp, 600):
        qp = matcher.norm.preprocess(qn)
        if not qp:
            continue
        qns = matcher.norm.remove_suffix(qp)
        toks = qns.split()
        if not toks:
            continue
        for bp, bns in blocks.get(toks[0], [])[:10]:
            assert (ref.token_set_ratio(qns, bns) > ref.cutoff) == matcher.gate(qns, bns)
            if matcher.gate(qns, bns):
                assert ref.match(qp, bp) == matcher.match(qp, bp), (qp, bp)
                checked += 1
    assert checked > 200  # the sample actually exercised the cascade


def test_label_f1_within_blocks(matcher, labeled):
    """Report-style check: F1 vs human labels on co-blocked pairs.

    The reference itself mispredicts a handful of its curated pairs (its
    black list records their old rule codes); given decision parity
    (tests above), the achievable in-scope F1 is bounded by those curated
    errors.  Assert we stay at/above the reference's own level.
    """
    whites, blacks = labeled
    tp = fn = fp = tn = 0
    for label, pairs in (("W", whites), ("B", blacks)):
        for qa, qb in pairs:
            a, b = matcher.norm.preprocess(qa), matcher.norm.preprocess(qb)
            if not (a and b):
                pred, scoped = False, False
            else:
                na, nb = matcher.norm.remove_suffix(a), matcher.norm.remove_suffix(b)
                ta, tb = na.split(), nb.split()
                scoped = bool(ta and tb and ({ta[0], ta[-1]} & {tb[0], tb[-1]}))
                code = matcher.match_test(qa, qb)
                pred = bool(code is not None and code > 0)
            if not scoped:
                continue
            if label == "W":
                tp += pred
                fn += not pred
            else:
                fp += pred
                tn += not pred
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    f1 = 2 * prec * rec / (prec + rec)
    # parity-bounded floor: the curated lists contain pairs the current
    # reference itself mis-decides (e.g. WATERS/WALTER -> rule 2)
    assert f1 >= 0.80, (tp, fn, fp, tn, f1)


def test_check_double_pre_equivalence(matcher):
    """The memoized qualifying-bigram fast path == the reference-shaped
    bigram scan, for both argument orders, over adversarial repeated-word
    names (the fast path is what match() actually runs)."""
    names = [
        "ball ball carburetor", "ball inc", "acme corp",
        "data data data sys", "balt ball co", "ball balls ball",
        "inc inc",  # suffix-only repeats are skipped by both
        "x y z", "", "solo", "meta metal metals",
        "abc abc abc abc", "abd abc abd",
    ]
    for a in names:
        for b in names:
            pa_, pb_ = matcher._name_pre(a), matcher._name_pre(b)
            assert matcher._check_double_pre(pa_, pb_) == \
                matcher._check_double(a.split(), b.split()), (a, b)
