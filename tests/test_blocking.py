"""Blocking-stage properties: salted-triangle completeness, histogram
equivalence, secondary-pass dedup."""

import pyarrow as pa
import pytest


def _names_table(n=300, hot_frac=0.6):
    """Synthetic normalized-name rows with one very hot first token."""
    rows = {"doc_id": [], "pre_proc": [], "nosuffix": [],
            "block_key": [], "block_key_last": []}
    for i in range(n):
        first = "acme" if i % 10 < int(hot_frac * 10) else f"t{i % 7}"
        last = f"l{i % 5}"
        nos = f"{first} mid{i % 13} {last}"
        rows["doc_id"].append(f"d{i:05d}")
        rows["pre_proc"].append(nos + " inc")
        rows["nosuffix"].append(nos)
        rows["block_key"].append(first)
        rows["block_key_last"].append(last)
    return pa.table(rows)


def _pair_set(ds):
    import pandas as pd

    df = ds.to_pandas()
    assert (df.left_doc_id < df.right_doc_id).all()
    pairs = list(zip(df.left_doc_id, df.right_doc_id))
    assert len(pairs) == len(set(pairs)), "duplicate candidate pairs emitted"
    return set(pairs)


def test_salting_preserves_pair_set(ray_session):
    """Salted hot keys (tiny cap) produce EXACTLY the unsalted pair set."""
    import ray.data

    from name_matching_ray.stages.blocking import candidate_pairs

    names = ray.data.from_arrow(_names_table())
    unsalted = _pair_set(candidate_pairs(names, cap=10**9, out_blocks=8))
    salted = _pair_set(candidate_pairs(names, cap=20, max_shards=16,
                                       out_blocks=8))
    assert salted == unsalted
    # sanity: the hot key really was salted (many docs share 'acme')
    from name_matching_ray.stages.blocking import compute_hot_keys_multi

    hot_first, _ = compute_hot_keys_multi(
        ray.data.from_arrow(_names_table()),
        ["block_key", "block_key_last"], 20)
    assert hot_first.get("acme", 0) > 1


def test_histogram_multi_matches_groupby(ray_session):
    import ray.data

    from name_matching_ray.stages.blocking import (
        compute_hot_keys, compute_hot_keys_multi,
    )

    names = ray.data.from_arrow(_names_table())
    a1 = compute_hot_keys(names, "block_key", 20)
    a2 = compute_hot_keys(names, "block_key_last", 20)
    b1, b2 = compute_hot_keys_multi(names, ["block_key", "block_key_last"], 20)
    assert a1 == b1 and a2 == b2


def test_fused_equals_two_stage(ray_session):
    """fused emit+score output == emit → shuffle → actor-pool scoring."""
    import ray.data

    from name_matching_ray.pipelines.linkage import build_names
    from name_matching_ray.stages.blocking import candidate_pairs, fused_match_pairs
    from name_matching_ray.stages.scoring import score_pairs
    from name_matching_ray.synth import synth_docs_dataset

    names = build_names(synth_docs_dataset(600, seed=7), max_name_tokens=8,
                        concurrency=(1, 2)).materialize()
    two_stage = score_pairs(candidate_pairs(names, cap=50, out_blocks=8),
                            concurrency=(1, 2)).to_pandas()
    fused = fused_match_pairs(names, cap=50, out_blocks=8).to_pandas()
    k = ["left_doc_id", "right_doc_id", "block_key", "rule_code"]
    a = two_stage.sort_values(k).reset_index(drop=True)
    b = fused.sort_values(k).reset_index(drop=True)
    assert a[k].equals(b[k])
    assert (abs(a.score - b.score) < 1e-4).all()
    assert len(a) > 0


def test_stop_keys_dropped_with_logging(ray_session):
    """A key needing > max_shards salt shards is dropped from pairing; all
    other keys' pair sets are untouched (no silent caps elsewhere)."""
    import ray.data

    from name_matching_ray.stages.blocking import candidate_pairs

    t = _names_table(n=300, hot_frac=0.6)  # 'acme' has 180 rows
    names = ray.data.from_arrow(t)
    # cap=20, max_shards=3 -> 'acme' needs ceil(180/20)=9 > 3 shards -> stop
    pairs = _pair_set(candidate_pairs(names, cap=20, max_shards=3,
                                      out_blocks=8))
    full = _pair_set(candidate_pairs(names, cap=10**9, out_blocks=8))
    assert pairs < full  # strictly fewer: the hot first-token key is dropped
    # pairs co-blocked only by 'acme' must be gone; others preserved
    df = t.to_pandas()
    acme = set(df[df.block_key == "acme"].doc_id)
    import itertools

    for l, r in full - pairs:
        assert l in acme and r in acme  # only stop-key pairs were dropped


def test_vectorized_gate_equals_exact_gate():
    """Property test: _score_bucket_groups' integer gate bounds + ambiguous
    fallback must reproduce the exact per-pair Python gate + cascade on
    adversarial name shapes (shared tokens, near-misses, empties, unicode,
    repeated tokens)."""
    import random

    import pandas as pd

    from name_matching_ray.functions.rules import get_matcher
    from name_matching_ray.functions.similarity import token_set_ratio
    from name_matching_ray.stages.blocking import _score_bucket_groups

    rng = random.Random(17)
    toks = ["industries", "zz", "a", "steel", "qx", "über", "mfg", "x1",
            "pelram", "pelran", "quentar", "data", "co", "nine9"]
    names = []
    for _ in range(60):
        k = rng.randint(0, 5)
        names.append(" ".join(rng.choice(toks) for _ in range(k)))
    names += ["", "industries", "industries industries", "a b c d e"]

    rows = {"pair_block": [], "side": [], "doc_id": [], "pre_proc": [],
            "nosuffix": [], "block_key": [], "block_key_last": []}
    for i, n in enumerate(names):
        rows["pair_block"].append("f|k|0|0")
        rows["side"].append(2)
        rows["doc_id"].append(f"d{i:04d}")
        rows["pre_proc"].append(n)
        rows["nosuffix"].append(n)
        rows["block_key"].append("k")
        rows["block_key_last"].append("k")
    g = pd.DataFrame(rows)
    got = _score_bucket_groups(g, keep_all=True, metrics=False).to_pandas()
    got_codes = {(l, r): c for l, r, c in
                 zip(got.left_doc_id, got.right_doc_id, got.rule_code)}

    matcher = get_matcher()
    expect = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            code = int(matcher.match(a, b)) \
                if token_set_ratio(a, b) > 50 else -100
            expect[(f"d{i:04d}", f"d{j:04d}")] = code
    assert got_codes == expect


def test_secondary_pass_recovers_dropped_first_key_pairs(ray_session):
    """Pairs sharing a DROPPED first-token stop key AND a healthy last token
    must still be emitted by the secondary pass (the old skip assumed the
    primary pass had emitted every equal-first-token pair)."""
    import ray.data

    from name_matching_ray.stages.blocking import candidate_pairs

    t = _names_table(n=300, hot_frac=0.6)  # 'acme' first token on 180 rows
    names = ray.data.from_arrow(t)
    pairs = _pair_set(candidate_pairs(names, cap=20, max_shards=3,
                                      out_blocks=8))
    df = t.to_pandas()
    # every acme pair that shares a last token is recoverable via pass 'l'
    by_last = df[df.block_key == "acme"].groupby("block_key_last")["doc_id"]
    expected = set()
    for _, ids in by_last:
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                expected.add((ids[i], ids[j]))
    assert expected, "fixture must produce recoverable pairs"
    missing = expected - pairs
    assert not missing, f"{len(missing)} recoverable pairs lost"


def test_vector_precascade_matches_cascade():
    """Every pair the vectorized Part-0/Part-1 pre-pass DECIDES must carry
    exactly the code the scalar cascade returns; undecided pairs are merely
    routed to match(), so completeness needs no separate check.  The name
    set hits every class: matchit sentinels, >5 word-count deltas, NA-empty
    names, location pairs, space-stripped equality (both len>8 and the
    len<=8 fall-through), sorted-join/sorted-char equality, banned words,
    plus ordinary near-duplicates."""
    import numpy as np

    from name_matching_ray.functions.rules import get_matcher
    from name_matching_ray.stages.blocking import _vector_precascade

    matcher = get_matcher()
    names = [
        "acme matchit gold", "acme matchit silver", "zeta matchit gold",
        "alpha beta gamma delta epsilon zeta eta theta inc", "alpha inc",
        "north america", "international holdings", "acme inc",
        "acme new york inc", "acme california inc",
        "general dynamics corp", "generaldynamics corp",
        "general dynamics  corp", "ab cd", "abcd", "a bc d",
        "delta gamma inc", "gamma delta inc",
        "university acme research", "acme university research",
        "acme holdings inc", "acme holding inc", "na", "",
        "blue river mining co", "blue river mining company",
        "red stone energy inc", "redstone energy inc",
    ]
    n = len(names)
    gi, gj = np.triu_indices(n, 1)
    # both orientations: the cascade is asymmetric (-23, -1/-2, ban side)
    gi2 = np.concatenate([gi, gj]).astype(np.int64)
    gj2 = np.concatenate([gj, gi]).astype(np.int64)
    codes, scalar = _vector_precascade(matcher, names, gi2, gj2)
    decided = np.nonzero(~scalar)[0]
    assert len(decided) > 20, "fixture must exercise the fast classes"
    seen = set()
    for t in decided:
        a, b = names[gi2[t]], names[gj2[t]]
        assert codes[t] == matcher.match(a, b), (a, b, codes[t])
        seen.add(int(codes[t]))
    # every vectorizable class fires at least once
    assert {-23, -1, -2, 1, -3} <= seen, seen
