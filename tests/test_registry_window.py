"""Registry-window ordering guard.

The driver's per-round correctness gate compares only ``queries()[:50]``
against ``oracle_sql()``; everything past the window is covered by
tests/test_oracle_overflow.py.  Both of those facts are ORDER-dependent:
an insertion that reshuffles the first 50 silently swaps which queries the
driver checks (the exact round-3 regression class), and an oracled entry
drifting past a no-oracle entry would fall out of both gates.  This test
freezes the invariants:

  (a) the first 50 registry keys are exactly the frozen list below
      (append new oracled queries AFTER position 50, never inside it);
  (b) every entry before the no-oracle tail has an ``oracle_sql()`` entry;
  (c) the no-oracle entries form a contiguous SUFFIX of the registry.

No Ray session needed — this inspects the registry dicts only.
"""

from __future__ import annotations

WINDOW = 50

# The driver's correctness window as of round 5.  Changing this list is a
# deliberate act: it changes which queries the driver grades.
FROZEN_WINDOW = [
    "pricing_summary", "segment_revenue", "region_balance", "topk_orders",
    "high_quantity_counts", "events_daily", "sessionize",
    "asof_prior_event", "rolling_user_value", "windowed_watermark",
    "topk_per_customer", "range_join_windows", "text_stats",
    "quality_filter", "fingerprints", "word_counts", "exact_dedup",
    "ngram_jaccard_dedup", "dedup_keep_list", "sample_mix", "decontaminate",
    "cross_dedup", "bloom_dedup", "cross_near_dedup", "split_by_cluster",
    "redact_pii", "pack_sequences", "shuffle_shards", "length_quantiles",
    "pmi_bigrams", "tfidf_topk", "inverted_index", "repetition_stats",
    "unigram_bits", "search_topk", "chunk_docs", "segment_dedup",
    "substring_dedup", "minhash_dedup", "simhash_dedup", "embedding_dups",
    "srp_dedup", "ann_threshold", "ann_topk", "ivf_topk", "cluster_stats",
    "semantic_keep_list", "lang_id", "winnow_fingerprint", "media_features",
]


def test_driver_window_is_frozen():
    import __ray_entry__ as ent

    names = list(ent.queries().keys())
    assert names[:WINDOW] == FROZEN_WINDOW, (
        "queries()[:50] changed — the driver now grades a different set. "
        "New queries must be appended AFTER the window (before the "
        "no-oracle tail); if this reshuffle is intentional, update "
        "FROZEN_WINDOW deliberately.")


def test_every_pre_tail_entry_is_oracled():
    import __ray_entry__ as ent

    names = list(ent.queries().keys())
    oracled = set(ent.oracle_sql().keys())
    no_oracle = [n for n in names if n not in oracled]

    # (c) contiguous suffix: the first no-oracle entry starts the tail.
    tail_start = names.index(no_oracle[0])
    assert names[tail_start:] == no_oracle, (
        f"no-oracle entries must be a contiguous registry SUFFIX; "
        f"found oracled entries after {no_oracle[0]!r}")

    # (b) everything before the tail carries an oracle.
    missing = [n for n in names[:tail_start] if n not in oracled]
    assert not missing, f"pre-tail entries without oracle_sql: {missing}"

    # window sanity: every window entry is oracled (the driver would
    # record a weaker rows-only check otherwise).
    assert all(n in oracled for n in names[:WINDOW])


def test_no_orphan_oracles():
    import __ray_entry__ as ent

    orphans = set(ent.oracle_sql().keys()) - set(ent.queries().keys())
    assert not orphans, f"oracle_sql entries without a query: {orphans}"
