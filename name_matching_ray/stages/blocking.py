"""Blocking: candidate generation as a salted groupby shuffle (SURVEY.md §2.4 J1).

The reference is a brute-force cartesian product (matcher.py:381-396:
every query row × all 46k base rows).  Per the north rule, candidates are
instead generated **within blocks**: the first token of ``nosuffix`` (primary
pass) and the last token (secondary recall pass).  Decision parity with the
reference is scoped to co-blocked pairs (BASELINE.json:2).

Skew (SURVEY.md §4): normalized names pile onto hot first tokens ("first",
"american", "inc"-heavy tails).  Hot keys — found via a distributed
``groupby().count()`` whose *hot subset only* comes back to the driver — are
salted into ``s = ceil(count / cap)`` shards; a row with salt ``u`` is
replicated into every shard-pair block ``(i, j), i <= j`` with ``u ∈ {i, j}``
(the triangle scheme), so all within-block pairs still meet exactly once
while no single group exceeds ~``cap²`` pair candidates.

Pair emission dedup: a pair co-blocked by BOTH its first and last tokens is
emitted only by the primary pass (the secondary pass skips pairs whose
``block_key`` — first token — already matches), with zero extra shuffle.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

from ..util import default_pool
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _stable_salt(doc_id: str, shards: int) -> int:
    h = hashlib.blake2b(doc_id.encode(), digest_size=4).digest()
    return int.from_bytes(h, "big") % shards


def compute_hot_keys(names_ds, key: str, cap: int) -> dict[str, int]:
    """Distributed histogram; only keys with count > cap return to the driver."""
    counts = names_ds.groupby(key).count()
    hot = counts.filter(lambda row: row["count()"] > cap).take_all()
    return {r[key]: int(math.ceil(r["count()"] / cap)) for r in hot}


def compute_hot_keys_multi(names_ds, keys: list[str], cap: int) -> list[dict[str, int]]:
    """Histograms for several key columns in ONE distributed pass.

    Each batch emits ``(col_idx, key, partial_count)`` rows from
    ``value_counts`` (a combiner: one row per distinct key per batch, not per
    input row), one small ``groupby.sum`` shuffle totals them, and ONLY keys
    with total > cap come back to the driver — at 10^12 docs the driver never
    holds the full distinct-key histogram, just the hot tail.  One lineage
    execution covers all key columns (a groupby per column re-executed the
    upstream pipeline each time).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cols, vals, cnts = [], [], []
        for ci, k in enumerate(keys):
            vc = batch.column(k).value_counts()
            flat = vc.combine_chunks() if isinstance(vc, pa.ChunkedArray) else vc
            n = len(flat)
            cols.append(np.full(n, ci, np.int8))
            vals.append(flat.field("values"))
            cnts.append(pc.cast(flat.field("counts"), pa.int64()))
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(cols), pa.int8()),
             pa.concat_arrays([v.combine_chunks() if isinstance(v, pa.ChunkedArray)
                               else v for v in vals]),
             pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                               else c for c in cnts])],
            names=["col", "key", "n"],
        )

    hot = (
        names_ds.select_columns(keys)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["col", "key"])
        .aggregate(Sum("n", alias_name="n"))
        .filter(expr=f"n > {int(cap)}")
    )
    out: list[dict[str, int]] = [{} for _ in keys]
    for b in hot.iter_batches(batch_format="pyarrow"):
        for ci, k, n in zip(b.column("col").to_pylist(),
                            b.column("key").to_pylist(),
                            b.column("n").to_pylist()):
            out[ci][k] = int(math.ceil(n / cap))
    return out


class ExplodeToPairBlocks:
    """map_batches: one row per (name, pair-block replica).

    Emits group key ``pair_block = "<pass>|<key>|<i>|<j>"`` and a ``side``
    column: 0 = left shard member, 1 = right, 2 = both (unsalted / i == j).
    """

    _WAVE_CACHE_CAP = 500_000  # long-lived actors over high-cardinality keys

    def __init__(self, hot_first: dict[str, int], hot_last: dict[str, int],
                 max_shards: int = 16, n_buckets: int | None = None,
                 drop_stop_keys: bool = True, n_waves: int | None = None,
                 metrics: bool = False):
        self.hot = {"f": hot_first, "l": hot_last}
        self.max_shards = max_shards
        self.n_buckets = n_buckets  # also emit bucket = hash(pair_block) % n
        self.n_waves = n_waves  # also emit wave = hash(key) % n_waves
        self._wave_cache: dict[str, int] = {}
        self.metrics = metrics  # push skip counts to the metrics actor
        # stop keys: a key needing > max_shards salt shards (> cap*max_shards
        # rows) is quadratic-blowup territory ('inc'-style generic tokens at
        # 10^12-doc scale) — drop it from this pass and count the skips (no
        # silent caps).  drop_stop_keys=False restores clamp-and-keep-all.
        self.drop_stop_keys = drop_stop_keys
        self.skipped_rows = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        pre = batch.column("pre_proc").to_pylist()
        nos = batch.column("nosuffix").to_pylist()
        first = batch.column("block_key").to_pylist()
        last = batch.column("block_key_last").to_pylist()

        out_block, out_side, out_idx, out_key = [], [], [], []
        batch_skips = 0
        for i in range(len(doc_ids)):
            for pass_tag, key in (("f", first[i]), ("l", last[i])):
                if pass_tag == "l" and key == first[i]:
                    continue  # identical key would duplicate the primary pass
                shards = self.hot[pass_tag].get(key, 1)
                if shards > self.max_shards:
                    if self.drop_stop_keys:
                        self.skipped_rows += 1
                        batch_skips += 1
                        if self.skipped_rows in (1, 1000, 1_000_000):
                            import logging

                            logging.getLogger(__name__).warning(
                                "blocking: stop key %r (pass %s) needs %d > "
                                "max_shards=%d shards; dropping its pairs "
                                "(%d rows skipped so far in this actor)",
                                key, pass_tag, shards, self.max_shards,
                                self.skipped_rows,
                            )
                        continue
                    shards = self.max_shards
                if shards <= 1:
                    out_block.append(f"{pass_tag}|{key}|0|0")
                    out_side.append(2)
                    out_idx.append(i)
                    out_key.append(key)
                else:
                    u = _stable_salt(doc_ids[i], shards)
                    for v in range(shards):
                        lo, hi = (u, v) if u <= v else (v, u)
                        out_block.append(f"{pass_tag}|{key}|{lo}|{hi}")
                        out_side.append(2 if lo == hi else (0 if u == lo else 1))
                        out_idx.append(i)
                        out_key.append(key)
        take = pa.array(out_idx, pa.int64())
        # block_key_last is consumed HERE (the secondary-pass key) and not
        # re-emitted: nothing downstream reads it, and every dropped byte is
        # paid once per replica row through the repartition + sort shuffle
        arrays = [
            pa.array(out_block, pa.string()),
            pa.array(out_side, pa.int8()),
            batch.column("doc_id").take(take),
            batch.column("pre_proc").take(take),
            batch.column("nosuffix").take(take),
            batch.column("block_key").take(take),
        ]
        names = ["pair_block", "side", "doc_id", "pre_proc", "nosuffix",
                 "block_key"]
        if self.n_buckets:
            arrays.append(pa.array(
                [_stable_salt(b, self.n_buckets) for b in out_block],
                pa.int64(),
            ))
            names.append("bucket")
        waves = None
        if self.n_waves:
            cache = self._wave_cache
            waves = []
            for k in out_key:
                w = cache.get(k)
                if w is None:
                    w = _stable_salt(k, self.n_waves)
                    if len(cache) < self._WAVE_CACHE_CAP:
                        cache[k] = w
                waves.append(w)
            arrays.append(pa.array(waves, pa.int64()))
            names.append("wave")
        if self.metrics:
            counters: dict[str, int] = {}
            if batch_skips:
                counters["rows_dropped_stop_keys"] = batch_skips
            if waves:
                # per-wave row tallies: the checkpoint manifest records which
                # waves are non-empty so resume never probes the filesystem
                u, c = np.unique(np.asarray(waves, np.int64),
                                 return_counts=True)
                for w, n_rows in zip(u, c):
                    counters[f"wave_rows_{int(w)}"] = int(n_rows)
            if counters:
                from ..state.metrics import add_sync

                add_sync(counters)
        return pa.Table.from_arrays(arrays, names=names)


def _cross_for_block(g: pd.DataFrame,
                     dropped_first: frozenset = frozenset()) -> tuple[pd.DataFrame, str]:
    """Candidate cross-product for ONE pair-block group -> (cross, key).

    Orientation is canonical: the lexicographically smaller doc_id is the
    query ("a") side of the asymmetric cascade.  Secondary-pass groups skip
    pairs already co-blocked by first token (see module docstring) — UNLESS
    that first token was a dropped stop key, in which case the primary pass
    never emitted the pair and the secondary pass must keep it.
    """
    block = g["pair_block"].iat[0]
    pass_tag, key, i_shard, j_shard = block.split("|")
    if i_shard == j_shard:
        # triangle block: all-pairs within the group, each exactly once
        cross = g.merge(g, how="cross", suffixes=("_a", "_b"))
        cross = cross[cross["doc_id_a"] < cross["doc_id_b"]]
    else:
        # cross-shard block: left shard × right shard, then canonicalize
        left = g[g["side"] == 0]
        right = g[g["side"] == 1]
        cross = left.merge(right, how="cross", suffixes=("_a", "_b"))
        flip = cross["doc_id_a"] > cross["doc_id_b"]
        if flip.any():
            # swap only the emitted string columns (swapping the int8 'side'
            # columns triggers pandas incompatible-dtype warnings)
            swap = ["doc_id", "pre_proc", "nosuffix", "block_key"]
            a_cols = [c + "_a" for c in swap]
            b_cols = [c + "_b" for c in swap]
            tmp = cross.loc[flip, a_cols].to_numpy()
            cross.loc[flip, a_cols] = cross.loc[flip, b_cols].to_numpy()
            cross.loc[flip, b_cols] = tmp
    if pass_tag == "l":
        same_first = cross["block_key_a"] == cross["block_key_b"]
        if dropped_first:
            same_first &= ~cross["block_key_a"].isin(dropped_first)
        cross = cross[~same_first]
    return cross, key


def _emit_pairs_for_group(g: pd.DataFrame,
                          dropped_first: frozenset = frozenset()) -> pd.DataFrame:
    """All unordered candidate pairs within one pair-block (pandas group)."""
    cross, key = _cross_for_block(g, dropped_first)
    if cross.empty:
        return pd.DataFrame(
            {c: pd.Series(dtype="object") for c in
             ("left_doc_id", "right_doc_id", "block_key",
              "pre_a", "pre_b", "nosuffix_a", "nosuffix_b")}
        )
    return pd.DataFrame(
        {
            "left_doc_id": cross["doc_id_a"].to_numpy(),
            "right_doc_id": cross["doc_id_b"].to_numpy(),
            "block_key": key,
            "pre_a": cross["pre_proc_a"].to_numpy(),
            "pre_b": cross["pre_proc_b"].to_numpy(),
            "nosuffix_a": cross["nosuffix_a"].to_numpy(),
            "nosuffix_b": cross["nosuffix_b"].to_numpy(),
        }
    )


_NAME_ENC: dict = {}  # nosuffix -> (sorted distinct token-id array, tw, token set)
_TOKEN_IDS: dict = {}  # token -> global int id
_TOKEN_W = np.empty(1024, np.int64)  # id -> len(token) + 1 (join weight)
_NAME_ENC_CAP = 500_000


def _encode_name(s: str):
    """Per-process encoding of a nosuffix name: distinct token ids (sorted),
    total join weight Σ(len+1), and the Python set for exact fallbacks."""
    got = _NAME_ENC.get(s)
    if got is not None:
        return got
    global _TOKEN_W
    toks = set(s.split())
    ids = np.empty(len(toks), np.int64)
    tw = 0
    for k, t in enumerate(toks):
        tid = _TOKEN_IDS.get(t)
        if tid is None:
            tid = len(_TOKEN_IDS)
            _TOKEN_IDS[t] = tid
            if tid >= len(_TOKEN_W):
                _TOKEN_W = np.resize(_TOKEN_W, len(_TOKEN_W) * 2)
            _TOKEN_W[tid] = len(t) + 1
        ids[k] = tid
        tw += len(t) + 1
    ids.sort()
    got = (ids, tw, toks)
    if len(_NAME_ENC) < _NAME_ENC_CAP:
        _NAME_ENC[s] = got
    return got


def _vector_precascade(matcher, pre: list, gi: np.ndarray, gj: np.ndarray):
    """Vectorized evaluation of the cascade's cheap Part-0/Part-1
    preconditions over gate-passing pairs (matcher.py:139-181 semantics,
    see rules.Matcher.match) — the codes that need NO per-pair alignment:

    - rule 16 sentinel: both sides contain ``matchit`` → scalar (rare);
    - ``-23``: query word count exceeds base word count by > 5;
    - ``-1`` / ``-2``: one side is NA-empty;
    - both sides carry a location → scalar (rule 21/-22 needs a ratio);
    - rule 1a: space-stripped equality with ``len(a) > 8`` → 1
      (equality falls through at ``len(a) <= 8`` — those stay scalar);
    - rule 1b triggers (sorted-join or sorted-char equality) → scalar
      (its body can return 1, -21 or fall through);
    - ``-3``: banned institution word on the query side.

    Per-NAME state comes from the memoized ``_name_pre`` (built once per
    distinct row actually present in a gate-passing pair); string
    equalities become integer code compares via one ``pd.factorize`` per
    field.  Returns ``(codes, scalar_mask)``: ``codes[t]`` is the decided
    cascade code where ``scalar_mask[t]`` is False; pairs with
    ``scalar_mask[t]`` True must run the full ``match()``.  Equivalence
    with the scalar cascade is differential-tested
    (test_vector_precascade_matches_cascade) and implied end-to-end by
    the fused == two-stage equality test (the two-stage path scores every
    pair through ``match()`` alone).
    """
    urows = np.unique(np.concatenate([gi, gj]))
    pres = [matcher._name_pre(pre[r]) for r in urows]
    nu = len(urows)
    mt = np.fromiter(("matchit" in pre[r] for r in urows), bool, nu)
    wc = np.fromiter((len(p.words) for p in pres), np.int64, nu)
    na = np.fromiter((p.na_empty for p in pres), bool, nu)
    loc = np.fromiter((p.has_loc for p in pres), bool, nu)
    ban = np.fromiter((p.ban for p in pres), bool, nu)
    len8 = np.fromiter((len(pre[r]) > 8 for r in urows), bool, nu)
    ns_c = pd.factorize(np.array([p.nospace for p in pres], object))[0]
    sj_c = pd.factorize(np.array([p.sj for p in pres], object))[0]
    sc_c = pd.factorize(np.array([p.sorted_c for p in pres], object))[0]

    ai = np.searchsorted(urows, gi)
    bi = np.searchsorted(urows, gj)

    codes = np.zeros(len(gi), np.int32)
    scalar = mt[ai] & mt[bi]
    dec = scalar.copy()
    m = ~dec & (wc[ai] - wc[bi] > 5)
    codes[m] = -23
    dec |= m
    m = ~dec & na[ai]
    codes[m] = -1
    dec |= m
    m = ~dec & na[bi]
    codes[m] = -2
    dec |= m
    m = ~dec & loc[ai] & loc[bi]
    scalar |= m
    dec |= m
    ns_eq = ns_c[ai] == ns_c[bi]
    m = ~dec & ns_eq & len8[ai]
    codes[m] = 1
    dec |= m
    # 1b triggers — or a 1a equality that fell through without returning
    m = ~dec & ((sj_c[ai] == sj_c[bi]) | (sc_c[ai] == sc_c[bi]) | ns_eq)
    scalar |= m
    dec |= m
    m = ~dec & ban[ai]
    codes[m] = -3
    dec |= m
    scalar |= ~dec  # remainder: the alignment loop / deep rules
    return codes, scalar


def _score_bucket_groups(g: pd.DataFrame, keep_all: bool, metrics: bool,
                         dropped_first: frozenset = frozenset()) -> pa.Table:
    """Fused emit+score for one coarse bucket of pair-blocks.

    Candidate pairs are enumerated as INDEX pairs and scored inline inside
    the groupby's reduce task — neither the wide pair table nor even a
    per-block cross-product frame is materialized.  The ``token_set_ratio
    > 50`` candidate gate is decided VECTORIZED per block: two n×V matmuls
    over the block's binary token matrix give every pair's intersection
    count and joined-char weight, from which exact integer bounds settle
    almost all pairs (``2·sect_len > bool(sect) + min(diff)`` ⟺ the
    sect-vs-sect+diff terms exceed 50; ``4·min(diff) ≤ diff_a + diff_b`` ⟹
    the remaining diff-vs-diff term cannot).  Only bound-ambiguous pairs
    fall back to the exact Python kernel, and only gate-passing pairs enter
    the rule cascade — the per-pair Python loop that capped scaling
    efficiency at 0.76 is gone.  The compiled Matcher comes from the
    per-process singleton.
    """
    import os
    import time as _time

    from ..functions.rules import get_matcher
    from ..functions.similarity import token_set_ratio_pre, token_sort_ratio

    profile = bool(os.environ.get("GRAFT_SCORE_PROFILE"))
    t_prep = t_gate = t_casc = 0.0
    n_gate_pass = n_ambig = n_fast = 0

    matcher = get_matcher()
    match = matcher.match
    out_l, out_r, out_k, out_c, out_s = [], [], [], [], []
    n_scored = 0
    _t0 = _time.perf_counter()

    # ONE sort for the whole bucket: groups become contiguous row ranges with
    # rows already in canonical doc_id order (i < j ⇒ i is the query side)
    g = g.sort_values(["pair_block", "doc_id"], kind="stable")
    blocks_np = g["pair_block"].to_numpy()
    ids = g["doc_id"].tolist()
    pre = g["pre_proc"].tolist()
    nos = g["nosuffix"].tolist()
    bk = g["block_key"].tolist()
    side_np = g["side"].to_numpy(np.int8)
    nrows = len(ids)

    enc = [_encode_name(s_) for s_ in nos]
    tok_ids = [e[0] for e in enc]
    tw_np = np.fromiter((e[1] for e in enc), np.int64, nrows)
    cnt_np = np.fromiter((len(e[0]) for e in enc), np.int64, nrows)
    tss = [e[2] for e in enc]
    bk_dropped = (np.fromiter((b in dropped_first for b in bk), bool, nrows)
                  if dropped_first else np.zeros(nrows, bool))

    change = (np.nonzero(blocks_np[1:] != blocks_np[:-1])[0] + 1
              if nrows else np.empty(0, np.int64))
    starts = [0] + change.tolist() if nrows else []
    ends = change.tolist() + [nrows] if nrows else []
    if profile:
        t_prep += _time.perf_counter() - _t0

    for s0, e0 in zip(starts, ends):
        n = e0 - s0
        if n < 2:
            continue
        pass_tag, key, i_shard, j_shard = blocks_np[s0].split("|")
        secondary = pass_tag == "l"
        triangle = i_shard == j_shard

        iu, ju = np.triu_indices(n, 1)
        iu += s0
        ju += s0
        if not triangle:
            keep = side_np[iu] != side_np[ju]
            iu, ju = iu[keep], ju[keep]
        if secondary and len(iu):
            bk_codes = pd.factorize(np.asarray(bk[s0:e0], object))[0]
            same_first = bk_codes[iu - s0] == bk_codes[ju - s0]
            if dropped_first:
                same_first &= ~bk_dropped[iu]
            iu, ju = iu[~same_first], ju[~same_first]
        np_pairs = len(iu)
        if not np_pairs:
            continue
        n_scored += np_pairs
        if profile:
            _tg = _time.perf_counter()

        # --- vectorized gate over the block's binary token matrix ---
        block_toks = [tok_ids[r] for r in range(s0, e0)]
        lens = np.fromiter((len(a) for a in block_toks), np.int64, n)
        total = int(lens.sum())
        if total:
            allids = np.concatenate(block_toks)
            uniq, inv = np.unique(allids, return_inverse=True)
            A = np.zeros((n, len(uniq)), np.float32)
            A[np.repeat(np.arange(n), lens), inv] = 1.0
            IC = A @ A.T
            IW = A @ (A * _TOKEN_W[uniq].astype(np.float32)).T
            li, lj = iu - s0, ju - s0
            ic = np.rint(IC[li, lj]).astype(np.int64)
            iw = np.rint(IW[li, lj]).astype(np.int64)
        else:
            ic = np.zeros(np_pairs, np.int64)
            iw = np.zeros(np_pairs, np.int64)
        ca, cb = cnt_np[iu], cnt_np[ju]
        sl = iw - (ic > 0)
        al = (tw_np[iu] - iw) - (ca > ic)
        bl = (tw_np[ju] - iw) - (cb > ic)
        mn = np.minimum(al, bl)
        both_empty = (ca == 0) & (cb == 0)
        gate_pass = both_empty | ((ic > 0) & ((al == 0) | (bl == 0))) \
            | (2 * sl > (sl > 0).astype(np.int64) + mn)
        undecided = ~gate_pass & ~((ca == 0) ^ (cb == 0)) \
            & (4 * mn > al + bl) & ~both_empty
        for t in np.nonzero(undecided)[0]:
            if token_set_ratio_pre(tss[iu[t]], tss[ju[t]]) > 50:
                gate_pass[t] = True
        if profile:
            t_gate += _time.perf_counter() - _tg
            n_ambig += int(undecided.sum())
            n_gate_pass += int(gate_pass.sum())
            _tc = _time.perf_counter()

        # --- cascade only for gate-passing pairs; the cheap Part-0/Part-1
        # early-outs are settled vectorized first, so match() runs only on
        # pairs that need the alignment loop / deep rules ---
        gp = np.nonzero(gate_pass)[0]
        if len(gp):
            gi, gj = iu[gp], ju[gp]
            fast_codes, scalar_mask = _vector_precascade(matcher, pre,
                                                         gi, gj)
            n_fast += int((~scalar_mask).sum())
            for t in range(len(gp)):
                i, j = int(gi[t]), int(gj[t])
                code = (int(match(pre[i], pre[j])) if scalar_mask[t]
                        else int(fast_codes[t]))
                if code > 0:
                    out_l.append(ids[i])
                    out_r.append(ids[j])
                    out_k.append(key)
                    out_c.append(code)
                    out_s.append(float(token_sort_ratio(nos[i], nos[j])))
                elif keep_all:
                    out_l.append(ids[i])
                    out_r.append(ids[j])
                    out_k.append(key)
                    out_c.append(code)
                    out_s.append(0.0)
        if keep_all:
            for t in np.nonzero(~gate_pass)[0]:
                i, j = int(iu[t]), int(ju[t])
                out_l.append(ids[i])
                out_r.append(ids[j])
                out_k.append(key)
                out_c.append(-100)
                out_s.append(0.0)
        if profile:
            t_casc += _time.perf_counter() - _tc
    out = {"left_doc_id": out_l, "right_doc_id": out_r, "block_key": out_k,
           "rule_code": out_c, "score": out_s}
    if metrics or profile:
        from ..state.metrics import add_sync

        counters = {"pairs_scored": n_scored,
                    "pairs_matched": sum(1 for c in out["rule_code"] if c > 0)}
        if profile:
            counters.update({
                "prof_prep_ms": int(t_prep * 1000),
                "prof_gate_ms": int(t_gate * 1000),
                "prof_cascade_ms": int(t_casc * 1000),
                "prof_gate_pass": n_gate_pass,
                "prof_gate_ambig": n_ambig,
                "prof_fast_decided": n_fast,
            })
        add_sync(counters)
    return pa.table({
        "left_doc_id": pa.array(out["left_doc_id"], pa.string()),
        "right_doc_id": pa.array(out["right_doc_id"], pa.string()),
        "block_key": pa.array(out["block_key"], pa.string()),
        "rule_code": pa.array(out["rule_code"], pa.int32()),
        "score": pa.array(out["score"], pa.float32()),
    })


def fused_match_pairs(names_ds, *, cap: int = 200, max_shards: int = 16,
                      hot_first: dict | None = None, hot_last: dict | None = None,
                      n_buckets: int = 4096, out_blocks: int | None = 256,
                      keep_all: bool = False, metrics: bool = False):
    """names -> matched pairs with emission and scoring fused in the reduce.

    One shuffle total: explode → repartition → groupby(coarse bucket) where
    each reduce task generates and scores its blocks' pairs immediately.
    ``n_buckets`` controls scheduling granularity (hash of pair_block, so a
    block never straddles buckets; salting already caps per-block size).
    4096 buckets over ``out_blocks`` reduce partitions give each reduce task
    ~16 buckets: per-bucket pair counts are quadratic in block size, and
    averaging more buckets per task shrinks the task-duration variance that
    otherwise leaves a straggler tail at high parallelism.
    """
    import ray

    if hot_first is None or hot_last is None:
        names_ds = names_ds.materialize()
        hot_first, hot_last = compute_hot_keys_multi(
            names_ds, ["block_key", "block_key_last"], cap
        )
    # explode parallelism follows the cluster — a fixed cap of 8 actors left
    # 3/4 of a 32-core node idle during the explode phase of the wide leg
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    exploded = names_ds.map_batches(
        ExplodeToPairBlocks,
        fn_constructor_kwargs={
            "hot_first": hot_first, "hot_last": hot_last,
            "max_shards": max_shards, "n_buckets": n_buckets,
            "metrics": metrics,
        },
        batch_format="pyarrow",
        concurrency=(1, max(8, ncpu)),
    )
    if out_blocks:
        exploded = exploded.repartition(out_blocks)
    dropped_first = frozenset(k for k, s in hot_first.items() if s > max_shards)
    return exploded.groupby("bucket").map_groups(
        lambda g: _score_bucket_groups(g, keep_all, metrics, dropped_first),
        batch_format="pandas",
    )


def candidate_pairs(names_ds, *, cap: int = 200, max_shards: int = 16,
                    hot_first: dict | None = None, hot_last: dict | None = None,
                    out_blocks: int | None = 256):
    """names Dataset -> candidate pair Dataset (the one blocking shuffle).

    ``out_blocks``: the groupby's reduce stage emits as few blocks as the
    input had (a single-file read gives ~4), which would cap the downstream
    scoring actor pool's parallelism — repartition the (narrow) pair rows so
    scoring saturates the cluster.  Measured: 6.0k → 20.7k pairs/s on 16
    CPUs at sf0.1.
    """
    if hot_first is None or hot_last is None:
        # materialize once: the histogram pass and the explode pass both
        # consume names; without this the whole upstream lineage re-executes
        names_ds = names_ds.materialize()
        hot_first, hot_last = compute_hot_keys_multi(
            names_ds, ["block_key", "block_key_last"], cap
        )
    exploded = names_ds.map_batches(
        ExplodeToPairBlocks,
        fn_constructor_kwargs={
            "hot_first": hot_first, "hot_last": hot_last, "max_shards": max_shards
        },
        batch_format="pyarrow",
        concurrency=default_pool(),
    )
    if out_blocks:
        # the sort-groupby's reduce (and the fused pair-emission) parallelism
        # follows the input block count; a single-file read yields ~2 blocks,
        # which would serialize the O(pairs) cross-products in 2 tasks
        exploded = exploded.repartition(out_blocks)
    dropped_first = frozenset(k for k, s in hot_first.items() if s > max_shards)
    pairs = exploded.groupby("pair_block").map_groups(
        lambda g: _emit_pairs_for_group(g, dropped_first), batch_format="pandas"
    )
    if out_blocks:
        # rebalance: emit blocks are skewed (hot blocks emit quadratically
        # more pairs), which would leave scoring stragglers
        pairs = pairs.repartition(out_blocks)
    return pairs


# ---------------------------------------------------------------------------
# phonetic blocking keys (Soundex) + block-size audit
# ---------------------------------------------------------------------------

# a..z -> Soundex digit (b f p v=1, c g j k q s x z=2, d t=3, l=4, m n=5,
# r=6, vowels/h/w/y=0).  h/w are treated as vowels (plain separators) —
# the simplified variant; classic Soundex lets codes merge ACROSS h/w.
# The SQL oracle inlines this exact table, so the law cannot drift.
_SOUNDEX_DIGITS = "01230120022455012623010202"
_SOUNDEX_TABLE = str.maketrans("abcdefghijklmnopqrstuvwxyz",
                               _SOUNDEX_DIGITS)
_SOUNDEX_COLLAPSE = __import__("re").compile(r"(\d)\1+")


def soundex_key(tok: str) -> str:
    """Simplified Soundex of a lowercase [a-z]+ token: first letter +
    first 3 non-zero digits of the adjacent-collapsed code string
    (collapse runs BEFORE the zero drop, first letter's digit included in
    the collapse — the classic rule ordering), zero-padded to length 4."""
    d = tok.translate(_SOUNDEX_TABLE)
    c = _SOUNDEX_COLLAPSE.sub(r"\1", d)
    return tok[0] + (c[1:].replace("0", "") + "000")[:3]


def phonetic_block_stats(ds, *, name_col: str, n_buckets: int = 64):
    """Phonetic blocking-key audit — the step BEFORE any fuzzy-match run:
    generate a Soundex key per name token and report every block's size
    (``n_tokens`` = token instances, ``n_distinct`` = distinct spellings
    it would co-block).  Skewed phonetic blocks are exactly the keys the
    salted-triangle blocking stage must shard, so this table is the
    operational input to choosing ``max_shards`` / stop keys.

    Tokens: RE2 ``\\s+`` split of ``lower(name)``, non-[a-z] stripped
    per token, empties dropped.  The per-token key is computed once per
    DISTINCT token per batch (vocab-bounded Python; the corpus-scale cost
    is the factorize, not the key).

    Scale shape: per-batch ``(key, token, count)`` partials → coarse
    key-hash buckets → in-bucket vectorized groupby (sum + nunique) —
    one shuffle, rows bounded by batch-distinct tokens.
    """
    from .textstats import _explode_tokens

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = _explode_tokens(batch, name_col)
        toks = pd.Series(flat.to_numpy(zero_copy_only=False))
        toks = toks.str.replace("[^a-z]", "", regex=True)
        toks = toks[toks != ""]
        if not len(toks):
            return pa.table({"block_key": pa.array([], pa.string()),
                             "tok": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(toks.to_numpy())
        keys = np.array([soundex_key(t) for t in uniq], object)
        g = pd.DataFrame({"block_key": keys[codes], "tok": toks.to_numpy()}) \
            .groupby(["block_key", "tok"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        a = g.groupby("block_key").agg(
            n_tokens=("n", "sum"), n_distinct=("tok", "nunique"))
        return pa.table({
            "block_key": pa.array(a.index.to_numpy(), pa.string()),
            "n_tokens": pa.array(a["n_tokens"].to_numpy(np.int64),
                                 pa.int64()),
            "n_distinct": pa.array(a["n_distinct"].to_numpy(np.int64),
                                   pa.int64()),
        })

    from ..pipelines.analytics import _bucket_tag

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return _bucket_tag(parts, ["block_key"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")
