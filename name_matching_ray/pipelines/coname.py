"""Legacy coname pipeline (reference ``coname.py``) — Ray-Data-native.

Reference shape (coname.py:186-249): a multiprocessing Pool maps every main
row against EVERY base row (full cartesian) through ``permutation``; the
corpus-derived ``unique_word`` / ``pair_word`` gates come from a driver-side
loop over the base table.  Here:

* corpus stats are a distributed bucketed groupby (hash(gvkey) % 256 coarse
  groups — the house pattern for many tiny key groups) with only the
  rare-item tail (count <= 2) collected;
* the base side is preprocessed DISTRIBUTED once, then broadcast via
  ``ray.put`` (S2 broadcast-small-side pattern; the legacy matcher is
  defined against a base *catalog* — stocknames — which is the small side
  by construction.  For a base too big to broadcast, the canonical
  matcher.py path with salted blocking is the supported route);
* the main side streams through an actor-pool ``map_batches``; the
  reference's two scalar prefilters are decided VECTORIZED per batch
  against base CHUNKS (bounded memory): the char-set gate
  (``len(set(x) & set(y)) < 4`` when both names are > 7 chars,
  coname.py:126-128) as a binary char-matrix matmul, and the
  ``fuzz.token_set_ratio(x, y) < 55`` gate (coname.py:129) by exact
  integer bounds over token-matmul intersections (the fused-scorer
  technique), with only bound-ambiguous pairs falling back to the exact
  fuzzywuzzy-semantics kernel.  Only pairs passing both gates enter the
  Python ``legacy_match`` cascade.

Output schema matches the reference's ``__coname__.csv`` rows:
(main_index, main_name, base_index, base_name)  (coname.py:189-193).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import bucket_hash

from ..functions.coname_legacy import (
    _WS,
    legacy_match,
    name_preprocessing,
    pairwise,
    remove_punc,
)
from ..functions.fuzzy_legacy import (
    full_process,
    fw_ratio,
    fw_token_set_ratio_pre,
)
from ..functions.similarity import lcs_length


# ---------------------------------------------------------------------------
# corpus word stats (coname.py:214-240), distributed
# ---------------------------------------------------------------------------

def coname_corpus_words(base_ds, *, order_col: str = "row_order",
                        gvkey_col: str = "gvkey", name_col: str = "name",
                        n_buckets: int = 256,
                        driver_threshold: int = 200_000) -> tuple[set, set]:
    """(unique_word, pair_word) gates.

    Per-gvkey semantics are ORDER-dependent for duplicate gvkeys (the first
    row contributes word tokens of the abbreviated name; later rows
    contribute the CHARS of the raw name — reference bug kept,
    coname.py:227-230), so the input must carry ``order_col``.

    Under ``driver_threshold`` rows the gates are computed driver-side with
    the exact loop (the segment_revenue small-side pattern: two distributed
    sort-shuffles over a catalog-sized table are pure fixed latency —
    measured 9.8 s for 1.4k rows).  Above it, rows are bucketed by
    hash(gvkey) and each bucket runs the exact per-gvkey loop over its
    (complete) gvkeys; one small (item, gvkey-count) shuffle later, only
    items with count <= 2 — the membership tail the cascade actually
    consults — reach the driver.  Both paths are equality-tested.
    """
    from ray.data.aggregate import Sum

    from ..functions.coname_legacy import abbr_adj, corpus_words_exact

    if base_ds.count() <= driver_threshold:
        rows = []
        for b in (base_ds.select_columns([order_col, gvkey_col, name_col])
                  .iter_batches(batch_format="pyarrow")):
            rows.extend(zip(b.column(order_col).to_pylist(),
                            b.column(gvkey_col).to_pylist(),
                            b.column(name_col).to_pylist()))
        rows.sort(key=lambda r: r[0])
        return corpus_words_exact(
            (g, nm, abbr_adj(nm)) for _, g, nm in rows)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[order_col, gvkey_col, name_col]].copy()
        out["_ub"] = bucket_hash(df[gvkey_col], n_buckets)
        return out

    def bucket_items(g: pd.DataFrame) -> pa.Table:
        rows = g.sort_values(order_col)
        items: dict[tuple[int, str], set] = {}
        seen: set = set()
        for gvkey, name in zip(rows[gvkey_col], rows[name_col]):
            if gvkey in seen:
                for ch in name:  # reference bug: chars of the raw name
                    items.setdefault((0, ch), set()).add(gvkey)
                    # pairwise of a 1-char string adds nothing (kept)
            else:
                seen.add(gvkey)
                abbrev = abbr_adj(name)
                toks = _WS.split(remove_punc(abbrev.lower()))
                for t in set(toks):
                    items.setdefault((0, t), set()).add(gvkey)
                for p in set(pairwise(toks)):
                    items.setdefault((1, " ".join(p)), set()).add(gvkey)
        return pa.table({
            "kind": pa.array([k for (k, _) in items], pa.int8()),
            "item": pa.array([v for (_, v) in items], pa.string()),
            "n": pa.array([len(s) for s in items.values()], pa.int64()),
        })

    tail = (
        base_ds.map_batches(tag, batch_format="pandas")
        .groupby("_ub").map_groups(bucket_items, batch_format="pandas")
        .groupby(["kind", "item"]).aggregate(Sum("n", alias_name="n"))
        .filter(expr="n <= 2")
    )
    unique_word: set = set()
    pair_word: set = set()
    for b in tail.iter_batches(batch_format="pyarrow"):
        for k, item in zip(b.column("kind").to_pylist(),
                           b.column("item").to_pylist()):
            if k == 0:
                unique_word.add(item)
            else:
                w1, w2 = item.split(" ", 1)
                pair_word.add((w1, w2))
    return unique_word, pair_word


# ---------------------------------------------------------------------------
# vectorized gate helpers
# ---------------------------------------------------------------------------

def _rows_to_matrix(item_sets: list, vocab: dict) -> np.ndarray:
    """n × len(vocab) binary matrix; ``vocab`` is extended in place."""
    for s in item_sets:
        for it in s:
            if it not in vocab:
                vocab[it] = len(vocab)
    m = np.zeros((len(item_sets), len(vocab)), np.float32)
    for i, s in enumerate(item_sets):
        for it in s:
            m[i, vocab[it]] = 1.0
    return m


def _pad_cols(m: np.ndarray, width: int) -> np.ndarray:
    if m.shape[1] < width:
        return np.hstack(
            [m, np.zeros((m.shape[0], width - m.shape[1]), np.float32)])
    return m


def _tsr_ge55(ic, iw, tw_a, tw_b, cnt_a, cnt_b):
    """Decide ``fw_token_set_ratio >= 55`` by exact integer bounds.

    Returns (definite_pass, definite_fail); pairs in neither band need the
    exact kernel.  fuzzywuzzy int-rounds each candidate ratio with Python's
    half-to-even ``round``, and 54.5 rounds DOWN to 54 — so a ratio passes
    iff it is STRICTLY above 54.5 (``400·x > 109·lensum`` in integers) and
    fails iff <= 54.5.  An EMPTY side returns 0 in fuzzywuzzy
    (validate-then-0), hence definite fail.

    With s = joined intersection length, gap_i = joined-diff length (+1
    separator when nonempty): ratio(sect, combined_i) = 200s/(2s+gap_i)
    exactly (sect is a prefix of combined_i); for ratio(c1, c2) the LCS is
    bounded in [s, s + min(gap1, gap2)] — only that band is inexact.
    """
    s = iw - (ic > 0)
    d1 = (tw_a - iw) - (cnt_a > ic)
    d2 = (tw_b - iw) - (cnt_b > ic)
    # combined = sect [+ ' '] + diff — the separator exists only when BOTH
    # parts are non-empty (fuzzywuzzy strips the joined string)
    gap1 = d1 + ((d1 > 0) & (s > 0))
    gap2 = d2 + ((d2 > 0) & (s > 0))
    c1 = s + gap1
    c2 = s + gap2
    r1 = (s > 0) & (400 * s > 109 * (s + c1))
    r2 = (s > 0) & (400 * s > 109 * (s + c2))
    lcs_hi = s + np.minimum(gap1, gap2)
    r3_hi = (c1 + c2 > 0) & (400 * lcs_hi > 109 * (c1 + c2))
    r3_lo = (c1 + c2 > 0) & (400 * s > 109 * (c1 + c2))
    empty = (cnt_a == 0) | (cnt_b == 0)
    definite_pass = (r1 | r2 | r3_lo) & ~empty
    definite_fail = (~(r1 | r2 | r3_hi)) | empty
    return definite_pass, definite_fail, s, c1, c2


# ---------------------------------------------------------------------------
# fast cascade: legacy_match with per-name precomputation
# ---------------------------------------------------------------------------

def _variant_aux(words, ws):
    """Precomputed views of one name variant's (words, without_suffix):
    (words, ws, raw ws set, processed words tokens, processed ws tokens).

    The processed sets reproduce fuzzywuzzy's LIST-argument behavior
    element-wise: every element is pure ``\\w`` (remove_punc output), so
    ``full_process(str(lst))`` tokenizes to exactly the union of
    ``full_process(elem)`` tokens (empty elements vanish both ways).
    """
    if words is None:
        return None

    def ts(lst):
        out = set()
        for w in lst:
            p = full_process(w)
            if p:
                out.update(p.split())
        return out

    return (words, ws, set(ws), ts(words), ts(ws))


def _prep_aux(p):
    """aux triple (main, two_, three_) for one 9-tuple."""
    (_z, words, ws, two_, two_words, two_ws,
     three_, three_words, three_ws) = p
    return (
        _variant_aux(words, ws),
        _variant_aux(two_words, two_ws) if two_ else None,
        _variant_aux(three_words, three_ws) if three_ else None,
    )


def _match_fast(ax, ay, unique_word, pair_word):
    """``legacy_match`` on precomputed aux views (exact same decisions —
    pipeline output is differentially tested against the reference loop).
    A None operand (absent glued variant passed through the reference's
    buggy three_x guard) scores 0 in fuzzywuzzy and rejects."""
    if ax is None or ay is None:
        return
    x_words, ws_x, set_ws_x, pwords_x, pws_x = ax
    y_words, ws_y, set_ws_y, pwords_y, pws_y = ay
    if fw_token_set_ratio_pre(pws_x, pws_y) < 94:
        return
    first_word_x, first_word_y = x_words[0], y_words[0]
    first_score = fw_ratio(first_word_x, first_word_y)
    if len(set_ws_x) == len(set_ws_y):
        if first_score > 90 and first_word_x[0] == first_word_y[0]:
            return True
        else:
            xyset = set_ws_x & set_ws_y
            xyset.discard('s')
            if xyset == set_ws_x:
                if len(xyset) == 1 and list(xyset)[0] not in unique_word:
                    if fw_token_set_ratio_pre(pwords_x, pwords_y) > 90:
                        return True
                else:
                    return True
    else:
        if first_score > 90 and (first_word_y in unique_word):
            if first_word_x[0] == first_word_y[0]:
                return True
        if len(ws_x) > 1 and len(ws_y) > 1:
            y1, y2 = y_words[:2]
            x1, x2 = x_words[:2]
            if (y1, y2) in pair_word and 'of' not in (y1, y2) \
                    and 's' not in (y1, y2):
                if fw_ratio(x1, y1) > 90 and fw_ratio(x2, y2) > 90:
                    return True


def _cascade_fast(px, ax, py, ay, unique_word, pair_word):
    """``_cascade_after_gates`` on aux views (guard asymmetry kept)."""
    if _match_fast(ax[0], ay[0], unique_word, pair_word):
        return True
    if px[3]:  # two_x
        if _match_fast(ax[1], ay[0], unique_word, pair_word):
            return True
        if px[6]:  # three_x
            if _match_fast(ax[2], ay[0], unique_word, pair_word):
                return True
    if py[3]:  # two_y
        if _match_fast(ax[0], ay[1], unique_word, pair_word):
            return True
        if px[6]:  # reference guard bug kept (coname.py:139-143)
            if _match_fast(ax[0], ay[2], unique_word, pair_word):
                return True
    return False


# ---------------------------------------------------------------------------
# the match stage
# ---------------------------------------------------------------------------

class _ConameScorer:
    """Actor: broadcast-base legacy scorer (all setup once per actor)."""

    BASE_CHUNK = 8192  # gate matrices are n_batch × BASE_CHUNK

    def __init__(self, base_ref, unique_word: set, pair_word: set,
                 index_col: str, name_col: str):
        import ray

        base = ray.get(base_ref)  # list of (index, name, 9-tuple)
        self.base_idx = [b[0] for b in base]
        self.base_name = [b[1] for b in base]
        self.base_prep = [b[2] for b in base]
        self.unique_word = unique_word
        self.pair_word = pair_word
        self.index_col = index_col
        self.name_col = name_col

        zs = [p[0] for p in self.base_prep]
        self.base_z = zs
        self.base_zlen = np.array([len(z) for z in zs], np.int64)
        # vocabs are SHARED between base and batch matrices (built here,
        # extended per batch) so column i always means the same char/token
        self.char_vocab: dict = {}
        self.base_cm = _rows_to_matrix([set(z) for z in zs], self.char_vocab)
        self.tok_vocab: dict = {}
        self.base_tsets = [set(full_process(z).split()) for z in zs]
        self.base_aux = [_prep_aux(p) for p in self.base_prep]
        self.base_tm = _rows_to_matrix(self.base_tsets, self.tok_vocab)
        self.base_tw = np.array(
            [sum(len(t) + 1 for t in ts) for ts in self.base_tsets], np.int64)
        self.base_cnt = np.array([len(ts) for ts in self.base_tsets], np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m_idx = batch.column(self.index_col).to_pylist()
        m_name = batch.column(self.name_col).to_pylist()
        preps = [name_preprocessing(nm) for nm in m_name]
        aux = [_prep_aux(p) for p in preps]
        zs = [p[0] for p in preps]
        zlen = np.array([len(z) for z in zs], np.int64)
        n = len(zs)

        out_mi, out_mn, out_bi, out_bn = [], [], [], []
        if n and self.base_idx:
            cm = _rows_to_matrix([set(z) for z in zs], self.char_vocab)
            tsets = [set(full_process(z).split()) for z in zs]
            tm = _rows_to_matrix(tsets, self.tok_vocab)
            tw = np.array([sum(len(t) + 1 for t in ts) for ts in tsets],
                          np.int64)
            cnt = np.array([len(ts) for ts in tsets], np.int64)
            self.base_cm = _pad_cols(self.base_cm, cm.shape[1])
            self.base_tm = _pad_cols(self.base_tm, tm.shape[1])
            wvec = np.zeros(len(self.tok_vocab), np.float32)
            for t, i in self.tok_vocab.items():
                wvec[i] = len(t) + 1
            twm = tm * wvec[None, :tm.shape[1]]

            for c0 in range(0, len(self.base_idx), self.BASE_CHUNK):
                c1 = min(c0 + self.BASE_CHUNK, len(self.base_idx))
                bcm = self.base_cm[c0:c1]
                btm = self.base_tm[c0:c1]
                common = cm @ bcm.T
                both_long = (zlen[:, None] > 7) & \
                    (self.base_zlen[None, c0:c1] > 7)
                alive = ~(both_long & (common < 4))

                ic = np.rint(tm @ btm.T).astype(np.int64)
                iw = np.rint(twm @ btm.T).astype(np.int64)
                d_pass, d_fail, s_m, c1_m, c2_m = _tsr_ge55(
                    ic, iw, tw[:, None], self.base_tw[None, c0:c1],
                    cnt[:, None], self.base_cnt[None, c0:c1])
                alive &= ~d_fail
                ambiguous = ~d_pass

                # ambiguous pairs: r1/r2 are already exactly settled (below
                # threshold), so the gate decision reduces to r3 =
                # ratio(combined1, combined2).  Both combineds share the
                # sect(+space) prefix, so LCS(c1, c2) = s + sep +
                # LCS(diff1, diff2) — ONE bit-parallel LCS over the short
                # diff strings decides the pair exactly (ambiguity implies
                # both diffs are non-empty: an empty diff makes r1 or r2
                # equal 100 and the pair definite-pass).  Per-pair values
                # are extracted VECTORIZED; the loop reads Python lists.
                iu, ju = np.nonzero(alive)
                amb_l = ambiguous[iu, ju].tolist()
                s_l = s_m[iu, ju].tolist()
                c12_l = (c1_m + c2_m)[iu, ju].tolist()
                iu_l = iu.tolist()
                ju_l = ju.tolist()
                uw, pw = self.unique_word, self.pair_word
                for k in range(len(iu_l)):
                    i = iu_l[k]
                    j = c0 + ju_l[k]
                    if amb_l[k]:
                        t1, t2 = tsets[i], self.base_tsets[j]
                        d1s = " ".join(sorted(t1 - t2))
                        d2s = " ".join(sorted(t2 - t1))
                        sp = s_l[k]
                        lcs_c = sp + (sp > 0) + lcs_length(d1s, d2s)
                        if 400 * lcs_c <= 109 * c12_l[k]:
                            continue
                    if _cascade_fast(preps[i], aux[i], self.base_prep[j],
                                     self.base_aux[j], uw, pw):
                        out_mi.append(m_idx[i])
                        out_mn.append(m_name[i])
                        out_bi.append(self.base_idx[j])
                        out_bn.append(self.base_name[j])
        return pa.table({
            "main_index": pa.array(out_mi, batch.column(self.index_col).type),
            "main_name": pa.array(out_mn, pa.string()),
            "base_index": pa.array(out_bi, pa.string()),
            "base_name": pa.array(out_bn, pa.string()),
        })


def _cascade_after_gates(x_tuple, y_tuple, unique_word, pair_word):
    """``legacy_permutation`` body AFTER its two prefilter gates
    (coname.py:130-145; the guard asymmetry at :139-143 is kept)."""
    (x, x_words, without_suffix_x, two_x, two_words_x, two_ws_x,
     three_x, three_words_x, three_ws_x) = x_tuple
    (y, y_words, without_suffix_y, two_y, two_words_y, two_ws_y,
     three_y, three_words_y, three_ws_y) = y_tuple
    if legacy_match(x, y, x_words, y_words, without_suffix_x,
                    without_suffix_y, unique_word, pair_word):
        return True
    if two_x:
        if legacy_match(two_x, y, two_words_x, y_words, two_ws_x,
                        without_suffix_y, unique_word, pair_word):
            return True
        if three_x:
            if legacy_match(three_x, y, three_words_x, y_words, three_ws_x,
                            without_suffix_y, unique_word, pair_word):
                return True
    if two_y:
        if legacy_match(x, two_y, x_words, two_words_y, without_suffix_x,
                        two_ws_y, unique_word, pair_word):
            return True
        if three_x:  # reference guard bug kept (coname.py:139-143)
            if legacy_match(x, three_y, x_words, three_words_y,
                            without_suffix_x, three_ws_y,
                            unique_word, pair_word):
                return True
    return False


def coname_match(main_ds, base_ds, *,
                 main_index: str = "index", main_name: str = "name",
                 base_index: str = "gvkey", base_name: str = "name",
                 order_col: str = "row_order",
                 person_filter: bool = False,
                 concurrency=None):
    """Legacy coname matcher: main × broadcast base, gates vectorized.

    Returns a Dataset (main_index, main_name, base_index, base_name) — the
    reference's ``__coname__.csv`` rows (coname.py:189-193; row order
    aside).  Base indices are emitted as strings (the reference never
    interprets them downstream).  ``person_filter=True`` fuses the
    postproc-ppl.py person-name tail filter (the reference's separate
    read→filter→overwrite pass over __coname__.csv) onto the output.
    """
    import ray

    if concurrency is None:
        # follow the cluster: the scorer is the dominant stage
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(8, ncpu))
    # the base lineage is consumed twice (corpus stats + broadcast prep);
    # materialize once — it is the small side by construction
    base_ds = base_ds.materialize()
    unique_word, pair_word = coname_corpus_words(
        base_ds, order_col=order_col, gvkey_col=base_index,
        name_col=base_name)

    # distribute the base preprocessing; the (small) tuple list crosses the
    # object store pickled per row, is assembled once on the driver, and is
    # broadcast via a single ray.put (each actor reads it once in __init__)
    import pickle

    def prep_base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "idx": df[base_index].astype(str),
            "name": df[base_name],
            "prep": [pickle.dumps(name_preprocessing(nm))
                     for nm in df[base_name]],
        })

    base_rows = []
    for b in (base_ds.map_batches(prep_base, batch_format="pandas")
              .iter_batches(batch_format="pandas", batch_size=8192)):
        base_rows.extend(zip(b["idx"], b["name"],
                             (pickle.loads(p) for p in b["prep"])))
    base_ref = ray.put(base_rows)

    # a single-source main side arrives as ~1 block = 1 task = 1 actor (the
    # house single-file pitfall) — repartition so the scorer pool saturates.
    # Block count follows the row count (>= ~64 rows per block — measured
    # best at sf0.1: enough actors to parallelize the quadratic pair loop
    # without hundreds of tiny scheduling roundtrips)
    pool_max = concurrency if isinstance(concurrency, int) else concurrency[1]
    n_blocks = max(1, min(pool_max * 4, main_ds.count() // 64 + 1))
    out = main_ds.repartition(n_blocks).map_batches(
        _ConameScorer,
        fn_constructor_kwargs={
            "base_ref": base_ref, "unique_word": unique_word,
            "pair_word": pair_word, "index_col": main_index,
            "name_col": main_name,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if person_filter:
        from .linkage import filter_person_matches

        out = filter_person_matches(out, name_col="main_name")
    return out
