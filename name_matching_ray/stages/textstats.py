"""Text analysis over the ``documents`` table — language-ID, quality
scoring, token counting, fingerprinting (training-data-pipeline ops).

All counting kernels are vectorized ``pyarrow.compute`` regex ops
(zero-copy Arrow in/out); only the md5 fingerprint walks rows (hashlib's C
md5, ~1 us/row).  Integer outputs everywhere so the DuckDB oracle can match
value-hashes exactly (no float summation-order hazards).

Reference linkage: the reference has no document analytics; these extend the
engine for large-scale training-data pipelines (token counting mirrors the
reference's ``__w_plus`` retokenization idea, matcher.py:122 / _name_pre.py:42).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import bucket_hash, default_pool


def _explode_tokens(batch: pa.Table, text_col: str):
    """Shared vectorized tokenize-and-explode: lowercase, RE2 ``\\s+`` split,
    then (batch-row index, flattened token array, list offsets).  Empty
    tokens are NOT filtered here — callers differ on when ``''`` drops
    relative to the offsets (tf vs positional-bigram vs window kernels)."""
    toks = pc.split_pattern_regex(pc.utf8_lower(batch.column(text_col)),
                                  r"\s+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
        else toks
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
    return doc_idx, flat, offsets


# shared with the SQL oracle (__ray_entry__.oracle_sql) — keep in sync
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")
_RE_TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # BPE-ish word/number/punct split
_RE_PUNCT = r"[^A-Za-z0-9\s]"
_RE_WS_TOKEN = r"\S+"

# tiny per-language profiles for the n-gram/stopword heuristic language ID
_LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "with", "for"},
    "de": {"der", "die", "und", "das", "nicht", "ist"},
    "fr": {"le", "la", "les", "et", "est", "une"},
    "es": {"el", "los", "las", "es", "una", "que"},
    "zh": set(),  # detected by CJK codepoint ratio instead
}


def text_stats_batch(batch: pa.Table, *, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """(id, text) -> integer quality/count features, all vectorized."""
    text = batch.column(text_col)
    n_chars_m = pc.utf8_length(text)
    n_tokens = pc.count_substring_regex(text, _RE_WS_TOKEN)
    n_tokens_re = pc.count_substring_regex(text, _RE_TOKEN)
    n_punct = pc.count_substring_regex(text, _RE_PUNCT)
    lower = pc.utf8_lower(text)
    stop_alt = "|".join(STOPWORDS)
    n_stop = pc.count_substring_regex(lower, rf"\b(?:{stop_alt})\b")
    # quality flag in pure integer arithmetic (SQL-identical)
    ok = pc.and_(
        pc.greater_equal(n_tokens, 5),
        pc.greater_equal(pc.multiply(n_stop, 100), pc.multiply(n_tokens, 2)),
    )
    return pa.Table.from_arrays(
        [
            batch.column(id_col),
            pc.cast(n_chars_m, pa.int64()),
            pc.cast(n_tokens, pa.int64()),
            pc.cast(n_tokens_re, pa.int64()),
            pc.cast(n_punct, pa.int64()),
            pc.cast(n_stop, pa.int64()),
            pc.cast(ok, pa.int64()),
        ],
        names=[id_col, "n_chars_m", "n_tokens", "n_tokens_re", "n_punct",
               "n_stop", "quality_ok"],
    )


def text_stats(docs_ds, *, text_col: str = "text", id_col: str = "doc_id"):
    return docs_ds.map_batches(
        lambda b: text_stats_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )


_NON_ALNUM = re.compile(r"[^a-z0-9]")


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """md5 over the lowercase alnum-collapsed text (== DuckDB
    ``md5(regexp_replace(lower(text),'[^a-z0-9]','','g'))``)."""
    texts = pc.utf8_lower(batch.column(text_col)).to_pylist()
    sub = _NON_ALNUM.sub
    fps = [hashlib.md5(sub("", t or "").encode()).hexdigest() for t in texts]
    return pa.Table.from_arrays(
        [batch.column(id_col), pa.array(fps, pa.string())],
        names=[id_col, "fingerprint"],
    )


def fingerprints(docs_ds, *, text_col: str = "text", id_col: str = "doc_id"):
    return docs_ds.map_batches(
        lambda b: fingerprint_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )


def word_counts(docs_ds, *, text_col: str = "text", min_count: int = 1):
    """Corpus word frequencies (the reference's unique-word corpus stats,
    coname.py:221-244, generalized): explode lowercase whitespace tokens with
    per-batch partial counts, then one small groupby-Sum shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(batch.column(text_col)), r"\s+")
        flat = toks.combine_chunks().flatten() if isinstance(toks, pa.ChunkedArray) \
            else toks.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({
            "word": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    out = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n", alias_name="n"))
    if min_count > 1:
        out = out.filter(expr=f"n >= {min_count}")
    return out


def length_quantiles(docs_ds, *, q_bps: tuple[int, ...] = (2500, 5000, 7500,
                                                           9000, 9900),
                     text_col: str = "text"):
    """Exact corpus token-length percentiles without a global sort.

    Per-batch ``value_counts`` of the whitespace token count → one tiny
    ``groupby(v).Sum`` shuffle → the cumulative scan runs on the driver over
    DISTINCT length values only (bounded by the longest document, not the
    corpus — a 100-TB corpus still has < ~10⁶ distinct lengths).  The
    quantile rule is pure integer arithmetic shared with the SQL oracle:
    value(q) = min v with cum_count(v) * 10000 >= q_bp * N — i.e.
    ``percentile_disc`` semantics with no float position math.

    Returns one row per requested quantile: ``(q_bp, value)``.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(batch.column(text_col), _RE_WS_TOKEN),
            pa.int64())
        vc = n_tok.combine_chunks().value_counts() \
            if isinstance(n_tok, pa.ChunkedArray) else n_tok.value_counts()
        return pa.table({
            "v": vc.field("values"),
            "c": pc.cast(vc.field("counts"), pa.int64()),
        })

    hist = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("c", alias_name="c")) \
        .sort("v").to_pandas()
    cum = hist["c"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    vals = hist["v"].to_numpy()
    out_q, out_v = [], []
    for q in q_bps:
        idx = int((cum * 10000 >= q * n).argmax()) if n else 0
        out_q.append(q)
        out_v.append(int(vals[idx]) if n else 0)
    return pa.table({"q_bp": pa.array(out_q, pa.int64()),
                     "value": pa.array(out_v, pa.int64())})


def grouped_length_quantiles(docs_ds, *, key_col: str = "lang",
                             q_bps: tuple[int, ...] = (2500, 5000, 7500,
                                                       9000, 9900),
                             text_col: str = "text"):
    """Per-group exact token-length percentiles — the ``PARTITION BY``
    version of :func:`length_quantiles`, with the cumulative scan pushed
    OFF the driver: per-batch ``(key, length)`` partial counts → one
    Sum shuffle over (key, distinct-length) rows → per-key integer
    quantile rule inside hash-bucketed ``map_groups`` (a group is a
    BUCKET of keys' tiny histograms — ~256 Ray groups however many
    domains exist — never any documents).  Same percentile_disc law:
    ``value(q) = min v with cum(v)·10⁴ >= q_bp·N_key``.

    Output one row per (key, quantile): ``(key, q_bp, value)``.  Driver
    sees nothing; each key's scan runs over its own histogram of < 10⁶
    distinct lengths.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(batch.column(text_col), _RE_WS_TOKEN),
            pa.int64())
        g = pd.DataFrame({
            "k": batch.column(key_col).to_numpy(zero_copy_only=False),
            "v": n_tok.to_numpy(zero_copy_only=False),
        }).groupby(["k", "v"], sort=False).size().reset_index(name="c")
        return pa.table({
            "k": pa.array(g["k"].to_numpy(), pa.string()),
            "v": pa.array(g["v"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        })

    import hashlib

    def tag(t: pa.Table) -> pa.Table:
        import pandas as pd

        codes, uniq = pd.factorize(
            t.column("k").to_numpy(zero_copy_only=False))
        bk = np.fromiter(
            (int.from_bytes(hashlib.md5(str(u).encode()).digest()[:4],
                            "big") % 256 for u in uniq),
            dtype=np.int64, count=len(uniq))
        return t.append_column("_kb", pa.array(bk[codes], pa.int64()))

    # coarse-bucket the per-key scan (hash(key) % 256): every key's
    # histogram co-locates in one bucket while the shuffle stays ~256 Ray
    # groups even with 10^5 domains (the tiny-group pathology guard); the
    # loop below iterates keys INSIDE the bucket, each over its own tiny
    # histogram
    hist = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["k", "v"]).aggregate(Sum("c", alias_name="c")) \
        .map_batches(tag, batch_format="pyarrow")

    def per_bucket(df) -> pa.Table:
        out_k, out_q, out_v = [], [], []
        for k, sub in df.groupby("k", sort=True):
            sub = sub.sort_values("v")
            cum = sub["c"].to_numpy(np.int64).cumsum()
            n = int(cum[-1])
            vals = sub["v"].to_numpy(np.int64)
            for q in q_bps:
                out_k.append(k)
                out_q.append(q)
                out_v.append(int(vals[int((cum * 10000 >= q * n)
                                          .argmax())]))
        return pa.table({
            key_col: pa.array(out_k, pa.string()),
            "q_bp": pa.array(out_q, pa.int64()),
            "value": pa.array(out_v, pa.int64()),
        })

    return hist.groupby("_kb").map_groups(per_bucket,
                                          batch_format="pandas")


def doc_freq(docs_ds, *, text_col: str = "text", min_df: int = 1):
    """Document frequency per lowercase whitespace token: per-batch
    DISTINCT-(doc, token) partial counts (pandas drop_duplicates — C hash
    table), then one small ``groupby(word).Sum`` shuffle.  The partial is
    exact because a doc never straddles batches (row-wise transform)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        doc_idx, flat, offsets = _explode_tokens(batch, text_col)
        import pandas as pd

        df = pd.DataFrame({"d": doc_idx,
                           "word": flat.to_numpy(zero_copy_only=False)})
        df = df[df["word"] != ""].drop_duplicates()
        vc = df["word"].value_counts()
        return pa.table({"word": vc.index.to_numpy(),
                         "df": vc.to_numpy().astype("int64")})

    out = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("df", alias_name="df"))
    if min_df > 1:
        out = out.filter(expr=f"df >= {min_df}")
    return out


def tfidf_topk(docs_ds, *, k: int = 3, min_df: int = 1,
               text_col: str = "text", id_col: str = "doc_id",
               broadcast: bool = True):
    """Per-document top-``k`` keywords by an EXACT-integer tf·idf proxy:
    ``score_bp = tf * ((N_docs * 10000) // df)`` — monotone in tf·idf for a
    fixed corpus, floor-division reproducible in SQL, no float log.

    Two plans, equal outputs (tested):

    ``broadcast=True`` (default): the document-frequency table
    (:func:`doc_freq`) is computed distributed, then collected and
    broadcast via ``ray.put`` — the small-side-lookup pattern; ``min_df``
    bounds the broadcast (Zipf: the df>=2 vocabulary is a tiny fraction of
    token occurrences).  Scoring is then map-only: per-batch tf via one
    pandas groupby-size (C hash table), score lookup against the broadcast
    dict, per-doc top-k by ``(score_bp DESC, token ASC)`` — the same
    deterministic total order as the oracle's ``row_number()``.

    ``broadcast=False``: the open-vocabulary plan — NOTHING returns to the
    driver.  The per-batch tf partials and the df table meet in a coarse
    token-hash bucket join (the lean-minhash attach idiom,
    dedup._minhash_lean), then a second doc-hash bucket pass takes the
    per-doc top-k.  Two extra shuffles buy an unbounded vocabulary — the
    100-TB configuration when min_df can't be raised.

    Output: ``(doc_id, token, tf, df, score_bp)``, <= k rows per doc.
    """
    import pandas as pd

    import ray

    n_docs = docs_ds.count()

    def _tf_partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        doc_idx, flat, offsets = _explode_tokens(batch, text_col)
        df = pd.DataFrame({"d": doc_idx,
                           "token": flat.to_numpy(zero_copy_only=False)})
        df = df[df["token"] != ""]
        tf = df.groupby(["d", "token"], sort=False).size().reset_index(
            name="tf")
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[tf["d"].to_numpy()],
                             batch.column(id_col).type),
            "token": pa.array(tf["token"].to_numpy(), pa.string()),
            "tf": pa.array(tf["tf"].to_numpy().astype("int64"), pa.int64()),
        })

    if not broadcast:
        return _tfidf_topk_join(docs_ds, _tf_partial, k=k, min_df=min_df,
                                n_docs=n_docs, text_col=text_col,
                                id_col=id_col)

    dft = doc_freq(docs_ds, text_col=text_col, min_df=min_df).to_pandas()
    dfd = dict(zip(dft["word"], dft["df"].astype(int)))
    df_ref = ray.put(dfd)

    def score(batch: pa.Table) -> pa.Table:
        import numpy as np

        dmap = ray.get(df_ref)
        doc_idx, flat, offsets = _explode_tokens(batch, text_col)
        df = pd.DataFrame({"d": doc_idx,
                           "token": flat.to_numpy(zero_copy_only=False)})
        df = df[df["token"] != ""]
        tf = df.groupby(["d", "token"], sort=False).size().reset_index(
            name="tf")
        dfv = tf["token"].map(dmap).fillna(0).astype("int64")
        tf["df"] = dfv
        tf = tf[dfv > 0]
        tf["score_bp"] = tf["tf"].astype("int64") * (
            (n_docs * 10000) // tf["df"])
        tf = tf.sort_values(["d", "score_bp", "token"],
                            ascending=[True, False, True],
                            kind="mergesort")
        top = tf.groupby("d", sort=False).head(k)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[top["d"].to_numpy()],
                             batch.column(id_col).type),
            "token": pa.array(top["token"].to_numpy(), pa.string()),
            "tf": pa.array(top["tf"].to_numpy().astype("int64"), pa.int64()),
            "df": pa.array(top["df"].to_numpy(), pa.int64()),
            "score_bp": pa.array(top["score_bp"].to_numpy(), pa.int64()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow")


def _tfidf_topk_join(docs_ds, tf_partial, *, k: int, min_df: int,
                     n_docs: int, text_col: str, id_col: str,
                     n_buckets: int = 256):
    """Open-vocabulary tf·idf plan: one token-hash bucket shuffle, then a
    doc-bucket top-k — no driver-side vocabulary.  ``df`` is computed
    INSIDE the token bucket from the tf rows themselves: the (doc, token)
    rows are globally unique (a doc never straddles batches) and every row
    for a token hashes to the same bucket, so the in-bucket per-token row
    count IS the exact document frequency — no separate ``doc_freq`` scan,
    no union, one less corpus pass and one less shuffle.  Bucket keys are
    ``pd.util.hash_pandas_object`` (process-stable fixed-key siphash, the
    same choice as dedup._minhash_lean's ``_jbucket``)."""
    import numpy as np
    import pandas as pd

    def _tb(s: pd.Series) -> np.ndarray:
        return bucket_hash(s, n_buckets)

    tf_rows = docs_ds.map_batches(tf_partial, batch_format="pyarrow")

    def tag_tf(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
            "token": pa.array(df["token"].to_numpy(), pa.string()),
            "tf": pa.array(df["tf"].to_numpy(), pa.int64()),
            "_tb": pa.array(_tb(df["token"]), pa.int64()),
        })

    tagged = tf_rows.map_batches(tag_tf, batch_format="pandas")

    def attach_df(g: pd.DataFrame) -> pa.Table:
        # exact df: count of (globally unique) (doc, token) rows per token
        got = g["token"].map(g["token"].value_counts())
        ok = got >= min_df
        tfr = g[ok]
        dfv = got[ok].astype("int64")
        score = tfr["tf"].astype("int64").to_numpy() * (
            (n_docs * 10000) // dfv.to_numpy())
        ids = tfr[id_col].astype("int64")
        return pa.table({
            id_col: pa.array(ids.to_numpy(), pa.int64()),
            "token": pa.array(tfr["token"].to_numpy(), pa.string()),
            "tf": pa.array(tfr["tf"].to_numpy().astype("int64"), pa.int64()),
            "df": pa.array(dfv.to_numpy(), pa.int64()),
            "score_bp": pa.array(score.astype("int64"), pa.int64()),
            "_db": pa.array((ids.to_numpy() % n_buckets).astype("int64"),
                            pa.int64()),
        })

    scored = tagged.groupby("_tb").map_groups(attach_df,
                                              batch_format="pandas")

    def topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([id_col, "score_bp", "token"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.groupby(id_col, sort=False).head(k)
        return pa.table({
            id_col: pa.array(top[id_col].to_numpy().astype("int64"),
                             pa.int64()),
            "token": pa.array(top["token"].to_numpy(), pa.string()),
            "tf": pa.array(top["tf"].to_numpy().astype("int64"), pa.int64()),
            "df": pa.array(top["df"].to_numpy().astype("int64"), pa.int64()),
            "score_bp": pa.array(top["score_bp"].to_numpy().astype("int64"),
                                 pa.int64()),
        })

    return scored.groupby("_db").map_groups(topk, batch_format="pandas")


def inverted_index(docs_ds, *, cap: int = 32, min_df: int = 1,
                   text_col: str = "text", id_col: str = "doc_id",
                   n_buckets: int = 256):
    """Search-index build: capped posting lists per token, exploded as rows
    ``(token, df, pos, doc_id)`` — ``df`` is the TRUE document frequency,
    ``pos`` the 0-based position of ``doc_id`` among the token's first
    ``cap`` documents ordered by id.  The cap is never silent: ``df`` in
    every output row records how many documents the token really has, so
    a capped list is visible as ``df > cap``.

    Plan (one shuffle): per-batch partials emit, per token, (a) at most
    ``cap`` smallest doc ids (the global cap-smallest set is a subset of
    the union of per-batch cap-smallest sets) and (b) ONE df-partial row
    carrying the batch's distinct-doc count; a coarse token-hash bucket
    groupby merges both kinds — sum the df partials, rank and cap the
    postings.  Volume per token per batch is bounded by ``cap + 1`` rows,
    so hot tokens (stopwords) cannot blow up the shuffle.
    """
    import numpy as np
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        doc_idx, flat, offsets = _explode_tokens(batch, text_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"doc_id": np.asarray(ids)[doc_idx],
                           "token": flat.to_numpy(zero_copy_only=False)})
        df = df[df["token"] != ""].drop_duplicates()
        df = df.sort_values(["token", "doc_id"], kind="mergesort")
        g = df.groupby("token", sort=False)
        pdfc = g.size()                       # per-batch distinct-doc count
        capped = g.head(cap)
        h = bucket_hash(pd.Index(pdfc.index), n_buckets)
        hb_post = bucket_hash(capped["token"], n_buckets)
        return pa.table({
            "token": pa.array(
                np.concatenate([capped["token"].to_numpy(),
                                pdfc.index.to_numpy()]), pa.string()),
            "doc_id": pa.array(np.concatenate([
                capped["doc_id"].to_numpy().astype("int64"),
                np.full(len(pdfc), -1, np.int64)]), pa.int64()),
            "pdf": pa.array(np.concatenate([
                np.zeros(len(capped), np.int64),
                pdfc.to_numpy().astype("int64")]), pa.int64()),
            "_tb": pa.array(np.concatenate([hb_post, h]).astype("int64"),
                            pa.int64()),
        })

    def merge(g: pd.DataFrame) -> pa.Table:
        dfc = g.loc[g["doc_id"] < 0].groupby("token", sort=False)["pdf"] \
               .sum()
        posts = g.loc[g["doc_id"] >= 0, ["token", "doc_id"]] \
                 .sort_values(["token", "doc_id"], kind="mergesort")
        posts = posts.groupby("token", sort=False).head(cap)
        pos = posts.groupby("token", sort=False).cumcount()
        dfv = posts["token"].map(dfc).astype("int64")
        keep = dfv.to_numpy() >= min_df
        return pa.table({
            "token": pa.array(posts["token"].to_numpy()[keep], pa.string()),
            "df": pa.array(dfv.to_numpy()[keep], pa.int64()),
            "pos": pa.array(pos.to_numpy().astype("int64")[keep],
                            pa.int64()),
            "doc_id": pa.array(
                posts["doc_id"].to_numpy().astype("int64")[keep],
                pa.int64()),
        })

    return docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_tb").map_groups(merge, batch_format="pandas")


def repetition_stats(docs_ds, *, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Intra-document repetition signals — the Gopher-family quality
    filters (Rae et al. 2021, *Scaling Language Models*): per doc, in
    exact basis-point integers (SQL-identical, no floats):

    - ``distinct_ratio_bp``   = distinct_tokens·10⁴ // n_tokens
    - ``dup_bigram_frac_bp``  = (bigram instances whose bigram repeats
      within the doc)·10⁴ // max(n_tokens-1, 1)
    - ``top_bigram_frac_bp``  = most-frequent-bigram count·10⁴ //
      max(n_tokens-1, 1)
    - ``max_run``             = longest run of one repeated token

    Map-only (each doc is self-contained) so the stage streams at any
    scale; all counting is pandas C-hash groupbys and numpy segment math
    over the batch's concatenated token stream — the run lengths come from
    the vectorized last-run-start trick (``arange - maximum.accumulate``),
    not a Python scan.  Docs with zero tokens emit no row (== the SQL
    ``len(toks) > 0`` guard)."""
    import numpy as np
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        _di, flat_all, _off = _explode_tokens(batch, text_col)
        keep = pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False)
        off0 = _off.astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
        off = cum[off0]
        flat = flat_all.filter(pa.array(keep)).to_numpy(zero_copy_only=False)
        n = np.diff(off)
        nonempty = n > 0
        ids_all = batch.column(id_col).to_numpy(zero_copy_only=False)
        ids = np.asarray(ids_all, np.int64)[nonempty]
        n_ne = n[nonempty]
        m = len(flat)
        doc_idx = np.repeat(np.arange(len(n)), n)

        df = pd.DataFrame({"d": doc_idx, "w": flat})
        nd = df.drop_duplicates().groupby("d", sort=True).size()
        distinct = nd.reindex(np.flatnonzero(nonempty)).to_numpy() \
            .astype(np.int64)

        # positional bigrams: valid iff not straddling a doc boundary
        if m > 1:
            same_doc = doc_idx[:-1] == doc_idx[1:]
            bi = np.flatnonzero(same_doc)
            bdf = pd.DataFrame({
                "d": doc_idx[bi],
                "b": pd.Series(flat[bi]) + "\x1f" + pd.Series(flat[bi + 1]),
            })
            bc = bdf.groupby(["d", "b"], sort=False).size().reset_index(
                name="c")
            agg = bc.groupby("d", sort=True)["c"].agg(
                dupc=lambda s: int(s[s > 1].sum()), topc="max")
        else:
            agg = pd.DataFrame(columns=["dupc", "topc"])
        didx = np.flatnonzero(nonempty)
        dupc = agg["dupc"].reindex(didx).fillna(0).to_numpy() \
            .astype(np.int64)
        topc = agg["topc"].reindex(didx).fillna(0).to_numpy() \
            .astype(np.int64)

        # longest same-token run, vectorized: a position starts a new run
        # iff it's a doc start or differs from its predecessor
        if m:
            starts = np.ones(m, bool)
            starts[1:] = (flat[1:] != flat[:-1]) | (doc_idx[1:]
                                                    != doc_idx[:-1])
            start_idx = np.maximum.accumulate(
                np.where(starts, np.arange(m), 0))
            run_len = np.arange(m) - start_idx + 1
            max_run = np.maximum.reduceat(run_len, off[:-1][nonempty]) \
                if nonempty.any() else np.empty(0, np.int64)
        else:
            max_run = np.empty(0, np.int64)

        nb = np.maximum(n_ne - 1, 1)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_ne, pa.int64()),
            "distinct_ratio_bp": pa.array(distinct * 10000 // n_ne,
                                          pa.int64()),
            "dup_bigram_frac_bp": pa.array(dupc * 10000 // nb, pa.int64()),
            "top_bigram_frac_bp": pa.array(topc * 10000 // nb, pa.int64()),
            "max_run": pa.array(max_run.astype(np.int64), pa.int64()),
        })

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def line_filter(docs_ds, *, min_words: int = 3, text_col: str = "text",
                id_col: str = "doc_id", emit_text: bool = False):
    """C4-style line-level boilerplate filter (Raffel et al. 2020, §2.2):
    split each document into lines, keep a line iff it has at least
    ``min_words`` words AND ends in terminal punctuation (``.!?"``) AND
    contains neither ``javascript`` nor ``{`` (boilerplate / code markers);
    a document survives iff at least one line AND at least half its lines
    are kept.  Per doc: ``(n_lines, n_kept, kept_chars, keep)`` — all
    integers so the DuckDB oracle hash-matches exactly; ``emit_text=True``
    additionally rebuilds the filtered document (kept lines re-joined with
    ``\\n``, vectorized ``pc.binary_join`` — not on the oracled surface).

    Map-only (each doc is self-contained): streams at any scale.  The line
    explode is pure Arrow (``split_pattern`` on the literal newline — ==
    DuckDB ``string_split(t, chr(10))``); predicates are RE2 kernels shared
    with the oracle (``[^ ]+`` word runs, ``[.!?"]$`` terminal punct —
    RE2 ``$`` is end-of-text on both sides); per-doc sums are
    cumsum-at-offsets (safe for any segment shape).  NULL text coalesces to
    ``''`` on both sides (1 empty line, dropped).
    """
    def fn(batch: pa.Table) -> pa.Table:
        return _line_filter_batch(batch, min_words=min_words,
                                  text_col=text_col, id_col=id_col,
                                  emit_text=emit_text)

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def _line_filter_batch(batch: pa.Table, *, min_words: int, text_col: str,
                       id_col: str, emit_text: bool = False) -> pa.Table:
    """line_filter's per-batch kernel, module-level so :func:`quality_gate`
    can fuse it with the Gopher kernel in a single map pass."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.coalesce(text, pa.scalar("", pa.string()))
    lines = pc.split_pattern(text, pattern="\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    flat = lines.flatten()
    off = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)

    n_words = pc.count_substring_regex(flat, r"[^ ]+").to_numpy(
        zero_copy_only=False)
    terminal = pc.match_substring_regex(flat, r'[.!?"]$').to_numpy(
        zero_copy_only=False)
    bad = pc.or_(
        pc.match_substring(flat, "javascript"),
        pc.match_substring(flat, "{"),
    ).to_numpy(zero_copy_only=False)
    keep_line = (n_words >= min_words) & terminal & ~bad
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
        .astype(np.int64)

    def segsum(x: np.ndarray) -> np.ndarray:
        c = np.concatenate([[0], np.cumsum(x, dtype=np.int64)])
        return c[off[1:]] - c[off[:-1]]

    n_lines = np.diff(off)
    n_kept = segsum(keep_line.astype(np.int64))
    kept_chars = segsum(np.where(keep_line, lens, 0))
    doc_keep = (n_kept >= 1) & (n_kept * 100 >= n_lines * 50)

    cols: dict = {
        id_col: batch.column(id_col),
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_kept": pa.array(n_kept, pa.int64()),
        "kept_chars": pa.array(kept_chars, pa.int64()),
        "keep": pa.array(doc_keep.astype(np.int64), pa.int64()),
    }
    if emit_text:
        kcum = np.concatenate(
            [[0], np.cumsum(keep_line, dtype=np.int64)])
        kept_list = pa.LargeListArray.from_arrays(
            pa.array(kcum[off], pa.int64()),
            flat.filter(pa.array(keep_line)))
        cols["clean_text"] = pc.binary_join(kept_list, "\n")
    return pa.table(cols)


# Gopher repetition-free quality rules (Rae et al. 2021, Appendix A) —
# shared with the SQL oracle (__ray_entry__.oracle_sql): keep in sync.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_RE_GOPHER_SYMBOL = r"#|\.\.\."        # hash marks + literal ellipses
_RE_ALPHA_WORD = r"\S*[A-Za-z]\S*"     # \S+ run containing >=1 ASCII letter
_RE_BULLET_LINE = r"^[-•*]"
_RE_ELLIPSIS_LINE = r"(\.\.\.|…)$"


def gopher_rules(docs_ds, *, text_col: str = "text", id_col: str = "doc_id",
                 min_words: int = 50, max_words: int = 100_000):
    """Gopher document-quality rules (Rae et al. 2021, Appendix A), the
    standard web-corpus quality gate: per doc, keep iff
      * ``min_words <= n_words <= max_words`` (whitespace ``\\S+`` runs),
      * mean word length in [3, 10] — as the integer cross-multiplication
        ``3·n_words <= nonws_chars <= 10·n_words`` (``nonws_chars`` = total
        non-whitespace codepoints = the exact sum of word lengths),
      * symbol-to-word ratio <= 0.1 (``#`` + literal ``...`` occurrences),
      * <= 90% of lines start with a bullet (``-``, ``•``, ``*``),
      * <= 30% of lines end with an ellipsis (``...`` or ``…``),
      * >= 80% of words contain an ASCII letter,
      * >= 2 distinct Gopher stop words present (``\\b``-bounded).

    Everything is integers (counts + cross-multiplied thresholds — no float
    ratios), so the DuckDB oracle hash-matches exactly; every predicate is
    an RE2 kernel evaluated by the same engine on both sides (pyarrow and
    DuckDB both embed RE2 — leftmost-first semantics agree by construction,
    which matters for the greedy ``\\S*[A-Za-z]\\S*`` alpha-word count).
    Map-only: each document is self-contained, so this streams at any
    scale with zero shuffles.  NULL text coalesces to ``''`` (one empty
    line; fails ``min_words``).
    """
    def fn(batch: pa.Table) -> pa.Table:
        return _gopher_batch(batch, text_col=text_col, id_col=id_col,
                             min_words=min_words, max_words=max_words)

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def _gopher_batch(batch: pa.Table, *, text_col: str, id_col: str,
                  min_words: int, max_words: int) -> pa.Table:
    """gopher_rules' per-batch kernel, module-level so
    :func:`quality_gate` can fuse it with the C4 line kernel."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.coalesce(text, pa.scalar("", pa.string()))

    n_words = pc.count_substring_regex(text, _RE_WS_TOKEN).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_cp = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_ws = pc.count_substring_regex(text, r"\s").to_numpy(
        zero_copy_only=False).astype(np.int64)
    nonws_chars = n_cp - n_ws
    n_sym = pc.count_substring_regex(text, _RE_GOPHER_SYMBOL).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_alpha_words = pc.count_substring_regex(text, _RE_ALPHA_WORD) \
        .to_numpy(zero_copy_only=False).astype(np.int64)

    lower = pc.utf8_lower(text)
    n_stop_kinds = np.zeros(len(batch), np.int64)
    for w in GOPHER_STOPWORDS:
        n_stop_kinds += pc.match_substring_regex(
            lower, rf"\b{w}\b").to_numpy(zero_copy_only=False)

    lines = pc.split_pattern(text, pattern="\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    flat = lines.flatten()
    off = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    bullet = pc.match_substring_regex(flat, _RE_BULLET_LINE).to_numpy(
        zero_copy_only=False).astype(np.int64)
    ellipsis = pc.match_substring_regex(flat, _RE_ELLIPSIS_LINE) \
        .to_numpy(zero_copy_only=False).astype(np.int64)

    def segsum(x: np.ndarray) -> np.ndarray:
        c = np.concatenate([[0], np.cumsum(x, dtype=np.int64)])
        return c[off[1:]] - c[off[:-1]]

    n_lines = np.diff(off)
    n_bullet = segsum(bullet)
    n_ellipsis = segsum(ellipsis)

    keep = (
        (n_words >= min_words) & (n_words <= max_words)
        & (3 * n_words <= nonws_chars) & (nonws_chars <= 10 * n_words)
        & (n_sym * 10 <= n_words)
        & (n_bullet * 10 <= n_lines * 9)
        & (n_ellipsis * 10 <= n_lines * 3)
        & (n_alpha_words * 10 >= n_words * 8)
        & (n_stop_kinds >= 2)
    )
    return pa.table({
        id_col: batch.column(id_col),
        "n_words": pa.array(n_words, pa.int64()),
        "nonws_chars": pa.array(nonws_chars, pa.int64()),
        "n_sym": pa.array(n_sym, pa.int64()),
        "n_alpha_words": pa.array(n_alpha_words, pa.int64()),
        "n_stop_kinds": pa.array(n_stop_kinds, pa.int64()),
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_bullet": pa.array(n_bullet, pa.int64()),
        "n_ellipsis": pa.array(n_ellipsis, pa.int64()),
        "keep": pa.array(keep.astype(np.int64), pa.int64()),
    })



def bpe_pair_counts(docs_ds, *, min_count: int = 1,
                    text_col: str = "text"):
    """BPE tokenizer-training statistics (Sennrich et al. 2016): the
    adjacent-symbol pair counts of the FIRST merge iteration — each
    vocabulary word decomposed into characters, every adjacent char pair
    weighted by the word's corpus frequency.  Output ``(left_sym,
    right_sym, pair_count)`` with ``pair_count >= min_count``; the argmax
    row is the first merge a BPE trainer would apply (subsequent
    iterations re-run this over the re-segmented vocab — the trainer's
    loop is driver-side over a table that only shrinks).

    Scale shape: this runs over the WORD-FREQUENCY table (the output of
    :func:`word_counts` — Zipf-bounded distinct words, not the corpus),
    and the per-batch partial collapses to ≤ |Σ|² symbol-pair rows before
    the one tiny Sum shuffle.  The per-distinct-word char loop is the
    same vocabulary-bounded Python the md5 kernels use (it never touches
    corpus rows).
    """
    from ray.data.aggregate import Sum

    wc = word_counts(docs_ds, text_col=text_col)

    def partial(batch: pa.Table) -> pa.Table:
        words = batch.column("word").to_pylist()
        ns = batch.column("n").to_numpy(zero_copy_only=False)
        counter: dict = {}
        get = counter.get
        for w, n in zip(words, ns):
            n = int(n)
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                counter[p] = get(p, 0) + n
        if not counter:
            return pa.table({"left_sym": pa.array([], pa.string()),
                             "right_sym": pa.array([], pa.string()),
                             "pair_count": pa.array([], pa.int64())})
        keys = list(counter.keys())
        return pa.table({
            "left_sym": pa.array([k[0] for k in keys], pa.string()),
            "right_sym": pa.array([k[1] for k in keys], pa.string()),
            "pair_count": pa.array(list(counter.values()), pa.int64()),
        })

    out = wc.map_batches(partial, batch_format="pyarrow") \
        .groupby(["left_sym", "right_sym"]) \
        .aggregate(Sum("pair_count", alias_name="pair_count"))
    if min_count > 1:
        out = out.filter(expr=f"pair_count >= {min_count}")
    return out


def gopher_repetition(docs_ds, *, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Gopher repetition rules (Rae et al. 2021, Appendix A) — the
    line/paragraph/n-gram half that :func:`repetition_stats` does not
    cover.  Per document, exact basis-point integers (SQL-identical):

    - ``dup_line_frac_bp`` / ``dup_line_char_frac_bp`` — fraction of line
      instances (and of line characters) whose line value occurs ≥ 2×
      within the doc; lines are literal ``\\n`` splits.
    - ``dup_para_frac_bp`` / ``dup_para_char_frac_bp`` — same over
      paragraphs (literal ``\\n\\n`` splits, non-overlapping left-to-right
      — identical to DuckDB ``string_split``).
    - ``top{2,3,4}gram_char_frac_bp`` — characters covered by the most
      frequent word n-gram: ``max_count · chars(gram)`` over the grams at
      max count (char-richest gram breaks count ties — deterministic on
      both sides, unlike "the" most frequent), over total token chars.
      Overlapping instances each count, so a doc that is one phrase
      repeated can exceed 10⁴ bp — fine for thresholding (cutoffs are
      ~2000 bp), and the oracle computes the identical value.
    - ``dup5gram_char_frac_bp`` — characters inside duplicated 5-grams,
      counting every instance (the common implementation shortcut; the
      paper counts overlapping chars once — interval union — which is not
      SQL-expressible; the sum is capped at total chars).

    ``chars(gram)`` = sum of its token lengths = ``length(w1⊕…⊕wn with
    chr(31) seps) − (n−1)`` — the identity the oracle uses.  Tokens are
    raw ``\\S+`` runs (no lowercasing: duplicate detection is
    case-sensitive like the paper's).  Map-only — each doc is
    self-contained, so the stage streams at any scale with zero shuffles.
    NULL text coalesces to ``''`` (1 empty line/para, 0 tokens).
    """
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.coalesce(text, pa.scalar("", pa.string()))
        R = len(batch)

        def seg_dup_stats(sep: str):
            """(n_segs, dup_instances, dup_chars, total_chars) per row."""
            parts = pc.split_pattern(text, pattern=sep)
            if isinstance(parts, pa.ChunkedArray):
                parts = parts.combine_chunks()
            flat = parts.flatten()
            off = parts.offsets.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            d = np.repeat(np.arange(R), np.diff(off))
            ln = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            df = pd.DataFrame({
                "d": d, "v": flat.to_numpy(zero_copy_only=False), "l": ln})
            g = df.groupby(["d", "v"], sort=False).agg(
                c=("l", "size"), l=("l", "first")).reset_index()
            g["inst"] = np.where(g["c"] > 1, g["c"], 0)
            g["instc"] = g["inst"] * g["l"]
            g["totc"] = g["c"] * g["l"]
            per = g.groupby("d", sort=True)[["inst", "instc", "totc"]].sum()
            per = per.reindex(np.arange(R)).fillna(0).astype(np.int64)
            return (np.diff(off), per["inst"].to_numpy(),
                    per["instc"].to_numpy(), per["totc"].to_numpy())

        n_lines, dupl, duplc, totlc = seg_dup_stats("\n")
        n_paras, dupp, duppc, totpc = seg_dup_stats("\n\n")

        # ---- word n-grams over raw \S+ tokens (case-sensitive) ----
        toks = pc.split_pattern_regex(text, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat_all = toks.flatten()
        off0 = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False)
        cum = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
        off = cum[off0]
        flat = flat_all.filter(pa.array(keep))
        codes, _ = pd.factorize(flat.to_numpy(zero_copy_only=False))
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = len(codes)
        n_tok = np.diff(off)
        doc_idx = np.repeat(np.arange(R), n_tok)
        lcs = np.concatenate([[0], np.cumsum(lens, dtype=np.int64)])
        tot = lcs[off[1:]] - lcs[off[:-1]]
        tot1 = np.maximum(tot, 1)

        def ngram_tables(n: int):
            """Per-doc (top_score, dup_chars) for word n-grams of size n."""
            if m < n:
                z = np.zeros(R, np.int64)
                return z, z
            valid = doc_idx[: m - n + 1] == doc_idx[n - 1:]
            i = np.flatnonzero(valid)
            cols = {"d": doc_idx[i]}
            for j in range(n):
                cols[f"k{j}"] = codes[i + j]
            chars = lcs[i + n] - lcs[i]
            gdf = pd.DataFrame(cols)
            gdf["ch"] = chars
            g = gdf.groupby(["d"] + [f"k{j}" for j in range(n)],
                            sort=False).agg(
                cnt=("ch", "size"), ch=("ch", "first")).reset_index()
            mc = g.groupby("d", sort=False)["cnt"].transform("max")
            sel = g[g["cnt"] == mc]
            top = sel.groupby("d", sort=True).agg(
                mc=("cnt", "first"), mch=("ch", "max"))
            top_score = (top["mc"] * top["mch"]).reindex(
                np.arange(R)).fillna(0).to_numpy().astype(np.int64)
            dup = g[g["cnt"] > 1]
            dupc = (dup["cnt"] * dup["ch"]).groupby(
                dup["d"]).sum().reindex(np.arange(R)).fillna(0) \
                .to_numpy().astype(np.int64)
            return top_score, dupc

        top2, _ = ngram_tables(2)
        top3, _ = ngram_tables(3)
        top4, _ = ngram_tables(4)
        _, dup5 = ngram_tables(5)

        return pa.table({
            id_col: batch.column(id_col),
            "n_lines": pa.array(n_lines, pa.int64()),
            "dup_line_frac_bp": pa.array(dupl * 10000 // n_lines,
                                         pa.int64()),
            "dup_line_char_frac_bp": pa.array(
                duplc * 10000 // np.maximum(totlc, 1), pa.int64()),
            "n_paras": pa.array(n_paras, pa.int64()),
            "dup_para_frac_bp": pa.array(dupp * 10000 // n_paras,
                                         pa.int64()),
            "dup_para_char_frac_bp": pa.array(
                duppc * 10000 // np.maximum(totpc, 1), pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "top2gram_char_frac_bp": pa.array(top2 * 10000 // tot1,
                                              pa.int64()),
            "top3gram_char_frac_bp": pa.array(top3 * 10000 // tot1,
                                              pa.int64()),
            "top4gram_char_frac_bp": pa.array(top4 * 10000 // tot1,
                                              pa.int64()),
            "dup5gram_char_frac_bp": pa.array(
                np.minimum(dup5, tot) * 10000 // tot1, pa.int64()),
        })

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def bigram_counts(docs_ds, *, text_col: str = "text"):
    """Corpus counts of adjacent lowercase word bigrams — vectorized: the
    token list array is flattened once and pairs are formed positionally
    (a pair is valid iff both tokens are non-empty and belong to the same
    document, computed from the list offsets), then ``value_counts`` on the
    joined pair string gives the per-batch partial; one groupby-Sum shuffle
    combines.  The join separator (unit separator \\x1f) cannot appear in
    whitespace-split tokens."""
    from ray.data.aggregate import Sum

    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        _di, flat, offsets = _explode_tokens(batch, text_col)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        m = len(flat)
        valid = np.zeros(max(m - 1, 0), bool)
        if m > 1:
            valid[:] = nonempty[:-1] & nonempty[1:]
            # kill pairs straddling a document boundary
            ends = offsets[1:-1] - 1
            valid[ends[(ends >= 0) & (ends < m - 1)]] = False
        idx = np.flatnonzero(valid)
        w1 = flat.take(pa.array(idx, pa.int64()))
        w2 = flat.take(pa.array(idx + 1, pa.int64()))
        joined = pc.binary_join_element_wise(w1, w2, "\x1f")
        vc = joined.value_counts()
        pair = vc.field("values")
        parts = pc.split_pattern(pair, "\x1f")
        return pa.table({
            "w1": pc.list_element(parts, 0),
            "w2": pc.list_element(parts, 1),
            "c_xy": pc.cast(vc.field("counts"), pa.int64()),
        })

    return docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["w1", "w2"]).aggregate(Sum("c_xy", alias_name="c_xy"))


def skipgram_counts(docs_ds, *, window: int = 3, min_count: int = 5,
                    text_col: str = "text"):
    """Windowed co-occurrence (skip-gram) counts — the word2vec/GloVe
    preprocessing table: for every ordered token pair ``(t[i], t[i+d])``
    with ``1 <= d <= window`` inside one document, count occurrences and
    keep pairs with corpus count >= ``min_count``.

    Law (shared with the SQL oracle): tokens are the lowercase ``\\S+``
    matches in document order (never empty); pairs keep their direction
    (left context, right context) and sum over all distances — the
    standard asymmetric-window co-occurrence law.

    Scale shape: all ``window`` distance lags are formed positionally on
    the SAME flattened token array per batch (one boolean doc-boundary
    mask per lag, no per-row loop), partial-counted with ``value_counts``
    so only (pair, count) rows enter the single groupby-Sum shuffle; the
    ``min_count`` filter runs after the Sum (a global-count predicate).
    Output volume is O(filtered co-occurrence vocabulary), never O(corpus
    positions).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        doc_idx, flat, _offsets = _explode_tokens(batch, text_col)
        # drop '' FIRST (split artifacts at string edges) so distance d is
        # measured over the real token sequence, matching the oracle's
        # regexp_extract_all('\S+') list indices
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(keep)
        flat = flat.take(pa.array(idx, pa.int64()))
        di = doc_idx[idx]
        m = len(di)
        joined_lags = []
        for d in range(1, window + 1):
            if m <= d:
                break
            j = np.flatnonzero(di[:-d] == di[d:])
            if not len(j):
                continue
            w1 = flat.take(pa.array(j, pa.int64()))
            w2 = flat.take(pa.array(j + d, pa.int64()))
            joined_lags.append(
                pc.binary_join_element_wise(w1, w2, "\x1f"))
        if not joined_lags:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c_sg": pa.array([], pa.int64())})
        vc = pa.chunked_array(joined_lags).value_counts()
        parts = pc.split_pattern(vc.field("values"), "\x1f")
        return pa.table({
            "w1": pc.list_element(parts, 0),
            "w2": pc.list_element(parts, 1),
            "c_sg": pc.cast(vc.field("counts"), pa.int64()),
        })

    return docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["w1", "w2"]).aggregate(Sum("c_sg", alias_name="c_sg")) \
        .filter(expr=f"c_sg >= {min_count}")


def pmi_bigrams(docs_ds, *, k: int = 20, min_count: int = 5,
                text_col: str = "text", broadcast: bool | None = None,
                broadcast_threshold: int = 2_000_000):
    """Top-``k`` collocations by a PMI-proportional score in EXACT integer
    arithmetic: ``score_ppm = (c_xy² · 10⁶) // (c_x · c_y)`` (monotone in
    pointwise mutual information for a fixed corpus size; the 10⁶ scale
    keeps ties honest and the // floor is reproducible in SQL HUGEINT
    math — no float log anywhere, so the oracle hash matches exactly).

    Two plans, equal outputs (tested):

    - ``broadcast=True``: word counts above ``min_count`` are collected to
      a driver dict and ``ray.put`` once — fine while the filtered
      vocabulary is genuinely small (an English corpus, a high
      ``min_count``).
    - ``broadcast=False``: the open-vocabulary plan — NOTHING returns to
      the driver.  Bigram partials meet the word-count table in a coarse
      w1-hash bucket join (attach ``c_x``), then a w2-hash bucket join
      (attach ``c_y``, score, local top-k per bucket), then one tiny merge
      — the same two-sided-bucket idiom as ``tfidf_topk(broadcast=False)``
      / ``dedup._minhash_lean``.  At 100 TB a count>=5 web vocabulary is
      10⁸+ words; this plan is the scale configuration.

    ``broadcast=None`` (default) auto-gates: broadcast only while the
    filtered vocabulary stays under ``broadcast_threshold`` rows.

    Top-k = per-block local top-k then one tiny merge, ordered by
    (score desc, c_xy desc, w1, w2) — a deterministic total order, so the
    result SET is stable under any partitioning.
    """
    import pandas as pd

    import ray

    # materialize ONCE: wc_ds is consumed 2-3x below (auto-gate count, the
    # two join-plan unions, or the broadcast collect) and Ray datasets are
    # lazy — without this the full word_counts scan+shuffle would re-execute
    # per consumer.  The pinned blocks are O(filtered vocabulary), not
    # O(corpus), and spill to the object store at scale.
    wc_ds = word_counts(docs_ds, text_col=text_col,
                        min_count=min_count).materialize()
    if broadcast is None:
        broadcast = wc_ds.count() <= broadcast_threshold
    if not broadcast:
        return _pmi_bigrams_join(docs_ds, wc_ds, k=k, min_count=min_count,
                                 text_col=text_col)

    wc = {w: int(c) for w, c in wc_ds.to_pandas().itertuples(index=False)}
    wc_ref = ray.put(wc)

    bc = bigram_counts(docs_ds, text_col=text_col) \
        .filter(expr=f"c_xy >= {min_count}")

    def score(batch: pa.Table) -> pa.Table:
        # stateless task (not an actor pool): the broadcast dict is one
        # object-store get per task — cheaper than actor spin-up for
        # this small post-filter stage
        wcd = ray.get(wc_ref)
        w1 = batch.column("w1").to_pylist()
        w2 = batch.column("w2").to_pylist()
        cxy = batch.column("c_xy").to_pylist()
        cx = [wcd.get(w, 0) for w in w1]
        cy = [wcd.get(w, 0) for w in w2]
        score = [(n * n * 1_000_000) // (a * b) if a and b else 0
                 for n, a, b in zip(cxy, cx, cy)]
        t = pa.table({
            "w1": batch.column("w1"), "w2": batch.column("w2"),
            "c_xy": batch.column("c_xy"),
            "c_x": pa.array(cx, pa.int64()),
            "c_y": pa.array(cy, pa.int64()),
            "score_ppm": pa.array(score, pa.int64()),
        })
        # local top-k: only k rows per block survive to the merge
        df = t.to_pandas().sort_values(
            ["score_ppm", "c_xy", "w1", "w2"],
            ascending=[False, False, True, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["score_ppm", "c_xy", "w1", "w2"],
                            ascending=[False, False, True, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return bc.map_batches(score, batch_format="pyarrow") \
        .repartition(1).map_batches(merge, batch_format="pandas")


def _pmi_bigrams_join(docs_ds, wc_ds, *, k: int, min_count: int,
                      text_col: str, n_buckets: int = 256):
    """Open-vocabulary PMI plan: two coarse bucket joins (hash(w1) then
    hash(w2)) attach the word counts to the ``min_count``-filtered bigram
    table with no driver-side vocabulary.  Bucket keys are
    ``pd.util.hash_pandas_object`` (process-stable fixed-key siphash — the
    same choice as ``_tfidf_topk_join``).  Scores use Python ints (the
    broadcast plan's arbitrary-precision semantics — ``c_xy²·10⁶``
    overflows int64 once c_xy > ~3M, exactly the regime this plan is for).
    The second bucket pass also takes the per-bucket local top-k, so at
    most ``k · n_buckets`` rows reach the final single-block merge."""
    import numpy as np
    import pandas as pd

    def _wb(s: pd.Series) -> np.ndarray:
        return bucket_hash(s, n_buckets)

    bc = bigram_counts(docs_ds, text_col=text_col) \
        .filter(expr=f"c_xy >= {min_count}")

    def _str(s) -> pa.Array:
        return pa.array(np.asarray(s, dtype=object), pa.string())

    def _i64(s, *, nullable: bool = False) -> pa.Array:
        if nullable:
            return pa.array(pd.array(s, dtype="Int64"), pa.int64())
        return pa.array(np.asarray(s).astype("int64"), pa.int64())

    def _tag_bigrams(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "w1": _str(df["w1"]), "w2": _str(df["w2"]),
            "c_xy": _i64(df["c_xy"]),
            "c_x": pa.nulls(len(df), pa.int64()),
            "cnt": pa.nulls(len(df), pa.int64()),
            "_b": _i64(_wb(df["w1"])),
        })

    def _tag_words(df: pd.DataFrame) -> pa.Table:
        # word rows (c_xy null) become the bucket-local count index; they
        # carry the word in BOTH w1 and w2 so the same row serves either
        # join side, and bucket on the word itself
        n = len(df)
        return pa.table({
            "w1": _str(df["word"]), "w2": _str(df["word"]),
            "c_xy": pa.nulls(n, pa.int64()),
            "c_x": pa.nulls(n, pa.int64()),
            "cnt": _i64(df["n"]),
            "_b": _i64(_wb(df["word"])),
        })

    def _attach(g: pd.DataFrame, col: str, out_cx) -> pd.DataFrame:
        # missing words count 0, mirroring the broadcast plan's
        # wcd.get(w, 0) (dead in practice: c_x >= c_xy >= min_count)
        dic = g.loc[g["c_xy"].isna()].drop_duplicates("w1") \
               .set_index("w1")["cnt"]
        big = g.loc[g["c_xy"].notna()].copy()
        big[out_cx] = big[col].map(dic).fillna(0).astype("int64")
        return big

    # pass 1: attach c_x on hash(w1) buckets.  union sums block counts —
    # repartition before the groupby sort (see CLAUDE.md perf lessons)
    def attach_cx(g: pd.DataFrame) -> pa.Table:
        big = _attach(g, "w1", "c_x")
        return pa.table({
            "w1": _str(big["w1"]), "w2": _str(big["w2"]),
            "c_xy": _i64(big["c_xy"]), "c_x": _i64(big["c_x"]),
            "cnt": pa.nulls(len(big), pa.int64()),
            "_b": _i64(_wb(big["w2"])),   # re-bucket for pass 2
        })

    withx = bc.map_batches(_tag_bigrams, batch_format="pandas") \
        .union(wc_ds.map_batches(_tag_words, batch_format="pandas")) \
        .repartition(32) \
        .groupby("_b").map_groups(attach_cx, batch_format="pandas")

    # pass 2: attach c_y on hash(w2) buckets, score, local top-k per bucket
    def score_topk(g: pd.DataFrame) -> pa.Table:
        t = _attach(g, "w2", "c_y")
        score = [(int(n) * int(n) * 1_000_000) // (int(a) * int(b))
                 if a and b else 0
                 for n, a, b in zip(t["c_xy"], t["c_x"], t["c_y"])]
        t = t.assign(score_ppm=pd.array(score, dtype="int64"))
        t = t.sort_values(["score_ppm", "c_xy", "w1", "w2"],
                          ascending=[False, False, True, True]).head(k)
        return pa.table({
            "w1": _str(t["w1"]), "w2": _str(t["w2"]),
            "c_xy": _i64(t["c_xy"]), "c_x": _i64(t["c_x"]),
            "c_y": _i64(t["c_y"]), "score_ppm": _i64(t["score_ppm"]),
        })

    def merge(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["score_ppm", "c_xy", "w1", "w2"],
                            ascending=[False, False, True, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return withx \
        .union(wc_ds.map_batches(_tag_words, batch_format="pandas")) \
        .repartition(32) \
        .groupby("_b").map_groups(score_topk, batch_format="pandas") \
        .repartition(1).map_batches(merge, batch_format="pandas")


class RollingFingerprint:
    """Winnowing-style document fingerprint: k-gram hashes, keep the
    minimum hash in each sliding window of ``w`` — robust to local edits.

    Stateless math, but expressed as a callable class so the compiled regex
    and parameters live once per actor.  The k-gram hash is the low 64 bits
    of md5 over the space-joined k-gram (== DuckDB ``md5_number_lower``, so
    the SQL oracle reproduces ``fp_len`` exactly) — a process-stable digest;
    the previous Python ``hash(tuple(...))`` was PYTHONHASHSEED-randomized,
    so fingerprints from different Ray workers were not comparable.
    """

    def __init__(self, k: int = 5, w: int = 4, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.k, self.w = k, w
        self.text_col, self.id_col = text_col, id_col
        self.token_re = re.compile(r"\S+")

    def _doc_fp(self, text: str) -> list[int]:
        toks = self.token_re.findall(text.lower())
        if len(toks) < self.k:
            return []
        md5 = hashlib.md5
        hs = [
            int.from_bytes(
                md5(" ".join(toks[i:i + self.k]).encode()).digest()[8:16],
                "little",
            ) & 0x7FFFFFFFFFFFFFFF
            for i in range(len(toks) - self.k + 1)
        ]
        out, prev = [], None
        for i in range(max(1, len(hs) - self.w + 1)):
            m = min(hs[i:i + self.w])
            if m != prev:
                out.append(m)
                prev = m
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        fps = [self._doc_fp(t or "") for t in texts]
        return pa.Table.from_arrays(
            [batch.column(self.id_col),
             pa.array(fps, pa.list_(pa.int64())),
             pa.array([len(f) for f in fps], pa.int64())],
            names=[self.id_col, "winnow_fp", "fp_len"],
        )


class LangId:
    """Heuristic language ID: CJK codepoint ratio, else stopword-marker votes
    per language (n-gram heuristic).  Compiled once per actor."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.word_re = re.compile(r"[a-zà-ÿ]+")

    @staticmethod
    def _cjk_ratio(t: str) -> float:
        if not t:
            return 0.0
        n = sum(1 for c in t if "一" <= c <= "鿿")
        return n / len(t)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        preds, confs = [], []
        for t in texts:
            t = (t or "").lower()
            if self._cjk_ratio(t) > 0.2:
                preds.append("zh")
                confs.append(1.0)
                continue
            words = set(self.word_re.findall(t))
            scores = {
                lang: len(words & markers)
                for lang, markers in _LANG_MARKERS.items() if markers
            }
            best = max(scores, key=lambda l: (scores[l], l))
            total = sum(scores.values())
            preds.append(best if scores[best] > 0 else "unknown")
            confs.append(scores[best] / total if total else 0.0)
        return pa.Table.from_arrays(
            [batch.column(self.id_col),
             pa.array(preds, pa.string()),
             pa.array(confs, pa.float32())],
            names=[self.id_col, "lang_pred", "lang_conf"],
        )


def lang_id(docs_ds, *, concurrency=(1, 4), **cols):
    return docs_ds.map_batches(
        LangId, fn_constructor_kwargs=cols, batch_format="pyarrow",
        concurrency=concurrency,
    )


def unigram_bits(docs_ds, *, vocab: int = 2048, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Corpus-LM quality score (the CCNet-style perplexity filter,
    integer-exact): pass 1 builds a top-``vocab`` unigram model of the
    corpus itself; pass 2 charges every token
    ``bits = (1 + N_tokens // (c_w + 1)).bit_length()`` (``c_w`` = model
    count, 0 for out-of-vocabulary — add-one smoothing; bit_length is
    floor-log2+1 and equals DuckDB ``length(bin(x))``), so the score is a
    Shannon-style surprisal with NO float log anywhere.  High ``bits/n_tok``
    = far from the corpus model = the tail bucket a quality filter drops.

    Scale shape: the count pass is per-batch value_counts partials -> one
    Sum shuffle (word_counts); the exact global top-V is the top-V of
    per-block top-V partials (each word appears once post-aggregate), merged
    in ONE reduce group and broadcast via ``ray.put`` (<= vocab rows on the
    driver); scoring is map-only with the per-WORD bit cost precomputed in
    the actor (one dict map per batch, zero per-token Python).

    Output: ``(doc_id, n_tok, bits)`` for EVERY doc (empty docs score 0).
    """
    import pandas as pd

    import ray

    counts = word_counts(docs_ds, text_col=text_col).materialize()
    n_tokens = int(counts.sum("n"))

    def local_topv(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n", "word"], ascending=[False, True], kind="mergesort")
        df = df.head(vocab)
        df["_g"] = np.int64(0)
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge_topv(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["n", "word"], ascending=[False, True],
                          kind="mergesort").head(vocab)
        return pa.table({"word": pa.array(g["word"], pa.string()),
                         "n": pa.array(g["n"].to_numpy(np.int64), pa.int64())})

    # batch_size must exceed vocab or head(vocab) is a no-op and the single
    # merge group receives the ENTIRE distinct-word table (the default
    # ~1k-row batches would silently defeat the per-block pruning)
    model_rows = counts.map_batches(local_topv, batch_format="pyarrow",
                                    batch_size=max(65536, 4 * vocab)) \
        .groupby("_g").map_groups(merge_topv, batch_format="pandas") \
        .take_all()
    bits_of = {
        r["word"]: (1 + n_tokens // (int(r["n"]) + 1)).bit_length()
        for r in model_rows
    }
    oov_bits = (1 + n_tokens).bit_length()
    model_ref = ray.put(bits_of)

    class Score:
        def __init__(self):
            self.bits = ray.get(model_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            doc_idx, flat, offsets = _explode_tokens(batch, text_col)
            s = pd.DataFrame({
                "d": doc_idx,
                "w": flat.to_numpy(zero_copy_only=False),
            })
            s = s[s["w"] != ""]
            s["b"] = s["w"].map(self.bits).fillna(oov_bits).astype(np.int64)
            agg = s.groupby("d").agg(n_tok=("b", "size"), bits=("b", "sum"))
            agg = agg.reindex(range(len(batch)), fill_value=0)
            return pa.table({
                id_col: batch.column(id_col),
                "n_tok": pa.array(agg["n_tok"].to_numpy(np.int64), pa.int64()),
                "bits": pa.array(agg["bits"].to_numpy(np.int64), pa.int64()),
            })

    return docs_ds.map_batches(Score, batch_format="pyarrow",
                               concurrency=default_pool())


def bigram_bits(docs_ds, *, vocab: int = 2048, bigram_vocab: int = 4096,
                text_col: str = "text", id_col: str = "doc_id"):
    """Bigram-backoff corpus-LM surprisal — :func:`unigram_bits` with one
    more order of context, still integer-exact: pass 1 builds a
    top-``vocab`` unigram model AND a top-``bigram_vocab`` bigram model
    of the corpus; pass 2 charges each token

    * ``bits = bitlen(1 + c_uni(prev) // c_bi(prev, cur))`` — the
      conditional surprisal — when the bigram AND ``prev`` are both in
      model (``c_bi <= c_uni(prev)`` always, so the ratio >= 1),
    * else ``1 + unigram cost`` (one backoff-penalty bit + the
      unigram_bits law ``bitlen(1 + N // (c_uni(cur)+1))``, OOV → c=0),
    * doc-initial tokens pay the plain unigram cost (no context, no
      penalty).

    ``bitlen == DuckDB length(bin(x))`` — no float log anywhere, so the
    oracle hash-matches.  Scale shape: both models are exact global
    top-K of per-block top-K partials merged in ONE reduce group
    (<= vocab+bigram_vocab rows ever reach the driver, broadcast once
    via ``ray.put``); scoring is map-only with two dict maps per batch.
    Output ``(doc_id, n_tok, bits)`` for every doc.
    """
    import pandas as pd

    import ray
    from ray.data.aggregate import Sum  # noqa: F401  (sibling imports)

    counts = word_counts(docs_ds, text_col=text_col).materialize()
    n_tokens = int(counts.sum("n"))

    def local_topv(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n", "word"], ascending=[False, True], kind="mergesort")
        df = df.head(vocab)
        df["_g"] = np.int64(0)
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge_topv(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["n", "word"], ascending=[False, True],
                          kind="mergesort").head(vocab)
        return pa.table({"word": pa.array(g["word"], pa.string()),
                         "n": pa.array(g["n"].to_numpy(np.int64),
                                       pa.int64())})

    uni_rows = counts.map_batches(local_topv, batch_format="pyarrow",
                                  batch_size=max(65536, 4 * vocab)) \
        .groupby("_g").map_groups(merge_topv, batch_format="pandas") \
        .take_all()
    uni_c = {r["word"]: int(r["n"]) for r in uni_rows}

    bcounts = bigram_counts(docs_ds, text_col=text_col)

    def local_topb(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["k"] = df["w1"] + "\x1f" + df["w2"]
        df = df.sort_values(["c_xy", "k"], ascending=[False, True],
                           kind="mergesort").head(bigram_vocab)
        df["_g"] = np.int64(0)
        return pa.Table.from_pandas(df[["k", "c_xy", "_g"]],
                                    preserve_index=False)

    def merge_topb(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["c_xy", "k"], ascending=[False, True],
                          kind="mergesort").head(bigram_vocab)
        return pa.table({"k": pa.array(g["k"], pa.string()),
                         "c": pa.array(g["c_xy"].to_numpy(np.int64),
                                       pa.int64())})

    bi_rows = bcounts.map_batches(local_topb, batch_format="pyarrow",
                                  batch_size=max(65536, 4 * bigram_vocab)) \
        .groupby("_g").map_groups(merge_topb, batch_format="pandas") \
        .take_all()
    bi_c = {r["k"]: int(r["c"]) for r in bi_rows}
    model_ref = ray.put((uni_c, bi_c))
    oov_bits = (1 + n_tokens).bit_length()

    class Score:
        def __init__(self):
            self.uni, self.bi = ray.get(model_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            doc_idx0, flat_all, off0 = _explode_tokens(batch, text_col)
            keep = pc.not_equal(flat_all, "") \
                .to_numpy(zero_copy_only=False)
            cum = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
            off = cum[off0.astype(np.int64)]
            toks = flat_all.filter(pa.array(keep)) \
                .to_numpy(zero_copy_only=False)
            m = len(toks)
            n_per = np.diff(off)
            d = np.repeat(np.arange(len(n_per)), n_per)
            is_start = np.zeros(m, bool)
            is_start[off[:-1][n_per > 0]] = True

            s = pd.DataFrame({"cur": toks})
            cu = s["cur"].map(self.uni)
            uni_bits = np.where(
                cu.isna(), oov_bits,
                _np_bitlen(1 + n_tokens
                           // (cu.fillna(0).to_numpy(np.int64) + 1)))
            prev = np.empty(m, object)
            if m:
                prev[0] = ""
                prev[1:] = toks[:-1]
            bik = pd.Series(prev, dtype=object) + "\x1f" + s["cur"]
            cb = bik.map(self.bi)
            cp = pd.Series(prev, dtype=object).map(self.uni)
            cond = (~is_start) & cb.notna().to_numpy() \
                & cp.notna().to_numpy()
            bits = np.where(
                cond,
                _np_bitlen(1 + cp.fillna(1).to_numpy(np.int64)
                           // cb.fillna(1).to_numpy(np.int64)),
                uni_bits + (~is_start).astype(np.int64))
            agg_bits = np.bincount(d, weights=bits,
                                   minlength=batch.num_rows) \
                .astype(np.int64)
            agg_n = np.bincount(d, minlength=batch.num_rows) \
                .astype(np.int64)
            return pa.table({
                id_col: batch.column(id_col),
                "n_tok": pa.array(agg_n, pa.int64()),
                "bits": pa.array(agg_bits, pa.int64()),
            })

    return docs_ds.map_batches(Score, batch_format="pyarrow",
                               concurrency=default_pool())


def search_topk(docs_ds, queries: dict[int, list[str]], *, k: int = 10,
                text_col: str = "text", id_col: str = "doc_id"):
    """Sparse retrieval over the corpus: score every document against a
    SMALL query set with the exact-integer tf-idf proxy
    ``score_bp = sum_t tf(t, d) * ((N_docs * 10000) // df(t))`` (the
    tfidf_topk proxy — monotone in tf-idf, no float log) and return the
    top-``k`` docs per query by ``(score_bp DESC, doc_id)``.

    Scale shape: the query-term set is tiny and broadcast; pass 1 computes
    EXACT df for those terms only (per-batch distinct-membership partials ->
    one Sum shuffle over <= |terms| keys -> driver dict); pass 2 is
    map-only — each doc lives in exactly one batch, so per-batch
    ``(query, doc)`` scores are already global, and only the per-batch
    top-``k`` survivors enter the final per-query merge (one tiny group per
    QUERY — bounded by the query count, not the corpus).

    Output: ``(query_id, doc_id, score_bp, rank)``, <= k rows per query.
    """
    import pandas as pd

    import ray
    from ray.data.aggregate import Sum

    qterms = {int(q): sorted({t for t in ts if t}) for q, ts in queries.items()}
    term_q = pd.DataFrame(
        [(t, q) for q, ts in qterms.items() for t in ts],
        columns=["w", "query_id"],
    )
    terms = set(term_q["w"])
    n_docs = docs_ds.count()

    def _tok(batch: pa.Table) -> pd.DataFrame:
        doc_idx, flat, offsets = _explode_tokens(batch, text_col)
        s = pd.DataFrame({"d": doc_idx,
                          "w": flat.to_numpy(zero_copy_only=False)})
        return s[s["w"].isin(terms)]

    def df_partial(batch: pa.Table) -> pa.Table:
        s = _tok(batch).drop_duplicates()
        vc = s["w"].value_counts()
        return pa.table({"w": pa.array(vc.index, pa.string()),
                         "df": pa.array(vc.to_numpy(np.int64), pa.int64())})

    df_rows = docs_ds.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("w").aggregate(Sum("df", alias_name="df")).take_all()
    idf_bp = {r["w"]: (n_docs * 10000) // int(r["df"]) for r in df_rows}
    bc = ray.put((term_q, idf_bp))

    class Score:
        def __init__(self):
            self.term_q, self.idf = ray.get(bc)

        def __call__(self, batch: pa.Table) -> pa.Table:
            s = _tok(batch)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            if not len(s):
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 id_col: pa.array([], pa.int64()),
                                 "score_bp": pa.array([], pa.int64())})
            tf = s.groupby(["d", "w"], sort=False).size().reset_index(name="tf")
            tf["part"] = tf["tf"] * tf["w"].map(self.idf).astype(np.int64)
            m = tf.merge(self.term_q, on="w")
            sc = m.groupby(["query_id", "d"], sort=False)["part"].sum() \
                .reset_index(name="score_bp")
            # local top-k per query: only survivors enter the global merge.
            # Tie-break on the REAL doc id (the merge/oracle order), not the
            # batch-local position — nothing guarantees id-monotone blocks
            sc["_id"] = ids[sc["d"].to_numpy()]
            sc = sc.sort_values(["query_id", "score_bp", "_id"],
                                ascending=[True, False, True],
                                kind="mergesort")
            sc = sc.groupby("query_id", sort=False).head(k)
            return pa.table({
                "query_id": pa.array(sc["query_id"].to_numpy(np.int64),
                                     pa.int64()),
                id_col: pa.array(sc["_id"].to_numpy(np.int64), pa.int64()),
                "score_bp": pa.array(sc["score_bp"].to_numpy(np.int64),
                                     pa.int64()),
            })

    def merge(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["score_bp", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        return pa.table({
            "query_id": pa.array(g["query_id"].to_numpy(np.int64), pa.int64()),
            id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
            "score_bp": pa.array(g["score_bp"].to_numpy(np.int64), pa.int64()),
            "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64),
                             pa.int64()),
        })

    return docs_ds.map_batches(Score, batch_format="pyarrow",
                               concurrency=default_pool()) \
        .groupby("query_id").map_groups(merge, batch_format="pandas")


def bm25_topk(docs_ds, queries: dict[int, list[str]], *, k: int = 10,
              k1_x10: int = 12, b_x100: int = 75,
              text_col: str = "text", id_col: str = "doc_id"):
    """BM25 retrieval (Robertson/Sparck Jones) with an ALL-INTEGER score law
    so the DuckDB oracle hash-compares exactly at any corpus size:

    * doc length ``dl`` = non-empty-token count = ``\\S+`` run count
      (trim/lower-invariant, shared RE2 both sides);
    * ``avgdl_c = (100·L) // N`` centitokens (L = corpus token total,
      N = doc count) — folding avgdl into a bounded integer keeps every
      product below int64 even at 10¹²-doc scale, where carrying raw
      ``L``/``N`` factors through the formula would overflow;
    * tf saturation in basis points:
      ``tf_bp = (tf·(K1+10)·100·avgdl_c·10⁴) //
      (tf·1000·avgdl_c + K1·(100−B)·avgdl_c + K1·B·dl·100)``
      — exactly ``10⁴ · tf(k1+1)/(tf + k1(1−b+b·dl/avgdl))`` floored,
      with k1 = K1/10, b = B/100;
    * idf as INTEGER BITS (the unigram_bits trick): ``idf_bits =
      bit_length(1 + N//df) == SQL length(bin(1 + N//df))`` ≈ log₂ idf —
      bounded ≤ 64, so ``score_i = Σ_t idf_bits(t) · tf_bp(t, d)`` can
      never overflow regardless of N.

    Scale shape is search_topk's: ONE stats pass (per-batch (n_docs, Σdl)
    partials → two scalars), one exact-df pass over the tiny broadcast
    query-term set, then a map-only scoring pass with per-batch local
    top-k and a final per-QUERY merge (groups bounded by |queries|).

    Output: ``(query_id, doc_id, score_i, rank)``, ≤ k rows per query.
    """
    import pandas as pd

    import ray
    from ray.data.aggregate import Sum

    K1, B = int(k1_x10), int(b_x100)
    qterms = {int(q): sorted({t for t in ts if t})
              for q, ts in queries.items()}
    term_q = pd.DataFrame(
        [(t, q) for q, ts in qterms.items() for t in ts],
        columns=["w", "query_id"])
    terms = set(term_q["w"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        dl = pc.count_substring_regex(batch.column(text_col), r"\S+")
        return pa.table({
            "n_docs": pa.array([len(batch)], pa.int64()),
            "dl_sum": pa.array([pc.sum(dl).as_py() or 0], pa.int64()),
        })

    stats = docs_ds.map_batches(stats_partial, batch_format="pyarrow") \
        .sum(["n_docs", "dl_sum"])
    n_docs = int(stats["sum(n_docs)"])
    avgdl_c = (100 * int(stats["sum(dl_sum)"])) // max(n_docs, 1)

    def _tok(batch: pa.Table) -> pd.DataFrame:
        doc_idx, flat, offsets = _explode_tokens(batch, text_col)
        s = pd.DataFrame({"d": doc_idx,
                          "w": flat.to_numpy(zero_copy_only=False)})
        return s[s["w"].isin(terms)]

    def df_partial(batch: pa.Table) -> pa.Table:
        s = _tok(batch).drop_duplicates()
        vc = s["w"].value_counts()
        return pa.table({"w": pa.array(vc.index, pa.string()),
                         "df": pa.array(vc.to_numpy(np.int64), pa.int64())})

    df_rows = docs_ds.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("w").aggregate(Sum("df", alias_name="df")).take_all()
    idf_bits = {r["w"]: (1 + n_docs // int(r["df"])).bit_length()
                for r in df_rows}
    bc = ray.put((term_q, idf_bits))

    class Score:
        def __init__(self):
            self.term_q, self.idf = ray.get(bc)

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table({"query_id": pa.array([], pa.int64()),
                              id_col: pa.array([], pa.int64()),
                              "score_i": pa.array([], pa.int64())})
            s = _tok(batch)
            if not len(s):
                return empty
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            dl_all = pc.count_substring_regex(
                batch.column(text_col), r"\S+").to_numpy(
                zero_copy_only=False).astype(np.int64)
            tf = s.groupby(["d", "w"], sort=False).size() \
                .reset_index(name="tf")
            t_f = tf["tf"].to_numpy(np.int64)
            dl = dl_all[tf["d"].to_numpy()]
            num = t_f * (K1 + 10) * 100 * avgdl_c * 10_000
            den = (t_f * 1000 * avgdl_c + K1 * (100 - B) * avgdl_c
                   + K1 * B * dl * 100)
            tf["part"] = (num // den) * tf["w"].map(self.idf) \
                .astype(np.int64)
            m = tf.merge(self.term_q, on="w")
            sc = m.groupby(["query_id", "d"], sort=False)["part"].sum() \
                .reset_index(name="score_i")
            sc["_id"] = ids[sc["d"].to_numpy()]
            sc = sc.sort_values(["query_id", "score_i", "_id"],
                                ascending=[True, False, True],
                                kind="mergesort")
            sc = sc.groupby("query_id", sort=False).head(k)
            return pa.table({
                "query_id": pa.array(sc["query_id"].to_numpy(np.int64),
                                     pa.int64()),
                id_col: pa.array(sc["_id"].to_numpy(np.int64), pa.int64()),
                "score_i": pa.array(sc["score_i"].to_numpy(np.int64),
                                    pa.int64()),
            })

    def merge(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["score_i", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        return pa.table({
            "query_id": pa.array(g["query_id"].to_numpy(np.int64),
                                 pa.int64()),
            id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
            "score_i": pa.array(g["score_i"].to_numpy(np.int64),
                                pa.int64()),
            "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64),
                             pa.int64()),
        })

    return docs_ds.map_batches(Score, batch_format="pyarrow",
                               concurrency=default_pool()) \
        .groupby("query_id").map_groups(merge, batch_format="pandas")


# --- quality-classifier corpus selection (DCLM-style) ----------------------

_CLS_OFFSET = 1 << 40  # makes every binned score non-negative, so the
# bin floor-division is identical in numpy and DuckDB (which truncates
# toward zero on negatives)


class _HashedLinearScorer:
    """Hashed-linear quality classifier (the fastText-style model-inference
    shape): ``score(doc) = Σ_token w[md5low64(token) % dim]`` over token
    OCCURRENCES, with the deterministic integer weight table
    ``w[i] = (i * 2654435761) % 1001 - 500`` built ONCE per actor in
    ``__init__`` (the stateful-stage pattern — a trained model's weights
    would load here instead; this table's law is reproducible in SQL so the
    whole inference pass is exactly oracled).  Per batch: factorize to
    DISTINCT tokens, one md5 per distinct token, then a vectorized
    ``bincount`` gather-sum (exact: |w| <= 500, so int sums stay far below
    2^53)."""

    def __init__(self, dim: int = 65536, text_col: str = "text",
                 id_col: str = "doc_id"):
        i = np.arange(dim, dtype=np.int64)
        self.w = (i * 2654435761) % 1001 - 500
        self.dim = dim
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        doc_idx, flat, _ = _explode_tokens(batch, self.text_col)
        toks = flat.to_numpy(zero_copy_only=False)
        mask = toks != ""
        score = np.zeros(batch.num_rows, dtype=np.int64)
        if mask.any():
            codes, uniq = pd.factorize(toks[mask])
            md5 = hashlib.md5
            dim = self.dim
            hu = np.fromiter(
                (int.from_bytes(md5(t.encode()).digest()[8:16], "little")
                 % dim for t in uniq),
                dtype=np.int64, count=len(uniq))
            wt = self.w[hu]
            sums = np.bincount(doc_idx[mask],
                               weights=wt[codes].astype(np.float64),
                               minlength=batch.num_rows)
            score = sums.astype(np.int64)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "score": pa.array(score, pa.int64()),
        })


def _np_bitlen(x: np.ndarray) -> np.ndarray:
    """Vectorized ``int.bit_length`` for non-negative int64 < 2^53 — the
    np.frexp exponent (exact in float64; the unigram_bits/HLL identity,
    == DuckDB ``length(bin(x))`` for x > 0)."""
    _, e = np.frexp(x.astype(np.float64))
    return e.astype(np.int64)


def _hashed_features(batch: pa.Table, text_col: str, buckets: int):
    """Per-occurrence (doc_index, bucket) for hashed unigram + positional
    bigram features — the DSIR feature space.  Tokens are the shared
    lowercase ``\\s+`` explode with ``''`` dropped (offset-remapped so
    bigrams never straddle a doc boundary); each distinct feature string
    is md5-hashed once (md5low64 % buckets == DuckDB
    ``md5_number_lower(f) % buckets``)."""
    import pandas as pd

    doc_idx0, flat_all, off0 = _explode_tokens(batch, text_col)
    keep = pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False)
    cum = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
    off = cum[off0.astype(np.int64)]
    toks = flat_all.filter(pa.array(keep)).to_numpy(zero_copy_only=False)
    m = len(toks)
    doc_idx = np.repeat(np.arange(len(off) - 1), np.diff(off))

    feats = [toks]
    dis = [doc_idx]
    if m > 1:
        bi = np.flatnonzero(doc_idx[:-1] == doc_idx[1:])
        if len(bi):
            feats.append((pd.Series(toks[bi]) + "\x1f"
                          + pd.Series(toks[bi + 1])).to_numpy())
            dis.append(doc_idx[bi])
    allf = np.concatenate(feats) if m else np.empty(0, object)
    alld = np.concatenate(dis) if m else np.empty(0, np.int64)
    if not len(allf):
        return alld, np.empty(0, np.int64)
    codes, uniq = pd.factorize(allf)
    md5 = hashlib.md5
    hu = np.fromiter(
        (int.from_bytes(md5(f.encode()).digest()[8:16], "little") % buckets
         for f in uniq),
        dtype=np.int64, count=len(uniq))
    return alld, hu[codes]


def dsir_select(docs_ds, *, target_lang: str = "en", buckets: int = 4096,
                keep_bp: int = 2500, bin_width: int = 8,
                text_col: str = "text", id_col: str = "doc_id",
                lang_col: str = "lang"):
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, *Data Selection for Language Models via Importance Resampling*):
    estimate hashed-n-gram bag-of-words models of a TARGET distribution
    (here: docs with ``lang == target_lang``) and the RAW corpus, score
    every doc by its importance log-ratio, keep the top ``keep_bp``/10⁴.

    Integer-exact adaptation (so the DuckDB oracle hash-matches): the
    per-bucket log-probability is the bit-length proxy (the unigram_bits
    idiom — ``bitlen(x) == length(bin(x))``), so

      ``wgt[b] = bitlen(tgt_c[b]+1) − bitlen(raw_c[b]+1)``
      ``norm   = bitlen(N_raw+B)   − bitlen(N_tgt+B)``
      ``score(doc) = Σ_features wgt[b(f)] + n_features · norm``

    ≈ ``Σ log₂ p̂_tgt(f)/p̂_raw(f)`` with add-one smoothing — deterministic
    instead of the paper's Gumbel-noised sampling (documented divergence:
    ranking selection, the reproducible batch variant).  Features are
    hashed unigrams + positional bigrams (md5low64 % ``buckets``).

    Scale shape: bucket counts are per-batch bincount PARTIALS → one Sum
    shuffle over ≤ ``buckets`` keys; the driver state is the fixed-size
    weight array (``buckets`` int64 — independent of corpus size),
    broadcast once via ``ray.put``; scoring is map-only; the percentile
    cutoff reuses the classifier_select binned-histogram law (driver sees
    DISTINCT BINS only).  Output ``(doc_id, score, keep)`` over ALL docs.
    """
    import ray
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        d, b = _hashed_features(batch, text_col, buckets)
        lang = batch.column(lang_col).to_numpy(zero_copy_only=False)
        is_t = (lang == target_lang)
        raw = np.bincount(b, minlength=buckets)
        tgt = np.bincount(b[is_t[d]], minlength=buckets)
        nz = np.flatnonzero(raw)
        return pa.table({
            "b": pa.array(nz, pa.int64()),
            "raw_c": pa.array(raw[nz].astype(np.int64), pa.int64()),
            "tgt_c": pa.array(tgt[nz].astype(np.int64), pa.int64()),
        })

    bc = docs_ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("b").aggregate(Sum("raw_c", alias_name="raw_c"),
                                Sum("tgt_c", alias_name="tgt_c")) \
        .to_pandas()  # ≤ buckets rows — fixed-size driver state
    raw_c = np.zeros(buckets, np.int64)
    tgt_c = np.zeros(buckets, np.int64)
    if len(bc):
        raw_c[bc["b"].to_numpy()] = bc["raw_c"].to_numpy()
        tgt_c[bc["b"].to_numpy()] = bc["tgt_c"].to_numpy()
    wgt = _np_bitlen(tgt_c + 1) - _np_bitlen(raw_c + 1)
    nr, nt = int(raw_c.sum()), int(tgt_c.sum())
    norm = (nr + buckets).bit_length() - (nt + buckets).bit_length()
    wref = ray.put(wgt)

    class Score:
        def __init__(self):
            self.w = ray.get(wref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            d, b = _hashed_features(batch, text_col, buckets)
            score = np.zeros(batch.num_rows, np.int64)
            if len(d):
                np.add.at(score, d, self.w[b])
                score += np.bincount(
                    d, minlength=batch.num_rows).astype(np.int64) * norm
            return pa.table({
                id_col: batch.column(id_col),
                "score": pa.array(score, pa.int64()),
            })

    scores = docs_ds.map_batches(
        Score, batch_format="pyarrow", concurrency=default_pool(),
    ).materialize()  # consumed twice: histogram + keep attach

    def binpart(t: pa.Table) -> pa.Table:
        b = (t.column("score").to_numpy(zero_copy_only=False)
             + _CLS_OFFSET) // bin_width
        vals, cnts = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(vals, pa.int64()),
                         "c": pa.array(cnts.astype(np.int64), pa.int64())})

    hist = scores.map_batches(binpart, batch_format="pyarrow") \
        .groupby("b").aggregate(Sum("c", alias_name="c")) \
        .sort("b").to_pandas()
    cum = hist["c"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    drop_bp = 10000 - keep_bp
    if n:
        idx = int((cum * 10000 >= drop_bp * n).argmax())
        cut = int(hist["b"].to_numpy()[idx])
    else:
        cut = 0

    def add_keep(t: pa.Table) -> pa.Table:
        s = t.column("score").to_numpy(zero_copy_only=False)
        keep = (((s + _CLS_OFFSET) // bin_width) > cut).astype(np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "score": t.column("score"),
            "keep": pa.array(keep, pa.int64()),
        })

    return scores.map_batches(add_keep, batch_format="pyarrow")


def classifier_select(docs_ds, *, keep_bp: int = 3000, dim: int = 65536,
                      bin_width: int = 64, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Quality-based corpus selection (the DCLM-style "classifier-score and
    keep the top p%" pipeline): hashed-linear inference (actor pool,
    weights in ``__init__``), then an EXACT percentile cutoff from a
    distributed histogram over SCORE BINS.

    The cutoff law is integer-exact and shared with the SQL oracle:
    ``bin = (score + 2^40) // bin_width``; ``cut`` = min bin whose
    ascending cumulative count satisfies ``cum * 10000 >= drop_bp * N``
    (``drop_bp = 10000 - keep_bp`` — percentile_disc semantics, the
    length_quantiles rule); ``keep = 1`` iff ``bin > cut``.  Binning is
    what bounds the driver: raw scores can take ~N distinct values, but
    the driver sees DISTINCT BINS only (range/bin_width — a knob trading
    selection granularity for driver state, like length_quantiles'
    distinct lengths).  The kept fraction is keep_bp/10000 up to one bin
    of granularity.

    Output: ``(doc_id, score, keep)`` over ALL docs, all int64.
    """
    from ray.data.aggregate import Sum

    # consumed twice (histogram + keep attach) — pin the O(N)-row id+score
    # table once rather than re-running inference per lazy consumer
    scores = docs_ds.map_batches(
        _HashedLinearScorer,
        fn_constructor_kwargs={"dim": dim, "text_col": text_col,
                               "id_col": id_col},
        batch_format="pyarrow", concurrency=default_pool(),
    ).materialize()

    def binpart(t: pa.Table) -> pa.Table:
        b = (t.column("score").to_numpy(zero_copy_only=False)
             + _CLS_OFFSET) // bin_width
        vals, cnts = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(vals, pa.int64()),
                         "c": pa.array(cnts.astype(np.int64), pa.int64())})

    hist = scores.map_batches(binpart, batch_format="pyarrow") \
        .groupby("b").aggregate(Sum("c", alias_name="c")) \
        .sort("b").to_pandas()
    cum = hist["c"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    drop_bp = 10000 - keep_bp
    if n:
        idx = int((cum * 10000 >= drop_bp * n).argmax())
        cut = int(hist["b"].to_numpy()[idx])
    else:
        cut = 0

    def add_keep(t: pa.Table) -> pa.Table:
        s = t.column("score").to_numpy(zero_copy_only=False)
        keep = (((s + _CLS_OFFSET) // bin_width) > cut).astype(np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "score": t.column("score"),
            "keep": pa.array(keep, pa.int64()),
        })

    return scores.map_batches(add_keep, batch_format="pyarrow")


def source_quality(docs_ds, *, key_col: str = "source",
                   text_col: str = "text", id_col: str = "doc_id",
                   min_words: int = 50, max_words: int = 100_000):
    """Per-source corpus health report — the dashboard a curation run
    publishes per domain: ``(source, n_docs, n_keep, keep_bp,
    n_words_total, nonws_chars_total)`` where keep is the Gopher gate
    verdict (:func:`_gopher_batch`, the shared kernel) and ``keep_bp =
    n_keep·10⁴ // n_docs``.

    Scale shape: the gopher stats and the per-source partial sums happen
    in the SAME map pass (one read, no join — the doc never leaves its
    batch); the only shuffle is a Sum over ≤ |sources| partial rows per
    batch.  All integers — the oracle composes the gopher SQL with a
    GROUP BY source.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = _gopher_batch(batch, text_col=text_col, id_col=id_col,
                          min_words=min_words, max_words=max_words)
        df = pd.DataFrame({
            "source": batch.column(key_col).to_numpy(
                zero_copy_only=False),
            "keep": g.column("keep").to_numpy(zero_copy_only=False),
            "nw": g.column("n_words").to_numpy(zero_copy_only=False),
            "nc": g.column("nonws_chars").to_numpy(zero_copy_only=False),
        })
        df["n"] = np.int64(1)
        agg = df.groupby("source", as_index=False)[
            ["n", "keep", "nw", "nc"]].sum()
        return pa.table({
            "source": pa.array(agg["source"].to_numpy(), pa.string()),
            "n_docs": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
            "n_keep": pa.array(agg["keep"].to_numpy(np.int64),
                               pa.int64()),
            "nw": pa.array(agg["nw"].to_numpy(np.int64), pa.int64()),
            "nc": pa.array(agg["nc"].to_numpy(np.int64), pa.int64()),
        })

    agg = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_keep", alias_name="n_keep"),
            Sum("nw", alias_name="nw"),
            Sum("nc", alias_name="nc"))

    def final(t: pa.Table) -> pa.Table:
        nd = t.column("n_docs").to_numpy(zero_copy_only=False)
        nk = t.column("n_keep").to_numpy(zero_copy_only=False)
        return pa.table({
            "source": t.column("source"),
            "n_docs": t.column("n_docs"),
            "n_keep": t.column("n_keep"),
            "keep_bp": pa.array(nk * 10000 // nd, pa.int64()),
            "n_words_total": t.column("nw"),
            "nonws_chars_total": t.column("nc"),
        })

    return agg.map_batches(final, batch_format="pyarrow")


def quality_gate(docs_ds, *, text_col: str = "text",
                 id_col: str = "doc_id", min_words: int = 50,
                 max_words: int = 100_000, line_min_words: int = 3):
    """Fused document-quality gate: the Gopher rules AND the C4 line
    filter evaluated in ONE map pass over each batch — the composition a
    production corpus pipeline actually runs, without paying a second
    read or a join (`keep = gopher_keep AND line_keep`; both component
    verdicts stay on the surface for auditability).

    This is the Ray-Data-first shape for multi-filter curation: both
    kernels are module-level batch functions (:func:`_gopher_batch`,
    :func:`_line_filter_batch`) sharing the same Arrow batch in memory —
    zero shuffles, zero extra materialization, streams at any scale.
    """

    def fn(batch: pa.Table) -> pa.Table:
        g = _gopher_batch(batch, text_col=text_col, id_col=id_col,
                          min_words=min_words, max_words=max_words)
        l = _line_filter_batch(batch, min_words=line_min_words,
                               text_col=text_col, id_col=id_col)
        gk = g.column("keep").to_numpy(zero_copy_only=False)
        lk = l.column("keep").to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: batch.column(id_col),
            "gopher_keep": g.column("keep"),
            "line_keep": l.column("keep"),
            "keep": pa.array((gk & lk).astype(np.int64), pa.int64()),
        })

    return docs_ds.map_batches(fn, batch_format="pyarrow")


# shared with the SQL oracle — RE2 literals on both sides
_RE_CTRL = r"[\x00-\x08\x0b-\x1f\x7f]"   # control chars EXCEPT \t \n (RE2)
_RE_SQUEEZE = r"\s+"                     # RE2 \s = [\t\n\f\r ] (no \x0b)


def clean_text(docs_ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Text normalization — the standard pre-tokenization cleanup: NFC
    unicode normalization (``pc.utf8_normalize`` == DuckDB
    ``nfc_normalize``), control-character strip, whitespace squeeze to
    single spaces, ASCII-space trim.  Output ``(doc_id, clean_text,
    n_chars_before, n_chars_after, changed)``.

    Every step matches DuckDB exactly (``unicodedata.normalize('NFC')``
    == ``nfc_normalize`` — this build's ``pc.utf8_normalize`` is a no-op
    on composition, probed and rejected; the strip/squeeze regexes are
    RE2 literals — note RE2 ``\\s`` excludes ``\\x0b``, which is why the
    control-strip class covers it), so even the STRING column
    hash-matches.  Map-only; NULL text coalesces to ``''``.  The NFC
    call is CPython's C ``unicodedata``, applied ONLY to rows containing
    non-ASCII (ASCII is NFC by construction; web text is ASCII-heavy, so
    the per-row call touches a small minority).
    """
    import unicodedata

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.coalesce(text, pa.scalar("", pa.string()))
        before = pc.cast(pc.utf8_length(text), pa.int64())
        nonascii = pc.match_substring_regex(text, r"[^\x00-\x7f]") \
            .to_numpy(zero_copy_only=False)
        if nonascii.any():
            vals = text.to_numpy(zero_copy_only=False).copy()
            idx = np.flatnonzero(nonascii)
            norm = unicodedata.normalize
            for i in idx:
                vals[i] = norm("NFC", vals[i])
            t = pa.array(vals, pa.string())
        else:
            t = text
        t = pc.replace_substring_regex(t, _RE_CTRL, "")
        t = pc.replace_substring_regex(t, _RE_SQUEEZE, " ")
        t = pc.utf8_trim(t, " ")
        after = pc.cast(pc.utf8_length(t), pa.int64())
        changed = pc.cast(pc.not_equal(t, text), pa.int64())
        return pa.table({
            id_col: batch.column(id_col),
            "clean_text": t,
            "n_chars_before": before,
            "n_chars_after": after,
            "changed": changed,
        })

    return docs_ds.map_batches(fn, batch_format="pyarrow")


_RE_INDENT_LINE = r"^(    |\t)"   # 4-space or tab indent


def code_detect(docs_ds, *, text_col: str = "text",
                id_col: str = "doc_id"):
    """Code-vs-prose heuristic — the curation signal that routes
    documents to a code corpus (or drops code from a prose one): per
    doc, integer counts of brace/semicolon density and indented-line
    fraction, and ``is_code = 1`` iff

      ``(n_braces + n_semis) · 10 >= n_words``  (symbol density) OR
      ``indent_lines · 10 >= n_lines · 3``      (≥30% indented lines).

    All counts are shared RE2 kernels; thresholds are integer
    cross-multiplications, so the oracle hash-matches.  Map-only.
    """

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.coalesce(text, pa.scalar("", pa.string()))
        n_words = pc.count_substring_regex(text, _RE_WS_TOKEN) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_braces = pc.count_substring_regex(text, r"[{}]") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_semis = pc.count_substring(text, ";") \
            .to_numpy(zero_copy_only=False).astype(np.int64)

        lines = pc.split_pattern(text, pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = lines.flatten()
        off = lines.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ind = pc.match_substring_regex(flat, _RE_INDENT_LINE) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(ind, dtype=np.int64)])
        indent_lines = cum[off[1:]] - cum[off[:-1]]
        n_lines = np.diff(off)

        # max(n_words, 1): an empty doc must not satisfy 0 >= 0
        is_code = (((n_braces + n_semis) * 10 >= np.maximum(n_words, 1))
                   | (indent_lines * 10 >= n_lines * 3)).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "n_words": pa.array(n_words, pa.int64()),
            "n_braces": pa.array(n_braces, pa.int64()),
            "n_semis": pa.array(n_semis, pa.int64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "indent_lines": pa.array(indent_lines, pa.int64()),
            "is_code": pa.array(is_code, pa.int64()),
        })

    return docs_ds.map_batches(fn, batch_format="pyarrow")


# --- character-entropy gibberish filter ------------------------------------

def char_entropy(docs_ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document character-entropy proxy — the gibberish/low-diversity
    filter (binary blobs, keyboard mash and single-char spam score near 0;
    natural text lands at a few bits/char).  All-integer law so the DuckDB
    oracle hash-compares: with ``n`` = codepoint count and ``cnt_c`` the
    count of codepoint ``c``,

        ``entropy_bits = Σ_c cnt_c · (bit_length(n // cnt_c) − 1)``

    i.e. each character is charged ``floor(log₂(n / cnt_c))`` bits — the
    floored Shannon self-information (== SQL ``length(bin(n // cnt)) −
    1``; a uniform single-char doc scores exactly 0).

    Output: ``(doc_id, n_chars, entropy_bits)`` for EVERY doc (NULL text
    reads as '': 0 chars, 0 bits).

    Scale shape: map-only.  The batch's texts are decoded in ONE
    ``utf-32`` pass (no per-row Python), per-(doc, codepoint) counts come
    from a single ``np.unique`` over the fused ``doc·2²¹ + cp`` key
    (codepoints < 2²¹), and the per-doc sum is one ``np.bincount``.
    """
    def score(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if pa.types.is_null(col.type):  # an all-NULL block types as null
            col = col.cast(pa.string())
        text = pc.fill_null(col, "")
        n = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        joined = "".join(text.to_pylist())
        cp = np.frombuffer(joined.encode("utf-32-le"), np.uint32) \
            .astype(np.int64)
        doc_idx = np.repeat(np.arange(len(n), dtype=np.int64), n)
        key = doc_idx * (1 << 21) + cp
        uk, cnt = np.unique(key, return_counts=True)
        ud = (uk >> 21).astype(np.int64)
        bits = cnt * (_np_bitlen(n[ud] // cnt) - 1)
        ent = np.bincount(ud, weights=bits.astype(np.float64),
                          minlength=len(n)).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "n_chars": pa.array(n, pa.int64()),
            "entropy_bits": pa.array(ent, pa.int64()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow")


# --- cross-source vocabulary overlap ---------------------------------------

def source_overlap(docs_ds, *, group_col: str = "source",
                   text_col: str = "text", n_buckets: int = 64):
    """Pairwise vocabulary Jaccard between corpus sources — the
    contamination/affinity matrix a data-mixing pipeline consults before
    weighting sources ("are these two crawls the same site?").  One row
    per observed source pair (a < b, pairs with empty intersection drop —
    inner-join semantics both sides):
    ``(source_a, source_b, inter, vocab_a, vocab_b, jaccard_bp)`` with
    ``jaccard_bp = inter·10⁴ // (vocab_a + vocab_b − inter)``.

    Scale shape: per-batch distinct (source, token) partials → TOKEN-hash
    buckets (every row of a token colocates, so the in-bucket dedupe and
    the per-token source pairing are globally exact); each bucket emits
    per-source vocab partials (as ``a == b`` diagonal rows) and per-pair
    intersection partials — a token shared by k sources emits k(k−1)/2
    rows, bounded by |sources|², never by corpus size.  One tiny Sum
    shuffle over ≤ |sources|² keys, then the Jaccard division over that
    tiny table.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..pipelines.analytics import _bucket_tag

    def partial(batch: pa.Table) -> pa.Table:
        doc_idx, flat, _ = _explode_tokens(batch, text_col)
        src = batch.column(group_col).to_numpy(zero_copy_only=False)
        s = pd.DataFrame({"s": src[doc_idx],
                          "tok": flat.to_numpy(zero_copy_only=False)})
        s = s[s["tok"] != ""].drop_duplicates()
        return pa.Table.from_pandas(s, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g[["s", "tok"]].drop_duplicates()
        v = g.groupby("s").size()
        m = g.merge(g, on="tok")
        m = m[m["s_x"] < m["s_y"]]
        i = m.groupby(["s_x", "s_y"]).size()
        sa = list(v.index) + [a for a, _ in i.index]
        sb = list(v.index) + [b for _, b in i.index]
        n = list(v.to_numpy(np.int64)) + list(i.to_numpy(np.int64))
        return pa.table({"sa": pa.array(sa, pa.string()),
                         "sb": pa.array(sb, pa.string()),
                         "n": pa.array(n, pa.int64())})

    parts = _bucket_tag(docs_ds.map_batches(partial, batch_format="pyarrow"),
                        ["tok"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")
    # NOTE: do NOT fuse (sa, sb) into a separator-joined string key —
    # Ray's groupby was observed to strip NUL bytes from string keys
    agg = parts.groupby(["sa", "sb"]).aggregate(Sum("n", alias_name="n"))

    def finish(g: pd.DataFrame) -> pa.Table:
        if not len(g):  # map_groups may hand an empty block
            return pa.table({
                "source_a": pa.array([], pa.string()),
                "source_b": pa.array([], pa.string()),
                "inter": pa.array([], pa.int64()),
                "vocab_a": pa.array([], pa.int64()),
                "vocab_b": pa.array([], pa.int64()),
                "jaccard_bp": pa.array([], pa.int64()),
            })
        vocab = g[g["sa"] == g["sb"]].set_index("sa")["n"]
        p = g[g["sa"] != g["sb"]].copy()
        va = vocab.reindex(p["sa"]).to_numpy(np.int64)
        vb = vocab.reindex(p["sb"]).to_numpy(np.int64)
        inter = p["n"].to_numpy(np.int64)
        return pa.table({
            "source_a": pa.array(p["sa"].to_numpy(), pa.string()),
            "source_b": pa.array(p["sb"].to_numpy(), pa.string()),
            "inter": pa.array(inter, pa.int64()),
            "vocab_a": pa.array(va, pa.int64()),
            "vocab_b": pa.array(vb, pa.int64()),
            "jaccard_bp": pa.array(inter * 10_000 // (va + vb - inter),
                                   pa.int64()),
        })

    # the aggregated table is <= |sources|^2 rows — one tiny group
    return agg.map_batches(lambda df: df.assign(_one=0),
                           batch_format="pandas") \
        .groupby("_one").map_groups(
            lambda g: finish(g.drop(columns=["_one"])),
            batch_format="pandas")


# --- within-document duplicate-line removal ---------------------------------

def dedup_lines(docs_ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Within-document duplicate-line removal — the nav-bar/footer
    boilerplate scrubber that complements the cross-document dedups: a
    line repeated INSIDE a doc keeps only its first occurrence, the doc
    is rebuilt in original order.  Output per doc: ``(doc_id, n_lines,
    n_kept, text_dedup)`` — the rebuilt STRING itself is hash-compared
    against SQL (``string_agg(line, chr(10) ORDER BY pos)`` over
    first-occurrence rows).

    Map-only, pure-Arrow explode (``split_pattern`` on the literal
    newline == DuckDB ``string_split(t, chr(10))``), first-occurrence
    mask via one stable pandas ``duplicated`` over (doc, line), rebuild
    via offsets-remap + ``pc.binary_join`` — no per-row Python.  NULL
    text coalesces to '' (one empty line, kept) on both sides.
    """
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if pa.types.is_null(text.type):
            text = text.cast(pa.string())
        text = pc.coalesce(text, pa.scalar("", pa.string()))
        lines = pc.split_pattern(text, pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = lines.flatten()
        off = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(off) - 1), np.diff(off))
        keep = ~pd.DataFrame(
            {"d": doc_idx,
             "l": flat.to_numpy(zero_copy_only=False)}).duplicated() \
            .to_numpy()
        kcum = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
        kept_list = pa.LargeListArray.from_arrays(
            pa.array(kcum[off], pa.int64()),
            flat.filter(pa.array(keep)))
        return pa.table({
            id_col: batch.column(id_col),
            "n_lines": pa.array(np.diff(off), pa.int64()),
            "n_kept": pa.array(kcum[off[1:]] - kcum[off[:-1]], pa.int64()),
            "text_dedup": pc.binary_join(kept_list, "\n"),
        })

    return docs_ds.map_batches(fn, batch_format="pyarrow")


# --- per-group open-vocabulary heavy hitters --------------------------------

def grouped_top_words(docs_ds, *, k: int = 5, group_col: str = "lang",
                      text_col: str = "text", n_buckets: int = 64):
    """Top-k words per group over an OPEN vocabulary (per-language heavy
    hitters without a pre-agreed word list — countmin_topk's exact global
    cousin, partitioned by group).  Rank law: ``(count DESC, word ASC)``.

    Scale shape: per-batch (group, word) count partials → (group, word)
    hash-buckets where each word's total is exact (colocated) → per-bucket
    per-group top-k (LOSSLESS: every (group, word) key lives in exactly
    one bucket, and a global top-k row is by definition ≥ every other row
    of its group in its bucket) → final per-group merge over
    ≤ n_buckets·k rows per group.  The driver never sees the vocabulary.

    Output: ``(group, word, n, rank)``, ≤ k rows per group.
    """
    import pandas as pd

    from ..pipelines.analytics import _bucket_tag

    def partial(batch: pa.Table) -> pa.Table:
        doc_idx, flat, _ = _explode_tokens(batch, text_col)
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        s = pd.DataFrame({"g": grp[doc_idx],
                          "w": flat.to_numpy(zero_copy_only=False)})
        s = s[s["w"] != ""]
        c = s.groupby(["g", "w"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(c, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        m = g.groupby(["g", "w"], as_index=False)["n"].sum()
        m = m.sort_values(["g", "n", "w"],
                          ascending=[True, False, True], kind="mergesort")
        m = m.groupby("g", sort=False).head(k)
        return pa.Table.from_pandas(m, preserve_index=False)

    def merge(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["n", "w"], ascending=[False, True],
                          kind="mergesort").head(k)
        return pa.table({
            "lang": pa.array(g["g"].to_numpy(), pa.string()),
            "word": pa.array(g["w"].to_numpy(), pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64),
                             pa.int64()),
        })

    parts = _bucket_tag(docs_ds.map_batches(partial, batch_format="pyarrow"),
                        ["g", "w"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")
    return parts.groupby("g").map_groups(merge, batch_format="pandas")


# --- CCNet-style perplexity bucketing --------------------------------------

def perplexity_buckets(docs_ds, *, vocab: int = 2048,
                       text_col: str = "text", id_col: str = "doc_id"):
    """CCNet's head/middle/tail split (Wenzek et al. 2020): score every
    doc by corpus-LM surprisal per token and cut the corpus into exact
    TERtiles — head (closest to the model) is what CCNet keeps, tail is
    what it drops.  Integer end to end: ``bpt = bits·1000 //
    max(n_tok, 1)`` (milli-bits/token, bits = the unigram_bits law) and
    the peers-inclusive percentile rule ``cut_q = min bpt with
    cum·3 ≥ q·N`` (q = 1, 2) — the length_quantiles law at thirds.

    Output: ``(doc_id, bpt, bucket)`` with bucket ∈ head|middle|tail.

    Scale shape: unigram_bits is two passes + map-only scoring; the
    tertile histogram ships DISTINCT bpt values only (bpt ≤ 64·1000, so
    the driver state is bounded by 64k keys regardless of corpus size);
    the bucket tag is a final map against two broadcast cutoffs.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    scores = unigram_bits(docs_ds, vocab=vocab, text_col=text_col,
                          id_col=id_col).materialize()

    def bpt_col(t: pa.Table) -> pa.Table:
        bits = t.column("bits").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ntok = t.column("n_tok").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return t.append_column(
            "bpt", pa.array(bits * 1000 // np.maximum(ntok, 1),
                            pa.int64()))

    withbpt = scores.map_batches(bpt_col, batch_format="pyarrow") \
        .materialize()

    def hist_part(t: pa.Table) -> pa.Table:
        v, c = np.unique(t.column("bpt").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"v": pa.array(v.astype(np.int64), pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    hist = withbpt.map_batches(hist_part, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("c", alias_name="c")) \
        .sort("v").to_pandas()  # distinct bpt values only — bounded
    cum = hist["c"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    vs = hist["v"].to_numpy()
    if n:
        c1 = int(vs[int((cum * 3 >= n).argmax())])
        c2 = int(vs[int((cum * 3 >= 2 * n).argmax())])
    else:
        c1 = c2 = 0

    def tag(t: pa.Table) -> pa.Table:
        bpt = t.column("bpt").to_numpy(zero_copy_only=False)
        bucket = np.where(bpt <= c1, "head",
                          np.where(bpt <= c2, "middle", "tail"))
        return pa.table({
            id_col: t.column(id_col),
            "bpt": t.column("bpt"),
            "bucket": pa.array(bucket, pa.string()),
        })

    return withbpt.map_batches(tag, batch_format="pyarrow")


# --- per-source corpus-model fit -------------------------------------------

def source_surprisal(docs_ds, *, vocab: int = 2048, text_col: str = "text",
                     group_col: str = "source", id_col: str = "doc_id"):
    """Which crawl is out-of-distribution: per-source aggregate corpus-LM
    surprisal ``(source, n_docs, n_tok, bits, bits_per_kilotoken)`` with
    ``bits_per_kilotoken = bits·1000 // max(n_tok, 1)`` — the
    unigram_bits law rolled up per source.  A source whose text the
    corpus model finds expensive is the one to inspect (or
    temperature-downweight) first.

    Scale shape: unigram_bits' two passes + map-only scoring, then one
    Sum shuffle over ≤ |sources| keys (per-batch partials).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    scored = unigram_bits(docs_ds, vocab=vocab, text_col=text_col,
                          id_col=id_col)
    # re-attach source: unigram_bits output carries only (id, n_tok,
    # bits) — score from the source-bearing input instead would need a
    # second text pass, so join the (tiny-per-batch) id→source map via
    # per-batch partial sums after a bucket join
    from ..pipelines.analytics import _grouped_sum
    from .joins import bucket_hash_join

    src = docs_ds.map_batches(
        lambda t: pa.table({id_col: t.column(id_col),
                            group_col: t.column(group_col)}),
        batch_format="pyarrow")
    j = bucket_hash_join(scored, src, on=id_col, how="inner")

    def partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(group_col, as_index=False).agg(
            n_docs=(id_col, "size"), n_tok=("n_tok", "sum"),
            bits=("bits", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = _grouped_sum(j, [group_col], partial,
                       ["n_docs", "n_tok", "bits"])

    def finish(t: pa.Table) -> pa.Table:
        bits = t.column("bits").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ntok = t.column("n_tok").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "source": t.column(group_col).cast(pa.string()),
            "n_docs": t.column("n_docs").cast(pa.int64()),
            "n_tok": pa.array(ntok, pa.int64()),
            "bits": pa.array(bits, pa.int64()),
            "bits_per_kilotoken": pa.array(
                bits * 1000 // np.maximum(ntok, 1), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# token-blocking budget (ER planning): block-size histogram + pair budget
# ---------------------------------------------------------------------------

def token_blocking_budget(docs_ds, *, text_col: str = "text"):
    """Token-blocking candidate-budget estimator — the ER planning pass
    run BEFORE committing to a blocking key: every distinct lowercase
    token is a block key, block size = number of distinct docs containing
    it, and the comparison budget of a block of size s is s*(s-1)/2.
    Output histogram: one row per distinct block size with
    ``(block_size, n_blocks, pairs_c)`` — from which any stop-key cap
    policy (and the resulting candidate count) is a driver-side sum.

    Scale plan: docs are whole within a batch, so distinct (doc, token)
    is BATCH-LOCAL (``drop_duplicates`` per batch, no global dedup
    shuffle); the vocabulary-wide groupby ships one row per distinct
    token per batch (combiner rule); the histogram groupby ships one row
    per distinct block size per block.  ``pairs_c`` is int64 — a single
    block would need >4.3e9 docs to overflow, far beyond any sane
    blocking key.  Tokenizer law shared with word_counts (lowercase,
    RE2 ``\\s+`` split, ``''`` dropped, NULL text contributes nothing).
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def tok_part(batch: pa.Table) -> pa.Table:
        doc_idx, flat, _ = _explode_tokens(batch, text_col)
        df = pd.DataFrame({"d": doc_idx,
                           "t": flat.to_pandas().astype(object)})
        df = df[df["t"].notna() & (df["t"] != "")]
        g = df.drop_duplicates().groupby("t", as_index=False).size()
        return pa.table({
            "token": pa.array(g["t"], pa.string()),
            "c": pa.array(g["size"].to_numpy().astype(np.int64)),
        })

    per_tok = docs_ds.map_batches(tok_part, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("c", alias_name="block_size"))

    def hist_part(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("block_size", as_index=False).size()
        return pa.table({
            "block_size": pa.array(
                g["block_size"].to_numpy().astype(np.int64)),
            "n_blocks": pa.array(g["size"].to_numpy().astype(np.int64)),
        })

    hist = per_tok.map_batches(hist_part, batch_format="pandas") \
        .groupby("block_size").aggregate(Sum("n_blocks",
                                             alias_name="n_blocks"))

    def final(t: pa.Table) -> pa.Table:
        bs = t.column("block_size").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nb = t.column("n_blocks").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "block_size": pa.array(bs),
            "n_blocks": pa.array(nb),
            "pairs_c": pa.array(nb * (bs * (bs - 1) // 2)),
        })

    return hist.map_batches(final, batch_format="pyarrow")


def vocab_growth(docs_ds, *, n_slices: int = 16, n_buckets: int = 256,
                 text_col: str = "text", id_col: str = "doc_id"):
    """Heaps-law corpus growth curve under DETERMINISTIC subsampling —
    the scaling-forecast op for a training-data pipeline ("how fast
    does vocabulary grow as we add data?").  Docs are sliced by the
    md5 coin ``md5low64(str(doc_id)) % n_slices`` (== DuckDB
    ``md5_number_lower``, the pair_review_sample law) and each prefix
    ``k = 1..n_slices`` reports the corpus it would contain:

        ``(k, n_docs, n_tokens, n_vocab)``

    with ``n_vocab(k) = #tokens whose MINIMUM slice < k`` — the
    distinct-count law that never ships a vocabulary: a token's first
    slice is a groupby-min, the curve is a 16-bin histogram cumsum.
    Token law == word_counts (lower, ``\\s+`` split, ``''`` dropped;
    NULL text = no tokens but the doc still counts).

    Scale shape: ONE corpus pass emits per-batch (token, min-slice)
    partials plus ≤ n_slices doc/token-count stat rows; one token-hash
    groupby finishes the mins IN-BUCKET and collapses them to ≤
    n_slices histogram rows per bucket — the driver sees ≤
    n_buckets·n_slices scalar rows, never a token.
    """
    import pandas as pd

    import ray.data as rd

    from .curation import _md5_low64

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        db = np.array([_md5_low64(str(i)) % n_slices for i in ids],
                      np.int64)
        txt = batch.column(text_col)
        if pa.types.is_null(txt.type):
            txt = txt.cast(pa.string())
        filled = batch.set_column(
            batch.schema.get_field_index(text_col), text_col,
            pc.fill_null(txt, ""))
        doc_idx, flat, _ = _explode_tokens(filled, text_col)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = flat.to_pandas().to_numpy()[keep]
        tdb = db[doc_idx[keep]]
        n_tok = np.bincount(doc_idx[keep], minlength=len(ids)) \
            .astype(np.int64)
        # ≤ n_slices stat rows (tok NULL) + per-token min-slice partials
        docs_b = np.bincount(db, minlength=n_slices).astype(np.int64)
        tokens_b = np.zeros(n_slices, np.int64)
        np.add.at(tokens_b, db, n_tok)
        out_tok = [None] * n_slices
        out_mdb = list(range(n_slices))
        out_docs = docs_b.tolist()
        out_tokens = tokens_b.tolist()
        if len(toks):
            tm = pd.DataFrame({"tok": toks, "mdb": tdb}) \
                .groupby("tok", as_index=False)["mdb"].min()
            out_tok.extend(tm["tok"].tolist())
            out_mdb.extend(tm["mdb"].to_numpy(np.int64).tolist())
            out_docs.extend([0] * len(tm))
            out_tokens.extend([0] * len(tm))
        t = pa.table({
            "tok": pa.array(out_tok, pa.string()),
            "mdb": pa.array(out_mdb, pa.int64()),
            "docs_p": pa.array(out_docs, pa.int64()),
            "tokens_p": pa.array(out_tokens, pa.int64())})
        tb = np.zeros(t.num_rows, np.int64)
        if t.num_rows > n_slices:
            tb[n_slices:] = bucket_hash(
                pd.Series(out_tok[n_slices:]), n_buckets)
        return t.append_column("_tb", pa.array(tb, pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # pandas groupby DROPS NaN keys — split stat rows by explicit
        # mask, never by grouping on tok
        stats = g[g["tok"].isna()]
        toks = g[g["tok"].notna()]
        docs_b = np.zeros(n_slices, np.int64)
        tokens_b = np.zeros(n_slices, np.int64)
        vocab_b = np.zeros(n_slices, np.int64)
        if len(stats):
            sd = stats.groupby("mdb")[["docs_p", "tokens_p"]].sum()
            docs_b[sd.index.to_numpy(np.int64)] = \
                sd["docs_p"].to_numpy(np.int64)
            tokens_b[sd.index.to_numpy(np.int64)] = \
                sd["tokens_p"].to_numpy(np.int64)
        if len(toks):
            tm = toks.groupby("tok")["mdb"].min()
            vc = np.bincount(tm.to_numpy(np.int64),
                             minlength=n_slices).astype(np.int64)
            vocab_b = vc
        return pa.table({
            "db": pa.array(np.arange(n_slices, dtype=np.int64)),
            "docs_p": pa.array(docs_b),
            "tokens_p": pa.array(tokens_b),
            "vocab_p": pa.array(vocab_b)})

    parts = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_tb").map_groups(per_bucket, batch_format="pandas") \
        .to_pandas()  # ≤ n_buckets · n_slices scalar rows — bounded

    hist = parts.groupby("db")[["docs_p", "tokens_p", "vocab_p"]].sum() \
        .reindex(range(n_slices), fill_value=0)
    docs_c = hist["docs_p"].to_numpy(np.int64).cumsum()
    tokens_c = hist["tokens_p"].to_numpy(np.int64).cumsum()
    vocab_c = hist["vocab_p"].to_numpy(np.int64).cumsum()
    return rd.from_arrow(pa.table({
        "k": pa.array(np.arange(1, n_slices + 1, dtype=np.int64)),
        "n_docs": pa.array(docs_c),
        "n_tokens": pa.array(tokens_c),
        "n_vocab": pa.array(vocab_c)}))


def k_anonymity(docs_ds, *, k: int = 5, bin_chars: int = 256,
                n_buckets: int = 128):
    """k-anonymity audit over the corpus metadata — the privacy
    check a release pipeline runs before publishing: with
    quasi-identifier ``(lang, source, n_chars // bin_chars)``, how many
    records sit in equivalence classes smaller than ``k`` (re-
    identifiable by metadata alone).  One row out: ``(n_records,
    n_groups, n_risk_groups, n_risk_records, max_group)`` where risk
    groups have ``count < k``.  NULL lang/source read as '' (a NULL
    quasi-identifier still identifies — the pandas-dropna trap).

    Scale shape: per-batch (qid, count) partials; qid-hash buckets
    finalize exact class sizes and collapse to FIVE scalar partials per
    bucket — the driver sees ≤ n_buckets rows, never a class table.
    """
    import pandas as pd
    import ray.data as rd

    from ..util import bucket_hash

    def partial(batch: pa.Table) -> pa.Table:
        lang = pc.fill_null(pc.cast(batch.column("lang"), pa.string()),
                            "")
        src = pc.fill_null(pc.cast(batch.column("source"), pa.string()),
                           "")
        nc = pc.cast(batch.column("n_chars"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"lang": lang.to_pandas(),
                           "source": src.to_pandas(),
                           "bin": nc // bin_chars})
        g = df.groupby(["lang", "source", "bin"], as_index=False).size()
        g["_qb"] = bucket_hash(g, n_buckets,
                               keys=["lang", "source", "bin"])
        return pa.Table.from_pandas(g.rename(columns={"size": "c"}),
                                    preserve_index=False)

    def fold(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({x: pa.array([0], pa.int64())
                             for x in ["n_records", "n_groups",
                                       "n_risk_groups", "n_risk_records",
                                       "max_group"]})
        c = g.groupby(["lang", "source", "bin"])["c"].sum() \
            .to_numpy(np.int64)
        risk = c < k
        return pa.table({
            "n_records": pa.array([int(c.sum())], pa.int64()),
            "n_groups": pa.array([len(c)], pa.int64()),
            "n_risk_groups": pa.array([int(risk.sum())], pa.int64()),
            "n_risk_records": pa.array([int(c[risk].sum())], pa.int64()),
            "max_group": pa.array([int(c.max())], pa.int64())})

    parts = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_qb").map_groups(fold, batch_format="pandas") \
        .to_pandas()
    if not len(parts):
        return rd.from_arrow(pa.table({
            "n_records": pa.array([0], pa.int64()),
            "n_groups": pa.array([0], pa.int64()),
            "n_risk_groups": pa.array([0], pa.int64()),
            "n_risk_records": pa.array([0], pa.int64()),
            "max_group": pa.array([0], pa.int64())}))
    return rd.from_arrow(pa.table({
        "n_records": pa.array([int(parts["n_records"].sum())], pa.int64()),
        "n_groups": pa.array([int(parts["n_groups"].sum())], pa.int64()),
        "n_risk_groups": pa.array([int(parts["n_risk_groups"].sum())],
                                  pa.int64()),
        "n_risk_records": pa.array([int(parts["n_risk_records"].sum())],
                                   pa.int64()),
        "max_group": pa.array([int(parts["max_group"].max())],
                              pa.int64())}))
