"""Chunking / segment-dedup / tf-idf operators: edge cases + brute-force
reference checks (the exact SQL-oracle parity runs in tools/check_oracle
and the driver; these tests pin the semantics standalone)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _brute_chunks(text: str, window: int, stride: int):
    toks = [t for t in text.lower().split() if t]
    out = []
    s = 0
    while s < len(toks):
        out.append((s // stride, " ".join(toks[s:s + window]),
                    min(window, len(toks) - s)))
        s += stride
    return out


def test_chunk_docs_matches_bruteforce(ray_session):
    import ray.data

    from name_matching_ray.stages.chunking import chunk_docs

    texts = [
        "a b c d e f g h i j",        # 10 tokens
        "one",                         # 1 token (single short chunk)
        "  padded   with   spaces  ",  # whitespace runs + edges
        "",                            # empty -> no chunks
        " ".join(f"t{i}" for i in range(37)),  # partial tail windows
    ]
    docs = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = chunk_docs(ray.data.from_arrow(docs), window=4, stride=3) \
        .to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    want = []
    for i, t in enumerate(texts):
        for cid, ctext, ntok in _brute_chunks(t, 4, 3):
            want.append((i, cid, ctext, ntok))
    want = pd.DataFrame(want, columns=["doc_id", "chunk_id", "chunk_text",
                                       "n_tokens"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_segment_dedup_keeps_first_occurrence(ray_session):
    import ray.data

    from name_matching_ray.stages.chunking import segment_dedup

    boiler = "h1 h2 h3 h4"  # one full window=4 segment
    docs = pa.table({
        "doc_id": pa.array([10, 3, 7], pa.int64()),
        "text": pa.array([
            boiler + " u1 u2 u3 u4",    # dup header, but doc_id NOT minimal
            boiler + " v1 v2 v3 v4",    # min doc_id -> keeps the header
            boiler,                      # only the dup -> clean_text empty
        ], pa.string()),
    })
    got = segment_dedup(ray.data.from_arrow(docs), window=4) \
        .to_pandas().set_index("doc_id").sort_index()
    assert got.loc[3, "clean_text"] == boiler + " v1 v2 v3 v4"
    assert got.loc[3, "n_kept"] == 2 and got.loc[3, "n_segments"] == 2
    assert got.loc[10, "clean_text"] == "u1 u2 u3 u4"
    assert got.loc[10, "n_kept"] == 1 and got.loc[10, "n_segments"] == 2
    # fully-deduped doc stays visible with an empty clean_text
    assert got.loc[7, "clean_text"] == ""
    assert got.loc[7, "n_kept"] == 0 and got.loc[7, "n_segments"] == 1


def test_segment_dedup_partition_invariant(ray_session):
    """First-occurrence choice is a global (doc_id, ord) rule — the result
    must not depend on how rows are split into blocks."""
    import ray.data

    from name_matching_ray.stages.chunking import segment_dedup

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(4, 24)))
             for _ in range(80)]
    docs = pa.table({
        "doc_id": pa.array(np.arange(80, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    a = segment_dedup(ray.data.from_arrow(docs), window=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = segment_dedup(ray.data.from_arrow(docs).repartition(13), window=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_kept"] < a["n_segments"]).any()  # non-vacuous on this vocab


def test_explode_windows_property(ray_session):
    """Hypothesis sweep: the vectorized window kernel equals the scalar
    brute force for arbitrary texts / window / stride."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from name_matching_ray.stages.chunking import explode_windows

    texts_st = st.lists(
        st.text(alphabet=" abXY9", min_size=0, max_size=30),
        min_size=1, max_size=8)

    @settings(max_examples=60, deadline=None)
    @given(texts=texts_st, window=st.integers(1, 5), stride=st.integers(1, 5))
    def check(texts, window, stride):
        batch = pa.table({
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        got = explode_windows(batch, window=window, stride=stride) \
            .to_pandas()
        want = []
        for i, t in enumerate(texts):
            for cid, ctext, ntok in _brute_chunks(t, window, stride):
                want.append((i, cid, ctext, ntok))
        want = pd.DataFrame(want, columns=["doc_id", "ord", "chunk_text",
                                           "n_tokens"])
        got = got.sort_values(["doc_id", "ord"]).reset_index(drop=True)
        want = want.sort_values(["doc_id", "ord"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    check()


def test_tfidf_join_path_equals_broadcast(ray_session):
    """broadcast=False (open-vocabulary bucket join) must produce the
    identical row set as the broadcast plan, under any partitioning."""
    import ray.data

    from name_matching_ray.stages.textstats import tfidf_topk

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
             for _ in range(120)]
    docs = pa.table({
        "doc_id": pa.array(np.arange(120, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    ds = ray.data.from_arrow(docs).repartition(7)
    a = tfidf_topk(ds, k=4, min_df=2, broadcast=True).to_pandas()
    b = tfidf_topk(ds, k=4, min_df=2, broadcast=False).to_pandas()
    key = ["doc_id", "token", "tf", "df", "score_bp"]
    a = a[key].sort_values(key).reset_index(drop=True)
    b = b[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_inverted_index_cap_and_df(ray_session):
    import ray.data

    from name_matching_ray.stages.textstats import inverted_index

    # 'hot' appears in every doc; 'cold3'/'cold7' in one each; 'pairq' in 2
    texts = []
    for i in range(9):
        t = f"hot unique{i}"
        if i in (3, 7):
            t += f" cold{i}"
        if i in (2, 5):
            t += " pairq"
        texts.append(t)
    docs = pa.table({
        "doc_id": pa.array(np.arange(9, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    ds = ray.data.from_arrow(docs).repartition(4)
    got = inverted_index(ds, cap=3, min_df=1).to_pandas() \
        .sort_values(["token", "pos"]).reset_index(drop=True)
    hot = got[got["token"] == "hot"]
    # capped at 3 postings, but df records the TRUE count (9 > cap)
    assert list(hot["doc_id"]) == [0, 1, 2]
    assert list(hot["pos"]) == [0, 1, 2]
    assert (hot["df"] == 9).all()
    pq = got[got["token"] == "pairq"]
    assert list(pq["doc_id"]) == [2, 5] and (pq["df"] == 2).all()
    # min_df drops singletons
    got2 = inverted_index(ds, cap=3, min_df=2).to_pandas()
    assert not got2["token"].str.startswith("unique").any()
    assert not got2["token"].str.startswith("cold").any()
    # partition-invariance
    got3 = inverted_index(ray.data.from_arrow(docs), cap=3, min_df=1) \
        .to_pandas().sort_values(["token", "pos"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got3)


def _brute_substring_dedup(texts, ids, k):
    """Scalar reference: mark non-first duplicate k-gram positions, drop
    covered tokens."""
    toks = {i: [w for w in t.lower().split() if w] for i, t in zip(ids, texts)}
    first: dict[tuple, tuple] = {}
    for i in sorted(ids):
        ts = toks[i]
        for p in range(len(ts) - k + 1):
            first.setdefault(tuple(ts[p:p + k]), (i, p))
    out = {}
    for i in ids:
        ts = toks[i]
        if not ts:
            continue
        covered = [False] * len(ts)
        for p in range(len(ts) - k + 1):
            if first[tuple(ts[p:p + k])] != (i, p):
                for j in range(p, p + k):
                    covered[j] = True
        kept = [w for w, c in zip(ts, covered) if not c]
        out[i] = (" ".join(kept), len(ts), sum(covered))
    return out


def test_substring_dedup_matches_bruteforce(ray_session):
    import ray.data

    from name_matching_ray.stages.chunking import substring_dedup

    shared = "s1 s2 s3 s4 s5 s6"           # 6 tokens, k=4 -> 3 dup windows
    texts = [
        "a1 a2 " + shared + " a3",          # first occurrence (doc 0) kept
        "b1 " + shared + " b2 b3",          # loses the shared span
        shared,                              # fully covered -> empty
        "c1 c2 c3 c4 c5",                    # unique, untouched
        "d1 " + shared + " d2 " + shared,    # two hits incl. within-doc rep
        "short one",                         # n < k -> untouched
    ]
    ids = list(range(len(texts)))
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    want = _brute_substring_dedup(texts, ids, k=4)
    for parts in (1, 5):
        ds = ray.data.from_arrow(docs).repartition(parts)
        got = substring_dedup(ds, k=4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert len(got) == len(want)
        for _, row in got.iterrows():
            w = want[row["doc_id"]]
            assert (row["clean_text"], row["n_tokens"],
                    row["n_removed"]) == w, (row["doc_id"], tuple(row), w)
    # the fully-duplicated doc survives as an empty row (visible drop)
    g = got.set_index("doc_id")
    assert g.loc[2, "clean_text"] == "" and g.loc[2, "n_removed"] == 6
    assert g.loc[3, "n_removed"] == 0
    assert g.loc[5, "n_removed"] == 0


def test_substring_dedup_random_property(ray_session):
    """Randomized cross-check on a small vocab (forces genuine overlapping
    duplicate spans) against the scalar reference."""
    import ray.data

    from name_matching_ray.stages.chunking import substring_dedup

    rng = np.random.default_rng(3)
    vocab = [f"v{i}" for i in range(6)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 25)))
             for _ in range(60)]
    ids = list(range(60))
    docs = pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})
    want = _brute_substring_dedup(texts, ids, k=3)
    got = substring_dedup(ray.data.from_arrow(docs).repartition(9), k=3) \
        .to_pandas()
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert (row["clean_text"], row["n_tokens"],
                row["n_removed"]) == want[row["doc_id"]]
    assert (got["n_removed"] > 0).any()  # non-vacuous at this vocab size


def test_repetition_stats_edges(ray_session):
    import ray.data

    from name_matching_ray.stages.textstats import repetition_stats

    texts = [
        "a a a a b",          # run of 4; bigram 'a a' x3 duplicated
        "x",                   # single token: nb guard = 1, fracs 0
        "p q p q p q",         # alternating: dup bigrams, max_run 1
        "",                    # empty: no row
        "u v w",               # all unique
    ]
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = repetition_stats(ray.data.from_arrow(docs).repartition(3)) \
        .to_pandas().set_index("doc_id").sort_index()
    assert 3 not in got.index and len(got) == 4
    r0 = got.loc[0]
    assert r0["n_tokens"] == 5 and r0["max_run"] == 4
    assert r0["distinct_ratio_bp"] == 2 * 10000 // 5
    # bigrams: (a,a)x3 (a,b)x1 -> dup instances 3 of 4; top 3 of 4
    assert r0["dup_bigram_frac_bp"] == 3 * 10000 // 4
    assert r0["top_bigram_frac_bp"] == 3 * 10000 // 4
    r1 = got.loc[1]
    assert (r1[["dup_bigram_frac_bp", "top_bigram_frac_bp"]] == 0).all()
    assert r1["max_run"] == 1 and r1["distinct_ratio_bp"] == 10000
    r2 = got.loc[2]
    # (p,q)x3 (q,p)x2 -> all 5 bigram instances duplicated; top 3 of 5
    assert r2["max_run"] == 1
    assert r2["dup_bigram_frac_bp"] == 5 * 10000 // 5
    assert r2["top_bigram_frac_bp"] == 3 * 10000 // 5
    r4 = got.loc[4]
    assert r4["dup_bigram_frac_bp"] == 0 and r4["distinct_ratio_bp"] == 10000


def test_tfidf_topk_matches_bruteforce(ray_session):
    import ray.data

    from name_matching_ray.stages.textstats import tfidf_topk

    texts = [
        "apple apple banana rare",
        "banana cherry cherry cherry",
        "apple banana cherry",
        "rare onlyonce apple",
    ]
    n_docs = len(texts)
    docs = pa.table({
        "doc_id": pa.array(list(range(n_docs)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    k, min_df = 2, 2
    got = tfidf_topk(ray.data.from_arrow(docs), k=k, min_df=min_df) \
        .to_pandas().sort_values(["doc_id", "score_bp", "token"],
                                 ascending=[True, False, True]) \
        .reset_index(drop=True)

    df_counts: dict[str, int] = {}
    for t in texts:
        for w in set(t.split()):
            df_counts[w] = df_counts.get(w, 0) + 1
    want = []
    for i, t in enumerate(texts):
        tf: dict[str, int] = {}
        for w in t.split():
            tf[w] = tf.get(w, 0) + 1
        rows = [(w, c, df_counts[w], c * ((n_docs * 10000) // df_counts[w]))
                for w, c in tf.items() if df_counts[w] >= min_df]
        rows.sort(key=lambda r: (-r[3], r[0]))
        for w, c, dfv, s in rows[:k]:
            want.append((i, w, c, dfv, s))
    want = pd.DataFrame(want, columns=["doc_id", "token", "tf", "df",
                                       "score_bp"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # 'onlyonce' (df=1) never appears at min_df=2
    assert "onlyonce" not in set(got["token"])
