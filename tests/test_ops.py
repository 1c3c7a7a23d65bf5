"""Tests for the training-data-pipeline operators (dedup, ANN, text stats,
multimodal, analytics) — brute-force oracles computed driver-side.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()


@pytest.fixture(scope="module")
def docs_ds(ray_session, docs_df):
    import ray.data

    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])


def _shingle_sets(docs_df, n=3):
    out = {}
    for _, r in docs_df.iterrows():
        toks = r.text.lower().split()
        out[r.doc_id] = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    return out


def _true_jaccard_pairs(docs_df, tau, n=3):
    sh = _shingle_sets(docs_df, n)
    ids = sorted(sh)
    pairs = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= tau:
                pairs.add((a, b))
    return pairs


def test_minhash_lsh_recall_precision(docs_ds, docs_df, ray_session):
    """LSH candidates with est sim >= tau must track true Jaccard >= tau."""
    from name_matching_ray.stages.dedup import minhash_lsh_pairs

    got = minhash_lsh_pairs(docs_ds, tau=0.10).to_pandas()
    got_pairs = set(zip(got.left_id, got.right_id))
    truth = _true_jaccard_pairs(docs_df, 0.10)
    # MinHash is probabilistic: demand high recall and reasonable precision
    if truth:
        recall = len(got_pairs & truth) / len(truth)
        assert recall >= 0.8, (recall, len(truth))
    for l, r in got_pairs:
        assert l < r


def test_minhash_lean_equals_default(docs_ds, ray_session):
    """The shuffle-lean (sig-join) LSH plan == the sig-carrying plan."""
    from name_matching_ray.stages.dedup import minhash_lsh_pairs

    a = minhash_lsh_pairs(docs_ds, tau=0.10, lean=False).to_pandas()
    b = minhash_lsh_pairs(docs_ds, tau=0.10, lean=True).to_pandas()
    # lean with the broadcast attach gated OFF → the two hash-bucket joins
    c = minhash_lsh_pairs(docs_ds, tau=0.10, lean=True,
                          broadcast_sig_bytes=0).to_pandas()
    k = ["left_id", "right_id"]
    a = a.sort_values(k).reset_index(drop=True)
    b = b.sort_values(k).reset_index(drop=True)
    c = c.sort_values(k).reset_index(drop=True)
    assert len(a) > 0
    assert a[k + ["est_sim_pct"]].equals(b[k + ["est_sim_pct"]])
    assert a[k + ["est_sim_pct"]].equals(c[k + ["est_sim_pct"]])


def test_simhash_hamming_is_exact(docs_ds, docs_df, ray_session):
    """Every reported pair's hamming distance matches a direct recompute,
    and banding finds ALL pairs within max_hamming (pigeonhole recall)."""
    from name_matching_ray.stages.dedup import SimHashes, simhash_pairs

    got = simhash_pairs(docs_ds, max_hamming=10).to_pandas()
    sh = SimHashes()
    hm = {r.doc_id: sh.simhash(r.text) for _, r in docs_df.iterrows()}
    truth = set()
    ids = sorted(hm)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(hm[a] ^ hm[b]).count("1")
            if d <= 10:
                truth.add((a, b, d))
    got_set = set(zip(got.left_id, got.right_id, got.hamming))
    assert got_set == truth


def test_exact_dedup_finds_planted_duplicates(ray_session):
    import ray.data

    from name_matching_ray.stages.dedup import exact_dedup

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": ["Hello World!", "hello, world", "unique one", "Unique ONE", "different"],
    })
    out = exact_dedup(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 3
    by_keep = out.set_index("keep_id")["n_dups"].to_dict()
    assert by_keep == {1: 2, 3: 2, 5: 1}


def test_ann_topk_matches_bruteforce(docs_ds, ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from name_matching_ray.stages.annsearch import ann_topk

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb.vec_id.to_numpy()
    qids = [0, 7, 42]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    got = ann_topk(ds, qids, k=5).to_pandas()
    for q in qids:
        qv = mat[ids == q][0]
        sims = mat @ qv
        order = np.lexsort((ids, -sims))
        expect = [int(ids[i]) for i in order if ids[i] != q][:5]
        mine = got[got.query_id == q].sort_values("rank").neighbor_id.tolist()
        assert mine == expect, (q, mine, expect)


def test_ivf_topk_recall(ray_session):
    import ray.data

    from name_matching_ray.stages.annsearch import (
        ann_topk, ivf_topk, kmeans_centroids,
    )

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    cent = kmeans_centroids(ds, n_clusters=8)
    exact = ann_topk(ds, [0, 1, 2], k=10).to_pandas()
    approx = ivf_topk(ds, cent, [0, 1, 2], k=10, nprobe=4).to_pandas()
    # IVF with half the lists probed should still recover most of top-10
    e = set(zip(exact.query_id, exact.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    assert len(a & e) / len(e) >= 0.5


def test_winnow_fingerprint_process_stable():
    """fp values must be identical across fresh interpreters regardless of
    PYTHONHASHSEED (the old hash(tuple) was seed-randomized per process)."""
    import os
    import subprocess
    import sys

    code = ("from name_matching_ray.stages.textstats import RollingFingerprint;"
            "print(RollingFingerprint()._doc_fp("
            "'the quick brown fox jumps over the lazy dog the quick brown fox'))")
    outs = set()
    for seed in ("1", "31337"):
        p = subprocess.run(
            [sys.executable, "-c", code],
            env={**os.environ, "PYTHONHASHSEED": seed},
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert p.returncode == 0, p.stderr
        outs.add(p.stdout.strip())
    assert len(outs) == 1 and outs != {"[]"}


def test_kmeans_sample_order_independent(ray_session):
    """Centroids from cluster-sorted input == centroids from shuffled input
    (the old limit(sample) took the first rows — biased on sorted data)."""
    import ray.data

    from name_matching_ray.stages.annsearch import kmeans_centroids

    rng = np.random.default_rng(3)
    a = rng.normal(loc=+2.0, size=(600, 8))
    b = rng.normal(loc=-2.0, size=(600, 8))
    vecs = np.concatenate([a, b])
    ids = np.arange(len(vecs))

    def as_ds(order):
        t = pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "embedding": pa.array(list(vecs[order]), pa.list_(pa.float64())),
        })
        return ray.data.from_arrow(t)

    sorted_order = np.arange(len(vecs))          # all of cluster a first
    shuffled = rng.permutation(len(vecs))
    c1 = kmeans_centroids(as_ds(sorted_order), n_clusters=4, sample=256)
    c2 = kmeans_centroids(as_ds(shuffled), n_clusters=4, sample=256)
    assert np.allclose(c1, c2)
    # and the sample actually covers both clusters: some centroid near each
    assert (c1 @ (a.mean(axis=0) / np.linalg.norm(a.mean(axis=0)))).max() > 0.5
    assert (c1 @ (b.mean(axis=0) / np.linalg.norm(b.mean(axis=0)))).max() > 0.5


def _planted_dup_ds(n_base=300, n_dup=40, d=16, seed=5):
    """Base vectors + planted near-duplicates (tiny perturbations)."""
    import ray.data

    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, d))
    dup_src = rng.choice(n_base, size=n_dup, replace=False)
    dups = base[dup_src] + rng.normal(scale=0.01, size=(n_dup, d))
    vecs = np.concatenate([base, dups])
    ids = np.arange(len(vecs))
    truth = {(int(s), int(n_base + k)) for k, s in enumerate(dup_src)}
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
    })
    return ray.data.from_arrow(t), truth


def test_embedding_dups_chunked_exact(ray_session):
    """Block-pair join over FORCED multiple chunks == single-chunk result
    (exactness does not depend on chunking), and finds all planted dups."""
    from name_matching_ray.stages.annsearch import embedding_cosine_dups

    ds, truth = _planted_dup_ds()
    one = embedding_cosine_dups(ds, threshold=0.95).to_pandas()
    many = embedding_cosine_dups(ds, threshold=0.95, chunk_rows=64).to_pandas()
    k = ["left_id", "right_id"]
    assert one.sort_values(k).reset_index(drop=True).equals(
        many.sort_values(k).reset_index(drop=True))
    got = set(zip(many.left_id, many.right_id))
    assert truth <= got  # every planted dup found (cos ~ 1 > 0.95)


def test_embedding_dups_scale_gate(ray_session):
    """The exact all-pairs join refuses to launch above max_rows, and the
    error names the sub-quadratic alternatives (verdict r3 item 5)."""
    from name_matching_ray.stages.annsearch import embedding_cosine_dups

    ds, _ = _planted_dup_ds()
    with pytest.raises(ValueError) as exc:
        embedding_cosine_dups(ds, threshold=0.95, max_rows=10)
    msg = str(exc.value)
    assert "ivf_cosine_dups" in msg and "srp_lsh_pairs" in msg
    # a deliberate audit with max_rows raised still runs
    out = embedding_cosine_dups(ds, threshold=0.95,
                                max_rows=10_000).to_pandas()
    assert len(out) > 0


def test_ivf_cosine_dups_recall_on_planted(ray_session):
    """Bucketed (within-partition) near-dup recovers planted duplicates."""
    from name_matching_ray.stages.annsearch import (
        ivf_cosine_dups, kmeans_centroids,
    )

    ds, truth = _planted_dup_ds()
    cent = kmeans_centroids(ds, n_clusters=6, sample=256)
    got = ivf_cosine_dups(ds, cent, threshold=0.95).to_pandas()
    got_pairs = set(zip(got.left_id, got.right_id))
    recall = len(got_pairs & truth) / len(truth)
    assert recall >= 0.9, recall


def test_text_stats_quality_flag(ray_session):
    import ray.data

    from name_matching_ray.stages.textstats import text_stats

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["the cat sat on the mat with a hat", "short"],
    })
    out = text_stats(ray.data.from_arrow(t)).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 9
    assert out.loc[1, "quality_ok"] == 1
    assert out.loc[2, "n_tokens"] == 1
    assert out.loc[2, "quality_ok"] == 0


def test_lang_id_cjk_and_markers(ray_session):
    import ray.data

    from name_matching_ray.stages.textstats import lang_id

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["the cat and the dog is here for fun",
                 "der hund und die katze ist nicht da",
                 "这是一个中文文档的例子没有别的"],
    })
    out = lang_id(ray.data.from_arrow(t)).to_pandas().set_index("doc_id")
    assert out.loc[1, "lang_pred"] == "en"
    assert out.loc[2, "lang_pred"] == "de"
    assert out.loc[3, "lang_pred"] == "zh"


def test_media_features_deterministic_and_stub_raises(ray_session):
    import ray.data

    from name_matching_ray.sources.docs_source import documents_as_interleaved
    from name_matching_ray.stages.multimodal import MediaDecoder, media_features

    docs = documents_as_interleaved(SF)
    out = media_features(docs, fake=True).to_pandas()
    assert len(out) > 0
    assert (out.kind == "image").all()
    assert (out.width == 64).all()
    assert out.feature.iloc[0].shape == (8,)
    # determinism: same refs -> same features
    out2 = media_features(documents_as_interleaved(SF), fake=True).to_pandas()
    m1 = out.sort_values(["doc_id", "span_idx"]).feature.tolist()
    m2 = out2.sort_values(["doc_id", "span_idx"]).feature.tolist()
    assert all((a == b).all() for a, b in zip(m1, m2))
    # kinds without a pure-numpy decoder (video, compressed) stay an
    # explicit stub; image/audio real decode is tests/test_multimodal_real
    dec = MediaDecoder(fake=False)
    with pytest.raises(NotImplementedError):
        dec._decode("video", "media://x/y")


def test_cluster_hybrid_paths_agree(ray_session):
    """Driver union-find and distributed min-label loop give identical labels."""
    import ray.data

    from name_matching_ray.stages.cluster import connected_components

    edges = pa.table({
        "left_doc_id": ["a", "b", "p", "q", "x"],
        "right_doc_id": ["b", "c", "q", "r", "a"],
    })
    nodes = pa.table({"doc_id": ["a", "b", "c", "p", "q", "r", "x", "lone"]})
    e_ds, n_ds = ray.data.from_arrow(edges), ray.data.from_arrow(nodes)
    fast = connected_components(e_ds, n_ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    dist = connected_components(e_ds, n_ds, driver_threshold=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert fast.equals(dist)
    lbl = fast.set_index("doc_id")["cluster_id"].to_dict()
    assert lbl["a"] == lbl["b"] == lbl["c"] == lbl["x"] == "a"
    assert lbl["p"] == lbl["q"] == lbl["r"] == "p"
    assert lbl["lone"] == "lone"

    # INT ids (the documents flow): both paths, numeric min labels.
    # "10" < "9" lexicographically but 9 < 10 numerically — the int graph
    # below would mislabel under a stringly-typed implementation
    edges_i = pa.table({"left_doc_id": pa.array([10, 9], pa.int64()),
                        "right_doc_id": pa.array([11, 10], pa.int64())})
    nodes_i = pa.table({"doc_id": pa.array([9, 10, 11, 12], pa.int64())})
    ei, ni = ray.data.from_arrow(edges_i), ray.data.from_arrow(nodes_i)
    for kw in ({}, {"driver_threshold": 0}):
        got = connected_components(ei, ni, **kw).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got["cluster_id"].dtype.kind == "i"
        assert got["cluster_id"].tolist() == [9, 9, 9, 12]


def test_read_docs_branches(ray_session, tmp_path):
    """read_docs exercises whichever IO branch the environment offers
    (native Lance when importable, parquet stand-in otherwise) and yields
    the identical schema either way."""
    import pyarrow.parquet as pq

    from name_matching_ray.schema import DOCS_SCHEMA
    from name_matching_ray.sources.docs_source import (
        HAS_LANCE,
        _is_lance_path,
        read_docs,
    )

    t = pa.table({
        "doc_id": ["d000000001"],
        "spans": [[{"kind": "text", "text": "hello world",
                    "media_ref": "", "offset": 0}]],
    }, schema=DOCS_SCHEMA)
    pq_path = str(tmp_path / "docs.parquet")
    pq.write_table(t, pq_path)
    ds_pq = read_docs(pq_path)
    assert ds_pq.schema().names == ["doc_id", "spans"]
    assert ds_pq.count() == 1

    if HAS_LANCE:  # production branch: identical schema from Lance
        import lance

        lance_path = str(tmp_path / "docs.lance")
        lance.write_dataset(t, lance_path)
        assert _is_lance_path(lance_path)
        ds_ln = read_docs(lance_path)
        assert ds_ln.schema().names == ds_pq.schema().names
        assert ds_ln.take_all() == ds_pq.take_all()
    else:  # offline: the probe must route a .lance path to parquet safely
        assert _is_lance_path("x.lance")  # detection logic itself is live


def test_closure_numpy_equals_dict_reference():
    """The vectorized numpy closure (pointer-doubling min-label) returns the
    exact {node: component-min} mapping of the scalar union-find it replaced,
    on random multi-component graphs with both int and string ids."""
    from name_matching_ray.stages.cluster import (
        _closure_dict_reference,
        _closure_numpy,
    )

    rng = np.random.default_rng(5)
    for trial in range(3):
        n = 4_000
        comp_of = rng.integers(0, 900, size=n)
        idx_by_comp: dict = {}
        lefts, rights = [], []
        for i in range(n):
            ms = idx_by_comp.setdefault(comp_of[i], [])
            if ms:  # random prior member: arbitrary topology, cycles incl.
                lefts.append(int(ms[rng.integers(0, len(ms))]))
                rights.append(i)
                if rng.random() < 0.3:  # extra edge -> cycles
                    lefts.append(int(ms[0]))
                    rights.append(i)
            ms.append(i)
        li, ri = np.array(lefts, np.int64), np.array(rights, np.int64)
        assert _closure_numpy(li, ri) == _closure_dict_reference(
            li.tolist(), ri.tolist())
        ls = np.array([f"n{x:06d}" for x in lefts], object)
        rs = np.array([f"n{x:06d}" for x in rights], object)
        assert _closure_numpy(ls, rs) == _closure_dict_reference(
            ls.tolist(), rs.tolist())


def test_cluster_distributed_path_at_size(ray_session):
    """Forced distributed min-label propagation (driver_threshold=0) on a
    6k-node chain-heavy graph matches the ground-truth components."""
    import time

    import ray.data

    from name_matching_ray.stages.cluster import connected_components

    rng = np.random.default_rng(11)
    n = 6_000
    comp_of = rng.integers(0, 1500, size=n)  # ground-truth component per node
    order = np.argsort(comp_of, kind="stable")
    nodes = [f"n{i:06d}" for i in range(n)]
    lefts, rights = [], []
    members: dict = {}
    for idx in order:
        c = comp_of[idx]
        ms = members.setdefault(c, [])
        if ms:  # binary-tree edges: log-diameter, still multi-round
            lefts.append(nodes[ms[(len(ms) - 1) // 2]])
            rights.append(nodes[idx])
        ms.append(idx)
    e_ds = ray.data.from_arrow(pa.table({
        "left_doc_id": pa.array(lefts, pa.string()),
        "right_doc_id": pa.array(rights, pa.string()),
    }))
    n_ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(nodes, pa.string())}))
    t0 = time.time()
    got = connected_components(e_ds, n_ds, driver_threshold=0,
                               max_iters=60).to_pandas()
    wall = time.time() - t0
    assert len(got) == n
    lbl = got.set_index("doc_id")["cluster_id"].to_dict()
    for c in np.unique(comp_of):
        members = [nodes[i] for i in np.nonzero(comp_of == c)[0]]
        expect = min(members)
        assert all(lbl[m] == expect for m in members), (c, wall)


def test_location_fast_path_equals_reference_regex():
    """_LocationIndex == the reference's alternation regex on clean inputs
    (sampled phrases embedded in names + negatives)."""
    import random
    import re

    from name_matching_ray.functions.assets import load_assets
    from name_matching_ray.functions.normalize import _LocationIndex

    locs = [x.strip() for x in load_assets().locations if x.strip()]
    ref = re.compile(r"\b|\b".join(locs))
    idx = _LocationIndex(locs)
    rng = random.Random(7)
    tok = re.compile(r"[\w\d]+")
    names = []
    for p in rng.sample(locs, 400):
        names += [f"acme {p} inc", f"x{p} sys", f"{p}y corp", p]
    for _ in range(400):
        names.append(" ".join(rng.choice(["zzq", "vrex", "qorf", "general"])
                              for _ in range(rng.randint(1, 5))))
    for raw in names:
        n = " ".join(tok.findall(raw.lower()))
        assert idx.search(n) == (ref.search(n) is not None), n


def test_sessionize_gap_semantics(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import sessionize

    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 01:00",  # user 1: 2 sessions
        "2024-01-01 00:00",                                          # user 2: 1 session
    ])
    t = pa.table({"user_id": pa.array([1, 1, 1, 2], pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us"))})
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    out = sessionize(str(d)).to_pandas().set_index("user_id")
    assert out.loc[1, "n_sessions"] == 2 and out.loc[1, "n_events"] == 3
    assert out.loc[2, "n_sessions"] == 1 and out.loc[2, "n_events"] == 1


def test_rolling_window_peers_and_bounds(ray_session, tmp_path):
    """Trailing RANGE window: ts peers are included, window edge inclusive."""
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import rolling_user_value

    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 00:10",  # peers
        "2024-01-01 00:45",
        "2024-01-01 00:00",                                          # user 2
    ])
    t = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 9.0], pa.float64()),
    })
    d = tmp_path / "ev2"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    out = rolling_user_value(str(d), window_minutes=30).to_pandas() \
        .set_index("event_id")["roll_c"].to_dict()
    assert out == {0: 100, 1: 600, 2: 600, 3: 400, 4: 900}


def test_windowed_watermark_late_detection(ray_session, tmp_path):
    """An event whose ts lags the user's running max beyond the watermark is
    counted late; on-time events in the same window stay separate."""
    import hashlib

    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import windowed_counts_watermark

    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 02:00", "2024-01-01 00:05",
    ])
    t = pa.table({
        "event_id": pa.array([10, 11, 12], pa.int64()),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    d = tmp_path / "ev3"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    out = windowed_counts_watermark(str(d), watermark_minutes=10).to_pandas()
    # replay the deterministic arrival order to know the expected late flag
    jit = [int.from_bytes(hashlib.md5(str(e).encode()).digest()[8:16],
                          "little") % 3_600_000_000 for e in (10, 11, 12)]
    arrival = {e: ts[i] + pd.Timedelta(microseconds=jit[i])
               for i, e in enumerate((10, 11, 12))}
    order = sorted((10, 11, 12), key=lambda e: (arrival[e], e))
    # event 12 (ts 00:05) is late iff some earlier-arriving event's ts
    # exceeds 00:15; that's event 11 (ts 02:00) arriving before it
    e12_late = order.index(11) < order.index(12)
    got = out.set_index("window_start")
    assert int(got.loc["2024-01-01 02:00", "n_on_time"]) == 1
    row0 = got.loc["2024-01-01 00:00"]
    if e12_late:
        assert int(row0.n_on_time) == 1 and int(row0.n_late) == 1
    else:
        assert int(row0.n_on_time) == 2 and int(row0.n_late) == 0


def test_asof_prior_event_matches_pandas(ray_session):
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import asof_prior_event

    got = asof_prior_event(SF).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    expect = []
    for uid, g in ev[ev.event_type.isin(["purchase", "view"])] \
            .sort_values("ts").groupby("user_id"):
        last = None
        for _, r in g.iterrows():
            if r.event_type == "view":
                last = r
            elif last is not None:
                expect.append((int(r.event_id), int(last.event_id),
                               int((r.ts - last.ts).value // 1000)))
    expect = sorted(expect)
    mine = list(zip(got.event_id, got.prior_id, got.gap_us))
    assert mine == expect and len(mine) > 0


def test_topk_per_customer_ranks(ray_session):
    from name_matching_ray.pipelines.analytics import topk_orders_per_customer

    got = topk_orders_per_customer(SF, k=3).to_pandas()
    per = got.groupby("o_custkey")
    assert (per.size() <= 3).all()
    for _, g in per:
        g = g.sort_values("rnk")
        assert list(g.rnk) == list(range(1, len(g) + 1))
        assert (g.totalprice_c.diff().dropna() <= 0).all()


def test_salted_event_ops_equal_unsalted(ray_session):
    """Whale-key path: grouping by (user, time-span) with cross-span
    stitch/replication produces byte-identical output.  The sf0.001 events
    table spans ~30 days per user, so a 24 h (sessionize/asof) or 2 h
    (rolling) salt puts every user across dozens of salt spans."""
    from name_matching_ray.pipelines.analytics import (
        asof_prior_event,
        rolling_user_value,
        sessionize,
    )

    def norm(df, keys):
        return df.sort_values(keys).reset_index(drop=True)

    a = norm(sessionize(SF).to_pandas(), ["user_id"])
    b = norm(sessionize(SF, salt_span_hours=24).to_pandas(), ["user_id"])
    assert len(a) > 0 and a.equals(b)

    a = norm(rolling_user_value(SF).to_pandas(), ["event_id"])
    b = norm(rolling_user_value(SF, salt_span_minutes=120).to_pandas(),
             ["event_id"])
    assert len(a) > 0 and a.equals(b)
    with pytest.raises(ValueError):
        rolling_user_value(SF, window_minutes=30, salt_span_minutes=10)

    a = norm(asof_prior_event(SF).to_pandas(), ["event_id"])
    b = norm(asof_prior_event(SF, salt_span_hours=24).to_pandas(),
             ["event_id"])
    assert len(a) > 0 and a.equals(b)


def test_segment_revenue_partitioned_equals_broadcast(ray_session):
    """The partitioned-join scale path == the broadcast path exactly."""
    from name_matching_ray.pipelines.analytics import segment_revenue

    bcast = segment_revenue(SF).to_pandas()
    parted = segment_revenue(SF, broadcast_threshold=0).to_pandas()
    k = "c_mktsegment"
    assert bcast.sort_values(k).reset_index(drop=True).equals(
        parted.sort_values(k).reset_index(drop=True))
    assert len(bcast) > 0


def test_word_counts_sum(docs_df, docs_ds, ray_session):
    from name_matching_ray.stages.textstats import word_counts

    got = word_counts(docs_ds).to_pandas()
    total_tokens = sum(len(t.lower().split()) for t in docs_df.text)
    assert got.n.sum() == total_tokens
    assert got.word.is_unique


def test_srp_lsh_matches_bruteforce(ray_session):
    """SRP-LSH banded pairs == brute-force signature hamming (exact set,
    including distances) on the real embeddings; and at the tight near-dup
    setting (max_hamming=6, 9-bit bands) planted near-duplicates are found."""
    import pyarrow.parquet as pq
    import ray.data

    from name_matching_ray.stages.annsearch import (
        srp_hyperplanes,
        srp_lsh_pairs,
    )

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    got = srp_lsh_pairs(emb, max_hamming=16).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    m = np.stack(t.embedding.to_numpy()).astype(np.float64)
    bits = (m @ srp_hyperplanes().T) > 0
    ids = t.vec_id.to_numpy()
    ham = (bits[:, None, :] != bits[None, :, :]).sum(axis=2)
    iu, ju = np.triu_indices(len(ids), 1)
    keep = ham[iu, ju] <= 16
    exp = set(zip(np.minimum(ids[iu[keep]], ids[ju[keep]]),
                  np.maximum(ids[iu[keep]], ids[ju[keep]]),
                  ham[iu, ju][keep]))
    assert set(zip(got.left_id, got.right_id, got.hamming)) == exp
    assert len(exp) > 0

    # planted near-dups at the tight setting
    rng = np.random.default_rng(5)
    base = rng.standard_normal((50, 64))
    dup = base[:10] + 0.02 * rng.standard_normal((10, 64))
    vecs = np.concatenate([base, dup]).astype(np.float32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(60), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32(), 64)),
    }))
    tight = srp_lsh_pairs(ds, max_hamming=6).to_pandas()
    found = set(zip(tight.left_id, tight.right_id))
    hits = sum((i, 50 + i) in found for i in range(10))
    assert hits >= 8, (hits, found)


def test_length_quantiles_integer_rule(ray_session):
    """Quantile = min v with cum*10000 >= q_bp*N — checked on a known
    distribution, including the q=9900 tail landing on the max."""
    import pandas as pd
    import ray.data

    from name_matching_ray.stages.textstats import length_quantiles

    # 10 docs of 1..10 tokens
    texts = [" ".join(["w"] * k) for k in range(1, 11)]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(10), "text": texts})).repartition(3)
    got = length_quantiles(ds, q_bps=(2500, 5000, 9000, 9900, 10000)) \
        .to_pandas().set_index("q_bp")["value"]
    assert got[2500] == 3   # cum(3)=3, 3*10000 >= 2500*10
    assert got[5000] == 5
    assert got[9000] == 9
    assert got[9900] == 10
    assert got[10000] == 10


def test_pmi_bigrams_planted_collocation(ray_session):
    """A bigram that always co-occurs scores c_xy^2*1e6/(c_x*c_y) = 1e6 at
    the top; filler words pair randomly and score far lower."""
    import pandas as pd
    import ray.data

    from name_matching_ray.stages.textstats import pmi_bigrams

    rng = np.random.default_rng(3)
    filler = [f"f{i}" for i in range(8)]
    texts = []
    for i in range(60):
        words = list(rng.choice(filler, 6))
        words[2:2] = ["hong", "kong"]  # the collocation, always adjacent
        texts.append(" ".join(words))
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(60), "text": texts})).repartition(4)
    got = pmi_bigrams(ds, k=5, min_count=5).to_pandas()
    top = got.iloc[0]
    assert (top.w1, top.w2) == ("hong", "kong")
    assert top.c_xy == top.c_x == top.c_y == 60
    assert top.score_ppm == 1_000_000
    assert (got.score_ppm.iloc[1:] < 600_000).all()
    # deterministic under re-run and different partitioning
    again = pmi_bigrams(ds.repartition(9), k=5, min_count=5).to_pandas()
    assert got.equals(again)


def test_pmi_bigrams_join_plan_equals_broadcast(ray_session):
    """The open-vocabulary bucket-join plan (broadcast=False — no driver
    vocabulary dict) must produce exactly the broadcast plan's rows."""
    import pandas as pd
    import ray.data

    from name_matching_ray.stages.textstats import pmi_bigrams

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, 12)) for _ in range(150)]
    for i in range(0, 150, 4):
        texts[i] += " san francisco"   # planted collocation
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(150), "text": texts})).repartition(7)

    cols = ["w1", "w2", "c_xy", "c_x", "c_y", "score_ppm"]
    bcast = pmi_bigrams(ds, k=15, min_count=3,
                        broadcast=True).to_pandas()[cols]
    joined = pmi_bigrams(ds, k=15, min_count=3,
                         broadcast=False).to_pandas()[cols]
    pd.testing.assert_frame_equal(bcast.reset_index(drop=True),
                                  joined.reset_index(drop=True))
    # auto gate: a tiny vocabulary picks the broadcast plan and still agrees
    auto = pmi_bigrams(ds, k=15, min_count=3).to_pandas()[cols]
    pd.testing.assert_frame_equal(bcast.reset_index(drop=True),
                                  auto.reset_index(drop=True))


def test_cluster_stats_planted_clusters_and_tiebreak(ray_session):
    import ray.data

    from name_matching_ray.stages import annsearch

    # 3 orthogonal unit centroids in 8-d; vectors = centroid + tiny noise so
    # the nearest-centroid assignment is unambiguous
    cent = np.zeros((3, 8), dtype=np.float64)
    cent[0, 0] = cent[1, 1] = cent[2, 2] = 1.0
    rng = np.random.default_rng(5)
    rows = []
    # cluster 0: labels 7,7,3 -> majority 7 (n=2); cluster 1: labels 4,5
    # tie -> LOWEST label 4; cluster 2: single label 9
    plan = [(0, [7, 7, 3]), (1, [4, 5]), (2, [9])]
    vid = 0
    for cid, labels in plan:
        for lb in labels:
            v = cent[cid] + rng.normal(0, 0.01, 8)
            rows.append({"vec_id": vid, "embedding": v.tolist(), "label": lb})
            vid += 1
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    got = annsearch.cluster_stats(ds, cent).to_pandas() \
        .sort_values("cluster_id").reset_index(drop=True)
    want = pd.DataFrame({
        "cluster_id": [0, 1, 2],
        "n_vecs": [3, 2, 1],
        "majority_label": [7, 4, 9],
        "n_majority": [2, 1, 1],
    }).astype(np.int64)
    pd.testing.assert_frame_equal(got.astype(np.int64), want)


def test_unigram_bits_matches_local_reference(ray_session):
    import ray.data

    from name_matching_ray.stages import textstats

    texts = ["the cat sat on the mat", "the the the", "",
             "zyzzyva unique tokens here", "cat mat the"]
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                       "text": texts})
    got = textstats.unigram_bits(ray.data.from_pandas(df), vocab=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    # local reference: same tokenization, top-3 model (count desc, word asc)
    from collections import Counter
    toks = [t.lower().split() for t in texts]
    cnt = Counter(w for ts in toks for w in ts)
    n_total = sum(cnt.values())
    model = dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
    for i, ts in enumerate(toks):
        bits = sum((1 + n_total // (model.get(w, 0) + 1)).bit_length()
                   for w in ts)
        assert got.loc[i, "n_tok"] == len(ts)
        assert got.loc[i, "bits"] == bits, (i, ts)
    assert got.loc[2, "n_tok"] == 0 and got.loc[2, "bits"] == 0


def test_search_topk_ranks_planted_relevant_doc_first(ray_session):
    import ray.data

    from name_matching_ray.stages import textstats

    docs = ["filler words only"] * 20
    docs[13] = "needle needle needle haystack"   # tf=3 on the rare term
    docs[7] = "needle appears once here"          # tf=1
    df = pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64),
                       "text": docs})
    got = textstats.search_topk(ray.data.from_pandas(df),
                                {42: ["needle"]}, k=5).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    assert list(got["query_id"].unique()) == [42]
    assert list(got["doc_id"]) == [13, 7]   # only matching docs, tf order
    assert list(got["rank"]) == [1, 2]
    # exact integer proxy: tf * ((N*10000)//df), df=2, N=20
    assert list(got["score_bp"]) == [3 * (200000 // 2), 1 * (200000 // 2)]


def test_cross_near_dedup_finds_planted_cross_pairs_only(ray_session):
    import ray.data

    from name_matching_ray.stages import dedup

    # ref corpus: 5 docs; main: 30 docs. main doc 100 is a near-copy of ref
    # doc 2 (one token changed); main docs 101,102 are near-copies of EACH
    # OTHER only (must NOT match: cross pairs only).
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ref = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [f"ref{i} " + base + f" tail{i} unique{i}" for i in range(5)],
    })
    main_texts = [f"main doc {i} totally different words {i*7}"
                  for i in range(30)]
    twin = "omicron pi rho sigma tau upsilon phi chi psi omega"
    main_texts[0] = "ref2 " + base + " tail2 CHANGED"       # near ref 2
    main_texts[1] = "twin one " + twin + " shared suffix x"  # near main[2]
    main_texts[2] = "twin two " + twin + " shared suffix x"
    main = pd.DataFrame({"doc_id": np.arange(100, 130, dtype=np.int64),
                         "text": main_texts})
    got = dedup.cross_near_dedup(
        ray.data.from_pandas(main), ray.data.from_pandas(ref),
        n=3, tau100=50, max_df=100).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == [100]
    assert list(got["ref_id"]) == [2]
    assert (got["score_ppm"] >= 500000).all()


def test_range_join_windows_containment_edges(ray_session, tmp_path):
    import ray.data

    from name_matching_ray.pipelines import analytics

    # windows from min(ts)=Jan-1: [Jan-1,Jan-3), [Jan-8,Jan-10), ...
    ts = pd.to_datetime([
        "2024-01-01 00:00:00",   # w0 start (inclusive)
        "2024-01-02 23:59:59",   # inside w0
        "2024-01-03 00:00:00",   # w0 end (EXCLUSIVE -> no window)
        "2024-01-07 12:00:00",   # gap -> no window
        "2024-01-08 00:00:00",   # w1 start
        "2024-01-09 00:00:00",   # inside w1
    ])
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "ts": ts,
        "user_id": np.int64(1),
        "event_type": ["click"] * 6,
        "value": 1.0,
        "props": "",
    })
    df.to_parquet(tmp_path / "events.parquet")
    got = analytics.range_join_windows(str(tmp_path)).to_pandas() \
        .sort_values("window_id").reset_index(drop=True)
    want = pd.DataFrame({"window_id": [0, 1],
                         "event_type": ["click", "click"],
                         "n_events": [2, 2]})
    pd.testing.assert_frame_equal(
        got.astype({"window_id": np.int64, "n_events": np.int64}), want)


def test_semantic_keep_list_clusters_planted_near_dups(ray_session):
    """End-to-end SemDeDup composition: planted near-identical vectors land
    in one cluster with exactly one keep=1 (the min id); singletons keep."""
    import importlib.util
    from pathlib import Path

    import ray  # noqa: F401

    spec = importlib.util.spec_from_file_location(
        "ray_entry_mod",
        str(Path(__file__).resolve().parents[1] / "__ray_entry__.py"))
    ent = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ent)

    got = ent._semantic_keep_list(SF).to_pandas()
    n = len(got)
    assert n == 500 and got["keep"].isin([0, 1]).all()
    # every cluster has exactly one keeper = its min member
    g = got.groupby("cluster_id")
    assert (g["keep"].sum() == 1).all()
    mins = g["vec_id"].min()
    keepers = got[got["keep"] == 1].set_index("cluster_id")["vec_id"]
    assert keepers.sort_index().equals(mins.sort_index())
    # non-vacuous: the synthetic embeddings contain near-dups
    assert (got["keep"] == 0).sum() > 0


def _brute_classifier(texts, keep_bp=3000, dim=65536, bin_width=64):
    """Pure-python reference of the classifier_select law."""
    import hashlib

    scores = []
    for t in texts:
        s = 0
        for w in (t or "").lower().split():
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[8:16],
                               "little") % dim
            s += (h * 2654435761) % 1001 - 500
        scores.append(s)
    n = len(scores)
    bins = [(s + (1 << 40)) // bin_width for s in scores]
    hist = sorted(set(bins))
    drop_bp = 10000 - keep_bp
    cum = 0
    cut = hist[0] if hist else 0
    for b in hist:
        cum += bins.count(b)
        if cum * 10000 >= drop_bp * n:
            cut = b
            break
    return scores, [1 if b > cut else 0 for b in bins]


def test_classifier_select_matches_bruteforce(ray_session):
    """Hashed-linear scores and the binned-percentile keep flags equal the
    scalar reference law, including empty / whitespace-only / null text and
    under re-partitioning (the cutoff must be a global, not per-block,
    decision)."""
    import pandas as pd
    import ray.data

    from name_matching_ray.stages.textstats import classifier_select

    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(300)]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 30)))
             for _ in range(400)]
    texts[5] = ""
    texts[17] = "   "
    texts[23] = None
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(400), "text": pd.array(texts, dtype="string")}))

    exp_scores, exp_keep = _brute_classifier(texts)
    for parts in (3, 11):
        got = classifier_select(ds.repartition(parts), keep_bp=3000) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert got["score"].tolist() == exp_scores
        assert got["keep"].tolist() == exp_keep
    # the kept fraction lands within a bin of the requested 30%
    assert 0.15 <= sum(exp_keep) / len(exp_keep) <= 0.45


def test_hll_registers_match_bruteforce_and_estimate(ray_session):
    """Register table equals the scalar bucket/rho law exactly (incl. under
    re-partitioning — max must be global), and the resulting cardinality
    estimate lands within HLL error of the exact distinct count.  Uses a
    ~6k-token vocabulary so deep rho values and register collisions are
    actually exercised (the sf tables' synthetic vocab is tiny)."""
    import hashlib

    import pandas as pd
    import ray.data

    from name_matching_ray.stages.sketches import hll_estimate, hll_registers

    rng = np.random.default_rng(11)
    vocab = {
        "en": [f"en{i}" for i in range(4000)],
        "de": [f"de{i}" for i in range(2000)],
    }
    rows = []
    for g, v in vocab.items():
        for d in range(200):
            rows.append({"doc_id": len(rows), "lang": g,
                         "text": " ".join(rng.choice(v, 60))})
    pdf = pd.DataFrame(rows)
    ds = ray.data.from_pandas(pdf)

    # scalar reference law
    exp: dict = {}
    seen: dict = {}
    for _, r in pdf.iterrows():
        for w in r["text"].lower().split():
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[8:16],
                               "little")
            b, v = h % 4096, h // 4096
            rho = 53 if v == 0 else 53 - v.bit_length()
            exp[(r["lang"], b)] = max(exp.get((r["lang"], b), 0), rho)
            seen.setdefault(r["lang"], set()).add(w)

    for parts in (2, 9):
        regs = hll_registers(ds.repartition(parts), group_col="lang")
        got = regs.to_pandas()
        gd = {(r.lang, r.bucket): r.rho for r in got.itertuples()}
        assert gd == exp
    est = hll_estimate(regs)
    for g, s in seen.items():
        assert abs(est[g] - len(s)) / len(s) < 0.1, (g, est[g], len(s))


def test_countmin_sketch_and_topk(ray_session):
    """Cell counts equal the scalar slice-hash law; every CMS estimate
    upper-bounds the true count (the count-min guarantee — only valid if
    partials merged correctly); top-k equals the brute-force ranking with
    the (est DESC, token ASC) tie-break."""
    import hashlib
    from collections import Counter

    import pandas as pd
    import ray.data

    from name_matching_ray.stages.sketches import (
        CMS_DEPTH, CMS_WIDTH, countmin_sketch, countmin_topk)

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(3000)] + ["hot1"] * 0
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(300)]
    texts[0] += " hot1" * 500  # a guaranteed heavy hitter
    texts[7] = None
    pdf = pd.DataFrame({"doc_id": range(300),
                        "text": pd.array(texts, dtype="string")})
    ds = ray.data.from_pandas(pdf)

    true = Counter(w for t in texts if t for w in t.lower().split())

    def cols(w):
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[8:16], "little")
        return [(h >> (16 * j)) % CMS_WIDTH for j in range(CMS_DEPTH)]

    exp = Counter()
    for w, c in true.items():
        for j, col in enumerate(cols(w)):
            exp[(j, col)] += c

    got = countmin_sketch(ds.repartition(5)).to_pandas()
    gd = {(r.row, r.col): r.count for r in got.itertuples()}
    assert gd == dict(exp)

    # CMS never underestimates
    table = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for (j, col), c in exp.items():
        table[j, col] = c
    est = {w: min(table[j, col] for j, col in enumerate(cols(w)))
           for w in true}
    assert all(est[w] >= c for w, c in true.items())

    ranked = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    tk = countmin_topk(ds.repartition(5), k=15).to_pandas()
    assert list(map(tuple, tk[["token", "est"]].itertuples(index=False))) \
        == ranked
    assert tk["token"].iloc[0] == "hot1"


def test_explode_spans_irregular_lists(ray_session):
    """Span explode preserves per-doc order and position for irregular
    lists (empty, single, many) and after repartitioning — span_idx is a
    within-doc position, not a global row number."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.schema import DOCS_SCHEMA
    from name_matching_ray.stages.extract import explode_spans

    def sp(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    rows = {
        "doc_id": ["a", "b", "c", "d"],
        "spans": [
            [sp("text", "hello", "", 0), sp("image", "", "m://1", 5),
             sp("text", "bye", "", 5)],
            [],
            [sp("image", "", "m://2", 0)],
            [sp("text", "héllo", "", 0)],  # non-ascii: codepoint length
        ],
    }
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows, schema=DOCS_SCHEMA))
    for parts in (1, 3):
        got = explode_spans(ds.repartition(parts)).to_pandas() \
            .sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
        assert got["doc_id"].tolist() == ["a", "a", "a", "c", "d"]
        assert got["span_idx"].tolist() == [0, 1, 2, 0, 0]
        assert got["kind"].tolist() == ["text", "image", "text", "image",
                                        "text"]
        assert got["text_len"].tolist() == [5, 0, 3, 0, 5]
        assert got["media_ref"].tolist() == ["", "m://1", "", "m://2", ""]
        assert got["offset"].tolist() == [0, 5, 5, 0, 0]


def test_line_filter_c4_rules(ray_session):
    """C4 line predicates: >=3 words, terminal punctuation, no
    javascript/{ markers; doc keep = >=1 kept line and >=half kept.
    Null text coalesces to one empty (dropped) line."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.textstats import line_filter

    rows = {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            # kept, kept, dropped (2 words), dropped (no terminal punct)
            "one two three.\nshe said \"go home now!\"\ntoo short.\n"
            "four words but no punct",
            None,                      # -> [''] : 1 line, 0 kept, keep=0
            "var x = {a: 1}. done.\nuses javascript here today.",  # both bad
            "multi  spaced   words  here.",   # multi-space: 4 words, kept
            "héllo wörld ünicode.",           # 3 words, codepoint lens
        ],
    }
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    got = line_filter(ds, emit_text=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_lines"].tolist() == [4, 1, 2, 1, 1]
    assert got["n_kept"].tolist() == [2, 0, 0, 1, 1]
    assert got["kept_chars"].tolist() == [
        len("one two three.") + len('she said "go home now!"'), 0, 0,
        len("multi  spaced   words  here."), len("héllo wörld ünicode.")]
    assert got["keep"].tolist() == [1, 0, 0, 1, 1]
    assert got["clean_text"].tolist() == [
        'one two three.\nshe said "go home now!"', "", "",
        "multi  spaced   words  here.", "héllo wörld ünicode."]


def test_quantized_topk_exact_integer_scores(ray_session):
    """quantized_topk == brute-force floor(x*127+0.5) integer dot ranking
    (dot desc, neighbor_id asc), across multiple blocks so the local-top-k
    + merge path is exercised."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.annsearch import quantized_topk

    rng = np.random.default_rng(7)
    n, d, k = 60, 8, 5
    emb = rng.normal(scale=0.5, size=(n, d)).astype(np.float32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(emb.astype(float)),
                              pa.list_(pa.float32())),
    })).repartition(4)

    got = quantized_topk(ds, [0, 1, 2], k=k).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)

    q = np.floor(emb.astype(np.float64) * 127.0 + 0.5)
    dots = (q @ q.T).astype(np.int64)
    for qid in (0, 1, 2):
        col = dots[qid].copy()
        ids = np.arange(n)
        mask = ids != qid
        order = np.lexsort((ids[mask], -col[mask]))
        exp_ids = ids[mask][order[:k]]
        exp_dots = col[mask][order[:k]]
        sub = got[got["query_id"] == qid]
        assert sub["neighbor_id"].tolist() == exp_ids.tolist()
        assert sub["dot"].tolist() == exp_dots.tolist()
        assert sub["rank"].tolist() == list(range(1, k + 1))


def test_gopher_rules_predicates(ray_session):
    """Each Gopher rule flips keep independently: word-count bounds, mean
    word length via cross-multiplication, symbol ratio, bullet/ellipsis
    line fractions, alpha-word share, distinct stop-word requirement."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.textstats import gopher_rules

    good = ("the cat and the dog have words with that many letters here "
            * 10).strip()  # 120 words, mean len ~3.9, >=2 stopwords
    rows = {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            good,                                  # passes everything
            "short of the words",                  # < 50 words
            good + " " + "#" * 30 + " " + "... " * 20,   # symbol ratio
            "\n".join(["- bullet line of the stuff"] * 10),  # all bullets
            good.replace("the", "zzz").replace("and", "qqq")
                .replace("that", "rrr").replace("have", "sss")
                .replace("with", "ttt").replace("of", "uuu"),  # no stopwords
            None,                                  # null -> 0 words
        ],
    }
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    got = gopher_rules(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got["keep"].tolist() == [1, 0, 0, 0, 0, 0]
    # doc 1: 120 whitespace words, all alphabetic, no lines dropped
    assert got.loc[0, "n_words"] == 120
    assert got.loc[0, "n_alpha_words"] == 120
    assert got.loc[0, "n_stop_kinds"] >= 2
    # doc 4: every line is a bullet line
    assert got.loc[3, "n_bullet"] == got.loc[3, "n_lines"] == 10
    # doc 6: null text coalesces to one empty line, zero words
    assert got.loc[5, "n_words"] == 0 and got.loc[5, "n_lines"] == 1


def test_gopher_repetition_hand_computed(ray_session):
    """Dup-line/para fractions and top-ngram char coverage on docs whose
    values are checkable by hand; nulls and empty docs emit zero rows."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.textstats import gopher_repetition

    rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [
            # 4 lines, "same line" twice (9 chars each); paras: the \n\n
            # split yields 2 paragraphs, both distinct
            "same line\nsame line\n\nother",
            # tokens: "a b a b a b" -> top bigram ("a","b") x3, chars 2;
            # total token chars 6
            "a b a b a b",
            None,                      # 1 empty line, 0 tokens
            "unique paragraph",        # nothing repeats
        ],
    }
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    got = gopher_repetition(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)

    d1 = got.loc[0]
    assert d1["n_lines"] == 4            # "same line","same line","","other"
    assert d1["dup_line_frac_bp"] == 2 * 10000 // 4
    assert d1["dup_line_char_frac_bp"] == 18 * 10000 // (18 + 0 + 5)
    assert d1["n_paras"] == 2 and d1["dup_para_frac_bp"] == 0

    d2 = got.loc[1]
    assert d2["n_tokens"] == 6
    # top bigram ("a","b") count 3, chars 2 -> 3*2*1e4 // 6
    assert d2["top2gram_char_frac_bp"] == 3 * 2 * 10000 // 6
    # 5-grams: "a b a b a" x1, "b a b a b" x1 -> no dups
    assert d2["dup5gram_char_frac_bp"] == 0

    d3 = got.loc[2]
    assert d3["n_lines"] == 1 and d3["n_tokens"] == 0
    assert d3["top2gram_char_frac_bp"] == 0

    d4 = got.loc[3]
    assert d4["dup_line_frac_bp"] == 0 and d4["dup_para_frac_bp"] == 0
    # single 2-gram ("unique","paragraph") count 1, chars 15, tot 15
    assert d4["top2gram_char_frac_bp"] == 10000


def test_dsir_select_ranks_targetlike_docs(ray_session):
    """DSIR importance scores rank docs written in the target corpus's
    vocabulary above off-target docs, regardless of their own lang tag;
    the binned-percentile keeps ~keep_bp of the corpus."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.textstats import dsir_select

    tgt_vocab = "alpha beta gamma delta epsilon zeta"
    off_vocab = "uno dos tres cuatro cinco seis"
    rows = {"doc_id": [], "text": [], "lang": []}
    for i in range(20):                      # target corpus (lang=en)
        rows["doc_id"].append(i)
        rows["text"].append(tgt_vocab + f" alpha beta {i % 3}")
        rows["lang"].append("en")
    for i in range(20, 40):                  # raw-only corpus (lang=es)
        rows["doc_id"].append(i)
        rows["text"].append(off_vocab + f" uno dos {i % 3}")
        rows["lang"].append("es")
    # probes: same length, opposite vocabularies, both tagged 'de' so the
    # score is driven purely by the learned models, not the tag
    rows["doc_id"] += [100, 101]
    rows["text"] += [tgt_vocab, off_vocab]
    rows["lang"] += ["de", "de"]
    rows["doc_id"].append(102)               # null text -> score 0
    rows["text"].append(None)
    rows["lang"].append("en")

    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    got = dsir_select(ds, keep_bp=5000, bin_width=1).to_pandas() \
        .set_index("doc_id")
    assert got.loc[100, "score"] > got.loc[101, "score"]
    assert got.loc[102, "score"] == 0
    # all target-vocab docs outscore all off-vocab docs
    t_min = got.loc[range(20), "score"].min()
    o_max = got.loc[range(20, 40), "score"].max()
    assert t_min > o_max
    # keep ~half, up to one tied score-bin of granularity (the strict
    # bin > cut rule drops the whole boundary bin on ties)
    kept = set(got[got["keep"] == 1].index)
    assert 0.30 * len(got) <= len(kept) <= 0.65 * len(got)
    # everything kept is target-vocab (the 20 en docs + the two
    # target-like probes); no off-vocab doc survives
    assert kept <= set(range(20)) | {100, 102}
    assert not kept & set(range(20, 40)) and 101 not in kept


def test_json_props_extraction_semantics(ray_session, tmp_path):
    """JSON property extraction: missing path, non-integer value, invalid
    JSON and NULL props all land in k_nulls; all-NULL groups coalesce
    min/max to 0; sums/mins/maxes are exact ints."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import json_props

    t = pa.table({
        "event_type": ["a", "a", "a", "a", "b", "b", "c"],
        "props": ['{"k": 5}', '{"k": -3}', '{"j": 9}', None,
                  '{"k": 2.5}', 'not json', '{"k": 7}'],
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = json_props(str(tmp_path)).to_pandas() \
        .sort_values("event_type").set_index("event_type")

    a = got.loc["a"]
    assert (a["n_events"], a["k_sum"], a["k_min"], a["k_max"],
            a["k_nulls"]) == (4, 2, -3, 5, 2)
    b = got.loc["b"]          # "2.5" fails the strict int cast
    assert (b["n_events"], b["k_nulls"], b["k_min"], b["k_max"]) \
        == (2, 2, 0, 0)
    c = got.loc["c"]
    assert (c["k_sum"], c["k_min"], c["k_max"], c["k_nulls"]) == (7, 7, 7, 0)


def test_kmeans_update_exact_sufficient_stats(ray_session):
    """One Lloyd step on planted clusters: assignments recover the
    plant, and (dim_sum, n_vecs) equal the numpy reference exactly."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.annsearch import (_quantize127,
                                                    kmeans_update)

    rng = np.random.default_rng(7)
    dim, n_per = 16, 40
    centers = np.array([[1.0] * dim, [-1.0] * dim]) * 0.5
    vecs = np.concatenate([
        centers[0] + 0.05 * rng.standard_normal((n_per, dim)),
        centers[1] + 0.05 * rng.standard_normal((n_per, dim)),
    ])
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(2 * n_per), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32))),
    }))
    got = kmeans_update(ds, centers).to_pandas() \
        .sort_values(["cluster_id", "dim"]).reset_index(drop=True)

    # numpy reference: same quantization, exact integer distances
    q = _quantize127(vecs.astype(np.float32).astype(np.float64))
    cq = _quantize127(centers)
    d2 = ((q[:, None, :] - cq[None, :, :]) ** 2).sum(axis=2)
    cid = d2.argmin(axis=1)
    assert (cid == np.repeat([0, 1], n_per)).all()   # plant recovered
    for c in (0, 1):
        sub = got[got.cluster_id == c]
        assert sub["n_vecs"].unique().tolist() == [n_per]
        np.testing.assert_array_equal(
            sub.sort_values("dim")["dim_sum"].to_numpy(),
            q[cid == c].sum(axis=0).astype(np.int64))
    # the implied new centroids move toward the plant means
    m0 = got[got.cluster_id == 0].sort_values("dim")
    new0 = m0["dim_sum"].to_numpy() / m0["n_vecs"].to_numpy()
    assert np.abs(new0 / 127.0 - 0.5).max() < 0.05


def test_frequency_cap_keeps_first_k_copies(ray_session):
    """Duplicate groups rank by ascending doc_id; copies past the cap
    drop; normalization ('Hello!' == 'hello') groups as in exact_dedup;
    null and '' text share one group (coalesced law)."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.dedup import frequency_cap

    rows = {
        "doc_id": [5, 3, 1, 9, 2, 7, 8],
        "text": ["hello", "Hello!", "h e l l o", "unique",
                 None, "", "other"],
    }
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    got = frequency_cap(ds, cap=2).to_pandas().set_index("doc_id")

    # "hello" variants all normalize to the same fingerprint: ranks by id
    assert got.loc[1, "copy_rank"] == 1 and got.loc[1, "keep"] == 1
    assert got.loc[3, "copy_rank"] == 2 and got.loc[3, "keep"] == 1
    assert got.loc[5, "copy_rank"] == 3 and got.loc[5, "keep"] == 0
    # null text and '' text coalesce into one group
    assert got.loc[2, "fingerprint"] == got.loc[7, "fingerprint"]
    assert got.loc[2, "copy_rank"] == 1 and got.loc[7, "copy_rank"] == 2
    assert got.loc[9, "keep"] == 1 and got.loc[8, "keep"] == 1


def test_token_budget_select_longest_first_quota(ray_session):
    """Within each source, longest docs fill the budget first; the doc
    that overflows the budget (and everything after) drops; ties rank by
    ascending doc_id; empty/null docs cost nothing."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.curation import token_budget_select

    rows = {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "source": ["a", "a", "a", "a", "b", "b"],
        "text": ["w " * 6, "w " * 5, "w " * 5, None,   # a: 6,5,5,0 words
                 "w " * 2, "w " * 9],                   # b: 2,9
    }
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    got = token_budget_select(ds, budget=11).to_pandas() \
        .set_index("doc_id")

    # a: rank order 1(6),2(5),3(5),4(0): cum 6,11,16,16 -> keep 1,2 only...
    assert got.loc[1, "cum_words"] == 6 and got.loc[1, "keep"] == 1
    assert got.loc[2, "cum_words"] == 11 and got.loc[2, "keep"] == 1
    assert got.loc[3, "cum_words"] == 16 and got.loc[3, "keep"] == 0
    # ...and the 0-word doc sorts last but still fails (cum stuck at 16)
    assert got.loc[4, "n_words"] == 0 and got.loc[4, "keep"] == 0
    # b: 9 then 2 -> cum 9, 11 -> both kept
    assert got.loc[6, "keep"] == 1 and got.loc[5, "keep"] == 1


def test_winnow_dedup_planted_pairs(ray_session):
    """Docs sharing a long common span pair up (winnowing guarantees any
    match of >= w+k-1 tokens shares a fingerprint); unrelated docs don't;
    n_left/n_right are the per-doc distinct fingerprint counts."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.dedup import winnow_dedup

    common = ("the quick brown fox jumps over the lazy dog near the "
              "silent river bank at dawn every single summer morning")
    rows = {
        "doc_id": [1, 2, 3],
        "text": [
            "intro words here " + common + " tail one",
            "different lead-in text " + common + " other ending",
            "completely unrelated content about distributed query "
            "engines and arrow batches streaming through object stores",
        ],
    }
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    got = winnow_dedup(ds, min_shared=2, max_df=64).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["left_id"], r["right_id"]) == (1, 2)
    assert r["n_shared"] >= 2
    assert r["n_left"] > r["n_shared"] and r["n_right"] > r["n_shared"]


def test_bpe_pair_counts_weighted_by_frequency(ray_session):
    """Pair counts weight each adjacent char pair by the word's corpus
    frequency; repeated words multiply; the argmax is the first BPE
    merge."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.textstats import bpe_pair_counts

    rows = {"doc_id": [1, 2],
            "text": ["aab aab ab", "aab Ünï"]}  # aab x3, ab x1, ünï x1
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    got = bpe_pair_counts(ds).to_pandas()
    d = {(r.left_sym, r.right_sym): r.pair_count
         for r in got.itertuples()}
    # 'aa' appears once per "aab" occurrence (x3)
    assert d[("a", "a")] == 3
    # 'ab' from "aab" x3 + "ab" x1
    assert d[("a", "b")] == 4
    # unicode pairs survive lowercasing as codepoints
    assert d[("ü", "n")] == 1 and d[("n", "ï")] == 1
    # the first merge a BPE trainer would apply
    assert max(d, key=d.get) == ("a", "b")


def test_event_dedup_window_semantics(ray_session, tmp_path):
    """Repeats of (user, type) within the window flag as dups; gaps
    beyond the window, other keys, and firsts don't; gap_us is exact."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import event_dedup

    base = np.datetime64("2026-01-01T00:00:00", "us")
    s = np.timedelta64(1_000_000, "us")
    t = pa.table({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [7, 7, 7, 7, 8],
        "event_type": ["c", "c", "c", "v", "c"],
        "ts": pa.array([base, base + 10 * s, base + 5000 * s,
                        base + 11 * s, base + 12 * s],
                       pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = event_dedup(str(tmp_path), window_seconds=3600).to_pandas() \
        .set_index("event_id")
    assert got.loc[1, "gap_us"] == -1 and got.loc[1, "is_dup"] == 0
    assert got.loc[2, "gap_us"] == 10_000_000 and got.loc[2, "is_dup"] == 1
    # 4990 s later: within 3600s? no — 4990 > 3600 -> not a dup
    assert got.loc[3, "gap_us"] == 4_990_000_000
    assert got.loc[3, "is_dup"] == 0
    # different event_type / different user: firsts
    assert got.loc[4, "is_dup"] == 0 and got.loc[5, "is_dup"] == 0


def test_ann_recall_bounds(ray_session):
    """IVF recall@10 vs exact top-10 on the real embeddings: every row in
    [0, 10000] bp, and nprobe=4-of-8 cells recovers most neighbors."""
    import __ray_entry__ as ent

    out = ent._ann_recall("/root/testdata/sf0.001")
    assert len(out) == 5
    assert ((out["recall_bp"] >= 0) & (out["recall_bp"] <= 10000)).all()
    assert out["recall_bp"].mean() >= 5000
    assert (out["n_hit"] * 1000 == out["recall_bp"]).all()


def test_grouped_length_quantiles_per_key(ray_session):
    """Per-key percentile_disc: each key's quantiles come from its own
    docs only (percentile = min v with cum*1e4 >= q*N)."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.textstats import grouped_length_quantiles

    rows = {"doc_id": list(range(8)),
            "lang": ["a"] * 4 + ["b"] * 4,
            "text": ["w " * n for n in (1, 2, 3, 4)] +
                    ["w " * n for n in (10, 20, 30, 40)]}
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    got = grouped_length_quantiles(
        ds, q_bps=(2500, 5000, 10000)).to_pandas()
    g = got.set_index(["lang", "q_bp"])["value"]
    # key a: lengths 1..4 -> p25=1 (cum 1*4 >= 1), p50=2, p100=4
    assert (g[("a", 2500)], g[("a", 5000)], g[("a", 10000)]) == (1, 2, 4)
    assert (g[("b", 2500)], g[("b", 5000)], g[("b", 10000)]) == (10, 20, 40)


def test_quality_gate_is_conjunction(ray_session):
    """The fused gate equals running gopher_rules and line_filter
    separately and ANDing their keeps."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.textstats import (gopher_rules,
                                                    line_filter,
                                                    quality_gate)

    good_line = ("the cat and dog have words with that story here now. "
                 * 5).strip()
    rows = {
        "doc_id": [1, 2, 3],
        "text": [
            "\n".join([good_line] * 3),           # passes both
            "\n".join(["short { js"] * 3),        # fails both
            good_line.replace(".", "") + " " +    # gopher-pass, line-fail
            ("alpha beta gamma " * 20).strip(),   # (no terminal punct)
        ],
    }
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    fused = quality_gate(ds).to_pandas().set_index("doc_id")
    g = gopher_rules(ds).to_pandas().set_index("doc_id")["keep"]
    l = line_filter(ds).to_pandas().set_index("doc_id")["keep"]
    for i in (1, 2, 3):
        assert fused.loc[i, "gopher_keep"] == g.loc[i]
        assert fused.loc[i, "line_keep"] == l.loc[i]
        assert fused.loc[i, "keep"] == (g.loc[i] & l.loc[i])
    assert fused["keep"].tolist() == [1, 0, 0]
    assert fused.loc[3, "gopher_keep"] == 1 and fused.loc[3, "line_keep"] == 0


def test_source_quality_report(ray_session):
    """Per-source rollup equals the gopher verdicts aggregated by hand;
    keep_bp is the integer basis-point ratio."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.textstats import (gopher_rules,
                                                    source_quality)

    good = ("the cat and dog have words with that many letters here "
            * 10).strip()
    rows = {
        "doc_id": [1, 2, 3, 4],
        "source": ["a", "a", "a", "b"],
        "text": [good, good, "too short of words", good],
    }
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    got = source_quality(ds).to_pandas().set_index("source")
    g = gopher_rules(ds).to_pandas()
    assert got.loc["a", "n_docs"] == 3
    assert got.loc["a", "n_keep"] == 2
    assert got.loc["a", "keep_bp"] == 2 * 10000 // 3
    assert got.loc["b", "keep_bp"] == 10000
    assert got.loc["a", "n_words_total"] == \
        g[g.doc_id.isin([1, 2, 3])]["n_words"].sum()


def test_bigram_bits_branch_laws(ray_session):
    """Every scoring branch hand-checked: in-model bigram (conditional
    surprisal), backoff with penalty bit (bigram out of the tiny model),
    OOV unigram, doc-initial token."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.textstats import bigram_bits

    # corpus: "a b" x4, "a c" x1, "z" x1 -> N=11 tokens
    # counts: a=5, b=4, c=1, z=1; bigrams: (a,b)=4, (a,c)=1
    rows = {"doc_id": [1, 2, 3],
            "text": ["a b a b a b a b", "a c", "z"]}
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    # bigram_vocab=1 keeps only (a,b); vocab=3 keeps a,b,c (z OOV... tie:
    # c=1 vs z=1 -> lexicographic keeps c)
    got = bigram_bits(ds, vocab=3, bigram_vocab=1).to_pandas() \
        .set_index("doc_id")
    N = 11

    def ub(c):  # unigram law
        return (1 + N // (c + 1)).bit_length()

    # doc1: a(initial: ub(5)=2? N//(5+1)=1 ->bitlen(2)=2) then b|a in
    # model: bitlen(1 + 5//4)=bitlen(2)=2; then a|b backoff: 1+ub(5);
    # pattern: a b a b a b a b = ub(a) + 4*bits(b|a)... positions:
    # a(init)=ub5, b|a=2, a|b=1+ub5, b|a=2, a|b=1+ub5, b|a=2, a|b=1+ub5, b|a=2
    exp1 = ub(5) + 4 * 2 + 3 * (1 + ub(5))
    assert got.loc[1, "bits"] == exp1 and got.loc[1, "n_tok"] == 8
    # doc2: a(init)=ub(5); c|a NOT in bigram model (vocab 1) -> 1+ub(1)
    assert got.loc[2, "bits"] == ub(5) + 1 + ub(1)
    # doc3: z OOV (vocab=3 kept a,b,c) -> initial, oov bits = bitlen(1+N)
    assert got.loc[3, "bits"] == (1 + N).bit_length()


def test_kmv_sketch_estimate_and_merge_law(ray_session):
    """The KMV estimate (k-1)*2^64/h_(k) lands within sketch error of
    the exact distinct count, and partial pruning (local k-smallest per
    batch) reproduces the global k smallest."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.sketches import kmv_sketch

    rng = np.random.default_rng(3)
    words = [f"tok{int(i)}" for i in rng.integers(0, 5000, 30000)]
    texts = [" ".join(words[i:i + 50]) for i in range(0, 30000, 50)]
    exact = len({w for t in texts for w in t.split()})
    k = 128
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "lang": pa.array(["en"] * len(texts)),
        "text": pa.array(texts),
    })).repartition(8)   # force multi-batch partials -> real merging
    got = kmv_sketch(ds, k=k).to_pandas().sort_values("rank")
    assert len(got) == k
    assert got["rank"].tolist() == list(range(1, k + 1))
    hk = int(got.iloc[-1]["h_top"]) * (1 << 63) + int(got.iloc[-1]["h_low"])
    est = (k - 1) * (1 << 64) / hk
    assert abs(est - exact) / exact < 4 / np.sqrt(k)  # ~4 sigma


def test_pivot_events_declared_columns(ray_session, tmp_path):
    """Pivot counts per declared type; undeclared types are ignored;
    users with no declared events still appear (all zeros)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import pivot_events

    t = pa.table({
        "user_id": [1, 1, 1, 2, 2, 3],
        "event_type": ["click", "click", "view", "purchase",
                       "mystery", "mystery"],
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = pivot_events(str(tmp_path)).to_pandas().set_index("user_id")
    assert (got.loc[1, "n_click"], got.loc[1, "n_view"]) == (2, 1)
    assert got.loc[2, "n_purchase"] == 1
    # undeclared 'mystery' contributes nothing, but the user row exists
    assert got.loc[3].sum() == 0
    assert set(got.columns) == {"n_click", "n_view", "n_purchase",
                                "n_signup", "n_error"}


def test_read_docs_jsonl_branch(ray_session, tmp_path):
    """read_docs reads JSONL (the web-corpus interchange format) into
    the same flat-docs shape parquet yields, honoring column pruning."""
    import json

    from name_matching_ray.sources.docs_source import read_docs

    rows = [{"doc_id": 1, "text": "hello world", "lang": "en"},
            {"doc_id": 2, "text": "höla", "lang": "es"}]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ds = read_docs(str(p), columns=["doc_id", "text"])
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == ["doc_id", "text"]
    assert got["text"].tolist() == ["hello world", "höla"]


def test_clean_text_and_code_detect(ray_session):
    """clean_text: NFC composition, control strip, squeeze, trim —
    checked on combining characters, tabs, vertical tab, NULLs.
    code_detect: brace/semicolon density and indent fraction flip
    is_code; empty docs never flag."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.textstats import clean_text, code_detect

    decomposed = "école"                # é as e + combining acute
    rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [f"  {decomposed}\t x \x0b y  ",
                 None,
                 "int main() { return 0; }\n    indented();\n    more();",
                 "plain prose with many ordinary words in it today"],
    }
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    ct = clean_text(ds).to_pandas().set_index("doc_id")
    assert ct.loc[1, "clean_text"] == "école x y"   # composed é
    assert ct.loc[1, "changed"] == 1
    assert ct.loc[2, "clean_text"] == "" and ct.loc[2, "n_chars_after"] == 0
    assert ct.loc[4, "changed"] == 0

    cd = code_detect(ds).to_pandas().set_index("doc_id")
    assert cd.loc[3, "is_code"] == 1
    assert cd.loc[3, "n_braces"] == 2 and cd.loc[3, "n_semis"] == 3
    assert cd.loc[3, "indent_lines"] == 2
    assert cd.loc[4, "is_code"] == 0
    assert cd.loc[2, "is_code"] == 0   # empty doc never flags


def test_bucket_hash_join_semantics(ray_session):
    """Inner and left joins via the generic coarse-bucket primitive
    match pandas merge; overlapping non-key columns are rejected."""
    import pyarrow as pa
    import pytest
    import ray.data

    from name_matching_ray.stages.joins import bucket_hash_join

    left = ray.data.from_arrow(pa.table({
        "k": [1, 2, 3, 3, 5], "lv": ["a", "b", "c", "d", "e"]}))
    right = ray.data.from_arrow(pa.table({
        "k": [1, 3, 3, 4], "rv": [10, 30, 31, 40]}))

    inner = bucket_hash_join(left, right, on="k").to_pandas() \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    # k=3 fans out 2x2; k=2,5 drop; k=4 drops
    assert inner["k"].tolist() == [1, 3, 3, 3, 3]
    assert sorted(inner[inner.k == 3]["rv"].tolist()) == [30, 30, 31, 31]

    lj = bucket_hash_join(left, right, on="k", how="left").to_pandas()
    assert len(lj) == 1 + 4 + 2            # k=1, k=3 fanout, k=2/5 null
    assert lj[lj.k == 2]["rv"].isna().all()

    with pytest.raises(ValueError, match="disjoint"):
        bucket_hash_join(left, left, on="k")


def test_decay_sum_halflife_shift_law(ray_session, tmp_path):
    """Each elapsed half-life halves (floor) the contribution; the
    reference point is the global max ts; cents are exact."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import decay_sum

    ref = np.datetime64("2026-01-29T00:00:00", "us")
    day = np.timedelta64(86_400_000_000, "us")
    t = pa.table({
        "user_id": [1, 1, 1, 2],
        "ts": pa.array([ref, ref - 7 * day, ref - 20 * day, ref - 13 * day],
                       pa.timestamp("us")),
        # 10.01 -> 1001 cents; shifts: 0, 1 (7d//7), 2 (20d//7), 1 (13d//7)
        "value": [10.01, 10.01, 10.01, 10.01],
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = decay_sum(str(tmp_path), halflife_days=7).to_pandas() \
        .set_index("user_id")
    assert got.loc[1, "decay_cents"] == 1001 + (1001 >> 1) + (1001 >> 2)
    assert got.loc[1, "n_events"] == 3
    assert got.loc[2, "decay_cents"] == 1001 >> 1


def test_funnel_strict_order_and_ties(ray_session, tmp_path):
    """First-occurrence funnel: ties and out-of-order stages break the
    chain; repeat events don't double-count users."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import funnel_counts

    b = np.datetime64("2026-01-01T00:00:00", "us")
    s = np.timedelta64(1_000_000, "us")
    rows = [
        # u1: full funnel (with a repeat click that must not matter)
        (1, "view", b), (1, "click", b + s), (1, "click", b + 5 * s),
        (1, "purchase", b + 2 * s),
        # u2: click BEFORE view -> depth 1
        (2, "click", b), (2, "view", b + s), (2, "purchase", b + 2 * s),
        # u3: click ties view's ts -> strict order fails -> depth 1
        (3, "view", b), (3, "click", b),
        # u4: never viewed -> depth 0
        (4, "click", b), (4, "purchase", b + s),
    ]
    t = pa.table({
        "user_id": [r[0] for r in rows],
        "event_type": [r[1] for r in rows],
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = funnel_counts(str(tmp_path)).to_pandas().set_index("stage_idx")
    assert got.loc[0, "n_users"] == 3       # u1 u2 u3 viewed
    assert got.loc[1, "n_users"] == 1       # only u1 clicked after view
    assert got.loc[2, "n_users"] == 1       # only u1 purchased after click
    assert got.loc[0, "stage"] == "view"


def test_user_retention_week_pairs(ray_session, tmp_path):
    """Retention counts users active in w AND w+1; gaps don't retain;
    multiple events in a week count once."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import user_retention

    week_us = 604_800_000_000
    w0 = (np.datetime64("2026-01-01T00:00:00", "us").astype(np.int64)
          // week_us) * week_us
    def ts(week, off=0):
        return np.datetime64(int(w0 + week * week_us + off), "us")
    t = pa.table({
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": pa.array([ts(0), ts(0, 5), ts(1), ts(0), ts(2), ts(1)],
                       pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = user_retention(str(tmp_path)).to_pandas().set_index("week")
    base = w0 // week_us
    assert got.loc[base, "active_users"] == 2          # u1 u2
    assert got.loc[base, "retained_next"] == 1         # only u1 in w1
    assert got.loc[base + 1, "active_users"] == 2      # u1 u3
    assert got.loc[base + 1, "retained_next"] == 0     # nobody in w2 of them... u2 is, but wasn't active w1


def test_dup_size_hist_planted_groups(ray_session):
    """Histogram over planted exact-dup groups: sizes 3, 2, 1, and the
    normalization law (case/punct-insensitive) groups variants."""
    import ray.data

    from name_matching_ray.stages.dedup import dup_size_hist

    docs = ray.data.from_items([
        {"doc_id": 1, "text": "Alpha Beta!"},
        {"doc_id": 2, "text": "alpha beta"},
        {"doc_id": 3, "text": "ALPHA-BETA"},
        {"doc_id": 4, "text": "gamma"},
        {"doc_id": 5, "text": "GAMMA "},
        {"doc_id": 6, "text": "delta"},
    ])
    got = dup_size_hist(docs).to_pandas().set_index("group_size")
    assert got.loc[3, "n_groups"] == 1 and got.loc[3, "n_docs"] == 3
    assert got.loc[2, "n_groups"] == 1 and got.loc[2, "n_docs"] == 2
    assert got.loc[1, "n_groups"] == 1 and got.loc[1, "n_docs"] == 1


def test_bm25_topk_saturation_and_length_norm(ray_session):
    """BM25 semantics the tf-idf proxy lacks: tf saturates (doubling tf
    far less than doubles the score) and longer docs are penalized at
    equal tf; rarer terms outweigh common ones via idf bits."""
    import ray.data

    from name_matching_ray.stages.textstats import bm25_topk

    pad = " ".join(["filler"] * 96)
    docs = ray.data.from_items([
        {"doc_id": 1, "text": "cat " + " ".join(["dog"] * 3)},
        {"doc_id": 2, "text": " ".join(["cat"] * 4)},          # tf=4, dl=4
        {"doc_id": 3, "text": " ".join(["cat"] * 4) + " " + pad},  # dl=100
        {"doc_id": 4, "text": "dog mouse " + pad},
        {"doc_id": 5, "text": pad + " " + pad},
    ])
    out = bm25_topk(docs, {7: ["cat", "dog"]}, k=5).to_pandas()
    s = out.set_index("doc_id")["score_i"]
    # length normalization: same tf('cat')=4, doc 3 is 25x longer
    assert s[2] > s[3]
    # tf saturation: tf 4 vs tf 1 of 'cat' in equal-ish short docs gains
    # far less than 4x (compare cat-part of doc2 vs doc1's single cat +
    # dog tf3): the scores are within 2x despite 4x/3x tf
    assert s[2] < 2 * s[1]
    # every score positive, ranks are 1..4 (doc 5 matches nothing)
    assert (out["rank"].to_numpy() == range(1, len(out) + 1)).all()
    assert 5 not in s.index


def test_soundex_blocking_semantics(ray_session):
    """Soundex co-blocks phonetic variants (robert/rupert, smith/smyth)
    and the block table reports instance + distinct-spelling counts."""
    import ray.data

    from name_matching_ray.stages.blocking import (phonetic_block_stats,
                                                   soundex_key)

    # classic pairs under the simplified (h/w = vowel) variant
    assert soundex_key("robert") == soundex_key("rupert") == "r163"
    assert soundex_key("smith") == soundex_key("smyth") == "s530"
    assert soundex_key("tymczak") == "t522"
    # first letter's code participates in the collapse (pfister -> p236)
    assert soundex_key("pfister") == "p236"

    ds = ray.data.from_items([
        {"name": "Robert Smith"}, {"name": "Rupert  SMYTH"},
        {"name": "robert"}, {"name": "Ann-Marie"},
    ])
    got = phonetic_block_stats(ds, name_col="name").to_pandas() \
        .set_index("block_key")
    assert got.loc["r163", "n_tokens"] == 3      # robert x2 + rupert
    assert got.loc["r163", "n_distinct"] == 2
    assert got.loc["s530", "n_tokens"] == 2      # smith + smyth
    assert got.loc["s530", "n_distinct"] == 2
    # hyphen stripped -> 'annmarie' one token
    assert got.loc[soundex_key("annmarie"), "n_tokens"] == 1


def test_char_entropy_gibberish_ordering(ray_session):
    """Uniform spam scores 0; diverse natural text scores high; NULL and
    empty docs survive with (0, 0); unicode counted by codepoint."""
    import ray.data

    from name_matching_ray.stages.textstats import char_entropy

    docs = ray.data.from_items([
        {"doc_id": 1, "text": "aaaaaaaaaaaaaaaa"},            # uniform -> 0
        {"doc_id": 2, "text": "the quick brown fox jumps"},   # diverse
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": None},
        {"doc_id": 5, "text": "héé"},  # n=3: h cnt1 -> floor(log2 3)=1; é cnt2 -> floor(log2 1.5)=0
    ])
    got = char_entropy(docs).to_pandas().set_index("doc_id")
    assert got.loc[1, "entropy_bits"] == 0
    assert got.loc[2, "entropy_bits"] > 3 * got.loc[2, "n_chars"] // 2
    assert got.loc[3, "n_chars"] == 0 and got.loc[3, "entropy_bits"] == 0
    assert got.loc[4, "n_chars"] == 0 and got.loc[4, "entropy_bits"] == 0
    assert got.loc[5, "n_chars"] == 3 and got.loc[5, "entropy_bits"] == 1


def test_source_overlap_jaccard(ray_session):
    """Vocab Jaccard per source pair; zero-intersection pairs drop;
    duplicate tokens within a source count once."""
    import ray.data

    from name_matching_ray.stages.textstats import source_overlap

    docs = ray.data.from_items([
        {"doc_id": 1, "text": "a b c a", "source": "s1"},
        {"doc_id": 2, "text": "b c d", "source": "s2"},
        {"doc_id": 3, "text": "x y", "source": "s3"},
    ])
    got = source_overlap(docs).to_pandas() \
        .set_index(["source_a", "source_b"])
    r = got.loc[("s1", "s2")]
    assert r["inter"] == 2 and r["vocab_a"] == 3 and r["vocab_b"] == 3
    assert r["jaccard_bp"] == 2 * 10000 // 4
    # s3 shares nothing -> no rows
    assert len(got) == 1


def test_minhash_recall_planted_dups(ray_session):
    """Planted near-identical docs are ground-truth pairs the LSH must
    recover (recall high on easy corpus); counts are consistent."""
    import ray.data

    from name_matching_ray.stages.dedup import minhash_recall

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon")
    docs = [{"doc_id": i, "text": base + f" suffix{i}"} for i in range(6)]
    docs += [{"doc_id": 100 + i,
              "text": f"totally different text number {i} " + " ".join(
                  f"w{i}{j}" for j in range(20))} for i in range(4)]
    out = minhash_recall(ray.data.from_items(docs)).iloc[0]
    assert out["n_true"] >= 10            # the 6 planted docs pair up
    assert out["n_hit"] <= min(out["n_true"], out["n_found"])
    assert out["recall_bp"] >= 8000       # near-identical sigs must bucket
    assert 0 <= out["precision_bp"] <= 10000


def test_group_sample_deterministic_k(ray_session):
    """Same k ids per group every run; rank 1..k; small groups yield all
    their rows."""
    import ray.data

    from name_matching_ray.stages.curation import group_sample

    docs = [{"doc_id": i, "lang": "en"} for i in range(50)]
    docs += [{"doc_id": 100 + i, "lang": "de"} for i in range(2)]
    a = group_sample(ray.data.from_items(docs), k=3).to_pandas()
    b = group_sample(ray.data.from_items(docs), k=3).to_pandas()
    a = a.sort_values(["lang", "rank"]).reset_index(drop=True)
    b = b.sort_values(["lang", "rank"]).reset_index(drop=True)
    assert a.equals(b)
    assert (a[a["lang"] == "en"]["rank"].to_numpy() == [1, 2, 3]).all()
    assert len(a[a["lang"] == "de"]) == 2  # group smaller than k


def test_temperature_mix_upweights_small_sources(ray_session):
    """√-temperature keeps a HIGHER rate for small sources than
    proportional sampling; rates respect the 10000 bp cap."""
    import ray.data

    from name_matching_ray.stages.curation import temperature_mix

    docs = [{"doc_id": i, "source": "big"} for i in range(400)]
    docs += [{"doc_id": 1000 + i, "source": "small"} for i in range(16)]
    out = temperature_mix(ray.data.from_items(docs), budget=100).to_pandas()
    r = out.groupby("source")["rate_bp"].first()
    # w_big=20, w_small=4, Σw=24: target_big=83 -> 2075bp; target_small=16
    # -> 10000bp (capped): the small source keeps EVERYTHING
    assert r["small"] == 10000
    assert r["big"] == (100 * 20 // 24) * 10000 // 400
    # proportional sampling would keep small at ~budget/total = 24% — the
    # temperature law keeps 100%
    kept = out.groupby("source")["keep"].sum()
    assert kept["small"] == 16


def test_dedup_lines_rebuild(ray_session):
    """Repeated lines keep their first occurrence only, order preserved,
    empty lines dedup too; NULL -> '' (one empty line)."""
    import ray.data

    from name_matching_ray.stages.textstats import dedup_lines

    docs = ray.data.from_items([
        {"doc_id": 1, "text": "nav\nbody one\nnav\nbody two\n\n\nnav"},
        {"doc_id": 2, "text": "only line"},
        {"doc_id": 3, "text": None},
    ])
    got = dedup_lines(docs).to_pandas().set_index("doc_id")
    assert got.loc[1, "text_dedup"] == "nav\nbody one\nbody two\n"
    assert got.loc[1, "n_lines"] == 7 and got.loc[1, "n_kept"] == 4
    assert got.loc[2, "text_dedup"] == "only line"
    assert got.loc[3, "n_lines"] == 1 and got.loc[3, "text_dedup"] == ""


def test_dup_by_source_rates(ray_session):
    """Dup rate per source; cross-source copies are distinct in each;
    case/punct variants collapse under the fingerprint law."""
    import ray.data

    from name_matching_ray.stages.dedup import dup_by_source

    docs = ray.data.from_items([
        {"doc_id": 1, "text": "Hello World", "source": "a"},
        {"doc_id": 2, "text": "hello, world!", "source": "a"},
        {"doc_id": 3, "text": "unique a", "source": "a"},
        {"doc_id": 4, "text": "Hello World", "source": "b"},
    ])
    got = dup_by_source(docs).to_pandas().set_index("source")
    assert got.loc["a", "n_docs"] == 3 and got.loc["a", "n_distinct"] == 2
    assert got.loc["a", "dup_bp"] == 10000 // 3
    assert got.loc["b", "n_docs"] == 1 and got.loc["b", "dup_bp"] == 0


def test_grouped_top_words_lossless_topk(ray_session):
    """Counts aggregate across docs; tie-break is (n DESC, word ASC);
    per-group ranking is independent."""
    import ray.data

    from name_matching_ray.stages.textstats import grouped_top_words

    docs = ray.data.from_items([
        {"doc_id": 1, "text": "x x x y y z", "lang": "en"},
        {"doc_id": 2, "text": "y x z w", "lang": "en"},
        {"doc_id": 3, "text": "a b a", "lang": "de"},
    ])
    got = grouped_top_words(docs, k=3).to_pandas()
    en = got[got["lang"] == "en"].set_index("rank")
    assert list(en.loc[[1, 2, 3], "word"]) == ["x", "y", "z"]
    assert list(en.loc[[1, 2, 3], "n"]) == [4, 3, 2]
    de = got[got["lang"] == "de"].set_index("rank")
    assert de.loc[1, "word"] == "a" and de.loc[2, "word"] == "b"


def test_incremental_dedup_streaming_state(ray_session):
    """Exactly one keeper per fingerprint group within a run; a second
    run over the SAME index marks everything dup (state carries across
    Dataset executions); a fresh index starts clean."""
    import ray.data

    from name_matching_ray.state.incremental import (IncrementalIndex,
                                                     incremental_dedup)

    docs = ray.data.from_items(
        [{"doc_id": i, "text": f"doc {i % 5}"} for i in range(20)])
    idx = IncrementalIndex(n_shards=4)
    out = incremental_dedup(docs, idx).to_pandas()
    keep = out[out["is_dup"] == 0]
    assert len(keep) == 5                       # one per distinct text
    assert keep["fingerprint"].nunique() == 5
    assert out["is_dup"].sum() == 15
    assert sum(idx.sizes()) == 5
    # second pass over the same index: zero keepers
    out2 = incremental_dedup(docs, idx).to_pandas()
    assert out2["is_dup"].sum() == 20
    # a fresh index sees everything as new again
    out3 = incremental_dedup(docs, IncrementalIndex(n_shards=4)).to_pandas()
    assert (out3["is_dup"] == 0).sum() == 5


def test_pq_encode_exact_reconstruction(ray_session):
    """A vector that IS a codebook row encodes to its own cid with zero
    distortion in every subspace; costs are true squared L2 on the grid."""
    import numpy as np
    import ray.data

    from name_matching_ray.stages.annsearch import pq_encode

    rng = np.random.default_rng(3)
    vecs = rng.uniform(-1, 1, (10, 8)).astype(np.float32)
    items = [{"vec_id": i, "embedding": list(map(float, vecs[i]))}
             for i in range(10)]
    out = pq_encode(ray.data.from_items(items),
                    codebook_ids=[0, 1, 2, 3], m=2).to_pandas()
    assert len(out) == 20
    for cid in range(4):  # codebook rows reconstruct exactly
        rows = out[out["vec_id"] == cid]
        assert (rows["code"] == cid).all() and (rows["cost"] == 0).all()
    # every cost equals the true grid L2 to the chosen centroid
    codes = np.floor(vecs.astype(np.float64) * 127 + 0.5).astype(np.int64)
    for _, r in out[out["vec_id"] == 7].iterrows():
        s = int(r["subspace"])
        d = codes[7, s * 4:(s + 1) * 4] - codes[int(r["code"]), s * 4:(s + 1) * 4]
        assert r["cost"] == (d ** 2).sum()


def test_pq_topk_adc_consistency(ray_session):
    """ADC distance to a query's own vector is the query's total PQ
    distortion (codes reconstruct through the same codebook); ranks are
    1..k ascending in adc."""
    import ray.data

    from name_matching_ray.stages.annsearch import pq_encode, pq_topk

    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"])
    out = pq_topk(emb, [0], list(range(8)), k=10, m=4).to_pandas()
    assert len(out) == 10
    assert (out.sort_values("rank")["adc"].diff().dropna() >= 0).all()
    # vec 0 IS codebook row 0: its codes have zero distortion, so its ADC
    # to itself equals the query-side quantization residual = LUT self
    # distance = 0 → it must be rank 1 with adc 0
    top = out[out["rank"] == 1].iloc[0]
    assert top["vec_id"] == 0 and top["adc"] == 0


def test_grid_l2_and_pq_recall(ray_session):
    """Flat grid index: self-distance 0 at rank 1; pq_recall rows are
    bounded and the composition is consistent with its parts."""
    import ray.data

    from name_matching_ray.stages.annsearch import grid_l2_topk, pq_recall

    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"])
    flat = grid_l2_topk(emb, [3], k=5).to_pandas()
    assert flat[flat["rank"] == 1].iloc[0]["vec_id"] == 3
    assert flat[flat["rank"] == 1].iloc[0]["dist"] == 0
    rec = pq_recall(emb, [0, 3], list(range(8)), k=5)
    assert len(rec) == 2
    assert ((rec["recall_bp"] >= 0) & (rec["recall_bp"] <= 10000)).all()
    assert (rec["n_hit"] * 2000 == rec["recall_bp"]).all()  # k=5


def test_rolling_active_window_membership(ray_session, tmp_path):
    """wau(d) counts a user once for any activity in the trailing 7 days;
    phantom post-activity days don't appear; dau rides along."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import rolling_active

    day_us = 86_400_000_000
    d0 = (np.datetime64("2026-02-01", "us").astype(np.int64) // day_us)
    def ts(day, off=0):
        return np.datetime64(int(day * day_us + off), "us")
    t = pa.table({
        "user_id": [1, 1, 2, 1],
        # u1 active d0 (twice) and d0+3; u2 active d0+9 (outside window)
        "ts": pa.array([ts(d0), ts(d0, 7), ts(d0 + 9), ts(d0 + 3)],
                       pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = rolling_active(str(tmp_path)).to_pandas().set_index("day")
    assert set(got.index) == {d0, d0 + 3, d0 + 9}  # observed days only
    assert got.loc[d0, "wau"] == 1 and got.loc[d0, "dau"] == 1
    assert got.loc[d0 + 3, "wau"] == 1              # still just u1
    assert got.loc[d0 + 9, "wau"] == 2              # u2 + u1 (d0+3 in win)
    assert got.loc[d0 + 9, "dau"] == 1


def test_pagerank_hub_ranks_highest(ray_session):
    """A star of near-dup docs ranks its hub above the leaves (the
    template-detection property); the integer law is deterministic."""
    import ray.data

    from name_matching_ray.stages.cluster import pagerank_dupgraph

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    # hub 0 shares a long prefix with leaves 1..4; leaves differ in their
    # own suffixes so leaf-leaf Jaccard stays below the threshold
    docs = [{"doc_id": 0, "text": base}]
    docs += [{"doc_id": i,
              "text": base + " " + " ".join(f"leaf{i}x{j}" for j in range(14))}
             for i in range(1, 5)]
    a = pagerank_dupgraph(ray.data.from_items(docs), iters=2,
                          tau100=50).to_pandas().set_index("doc_id")
    b = pagerank_dupgraph(ray.data.from_items(docs), iters=2,
                          tau100=50).to_pandas().set_index("doc_id")
    assert a.sort_index().equals(b.sort_index())
    assert a.loc[0, "pagerank"] == a["pagerank"].max()
    assert (a.drop(0)["pagerank"] < a.loc[0, "pagerank"]).all()


def test_bucket_hash_join_semi_anti(ray_session):
    """semi keeps left rows WITH a match, anti those WITHOUT; right
    payload columns never appear; duplicate right keys don't multiply."""
    import ray.data

    from name_matching_ray.stages.joins import bucket_hash_join

    left = ray.data.from_items([
        {"k": 1, "a": "x"}, {"k": 2, "a": "y"}, {"k": 3, "a": "z"}])
    right = ray.data.from_items([
        {"k": 1, "b": 10}, {"k": 1, "b": 11}, {"k": 9, "b": 12}])
    semi = bucket_hash_join(left, right, on="k", how="semi").to_pandas()
    anti = bucket_hash_join(left, right, on="k", how="anti").to_pandas()
    assert sorted(semi["k"]) == [1] and list(semi.columns) == ["k", "a"]
    assert sorted(anti["k"]) == [2, 3]


def test_ivfpq_subset_of_pq(ray_session):
    """IVFPQ searches only the probed cells: its result per query is the
    pq_topk ranking restricted to a subset (every IVFPQ hit appears in
    the unrestricted ADC ranking at the same or better adc)."""
    import ray.data

    from name_matching_ray.stages.annsearch import (fixed_centroids,
                                                    ivfpq_topk, pq_topk)

    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"])
    full = pq_topk(emb, [0], list(range(8)), k=500, m=4).to_pandas()
    sub = ivfpq_topk(emb, fixed_centroids(8, 64), [0], list(range(8)),
                     k=10, nprobe=4, m=4).to_pandas()
    assert len(sub) == 10
    fmap = full.set_index("vec_id")["adc"]
    for _, r in sub.iterrows():
        assert fmap.loc[r["vec_id"]] == r["adc"]   # same ADC law
    # probing fewer cells can only LOSE candidates: the adc at each rank
    # is >= the unrestricted ranking's adc at that rank
    fr = full.sort_values("rank")["adc"].to_numpy()[:10]
    sr = sub.sort_values("rank")["adc"].to_numpy()
    assert (sr >= fr).all()


def test_perplexity_buckets_tertiles(ray_session):
    """Repetitive in-model docs land in head, OOV gibberish in tail;
    tertile sizes are balanced within peer-tie slack."""
    import ray.data

    from name_matching_ray.stages.textstats import perplexity_buckets

    common = "the cat sat on the mat and the dog ran off"
    docs = [{"doc_id": i, "text": common} for i in range(6)]
    docs += [{"doc_id": 10 + i, "text": common + f" extra{i} words{i}"}
             for i in range(6)]
    docs += [{"doc_id": 20 + i,
              "text": " ".join(f"zq{i}{j}xv" for j in range(10))}
             for i in range(6)]
    got = perplexity_buckets(ray.data.from_items(docs), vocab=64) \
        .to_pandas().set_index("doc_id")
    assert (got.loc[range(6), "bucket"] == "head").all()
    assert (got.loc[range(20, 26), "bucket"] == "tail").all()
    # monotone: head bpt <= middle bpt <= tail bpt
    assert got[got["bucket"] == "head"]["bpt"].max() <= \
        got[got["bucket"] == "middle"]["bpt"].min()
    assert got[got["bucket"] == "middle"]["bpt"].max() <= \
        got[got["bucket"] == "tail"]["bpt"].min()


def test_profile_table_null_and_types(ray_session, tmp_path):
    """Nulls counted, distinct exact across batches, numeric min/max via
    the typed law (no '10' < '9' string order), floats in cents."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import profile_table

    t = pa.table({
        "o_custkey": pa.array([9, 10, None, 10], pa.int64()),
        "o_orderstatus": pa.array(["P", None, "F", "O"], pa.string()),
        "o_totalprice": pa.array([1.01, 2.5, None, 100.0], pa.float64()),
    })
    pq.write_table(t, tmp_path / "orders.parquet")
    got = profile_table(str(tmp_path)).to_pandas().set_index("column")
    ck = got.loc["o_custkey"]
    assert ck["n_rows"] == 4 and ck["n_nulls"] == 1
    assert ck["n_distinct"] == 2
    assert ck["min_v"] == "9" and ck["max_v"] == "10"   # numeric order
    st = got.loc["o_orderstatus"]
    assert st["min_v"] == "F" and st["max_v"] == "P" and st["n_nulls"] == 1
    tp = got.loc["o_totalprice"]
    assert tp["min_v"] == "101" and tp["max_v"] == "10000"  # cents law


def test_conversion_time_percentiles(ray_session, tmp_path):
    """Only strictly-ordered converters count; delays floor to seconds;
    the peers-inclusive percentile rule picks exact values."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import conversion_time

    b = np.datetime64("2026-01-01T00:00:00", "us")
    s = np.timedelta64(1_000_000, "us")
    rows = []
    # converters with delays 10, 20, 30, 40 s
    for u, d in [(1, 10), (2, 20), (3, 30), (4, 40)]:
        rows += [(u, "view", b), (u, "purchase", b + d * s)]
    # purchase BEFORE view -> not a converter
    rows += [(9, "purchase", b), (9, "view", b + s)]
    t = pa.table({
        "user_id": [r[0] for r in rows],
        "event_type": [r[1] for r in rows],
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = conversion_time(str(tmp_path)).to_pandas().set_index("q_bp")
    # n=4: p25 -> first v with cum*1e4 >= 2500*4=1e4 -> cum>=1 -> 10
    assert got.loc[2500, "delay_s"] == 10
    assert got.loc[5000, "delay_s"] == 20
    assert got.loc[7500, "delay_s"] == 30
    assert got.loc[9000, "delay_s"] == 40


def test_incremental_index_checkpoint(ray_session, tmp_path):
    """A saved+restored index remembers everything: the restored run
    marks all previously-seen docs dup; new docs still pass."""
    import ray.data

    from name_matching_ray.state.incremental import (IncrementalIndex,
                                                     incremental_dedup)

    docs = ray.data.from_items(
        [{"doc_id": i, "text": f"ck doc {i}"} for i in range(10)])
    idx = IncrementalIndex(n_shards=4)
    incremental_dedup(docs, idx).to_pandas()
    sizes = idx.save(str(tmp_path / "ckpt"))
    assert sum(sizes) == 10
    idx2 = IncrementalIndex.load(str(tmp_path / "ckpt"), n_shards=4)
    out = incremental_dedup(docs, idx2).to_pandas()
    assert out["is_dup"].sum() == 10
    new = ray.data.from_items([{"doc_id": 99, "text": "brand new"}])
    assert incremental_dedup(new, idx2).to_pandas()["is_dup"].sum() == 0


def test_curate_corpus_composition(ray_session):
    """keep == quality_keep AND dedup_keep: dup copies lose dedup_keep
    (first doc_id wins), junk loses quality_keep."""
    import ray.data

    from name_matching_ray.stages.curation import curate_corpus

    good = ("This is a reasonably long sentence with many common words "
            "that the quality gate should accept without any trouble. "
            "It continues for a while and ends properly.") * 3
    docs = ray.data.from_items([
        {"doc_id": 1, "text": good},
        {"doc_id": 2, "text": good},              # exact dup of 1
        {"doc_id": 3, "text": "x { junk"},        # fails quality
    ])
    got = curate_corpus(docs).to_pandas().set_index("doc_id")
    assert got.loc[1, "dedup_keep"] == 1 and got.loc[2, "dedup_keep"] == 0
    assert got.loc[3, "quality_keep"] == 0 and got.loc[3, "keep"] == 0
    assert (got["keep"] == got["quality_keep"] * got["dedup_keep"]).all()


def test_broadcast_join_equals_bucketed(ray_session):
    """broadcast_join == bucket_hash_join on every mode; the size guard
    refuses oversized broadcast sides and names the alternative."""
    import pytest
    import ray.data

    from name_matching_ray.stages.joins import (broadcast_join,
                                                bucket_hash_join)

    left = ray.data.from_items(
        [{"k": i % 7, "a": f"l{i}"} for i in range(40)])
    right = ray.data.from_items(
        [{"k": 1, "b": 10}, {"k": 3, "b": 30}, {"k": 99, "b": 99}])

    import pandas as pd

    def canon(df, cols):
        out = df[cols].copy()
        for c in cols:
            out[c] = out[c].map(
                lambda x: "" if pd.isna(x)
                else str(int(x)) if isinstance(x, (int, float))
                and float(x) == int(float(x)) else str(x))
        return out.sort_values(cols).reset_index(drop=True)

    for how in ("inner", "left", "semi", "anti"):
        b1 = broadcast_join(left, right, on="k", how=how).to_pandas()
        b2 = bucket_hash_join(left, right, on="k", how=how).to_pandas()
        cols = sorted(b1.columns)
        assert canon(b1, cols).equals(canon(b2, cols)), how

    with pytest.raises(ValueError, match="bucket_hash_join"):
        broadcast_join(left, right, on="k", max_rows=2)


def test_cluster_size_hist_conservation(ray_session):
    """Σ n_docs == corpus size; planted chains collapse transitively into
    one cluster of the chain length."""
    import __ray_entry__ as ent

    out = ent._cluster_size_hist("/root/testdata/sf0.001").to_pandas()
    assert out["n_docs"].sum() == 500
    assert (out["n_docs"] == out["cluster_size"] * out["n_clusters"]).all()
    assert out["cluster_size"].min() >= 1


def test_revenue_rollup_margins_consistent(ray_session):
    """Margins are exact sums of the finest level; the grand total
    appears once; every (nation,status) cell sums into both margins."""
    import __ray_entry__ as ent

    out = ent.queries()["revenue_rollup"]("/root/testdata/sf0.001") \
        .to_pandas()
    fine = out[(out["nation"] != "ALL") & (out["status"] != "ALL")]
    by_n = out[(out["nation"] != "ALL") & (out["status"] == "ALL")]
    tot = out[(out["nation"] == "ALL") & (out["status"] == "ALL")]
    assert len(tot) == 1
    assert tot.iloc[0]["revenue_c"] == fine["revenue_c"].sum()
    assert tot.iloc[0]["n_orders"] == fine["n_orders"].sum()
    m = fine.groupby("nation")["revenue_c"].sum()
    for _, r in by_n.iterrows():
        assert r["revenue_c"] == m[r["nation"]]


def test_source_surprisal_rollup(ray_session):
    """Per-source bits are the exact sums of per-doc unigram_bits."""
    import ray.data

    from name_matching_ray.stages.textstats import (source_surprisal,
                                                    unigram_bits)

    docs = ray.data.from_items(
        [{"doc_id": i, "text": f"common words here {i % 3}",
          "source": f"s{i % 2}"} for i in range(12)])
    per_doc = unigram_bits(docs, vocab=64).to_pandas()
    got = source_surprisal(docs, vocab=64).to_pandas() \
        .set_index("source")
    for s in ("s0", "s1"):
        ids = [i for i in range(12) if f"s{i % 2}" == s]
        sub = per_doc[per_doc["doc_id"].isin(ids)]
        assert got.loc[s, "bits"] == sub["bits"].sum()
        assert got.loc[s, "n_tok"] == sub["n_tok"].sum()
        assert got.loc[s, "n_docs"] == len(ids)


def test_event_transitions_lag_law(ray_session, tmp_path):
    """Transitions never straddle users; firsts have no predecessor;
    p_bp row-normalizes over each from_type's outgoing total."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import event_transitions

    b = np.datetime64("2026-01-01T00:00:00", "us")
    s = np.timedelta64(1_000_000, "us")
    rows = [(1, 1, "a", b), (2, 1, "b", b + s), (3, 1, "a", b + 2 * s),
            (4, 2, "a", b), (5, 2, "a", b + s),
            (6, 3, "c", b)]
    t = pa.table({
        "event_id": [r[0] for r in rows],
        "user_id": [r[1] for r in rows],
        "event_type": [r[2] for r in rows],
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = event_transitions(str(tmp_path)).to_pandas() \
        .set_index(["from_type", "to_type"])
    assert got.loc[("a", "b"), "n"] == 1
    assert got.loc[("a", "a"), "n"] == 1
    assert got.loc[("b", "a"), "n"] == 1
    assert len(got) == 3                   # u3's lone 'c' emits nothing
    # a has 2 outgoing: a->b and a->a each 5000 bp
    assert got.loc[("a", "b"), "p_bp"] == 5000
    assert got.loc[("b", "a"), "p_bp"] == 10000


def test_cluster_outliers_planted(ray_session):
    """A vector equal to a centroid can't be its cell's outlier when a
    far vector shares the cell; distances are exact grid L2."""
    import numpy as np
    import ray.data

    from name_matching_ray.stages.annsearch import (_quantize127,
                                                    cluster_outliers)

    cent = np.zeros((2, 4)); cent[0, 0] = 1.0; cent[1, 1] = 1.0
    vecs = {
        1: [1.0, 0.0, 0.0, 0.0],     # == centroid 0 -> dist 0
        2: [0.9, 0.0, 0.3, 0.3],     # cell 0, off-center
        3: [0.0, 1.0, 0.0, 0.0],     # == centroid 1
    }
    ds = ray.data.from_items(
        [{"vec_id": k, "embedding": v} for k, v in vecs.items()])
    got = cluster_outliers(ds, cent).to_pandas().set_index("cluster")
    assert got.loc[0, "vec_id"] == 2
    v = _quantize127(np.array(vecs[2])).astype(np.int64)
    c = _quantize127(cent[0]).astype(np.int64)
    assert got.loc[0, "dist"] == ((v - c) ** 2).sum()
    assert got.loc[1, "vec_id"] == 3 and got.loc[1, "dist"] == 0


def test_supplier_balance_negatives(ray_session, tmp_path):
    """Negative balances floor under the same cents law and count into
    n_negative; nation names resolve through the broadcast dim."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import supplier_balance

    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": ["ALPHA", "BETA"],
    }), tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": ["a", "b", "c"],
        "s_nationkey": pa.array([0, 0, 1], pa.int32()),
        "s_acctbal": pa.array([10.01, -2.005, 5.0], pa.float64()),
    }), tmp_path / "supplier.parquet")
    got = supplier_balance(str(tmp_path)).to_pandas().set_index("n_name")
    # -2.005*100 = -200.49999... +0.5 -> floor(-199.99..) = -200
    assert got.loc["ALPHA", "bal_cents"] == 1001 - 200
    assert got.loc["ALPHA", "n_negative"] == 1
    assert got.loc["BETA", "n_suppliers"] == 1


def test_token_blocking_budget_distinct_and_nulls(ray_session, tmp_path):
    """Within-doc token repeats count ONCE per doc (distinct doc,token);
    NULL text contributes nothing; pair budget = n_blocks * s*(s-1)//2."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from name_matching_ray.stages.textstats import token_blocking_budget

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        # "acme" in docs 1,2,3 (twice in doc 1 -> still one); "corp" in
        # docs 1,2; "zeta" only in doc 3; doc 4 NULL
        "text": pa.array(["acme acme  corp", "acme corp", "acme zeta", None],
                         pa.string()),
    }), tmp_path / "docs.parquet")
    ds = ray.data.read_parquet(str(tmp_path / "docs.parquet"))
    got = token_blocking_budget(ds).to_pandas() \
        .sort_values("block_size").reset_index(drop=True)
    # block sizes: acme=3, corp=2, zeta=1
    assert got.to_dict("records") == [
        {"block_size": 1, "n_blocks": 1, "pairs_c": 0},
        {"block_size": 2, "n_blocks": 1, "pairs_c": 1},
        {"block_size": 3, "n_blocks": 1, "pairs_c": 3},
    ]


def test_shipping_priority_filters_and_tiebreak(ray_session, tmp_path):
    """Only the target segment's customers, orders strictly before the
    cut, lineitems strictly after it; revenue ties break on orderkey."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import shipping_priority

    ts = lambda s: pd.Timestamp(s)
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_mktsegment": ["BUILDING", "MACHINERY"],
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 1], pa.int64()),
        "o_orderdate": pa.array(
            [ts("1998-01-01"), ts("1998-01-02"), ts("1998-01-03"),
             ts("1998-06-01")],  # 13: ON the cut -> excluded (strict <)
            pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "1-URGENT"],
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 11, 12, 13], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 150.0, 999.0, 10.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0]),
        "l_shipdate": pa.array(
            [ts("1998-07-01"), ts("1998-06-01"),  # 2nd ON cut -> excluded
             ts("1998-07-01"), ts("1998-07-01"), ts("1998-07-01")],
            pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    got = shipping_priority(str(tmp_path)).to_pandas() \
        .reset_index(drop=True)
    # order 12 is MACHINERY (semi-join drops), 13 is on the cut date;
    # orders 10 and 11 both net 100.00 and 150.00... 10: only the
    # 1998-07-01 line counts (100.0); 11: 150.0
    assert list(got["o_orderkey"]) == [11, 10]
    assert list(got["revenue_c"]) == [15000, 10000]
    assert list(got["order_day"]) == ["1998-01-02", "1998-01-01"]
    # tie-break: equal revenues order by orderkey ascending
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 11], pa.int64()),
        "l_extendedprice": pa.array([100.0, 100.0]),
        "l_discount": pa.array([0.0, 0.0]),
        "l_shipdate": pa.array([ts("1998-07-01")] * 2, pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    got = shipping_priority(str(tmp_path)).to_pandas()
    assert list(got["o_orderkey"]) == [10, 11]


def test_skipgram_counts_window_directions_and_doc_boundary(ray_session):
    """Pairs keep direction, sum over distances 1..window, never cross a
    document boundary; leading/trailing whitespace split artifacts do not
    shift the distance; min_count filters on the GLOBAL count."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.textstats import skipgram_counts

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["  The cat sat on the mat ", "the cat the cat the cat"],
    }))
    got = skipgram_counts(ds, window=3, min_count=2).to_pandas() \
        .sort_values(["w1", "w2"]).reset_index(drop=True)
    # hand-counted over both docs (see doc 2: (the,cat) d1 x3 + d3 x2,
    # doc 1: d1 x1, d2 x0, d3 x0 -> 6 total; direction matters)
    assert got.to_dict("records") == [
        {"w1": "cat", "w2": "cat", "c_sg": 2},
        {"w1": "cat", "w2": "the", "c_sg": 4},
        {"w1": "the", "w2": "cat", "c_sg": 6},
        {"w1": "the", "w2": "the", "c_sg": 2},
    ]


def test_dedup_keep_longest_length_then_id(ray_session):
    """The keeper is the LONGEST raw text per fingerprint group (character
    length, before normalization); ties break to the lowest doc_id; null
    and '' text coalesce into one zero-length group."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.dedup import dedup_keep_longest

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([5, 3, 9, 2, 1, 4, 6], pa.int64()),
        "text": ["hello", "Hello!!", "h e l l o",   # one fp group
                 "abc", "ABC",                       # tie on length 3
                 None, ""],                          # coalesced group
    }))
    got = dedup_keep_longest(ds).to_pandas().set_index("keep_id")
    assert got.loc[9, "keep_len"] == 9 and got.loc[9, "n_dups"] == 3
    assert got.loc[1, "keep_len"] == 3 and got.loc[1, "n_dups"] == 2
    assert got.loc[4, "keep_len"] == 0 and got.loc[4, "n_dups"] == 2
    assert len(got) == 3


def test_rfm_segments_grid_and_recency(ray_session, tmp_path):
    """Recency is measured against the corpus max order date; the 4..1
    grid scores compose as r*100 + f*10 + m; cents law is per-order
    floor(x*100+0.5) summed."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import rfm_segments

    ts = pd.Timestamp
    rows = []
    # cust 1: 12 orders ending ON the corpus max -> r4 f4; 25_000_000
    # cents each -> 300_000_000 -> m4 -> rfm 444
    for i in range(12):
        rows.append((1, ts("2000-01-01") - pd.Timedelta(days=i),
                     250_000.0))
    # cust 2: 1 stale order -> r1 f1 m1 -> 111
    rows.append((2, ts("1997-06-01"), 10.0))
    # cust 3: 4 orders, last 306 days back -> r3 f2; 4 x 50_000_000
    # cents = 200_000_000 -> m3 -> 323
    for i in range(4):
        rows.append((3, ts("1999-03-01") - pd.Timedelta(days=i),
                     500_000.0))
    cust, date, price = zip(*rows)
    pq.write_table(pa.table({
        "o_custkey": pa.array(cust, pa.int64()),
        "o_orderdate": pa.array(list(date), pa.timestamp("us")),
        "o_totalprice": pa.array(price, pa.float64()),
    }), tmp_path / "orders.parquet")
    got = rfm_segments(str(tmp_path)).to_pandas().set_index("o_custkey")
    assert got.loc[1, "rfm"] == 444 and got.loc[1, "recency_days"] == 0
    assert got.loc[2, "rfm"] == 111
    assert got.loc[3, "rfm"] == 323 and got.loc[3, "recency_days"] == 306
    assert got.loc[3, "monetary_cents"] == 200_000_000


def test_snm_pairs_boundary_replication_and_order(ray_session):
    """Pairs must form across rank-chunk boundaries (boundary replication)
    and across prefix-group edges; order is (key, doc_id) with ties broken
    by id; gap records the rank distance."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import snm_pairs

    # 10 docs whose collapsed keys sort as a0 < a0 < a1 < b0 < ... (two
    # ties on 'a0' -> id order) spread over several input blocks; chunk=4
    # forces pairs to span chunk boundaries, window=2.
    texts = ["A-0!", "a 0", "a1", "b0", "b1", "b2", "c0", "c1", "d0", "d1"]
    ids = [7, 3, 1, 2, 9, 4, 5, 6, 8, 0]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": texts,
    })).repartition(4)
    got = snm_pairs(ds, window=2, chunk=4).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # sorted (key, id): a0/3, a0/7, a1/1, b0/2, b1/9, b2/4, c0/5, c1/6,
    # d0/8, d1/0 -> ranks 1..10; window-2 pairs = (r, r+1), (r, r+2)
    order = [3, 7, 1, 2, 9, 4, 5, 6, 8, 0]
    want = set()
    for i in range(10):
        for d in (1, 2):
            if i + d < 10:
                want.add((order[i], order[i + d], d))
    assert set(map(tuple, got[["id_a", "id_b", "gap"]].to_numpy())) == want
    assert len(got) == len(want)


def test_blocking_quality_group_size_math(ray_session):
    """Metrics from group sizes: same-fp-different-first-token pairs are
    true-but-missed; keyless docs (empty/whitespace/null) never enter the
    candidate side; pc_bp floors."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import blocking_quality

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(7), pa.int64()),
        "text": ["ab c", "a bc",          # same fp, DIFFERENT first token
                 "x y", "x z", "x y",     # key 'x': C(3,2)=3 cand; 1 true
                 None, "   "],            # keyless; same fp ('' collapse)
    }))
    got = blocking_quality(ds).to_pandas().iloc[0]
    assert got["n_docs"] == 7 and got["n_keyed"] == 5
    # true pairs: {ab c, a bc}=1, {x y, x y}=1, {None, '   '}=1 -> 3
    assert got["n_true_pairs"] == 3
    assert got["n_cand_pairs"] == 3      # only the 'x' block
    assert got["n_true_cand"] == 1       # the x-y duplicate pair
    assert got["pc_bp"] == 3333          # floor(1e4/3)


def test_edit_block_pairs_cap_and_distance(ray_session):
    """Distance runs on the collapsed 24-char prefix; the block key is
    the first 8 collapse chars; pairs beyond lev 2 drop; blocks above
    max_block drop entirely."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import edit_block_pairs

    rows = [
        (1, "acme corporation"),     # key 'acmecorp', s 'acmecorporation'
        (2, "acme corp"),            # lev vs 1 = 7 -> dropped
        (3, "acme corporatio"),      # lev vs 1 = 1, vs 2 = 6
        (4, "acme corporati0n"),     # lev vs 1 = 1, vs 3 = 2
        (5, "zeta w"),               # singleton block -> nothing
    ]
    # a capped block: 5 identical docs under key 'bigsame' with max_block=4
    rows += [(10 + i, "big same") for i in range(5)]
    ids, texts = zip(*rows)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": list(texts),
    }))
    got = edit_block_pairs(ds, k=2, max_block=4).to_pandas()
    pairs = {(int(a), int(b)): int(d) for a, b, d in
             got[["id_a", "id_b", "lev"]].to_numpy()}
    assert pairs == {(1, 3): 1, (1, 4): 1, (3, 4): 2}


def test_golden_record_modal_tiebreak(ray_session, tmp_path):
    """Modal attribute wins; count ties break to the lexicographically
    smallest value; last_ts_us is the max order date in epoch us."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import golden_record

    ts = pd.Timestamp
    rows = [
        # cust 1: prio 2-URGENT x2 vs 1-HIGH x2 (tie -> '1-HIGH'),
        # status F x3 vs O x1 -> 'F'
        (1, "2-URGENT", "F", ts("2000-01-05")),
        (1, "2-URGENT", "F", ts("2000-01-04")),
        (1, "1-HIGH", "F", ts("2000-01-03")),
        (1, "1-HIGH", "O", ts("2000-01-06")),
        # cust 2: single order
        (2, "3-MEDIUM", "P", ts("1999-07-01")),
    ]
    cust, prio, status, date = zip(*rows)
    pq.write_table(pa.table({
        "o_custkey": pa.array(cust, pa.int64()),
        "o_orderpriority": pa.array(prio, pa.string()),
        "o_orderstatus": pa.array(status, pa.string()),
        "o_orderdate": pa.array(list(date), pa.timestamp("us")),
    }), tmp_path / "orders.parquet")
    got = golden_record(str(tmp_path)).to_pandas().set_index("o_custkey")
    assert got.loc[1, "top_priority"] == "1-HIGH"
    assert got.loc[1, "top_status"] == "F"
    assert got.loc[1, "n_orders"] == 4
    assert got.loc[1, "last_ts_us"] == ts("2000-01-06").value // 1000
    assert got.loc[2, "top_priority"] == "3-MEDIUM"


def test_meta_blocking_cbs_weight_and_mean_prune(ray_session):
    """CBS weight counts shared df-capped TRIGRAM blocks; singleton and
    stop-shingle blocks contribute nothing; edges below the mean weight
    prune (w * n_pairs >= sum_w, the floor-free integer law)."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import meta_blocking_pairs

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["a b c d", "a b c e", "a b c d e", "x y z w"],
    })).repartition(2)
    # trigram df: 'a b c'=3, 'b c d'=2 (kept); all others singletons.
    # weights: (1,2)=1, (1,3)=2 ['a b c','b c d'], (2,3)=1 -> mean 4/3;
    # keep w*3 >= 4 -> only (1,3).
    got = meta_blocking_pairs(ds).to_pandas()
    assert got[["id_a", "id_b", "w"]].to_records(index=False).tolist() \
        == [(1, 3, 2)]
    # stop-shingle check: with max_df=2 'a b c' (df 3) is a stop block ->
    # (1,3) falls to w=1 ['b c d']; (1,2)/(2,3) vanish -> mean 1, kept.
    got2 = meta_blocking_pairs(ds, max_df=2).to_pandas()
    assert got2[["id_a", "id_b", "w"]].to_records(index=False).tolist() \
        == [(1, 3, 1)]


def test_blocking_quality_empty_corpus(ray_session):
    """Degenerate empty corpus still yields the oracle's single row:
    zero counts with NULL n_true_pairs / pc_bp (SQL SUM-over-empty)."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import blocking_quality

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    got = blocking_quality(ds).to_pandas()
    assert len(got) == 1
    assert got["n_docs"].iloc[0] == 0 and got["n_cand_pairs"].iloc[0] == 0
    assert got["n_true_pairs"].isna().iloc[0] and got["pc_bp"].isna().iloc[0]


def test_snm_recall_window_hits(ray_session):
    """Hits count window candidates sharing a fingerprint — including
    across chunk boundaries; the denominator is the exact-dup C(n,2)
    truth even when a true pair falls OUTSIDE the window."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import snm_recall

    # keys sort as: aa/1, aa/2, ab/3, ac/4, zz/9 — fp(aa1)==fp(aa2)
    # (adjacent, hit) and fp(ac)==fp(zz) (true pair, rank gap 1 with
    # window 1... place it out of window instead)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 9], pa.int64()),
        "text": ["aa", "a-a", "ab", "zz top", "zz-top"],
    }))
    # collapse: aa, aa, ab, zztop, zztop -> order 1,2,3,4,9
    # truth: {1,2} and {4,9} -> 2 true pairs
    # window=1 pairs: (1,2) hit, (2,3), (3,4), (4,9) hit -> cand 4, hit 2
    got = snm_recall(ds, window=1, chunk=4).to_pandas().iloc[0]
    assert got["n_true_pairs"] == 2 and got["n_cand"] == 4
    assert got["n_hit"] == 2 and got["recall_bp"] == 10_000
    # window=1, chunk=2: boundary replication must still find (4,9)
    # (ranks 4,5 straddle the chunk edge)
    got2 = snm_recall(ds, window=1, chunk=2).to_pandas().iloc[0]
    assert got2["n_hit"] == 2
    # a true pair beyond the window: three copies of fp 'aa' rank
    # adjacently (ranks 1,2,3) -> window-1 hits (1,2) and (2,9) but NOT
    # (1,9) at gap 2; C(3,2)=3 true pairs -> recall floor(2e4/3) = 6666
    ds3 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 5, 6, 9], pa.int64()),
        "text": ["aa", "a-a", "ab", "ac", "a a"],
    }))
    got3 = snm_recall(ds3, window=1, chunk=4).to_pandas().iloc[0]
    assert got3["n_true_pairs"] == 3 and got3["n_hit"] == 2
    assert got3["recall_bp"] == 6666


def test_cluster_survivorship_keep_and_modal_laws(ray_session):
    """Keep = longest text then lowest id; modal attributes break count
    ties to the smallest value with NULL sorting last, but a strict NULL
    majority wins (SQL GROUP BY keeps NULL — pandas dropna would not)."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import cluster_survivorship

    cc = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        "cluster_id": pa.array([1, 1, 1, 4, 5, 5, 7, 7], pa.int64()),
    }))
    attrs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        "text": ["aaaa", "bbbbbb", "cc", "dd", "e", "f", "g", "h"],
        "lang": ["en", None, "en", "fr", None, None, "de", "ar"],
        "source": ["s1", "s2", "s2", "s9", "s3", "s4", "s5", "s5"],
    }))
    got = cluster_survivorship(cc, attrs).to_pandas() \
        .set_index("cluster_id")
    # cluster 1: keep doc 2 (len 6); lang en x2 beats NULL x1; source s2 x2
    assert got.loc[1, "keep_id"] == 2 and got.loc[1, "keep_len"] == 6
    assert got.loc[1, "top_lang"] == "en"
    assert got.loc[1, "top_source"] == "s2" and got.loc[1, "n_members"] == 3
    # cluster 5: NULL lang majority -> top_lang NULL; source tie s3/s4 -> s3
    import pandas as pd
    assert pd.isna(got.loc[5, "top_lang"])
    assert got.loc[5, "top_source"] == "s3"
    # cluster 7: lang tie de/ar (1 each) -> 'ar' (smallest); len tie 1 -> id 7
    assert got.loc[7, "top_lang"] == "ar" and got.loc[7, "keep_id"] == 7


def test_snm_multi_pairs_reverse_pass_and_pass_count(ray_session):
    """The reversed-key pass catches a prefix-corrupted duplicate the
    forward pass misses; pairs found by both passes count n_passes=2;
    pairs are unordered-normalized (id_a < id_b)."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import snm_multi_pairs

    # forward keys: qqaaaa/1, xxaaaa/2 sort FAR apart with the z* rows
    # between; reversed keys both end 'aaaa' -> 'aaaaqq'/'aaaaxx' rank
    # adjacently in pass 2.
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 5, 6, 7, 8], pa.int64()),
        "text": ["qq aaaa", "xx aaaa", "rr 11", "ss 22", "tt 33", "uu 44"],
    }))
    got = snm_multi_pairs(ds, window=1).to_pandas()
    pairs = {(int(a), int(b)): int(n) for a, b, n in
             got[["id_a", "id_b", "n_passes"]].to_numpy()}
    # forward order (collapse): qqaaaa/1 rr11/5 ss22/6 tt33/7 uu44/8
    # xxaaaa/2 -> window-1 pairs (1,5)(5,6)(6,7)(7,8)(8,2)
    # reversed keys sort digits first: 11rr/5 22ss/6 33tt/7 44uu/8
    # aaaaqq/1 aaaaxx/2 -> pairs (5,6)(6,7)(7,8)(8,1)(1,2)
    assert pairs[(1, 2)] == 1          # ONLY the reversed pass finds it
    assert pairs[(5, 6)] == 2 and pairs[(6, 7)] == 2 and pairs[(7, 8)] == 2
    assert pairs[(1, 5)] == 1 and pairs[(2, 8)] == 1 and pairs[(1, 8)] == 1
    assert len(pairs) == 7
    assert all(a < b for a, b in pairs)


def test_snm_ops_empty_corpus(ray_session):
    """Empty corpus: snm_pairs yields zero rows (no crash on the empty
    prefix-count aggregate); snm_recall yields the degenerate scalar row
    (recall 10000 with no true pairs, the blocking_quality convention)."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import snm_pairs, snm_recall

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    assert snm_pairs(ds).count() == 0
    got = snm_recall(ds).to_pandas().iloc[0]
    assert got["n_true_pairs"] == 0 and got["n_cand"] == 0
    assert got["recall_bp"] == 10_000


def test_fs_match_scores_weights_boundary_and_edges(ray_session):
    """Fellegi-Sunter scores: (a) weights follow the bit_length(T // A_f)
    law on a hand-computable table; (b) pairs crossing the id//chunk
    boundary still form (backward replication); (c) negative balances
    floor-divide toward -inf (numpy // == the SQL floor-div law); (d) an
    empty corpus yields zero rows."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import fs_match_scores

    def cust(rows):
        return ray.data.from_arrow(pa.table({
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([r[1] for r in rows], pa.string()),
            "c_nationkey": pa.array([r[2] for r in rows], pa.int64()),
            "c_mktsegment": pa.array([r[3] for r in rows], pa.string()),
            "c_acctbal": pa.array([r[4] for r in rows], pa.float64()),
        }))

    # 4 rows, one nation.  N=4, T=6.
    #   seg: all 'A'            -> A_seg=6, w_seg=bit_length(6//6)=1
    #   ten: tens chars 0,0,1,1 -> A_ten=2, w_ten=bit_length(3)=2
    #   bal: all distinct $1000 buckets, A_bal=0 -> w_bal=bit_length(6)=3
    # chunk=8: ids 6,7 in bucket 0; 8,9 in bucket 1; 8 replicates back
    # (8 % 8 = 0 < gap) so pair (7,8) forms across the boundary.
    # names '..x06'..'..x09': tens char is the '0'/'1' before the last.
    ds = cust([(6, "x06", 3, "A", 1000.00),
               (7, "x07", 3, "A", 2000.00),
               (8, "x18", 3, "A", 3000.00),
               (9, "x19", 3, "A", -999.00)])  # cents -99900 // 1e5 = -1
    got = fs_match_scores(ds, gap=5, chunk=8).to_pandas() \
        .sort_values("score").reset_index(drop=True)
    # pairs (id gap <= 5, same nation): (6,7)(6,8)(6,9)(7,8)(7,9)(8,9)
    #   seg agrees on all 6 (+1); ten agrees on (6,7) and (8,9) (+2);
    #   bal never agrees (all buckets distinct: 1,2,3,-1) -> scores:
    #   (6,7)=3 (8,9)=3 others=1
    assert got.to_dict("list") == {"score": [1, 3], "n_pairs": [4, 2]}

    empty = cust([])
    assert fs_match_scores(empty).to_pandas().empty


def test_ppjoin_pairs_hot_shingle_exactness(ray_session):
    """ppjoin_pairs is the cap-FREE exact tau-Jaccard join: a duplicate
    pair whose shingles are all HOT (df > ngram_jaccard's max_df) is
    found by ppjoin but invisible to the stop-shingle-capped index; the
    prefix filter is output-invariant (verified candidates only)."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.dedup import ngram_jaccard_pairs, \
        ppjoin_pairs

    # docs 1..4 identical -> every shingle has df 4 > max_df 3; docs
    # 5/6 share a rare tail.  Word 4-grams, tau 0.5.
    hot = "alpha beta gamma delta epsilon"
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": [hot, hot, hot, hot,
                 "one two three four five", "one two three four six"],
    }))
    pp = ppjoin_pairs(ds, n=4, tau100=50).to_pandas()
    got = {(int(a), int(b)) for a, b in pp[["left_id", "right_id"]].to_numpy()}
    # hot docs: all 6 pairs at J=1; docs 5/6 share 'one two three four'
    # (J = 1/3 < 0.5 -> excluded)
    assert got == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    assert (pp["inter"] == 2).all() and (pp["n_left"] == 2).all()

    nj = ngram_jaccard_pairs(ds, n=4, tau100=50, max_df=3).to_pandas()
    assert len(nj) == 0  # the capped index drops every hot shingle

    # empty corpus: no rows, no crash
    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert ppjoin_pairs(empty).to_pandas().empty


def test_cluster_pair_eval_pair_counting_laws(ray_session):
    """Pair-counting P/R/F1: an over-merged clustering loses precision,
    not recall; all-singleton predictions are vacuously precise (10000)
    with zero recall against existing true pairs; empty corpus emits the
    degenerate NULL row."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import cluster_pair_eval

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        # fp groups: {1,2} ('a b'=='A-b' collapse 'ab'), {3}, {4}
        "text": ["a b", "A-b", "c", "d"],
    }))
    # over-merged: one predicted cluster {1,2,3}, singleton {4}
    # pred pairs C(3,2)=3; true pairs 1; tp 1 -> p=3333, r=10000,
    # f1 = 2*3333*10000 // 13333 = 4999
    cc = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "cluster_id": pa.array([1, 1, 1, 4], pa.int64()),
    }))
    row = cluster_pair_eval(cc, docs).to_pandas().iloc[0]
    assert (row["n_pred_pairs"], row["n_true_pairs"], row["n_tp"]) == (3, 1, 1)
    assert (row["precision_bp"], row["recall_bp"], row["f1_bp"]) \
        == (3333, 10000, 4999)

    # all singletons: pred pairs 0 -> precision 10000 (vacuous), recall 0
    cc1 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "cluster_id": pa.array([1, 2, 3, 4], pa.int64()),
    }))
    row = cluster_pair_eval(cc1, docs).to_pandas().iloc[0]
    assert (row["precision_bp"], row["recall_bp"], row["f1_bp"]) \
        == (10000, 0, 0)

    # empty corpus: one degenerate row, NULL metrics
    e = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    ec = pa.table({"doc_id": pa.array([], pa.int64()),
                   "cluster_id": pa.array([], pa.int64())})
    row = cluster_pair_eval(ray.data.from_arrow(ec),
                            ray.data.from_arrow(e)).to_pandas().iloc[0]
    import pandas as pd

    assert row["n_docs"] == 0 and pd.isna(row["precision_bp"]) \
        and pd.isna(row["f1_bp"])


def test_canopy_assign_center_and_orphan_laws(ray_session):
    """Canopy invariants on a crafted chain: centers have no lower
    neighbor (so no two centers are within t1), docs take the LOWEST
    covering center even when it has a higher id than an uncovering
    lower neighbor, and docs with no covering center keep themselves."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import canopy_assign

    # trigram overlap, t1=2, df cap high.  Construct:
    #   doc1 = 'a b c d e'   doc2 = 'a b c d x' (ov(1,2) = 2: 'a b c','b c d')
    #   doc3 = 'c d x y z'   (ov(2,3) = 1 'c d x' -> NOT within t1;
    #                         ov(1,3) = 0)
    # centers: 1 (no lower), 3 (only neighbor 2 is not lower? ov(2,3)<t1
    # so 3 has NO neighbor at all -> center).  2 covered by 1.
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["a b c d e", "a b c d x", "c d x y z"],
    }))
    got = canopy_assign(ds, n=3, t1=2, max_df=100).to_pandas() \
        .set_index("doc_id")["canopy_id"].to_dict()
    assert got == {1: 1, 2: 1, 3: 3}

    # orphan law: 4 covered only by NON-center 5?  chain 4<5<6 where
    # ov(4,5)>=t1, ov(5,6)>=t1, ov(4,6)<t1: centers={4}; 5 -> 4;
    # 6's only neighbor 5 is not a center -> 6 keeps itself.
    ds2 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([4, 5, 6], pa.int64()),
        "text": ["p q r s t", "p q r s u v w", "s u v w x"],
    }))
    # ov(4,5): 'p q r','q r s' = 2 >= 2; ov(5,6): 's u v','u v w' = 2;
    # ov(4,6): 0
    got2 = canopy_assign(ds2, n=3, t1=2, max_df=100).to_pandas() \
        .set_index("doc_id")["canopy_id"].to_dict()
    assert got2 == {4: 4, 5: 4, 6: 6}


def test_phonetic_block_pairs_soundex_law(ray_session):
    """Soundex blocking: classic vectors pair ('robert'/'rupert' R163,
    'smith'/'smyth' S530), the h/w-as-vowel variant separates duplicate
    codes across h ('ashcraft' A226 here, not classic A261), oversize
    blocks drop whole, letterless docs block nothing."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import phonetic_block_pairs, \
        soundex_key

    assert soundex_key("robert") == "R163" == soundex_key("rupert")
    assert soundex_key("smith") == "S530" == soundex_key("smyth")
    assert soundex_key("ashcraft") == "A226"   # variant law (h separates)
    assert soundex_key("123") == "" and soundex_key(None) == ""
    assert soundex_key("pfister") == "P236"    # adjacent dup collapses

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "text": ["robert jones", "rupert x", "smith", "smyth",
                 "42 99", "aaa", "aah"],
    }))
    got = phonetic_block_pairs(ds, max_block=64).to_pandas()
    pairs = {(int(a), int(b)): k for a, b, k in
             got[["id_a", "id_b", "key"]].to_numpy()}
    # 6 'aaa' -> A000, 7 'aah' -> A000 (h vowel-like, drops)
    assert pairs == {(1, 2): "R163", (3, 4): "S530", (6, 7): "A000"}

    # stop-key: with max_block=1 every block is oversize -> no pairs
    assert phonetic_block_pairs(ds, max_block=1).to_pandas().empty


def test_blocking_cascade_provenance_mask(ray_session):
    """The cascade mask records WHICH blockers found each pair: an
    identical pair carries all three bits (7); a Soundex-only variant
    ('smith'/'smyth' share S530 but differ in the first collapse chars
    beyond lev 2... use a phonetic-equal, prefix-distant pair) carries
    only bit 4; pairs are unordered (id_a < id_b)."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import blocking_cascade

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 5, 6], pa.int64()),
        "text": ["acme corporation", "acme corporation",   # identical
                 "smith", "smyth"],                        # S530 both
    }))
    got = blocking_cascade(ds).to_pandas()
    m = {(int(a), int(b)): int(k) for a, b, k in
         got[["id_a", "id_b", "src_mask"]].to_numpy()}
    # (1,2): SNM-adjacent (bit 1) + same 8-prefix lev 0 (bit 2) +
    # same soundex (bit 4) = 7.
    assert m[(1, 2)] == 7
    # (5,6): smith/smyth -> SNM ranks adjacent too (bit 1); 8-prefix
    # keys 'smith'/'smyth' DIFFER -> no bit 2; soundex equal -> bit 4.
    assert m[(5, 6)] == 5
    assert all(a < b for a, b in m)


def test_returned_revenue_flag_filter_and_tiebreak(ray_session, tmp_path):
    """Only 'R' lines count; revenue ties break on custkey asc; a customer
    whose orders have no returned line emits no row; nation-map miss
    fills ''."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import returned_revenue

    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int32()),
        "n_name": ["ALGERIA"],
    }), tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": ["Cust#1", "Cust#2", "Cust#3"],
        # custkey 2 points at a nation absent from the dim -> n_name ''
        "c_nationkey": pa.array([0, 7, 0], pa.int32()),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 2, 3], pa.int64()),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 11, 12], pa.int64()),
        "l_extendedprice": pa.array([100.0, 25.0, 100.0, 5.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        # cust 1: one R line (100) + one N line (ignored); cust 2: one R
        # line (100) -> tie with cust 1, custkey breaks it; cust 3: N only
        "l_returnflag": ["R", "N", "R", "N"],
    }), tmp_path / "lineitem.parquet")
    got = returned_revenue(str(tmp_path)).to_pandas().reset_index(drop=True)
    assert list(got["c_custkey"]) == [1, 2]
    assert list(got["revenue_c"]) == [10000, 10000]
    assert list(got["n_name"]) == ["ALGERIA", ""]
    assert list(got["c_name"]) == ["Cust#1", "Cust#2"]


def test_order_priority_counts_strict_boundary(ray_session, tmp_path):
    """shipdate exactly AT orderdate+60d does NOT qualify (strict >);
    one late line among many is enough; orders without lineitems drop."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import order_priority_counts

    ts = lambda s: pd.Timestamp(s)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array(
            [ts("2000-01-01"), ts("2000-01-01"), ts("2000-01-01")],
            pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH"],
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_shipdate": pa.array(
            [ts("2000-01-02"),
             ts("2000-03-02"),   # orderdate+61d -> late
             ts("2000-03-01"),   # exactly +60d -> NOT late (strict >)
             ts("2000-03-02")],
            pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    got = order_priority_counts(str(tmp_path)).to_pandas()
    got = got.sort_values("o_orderpriority").reset_index(drop=True)
    assert list(got["o_orderpriority"]) == ["1-URGENT", "2-HIGH"]
    assert list(got["n_late"]) == [1, 1]


def test_group_linkage_best_cap_ties_and_nulls(ray_session):
    """Stop items (df > max_df) pair nobody but still count in sizes;
    jac ties break on lowest partner id; NULL ids drop; duplicate
    (id, item) rows dedup; an entity sharing only stop items emits no
    row."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from name_matching_ray.stages.erblock import group_linkage_best

    rows = []
    # suppliers 1,2,3 share part 100 (df=3 > cap 2 -> stopped).
    for s in (1, 2, 3):
        rows.append((s, 100))
    # 1 and 2 also share parts 101,102 (df=2 each, survive).
    for p in (101, 102):
        rows.append((1, p)); rows.append((2, p))
    # 1 and 3 share part 103; 2 and 3 share part 104 -> for supplier 3
    # both partners have inter=1 and SAME sizes -> tie, partner 1 wins.
    rows.append((1, 103)); rows.append((3, 103))
    rows.append((2, 104)); rows.append((3, 104))
    # supplier 4 has ONLY the stop item -> no candidate -> absent.
    rows.append((4, 100))
    # duplicate row must not double-count inter
    rows.append((1, 101))
    df = pd.DataFrame(rows, columns=["l_suppkey", "l_partkey"])
    # a NULL id row drops entirely
    df = pd.concat([df, pd.DataFrame({"l_suppkey": [pd.NA],
                                      "l_partkey": [101]})],
                   ignore_index=True)
    ds = rd.from_pandas(df)
    got = group_linkage_best(ds, max_df=2).to_pandas() \
        .sort_values("s_suppkey").reset_index(drop=True)
    # sizes: 1 -> {100,101,102,103} = 4; 2 -> {100,101,102,104} = 4;
    # 3 -> {100,103,104} = 3
    assert list(got["s_suppkey"]) == [1, 2, 3]
    # 1<->2 inter=2 (101,102), jac = 2e4 // (4+4-2) = 3333
    row1 = got[got["s_suppkey"] == 1].iloc[0]
    assert (row1["best_suppkey"], row1["inter"], row1["jac_bp"]) == (2, 2, 3333)
    # 3: 1 and 2 both inter=1, union 4+3-1=6 -> 1666 each; partner 1 wins
    row3 = got[got["s_suppkey"] == 3].iloc[0]
    assert (row3["best_suppkey"], row3["inter"], row3["jac_bp"]) == (1, 1, 1666)
    assert 4 not in set(got["s_suppkey"])


def test_fs_mutual_best_cross_chunk_and_ties(ray_session):
    """Right-best partials must combine across chunk kernels (a right id
    near a chunk boundary has left partners in the previous chunk);
    non-mutual best pairs drop; score ties break on lowest partner id."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from name_matching_ray.stages.erblock import fs_mutual_best

    # chunk=8, gap=3. ids 6,7 sit in chunk 0; ids 8,9 in chunk 1 (within
    # gap of the boundary -> replicated back).  Same nation.  Fields via
    # c_mktsegment; names give ten='0' everywhere; balances all 0.
    # seg: 6:A 7:B 8:A 9:B.
    # candidates (gap 3): (6,7) (6,8) (6,9) (7,8) (7,9) (8,9).
    # agreements: (6,8) seg A==A; (7,9) seg B==B; others disagree all
    # fields except ten/bal which EVERYONE shares.
    df = pd.DataFrame({
        "c_custkey": pd.array([6, 7, 8, 9], dtype="int64"),
        "c_name": ["Cust#06", "Cust#07", "Cust#08", "Cust#09"],
        "c_nationkey": pd.array([1, 1, 1, 1], dtype="int64"),
        "c_mktsegment": ["A", "B", "A", "B"],
        "c_acctbal": [0.0, 0.0, 0.0, 0.0],
    })
    got = fs_mutual_best(rd.from_pandas(df), gap=3, chunk=8).to_pandas() \
        .sort_values("left_id").reset_index(drop=True)
    # ten and bal agree for all pairs (constant fields); seg splits.
    # best for 6 is 8 (seg+ten+bal), best for 8 is 6 (only left partner
    # with seg match... lefts of 8 are 6,7; 6 agrees seg).  (6,8) is a
    # CROSS-CHUNK pair: 8 lives in chunk 1, left 6 in chunk 0.
    # best for 7 is 9, best for 9 is 7 (lefts of 9: 6,7,8; 7 agrees seg).
    assert list(got["left_id"]) == [6, 7]
    assert list(got["right_id"]) == [8, 9]
    # non-mutual pairs like (6,7) never appear
    assert len(got) == 2
    # tie case: all same segment -> every pair ties on every field, so
    # each left's best is its LOWEST right (6->7, 7->8, 8->9) and every
    # right's best is its LOWEST left (7->6, 8->6, 9->6): only (6,7) is
    # mutual — the tie law collapses a tied chain to its head pair.
    df2 = df.assign(c_mktsegment=["A", "A", "A", "A"])
    got2 = fs_mutual_best(rd.from_pandas(df2), gap=3, chunk=8).to_pandas() \
        .sort_values("left_id").reset_index(drop=True)
    assert (got2["left_id"].tolist(), got2["right_id"].tolist()) == ([6], [7])


def test_suffix_blocking_pairs_caps_and_tail_match(ray_session):
    """A leading typo still co-blocks on the shared tail; singleton and
    oversize blocks pair nothing; n_blocks counts shared blocks; short
    keys (< min_len after collapse) block nothing."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from name_matching_ray.stages.erblock import suffix_blocking_pairs

    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4, 5, 6], dtype="int64"),
        "text": [
            "acme widgets",     # key acmewidgets
            "xcme widgets",     # leading typo: shares suffixes from pos 2
            "zzz unrelated",    # no shared suffix
            "tiny",             # collapse 'tiny' < 6 chars -> no blocks
            None,               # NULL -> '' -> nothing
            "acme widgets",     # exact dup of 1
        ],
    })
    got = suffix_blocking_pairs(rd.from_pandas(docs)).to_pandas() \
        .sort_values(["left_id", "right_id"]).reset_index(drop=True)
    # keys: 1,6 = 'acmewidgets' (11 chars -> suffixes at i=0..5, all 6
    # suffixes shared); 2 = 'xcmewidgets' shares suffixes i>=1 (5 each
    # with 1 and 6).
    pairs = {(l, r): n for l, r, n in
             zip(got["left_id"], got["right_id"], got["n_blocks"])}
    assert pairs[(1, 6)] == 6
    assert pairs[(1, 2)] == 5 and pairs[(2, 6)] == 5
    assert set(pairs) == {(1, 6), (1, 2), (2, 6)}
    # oversize blocks are stop blocks: 60 copies of one text -> 0 pairs
    many = pd.DataFrame({
        "doc_id": pd.array(range(60), dtype="int64"),
        "text": ["same exact text here"] * 60})
    got2 = suffix_blocking_pairs(rd.from_pandas(many)).to_pandas()
    assert len(got2) == 0


def test_dedup_threshold_sweep_shape_and_monotonicity(ray_session):
    """Fixed 5-row shape even on an empty/degenerate corpus; n_pred and
    n_tp are non-increasing in tau; exact dups land as tp at every tau
    they survive."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import dedup_threshold_sweep

    # empty corpus: 5 rows, all-zero counts, 10000/10000 conventions
    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.array([], dtype="int64"),
        "text": pd.array([], dtype="string")}))
    got = dedup_threshold_sweep(empty).to_pandas() \
        .sort_values("tau100").reset_index(drop=True)
    assert list(got["tau100"]) == [10, 30, 50, 70, 90]
    assert (got["n_pred"] == 0).all() and (got["n_tp"] == 0).all()
    assert (got["precision_bp"] == 10000).all()
    assert (got["recall_bp"] == 10000).all()
    assert (got["f1_bp"] == 10000).all()

    # two exact dups (same fp, jaccard 100%) + one near-dup pair that
    # only clears the low taus + isolated docs
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4, 5], dtype="int64"),
        "text": [base, base,
                 base + " extra words trailing here now ok fine yes",
                 "totally different content lives here today friends",
                 "another unrelated string of many distinct words"],
    })
    got2 = dedup_threshold_sweep(rd.from_pandas(docs)).to_pandas() \
        .sort_values("tau100").reset_index(drop=True)
    np_, nt = got2["n_pred"].to_numpy(), got2["n_tp"].to_numpy()
    assert (np_[:-1] >= np_[1:]).all() and (nt[:-1] >= nt[1:]).all()
    # the exact-dup pair scores jaccard 10000 -> predicted at every tau
    assert nt[-1] >= 1 and np_[-1] >= 1
    # truth has exactly one fp pair -> recall at tau90 = tp/1
    assert got2.loc[4, "recall_bp"] == nt[-1] * 10000


def test_cosine_pairs_tf_weighting_and_norms(ray_session):
    """Cosine uses COUNTS (a doc repeating a shingle twice scores
    differently than once); norms include stop shingles even though
    cross skips them; exact duplicate -> cosine 1 passes any tau."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.dedup import cosine_pairs

    # docs 1,2: identical -> cross = n -> cosine exactly 1.
    # doc 3 repeats the shared trigram twice -> tf weighting visible.
    a = "red green blue"                      # 1 trigram, c=1, n=1
    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3], dtype="int64"),
        "text": [a, a, "red green blue red green blue red"],
    })
    got = cosine_pairs(rd.from_pandas(docs), tau100=50).to_pandas()
    got = got.sort_values(["left_id", "right_id"]).reset_index(drop=True)
    pairs = {(l, r): (x, nl, nr) for l, r, x, nl, nr in zip(
        got["left_id"], got["right_id"], got["cross"],
        got["n_left"], got["n_right"])}
    # doc 3 trigrams: 'red green blue' x2, 'green blue red' x2,
    # 'blue red green' x1 -> n3 = 4+4+1 = 9; cross(1,3) = 1*2 = 2.
    # cosine(1,3) = 2/sqrt(1*9) = 0.667 >= 0.5 -> kept.
    assert pairs[(1, 2)] == (1, 1, 1)
    assert pairs[(1, 3)] == (2, 1, 9) and pairs[(2, 3)] == (2, 1, 9)
    # tau 70: 0.667 < 0.7 -> (1,3) drops, exact dup stays
    got70 = cosine_pairs(rd.from_pandas(docs), tau100=70).to_pandas()
    keys70 = set(zip(got70["left_id"], got70["right_id"]))
    assert keys70 == {(1, 2)}


def test_blocking_budget_sweep_monotone_and_empty(ray_session):
    """Candidate and true-candidate counts are non-decreasing in the
    cap; a block right AT the cap survives, one past it drops; empty
    corpus emits the fixed 5-row shape with pc 10000."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import blocking_budget_sweep

    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.array([], dtype="int64"),
        "text": pd.array([], dtype="string")}))
    got = blocking_budget_sweep(empty).to_pandas()
    assert len(got) == 5 and (got["pc_bp"] == 10000).all()
    assert (got["n_cand_pairs"] == 0).all()

    # key 'aaa': 3 docs (2 true dups) -> block size 3; key 'bbb': 11
    # docs -> survives only at caps >= 11; caps (2, 3, 10, 11, 1000).
    docs = pd.DataFrame({
        "doc_id": pd.array(range(14), dtype="int64"),
        "text": (["aaa same", "aaa same", "aaa other"]
                 + [f"bbb doc {i}" for i in range(11)]),
    })
    got2 = blocking_budget_sweep(rd.from_pandas(docs),
                                 caps=(2, 3, 10, 11, 1000)).to_pandas() \
        .sort_values("cap").reset_index(drop=True)
    assert list(got2["cap"]) == [2, 3, 10, 11, 1000]
    # cap 2: 'aaa' (3) and 'bbb' (11) both too big -> nothing
    assert got2.loc[0, "n_cand_pairs"] == 0
    # cap 3: 'aaa' alive -> C(3,2)=3 cands, 1 true pair inside
    assert (got2.loc[1, "n_blocks"], got2.loc[1, "n_cand_pairs"],
            got2.loc[1, "n_true_cand"]) == (1, 3, 1)
    # cap 10: same (bbb still too big); cap 11: bbb joins with C(11,2)=55
    assert got2.loc[2, "n_cand_pairs"] == 3
    assert (got2.loc[3, "n_blocks"], got2.loc[3, "n_cand_pairs"]) == (2, 58)
    # truth total = 1 -> pc hits 10000 once 'aaa' is in
    assert list(got2["pc_bp"]) == [0, 10000, 10000, 10000, 10000]
    cc = got2["n_cand_pairs"].to_numpy()
    assert (cc[1:] >= cc[:-1]).all()


def test_meta_blocking_ecbs_boost_and_damp(ray_session):
    """A doc sitting in every block is damped (bl(B//nb)=1 when nb=B);
    a doc in few blocks is boosted; the prune is over ECBS weights, not
    CBS; empty corpus -> empty output."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import meta_blocking_ecbs

    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.array([], dtype="int64"),
        "text": pd.array([], dtype="string")}))
    assert len(meta_blocking_ecbs(empty).to_pandas()) == 0

    # trigram blocks: docs 1,2 share 'a b c' and 'b c d'; docs 3,4 share
    # 'x y z' only; doc 5 shares every block with 1 (same text).
    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4, 5], dtype="int64"),
        "text": ["a b c d", "a b c d e", "x y z w", "q x y z",
                 "a b c d"],
    })
    got = meta_blocking_ecbs(rd.from_pandas(docs)).to_pandas()
    w = {(a, b): x for a, b, x in zip(got["id_a"], got["id_b"], got["w"])}
    # surviving blocks (df in [2,100]): 'a b c' {1,2,5}, 'b c d' {1,2,5},
    # 'x y z' {3,4}.  B=3; nb: 1->2, 2->2, 5->2, 3->1, 4->1.
    # cbs: (1,2)=2 (1,5)=2 (2,5)=2 (3,4)=1
    # bl(3//2)=bl(1)=1; bl(3//1)=bl(3)=2
    # ecbs: (1,2)=2*1*1=2, (1,5)=2, (2,5)=2, (3,4)=1*2*2=4
    # mean*np test: sum=10, np=4 -> keep w*4 >= 10 -> w >= 2.5 -> only (3,4)
    assert w == {(3, 4): 4}


def test_customer_distribution_zero_bin(ray_session, tmp_path):
    """Customers with no orders land in the 0 bin; orphan orders (no
    matching customer) count nowhere."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import customer_distribution

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        # cust 1: 2 orders; cust 2: 1; custs 3,4: none; 99 is an orphan
        "o_custkey": pa.array([1, 1, 2, 99], pa.int64()),
    }), tmp_path / "orders.parquet")
    got = customer_distribution(str(tmp_path)).to_pandas() \
        .sort_values("n_orders").reset_index(drop=True)
    assert list(got["n_orders"]) == [0, 1, 2]
    assert list(got["n_custs"]) == [2, 1, 1]


def test_fs_em_round_counts_and_conventions(ray_session):
    """m counts agreements among matches only, u among non-matches only;
    empty corpus emits the fixed empty shape; an all-match corpus hits
    the u 0/0 -> 10000 convention."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import fs_em_round

    empty = rd.from_pandas(pd.DataFrame({
        "c_custkey": pd.array([], dtype="int64"),
        "c_name": pd.array([], dtype="string"),
        "c_nationkey": pd.array([], dtype="int64"),
        "c_mktsegment": pd.array([], dtype="string"),
        "c_acctbal": pd.array([], dtype="float64")}))
    assert len(fs_em_round(empty).to_pandas()) == 0

    # 3 identical customers (same seg/name/balance, same nation):
    # every candidate pair agrees on every field -> all pairs are
    # matches -> n_non = 0 -> u_bp = 10000, m_bp = 10000 with real
    # counts behind them.
    df = pd.DataFrame({
        "c_custkey": pd.array([1, 2, 3], dtype="int64"),
        "c_name": ["Cust#011", "Cust#011", "Cust#011"],
        "c_nationkey": pd.array([7, 7, 7], dtype="int64"),
        "c_mktsegment": ["AUTO", "AUTO", "AUTO"],
        "c_acctbal": [10.0, 10.0, 10.0]})
    got = fs_em_round(rd.from_pandas(df)).to_pandas() \
        .sort_values("field").reset_index(drop=True)
    assert list(got["field"]) == ["bal", "seg", "ten"]
    assert (got["n_pairs"] == 3).all()           # (1,2)(1,3)(2,3)
    assert (got["n_agree"] == 3).all()
    assert (got["n_match"] == 3).all()
    assert (got["m_bp"] == 10000).all() and (got["u_bp"] == 10000).all()

    # split field: two pairs of dups in DIFFERENT segments + a gap-5
    # neighbor that agrees on nothing but ten/bal partially
    df2 = pd.DataFrame({
        "c_custkey": pd.array([1, 2, 3, 4], dtype="int64"),
        "c_name": ["Cust#010", "Cust#010", "Cust#020", "Cust#020"],
        "c_nationkey": pd.array([7, 7, 7, 7], dtype="int64"),
        "c_mktsegment": ["AUTO", "AUTO", "BIKE", "BIKE"],
        "c_acctbal": [10.0, 10.0, 9999.0, 9999.0]})
    got2 = fs_em_round(rd.from_pandas(df2)).to_pandas()
    seg = got2[got2["field"] == "seg"].iloc[0]
    # candidates: all 6 pairs (gap 5, same nation); (1,2) and (3,4)
    # agree everywhere (matches); cross pairs agree on ten only
    assert seg["n_pairs"] == 6 and seg["n_match"] == 2
    assert seg["n_agree"] == 2 and seg["n_match_agree"] == 2
    assert seg["m_bp"] == 10000 and seg["u_bp"] == 0


def test_cluster_bcubed_record_average_law(ray_session):
    """B³ is a per-record average: a wrong merge of a small pair into a
    big cluster hurts less than under pair counting; floors happen
    per-record first; empty corpus -> 10000s."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import cluster_bcubed

    def run(cc_rows, doc_rows):
        cc = rd.from_pandas(pd.DataFrame(cc_rows,
                                         columns=["doc_id", "cluster_id"]))
        docs = rd.from_pandas(pd.DataFrame(doc_rows,
                                           columns=["doc_id", "text"]))
        return cluster_bcubed(cc, docs).to_pandas().iloc[0]

    # empty
    r = run([], [])
    assert (r["n_docs"], r["bcubed_p_bp"], r["bcubed_r_bp"]) \
        == (0, 10000, 10000)

    # perfect clustering: 2 dups together, singleton alone
    r = run([(1, 1), (2, 1), (3, 3)],
            [(1, "same text"), (2, "same text"), (3, "other")])
    assert (r["bcubed_p_bp"], r["bcubed_r_bp"]) == (10000, 10000)

    # one cluster of 3 where only 2 share a fingerprint:
    # per-record precision: dup records 2/3 each (6666), intruder 1/3
    # (3333) -> sum 16665 // 3 = 5555; recall perfect (each fp group
    # fully inside the cluster).
    r = run([(1, 1), (2, 1), (3, 1)],
            [(1, "same text"), (2, "same text"), (3, "other")])
    assert (r["bcubed_p_bp"], r["bcubed_r_bp"]) == (5555, 10000)
    # f = 2pr//(p+r)
    assert r["bcubed_f_bp"] == 2 * 5555 * 10000 // 15555


def test_cluster_purity_majority_law(ray_session):
    """Purity counts the modal fingerprint per cluster (never needs the
    label); inverse purity swaps roles; empty corpus -> 10000s; a wrong
    merge hurts purity but not inverse purity."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import cluster_purity

    def run(cc_rows, doc_rows):
        cc = rd.from_pandas(pd.DataFrame(cc_rows,
                                         columns=["doc_id", "cluster_id"]))
        docs = rd.from_pandas(pd.DataFrame(doc_rows,
                                           columns=["doc_id", "text"]))
        return cluster_purity(cc, docs).to_pandas().iloc[0]

    # empty
    r = run([], [])
    assert (r["n_docs"], r["purity_bp"], r["inverse_bp"]) == (0, 10000, 10000)

    # perfect clustering
    r = run([(1, 1), (2, 1), (3, 3)],
            [(1, "same text"), (2, "same text"), (3, "other")])
    assert (r["purity_hits"], r["inverse_hits"]) == (3, 3)
    assert (r["purity_bp"], r["inverse_bp"], r["purity_f_bp"]) \
        == (10000, 10000, 10000)

    # over-merge: one cluster of 3 with a 2-dup majority + 1 intruder:
    # purity hits = max(2,1) = 2 (2/3 = 6666 bp); each fp group still
    # concentrated in ONE cluster -> inverse hits = 2 + 1 = 3 (10000).
    r = run([(1, 1), (2, 1), (3, 1)],
            [(1, "same text"), (2, "same text"), (3, "other")])
    assert (r["purity_hits"], r["inverse_hits"]) == (2, 3)
    assert (r["purity_bp"], r["inverse_bp"]) == (6666, 10000)
    assert r["purity_f_bp"] == 2 * 6666 * 10000 // 16666

    # under-merge: the dup pair split across two clusters: purity
    # perfect (each cluster is pure), inverse loses one record.
    r = run([(1, 1), (2, 2), (3, 3)],
            [(1, "same text"), (2, "same text"), (3, "other")])
    assert (r["purity_hits"], r["inverse_hits"]) == (3, 2)
    assert (r["purity_bp"], r["inverse_bp"]) == (10000, 6666)


def test_pair_review_sample_deterministic_coin(ray_session):
    """The sample is the md5-low64 pair coin: rerunning (or re-ordering
    input) yields byte-identical pairs; rate 10000 keeps everything."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import pair_review_sample

    base = "alpha beta gamma delta epsilon zeta"
    docs = pd.DataFrame({
        "doc_id": pd.array(range(20), dtype="int64"),
        "text": [base + f" tail{i % 4}" for i in range(20)]})
    ds = rd.from_pandas(docs)
    full = pair_review_sample(ds, rate_bp=10000).to_pandas()
    assert len(full) > 0
    got1 = pair_review_sample(ds, rate_bp=2000).to_pandas() \
        .sort_values(["left_id", "right_id"]).reset_index(drop=True)
    got2 = pair_review_sample(rd.from_pandas(docs.iloc[::-1]),
                              rate_bp=2000).to_pandas() \
        .sort_values(["left_id", "right_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got1, got2)
    # every sampled pair satisfies the coin; every skipped one fails it
    def coin(l, r):
        d = hashlib.md5(f"{l}:{r}".encode()).digest()
        return int.from_bytes(d[8:], "little") % 10000
    sampled = set(zip(got1["left_id"], got1["right_id"]))
    for l, r in zip(full["left_id"], full["right_id"]):
        assert ((l, r) in sampled) == (coin(l, r) < 2000)


def test_snm_window_sweep_cross_chunk_and_cumsum(ray_session):
    """A duplicate run straddling a rank-chunk boundary is fully counted
    (backward replication sized to max(windows)); counts cumulate over
    gap distances; recall saturates at the window spanning the run."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import snm_window_sweep

    # 40 docs, chunk=16 -> rank chunks 1-16 | 17-32 | 33-40.  Six
    # identical docs (one fp group) occupy ranks 14-19, straddling the
    # 16|17 boundary; every other doc is unique.
    texts = [f"k{i:02d} unique {i}" for i in range(40)]
    for i in range(13, 19):
        texts[i] = "k13 dup run"
    docs = pd.DataFrame({"doc_id": pd.array(range(40), dtype="int64"),
                         "text": texts})
    got = snm_window_sweep(rd.from_pandas(docs), windows=(1, 2, 3, 5, 10),
                           chunk=16).to_pandas() \
        .sort_values("window").reset_index(drop=True)
    # truth: C(6,2)=15 pairs at rank gaps 1..5; hits by window:
    # w=1 -> 5, 2 -> 9, 3 -> 12, 5 -> 15 (saturated), 10 -> 15
    assert list(got["n_hit"]) == [5, 9, 12, 15, 15]
    assert got.loc[3, "recall_bp"] == 10000
    # candidates: sum over gaps d<=w of (N - d), N=40
    assert list(got["n_cand"]) == [39, 77, 114, 185, 345]


def test_brand_supplier_counts_distinct_across_batches(ray_session,
                                                       tmp_path):
    """The same (brand, supplier) pair arriving through different parts
    (and different batches) counts ONCE; a part never shipped adds no
    brand row; NULL suppkey rows drop."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import brand_supplier_counts

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_brand": ["B1", "B1", "B2", "B3"],  # part 4 never shipped
    }), tmp_path / "part.parquet")
    pq.write_table(pa.table({
        # supplier 7 ships TWO different B1 parts -> one distinct count;
        # supplier 8 ships part 1 twice -> one; NULL suppkey ignored
        "l_partkey": pa.array([1, 2, 1, 1, 3, 3], pa.int64()),
        "l_suppkey": pa.array([7, 7, 8, 8, 7, None], pa.int64()),
    }), tmp_path / "lineitem.parquet")
    got = brand_supplier_counts(str(tmp_path)).to_pandas() \
        .sort_values("p_brand").reset_index(drop=True)
    assert list(got["p_brand"]) == ["B1", "B2"]
    assert list(got["n_suppliers"]) == [2, 1]


def test_fs_pattern_counts_gamma_histogram(ray_session):
    """fs_pattern_counts: the gamma comparison-vector histogram over the
    same candidates as fs_match_scores — hand-checked patterns on the
    4-row table, the chunk-boundary pair included; empty corpus -> 0
    rows."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import fs_pattern_counts

    def cust(rows):
        return ray.data.from_arrow(pa.table({
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([r[1] for r in rows], pa.string()),
            "c_nationkey": pa.array([r[2] for r in rows], pa.int64()),
            "c_mktsegment": pa.array([r[3] for r in rows], pa.string()),
            "c_acctbal": pa.array([r[4] for r in rows], pa.float64()),
        }))

    # same table as the fs_match_scores test: seg agrees on all 6 pairs,
    # ten agrees on (6,7) and (8,9), bal never agrees.  chunk=8 puts
    # (7,8) across the kernel boundary (backward replication).
    ds = cust([(6, "x06", 3, "A", 1000.00),
               (7, "x07", 3, "A", 2000.00),
               (8, "x18", 3, "A", 3000.00),
               (9, "x19", 3, "A", -999.00)])
    got = fs_pattern_counts(ds, gap=5, chunk=8).to_pandas() \
        .sort_values(["g_seg", "g_ten", "g_bal"]).reset_index(drop=True)
    assert got.to_dict("list") == {
        "g_seg": [1, 1], "g_ten": [0, 1], "g_bal": [0, 0],
        "n_pairs": [4, 2]}

    assert fs_pattern_counts(cust([])).to_pandas().empty


def test_fs_tf_scores_per_value_weights(ray_session):
    """fs_tf_scores: agreement weight is per VALUE — on a table where
    segment 'A' (3 rows) and 'B' (2 rows) both agree, the rare value
    earns the bigger weight (the pooled law would score them equally);
    singleton values take the bit_length(T) fallback; empty -> empty."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import fs_tf_scores

    def cust(rows):
        return ray.data.from_arrow(pa.table({
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([r[1] for r in rows], pa.string()),
            "c_nationkey": pa.array([r[2] for r in rows], pa.int64()),
            "c_mktsegment": pa.array([r[3] for r in rows], pa.string()),
            "c_acctbal": pa.array([r[4] for r in rows], pa.float64()),
        }))

    # N=5, T=10.  ten: all '0' (n=5, C=10) -> w=bit_length(10//10)=1;
    # bal: all bucket 1 -> w=1.  seg: A n=3 (C=3 -> w=bit_length(3)=2),
    # B n=2 (C=1 -> w=bit_length(10)=4).
    ds = cust([(1, "x01", 0, "A", 1000.00),
               (2, "x02", 0, "A", 1000.00),
               (3, "x03", 0, "A", 1000.00),
               (4, "x04", 0, "B", 1000.00),
               (5, "x05", 0, "B", 1000.00)])
    got = fs_tf_scores(ds, gap=5, chunk=8192).to_pandas() \
        .sort_values("score").reset_index(drop=True)
    # within-A pairs (3): 2+1+1=4; within-B (1): 4+1+1=6; cross (6): 2
    assert got.to_dict("list") == {"score": [2, 4, 6],
                                   "n_pairs": [6, 3, 1]}

    assert fs_tf_scores(cust([])).to_pandas().empty


def test_deletion_join_pairs_shapes_and_dedupe(ray_session):
    """FastSS k=1 join: finds equal / substitution / insertion /
    deletion pairs, excludes 2-edit pairs, drops NULL names, orders
    left_id < right_id, and counts a pair ONCE even though equal names
    share every deletion key (the global-distinct shuffle)."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import (_lev_le1,
                                                  deletion_join_pairs)

    # closed-form kernel first
    assert _lev_le1("abc", "abc") == 0
    assert _lev_le1("abc", "abd") == 1      # substitution
    assert _lev_le1("abc", "abcd") == 1     # insertion
    assert _lev_le1("abc", "ab") == 1       # deletion
    assert _lev_le1("abc", "axd") == 2      # 2 subs
    assert _lev_le1("abc", "cab") == 2      # rotation = 2 edits
    assert _lev_le1("", "a") == 1

    ds = ray.data.from_arrow(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "c_name": pa.array(["alpha", "alpha",      # equal pair (dist 0)
                            "alphb",               # sub of alpha
                            "alpha1",              # insertion
                            "alph",                # deletion
                            None,                  # dropped
                            "omega"],              # matches nothing
                           pa.string()),
    }))
    got = deletion_join_pairs(ds, n_buckets=4, pair_buckets=4) \
        .to_pandas().sort_values(["left_id", "right_id"]) \
        .reset_index(drop=True)
    rows = set(map(tuple, got.to_numpy()))
    assert rows == {(1, 2, 0),                    # equal, counted once
                    (1, 3, 1), (2, 3, 1),         # substitution
                    (1, 4, 1), (2, 4, 1),         # insertion
                    (1, 5, 1), (2, 5, 1),         # deletion
                    (3, 5, 1)}                    # alphb -del-> alph

    # empty corpus
    empty = ray.data.from_arrow(pa.table({
        "c_custkey": pa.array([], pa.int64()),
        "c_name": pa.array([], pa.string())}))
    assert deletion_join_pairs(empty).to_pandas().empty


def test_promo_revenue_share_and_degenerate_window(ray_session, tmp_path):
    """promo_revenue: only in-window lines count, only joined parts
    count, PROMO share floors to basis points, and an empty window
    still emits the fixed (0, 0, 0) row (SQL aggregate-without-GROUP-BY
    parity)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import promo_revenue

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_type": ["PROMO", "STANDARD", "PROMO"],  # part 3 never ships
    }), tmp_path / "part.parquet")
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 1, 9], pa.int64()),  # 9: no part row
        "l_extendedprice": pa.array([100.0, 200.0, 50.0, 999.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0, 0.5, 0.0, 0.0], pa.float64()),
        # line 3 (partkey 1, 50.00) ships OUT of window
        "l_shipdate": pa.array(
            np.array(["1997-06-01", "1997-07-01", "1998-06-01",
                      "1997-08-01"], dtype="datetime64[us]")),
    }), tmp_path / "lineitem.parquet")
    got = promo_revenue(str(tmp_path)).to_pandas()
    # promo = 100.00 -> 10000c; total = 10000 + 200*0.5*100 = 20000c
    assert got.to_dict("list") == {"promo_revenue_c": [10000],
                                   "total_revenue_c": [20000],
                                   "promo_bp": [5000]}

    got2 = promo_revenue(str(tmp_path), start="2020-01-01",
                         end="2021-01-01").to_pandas()
    assert got2.to_dict("list") == {"promo_revenue_c": [0],
                                    "total_revenue_c": [0],
                                    "promo_bp": [0]}


def test_cluster_conflicts_distinct_counts_and_null_bin(ray_session):
    """cluster_conflicts: distinct NON-NULL values per (cluster, attr) —
    a conflicted cluster lands in the n_values=2 bin, an all-null
    cluster in the 0 bin (SQL COUNT(DISTINCT) semantics), and a
    mixed null/value cluster counts only the value."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import cluster_conflicts

    cc = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "cluster_id": pa.array([1, 1, 3, 3, 5, 5], pa.int64()),
    }))
    attrs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        # cluster 1: en/de conflict; cluster 3: en + null -> 1;
        # cluster 5: all null -> 0
        "lang": pa.array(["en", "de", "en", None, None, None],
                         pa.string()),
        # source: all clusters agree on 'web' except cluster 5 ('api')
        "source": pa.array(["web", "web", "web", "web", "api", "api"],
                           pa.string()),
    }))
    got = cluster_conflicts(cc, attrs, n_buckets=4).to_pandas() \
        .sort_values(["attr", "n_values"]).reset_index(drop=True)
    assert got.to_dict("list") == {
        "attr": ["lang", "lang", "lang", "source"],
        "n_values": [0, 1, 2, 1],
        "n_clusters": [1, 1, 1, 3]}


def test_large_orders_iceberg_cross_batch_sum(ray_session, tmp_path):
    """large_orders: the HAVING is on the GLOBAL per-order sum — an
    order whose quantity crosses the threshold only across row-group
    boundaries must survive; one below stays out; an order with no
    lineitem never appears."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import large_orders

    # order 1: 150 + 100 = 250 > 200 (split across two row groups);
    # order 2: 120 total; order 3: no lineitem
    t = pa.table({
        "l_orderkey": pa.array([1, 2, 1, 2], pa.int64()),
        "l_quantity": pa.array([150.0, 60.0, 100.0, 60.0], pa.float64()),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet", row_group_size=2)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 20, 30], pa.int64()),
        "o_orderdate": pa.array(np.array(
            ["1997-01-02", "1997-03-04", "1997-05-06"],
            dtype="datetime64[us]")),
        "o_totalprice": pa.array([1234.56, 10.0, 20.0], pa.float64()),
    }), tmp_path / "orders.parquet")
    got = large_orders(str(tmp_path)).to_pandas()
    assert got.to_dict("list") == {
        "o_orderkey": [1], "o_custkey": [10],
        "order_day": ["1997-01-02"], "totalprice_c": [123456],
        "sum_qty_c": [25000]}


def test_bracket_revenue_disjuncts_and_fixed_shape(ray_session, tmp_path):
    """bracket_revenue: quantity bounds are INCLUSIVE and bracket-local
    (a line can satisfy one bracket and miss another on qty alone); a
    part outside every size/brand bracket never joins; output keeps the
    fixed 3-row shape with zeros for empty brackets."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import bracket_revenue

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_brand": pa.array(["Brand#12", "Brand#23", "Brand#12",
                             "Brand#99"], pa.string()),
        "p_size": pa.array([5, 10, 6, 1], pa.int32()),
    }), tmp_path / "part.parquet")
    # part 1: bracket 1 (size 5 at the inclusive edge); part 2:
    # bracket 2; part 3: Brand#12 but size 6 > 5 (no bracket);
    # part 4: foreign brand.
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 2, 2, 3, 4], pa.int64()),
        "l_quantity": pa.array([1.0, 11.0, 12.0, 10.0, 20.0, 5.0, 25.0],
                               pa.float64()),
        "l_extendedprice": pa.array([100.0, 200.0, 400.0, 50.0, 50.0,
                                     1000.0, 1000.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.5, 0.0, 0.0, 0.1, 0.0, 0.0],
                               pa.float64()),
    }), tmp_path / "lineitem.parquet", row_group_size=3)
    got = bracket_revenue(str(tmp_path)).to_pandas()
    # bracket 1: qty 1 and 11 inclusive edges (10000 + 10000 cents),
    # qty 12 excluded; bracket 2: qty 10 and 20 edges (5000 + 4500);
    # bracket 3: nothing (the Brand#34 row set is empty) -> zeros.
    assert got.to_dict("list") == {
        "bracket_id": [1, 2, 3],
        "p_brand": ["Brand#12", "Brand#23", "Brand#34"],
        "n_lines": [2, 2, 0],
        "revenue_c": [20000, 9500, 0]}


def test_returnflag_priority_null_and_cross_batch(ray_session, tmp_path):
    """returnflag_priority: NULL priority falls to the LOW bucket (SQL
    CASE ELSE), NULL returnflag groups as '' both sides, and per-flag
    counts fold across row-group boundaries."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import returnflag_priority

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_returnflag": pa.array(["A", "A", None, "R"], pa.string()),
    }), tmp_path / "lineitem.parquet", row_group_size=2)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", None, "5-LOW"],
                                    pa.string()),
    }), tmp_path / "orders.parquet")
    got = returnflag_priority(str(tmp_path)).to_pandas()
    assert got.to_dict("list") == {
        "l_returnflag": ["", "A", "R"],
        "high_line_count": [0, 2, 0],
        "low_line_count": [1, 0, 1]}


def test_small_qty_revenue_strict_threshold_and_brand(ray_session,
                                                      tmp_path):
    """small_qty_revenue: the correlated threshold is STRICT (a line at
    exactly 0.2x the part's avg is excluded — the integer cross-multiply
    hits equality), other brands never count, and the total floors
    through // 7."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import small_qty_revenue

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["Brand#23", "Brand#23", "Brand#11"],
                            pa.string()),
    }), tmp_path / "part.parquet")
    # part 1: qtys (1, 9, 10) -> avg 20/3; 1 < 0.2*avg=4/3 -> kept.
    # part 2: qtys (1, 9) -> avg 5; the qty-1 line is EXACTLY 0.2*avg
    #         (5*100*2 == 1000) -> strict < excludes it.
    # part 3: wrong brand -> never counts.
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "l_quantity": pa.array([1.0, 9.0, 10.0, 1.0, 9.0, 0.1],
                               pa.float64()),
        "l_extendedprice": pa.array([10.0, 11.0, 12.0, 77.0, 78.0, 99.0],
                                    pa.float64()),
    }), tmp_path / "lineitem.parquet", row_group_size=2)
    got = small_qty_revenue(str(tmp_path)).to_pandas()
    assert got.to_dict("list") == {"avg_yearly_c": [1000 // 7]}


def test_idle_customers_scalar_boundary_and_antijoin(ray_session,
                                                     tmp_path):
    """idle_customers: the average is over POSITIVE balances only,
    the filter is strict (a customer at exactly the average is out),
    NULL balance counts as 0, old orders don't block, an order ON the
    cutoff does; an all-non-positive corpus returns the empty frame."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import idle_customers

    # positives: 100 + 300 + 200 + 250 -> avg 212.50
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "c_nationkey": pa.array([7, 7, 8, 8, 9, 9], pa.int64()),
        "c_acctbal": pa.array([100.0, 300.0, -50.0, None, 200.0, 250.0],
                              pa.float64()),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([2, 6], pa.int64()),
        # cust 2: OLD order only -> still idle; cust 6: order exactly
        # ON the cutoff -> blocked
        "o_orderdate": pa.array(np.array(["1999-12-31", "2000-01-01"],
                                         dtype="datetime64[us]")),
    }), tmp_path / "orders.parquet")
    got = idle_customers(str(tmp_path)).to_pandas()
    assert got.to_dict("list") == {
        "c_nationkey": [7], "numcust": [1], "totacctbal_c": [30000]}

    sub = tmp_path / "neg"
    sub.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_nationkey": pa.array([7], pa.int64()),
        "c_acctbal": pa.array([-5.0], pa.float64()),
    }), sub / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([], pa.int64()),
        "o_orderdate": pa.array([], pa.timestamp("us")),
    }), sub / "orders.parquet")
    assert len(idle_customers(str(sub)).to_pandas()) == 0


def test_top_supplier_ties_and_window(ray_session, tmp_path):
    """top_supplier: ALL suppliers tied at the max survive (revenue
    folded across row groups), out-of-window shipments never count,
    and names attach from the dimension."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import top_supplier

    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 2, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([100.0, 60.0, 40.0, 200.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0], pa.float64()),
        # supplier 3's line ships OUT of the quarter
        "l_shipdate": pa.array(np.array(
            ["1997-02-01", "1997-01-15", "1997-03-20", "1997-06-01"],
            dtype="datetime64[us]")),
    }), tmp_path / "lineitem.parquet", row_group_size=2)
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
    }), tmp_path / "supplier.parquet")
    got = top_supplier(str(tmp_path)).to_pandas() \
        .sort_values("s_suppkey").reset_index(drop=True)
    assert got.to_dict("list") == {
        "s_suppkey": [1, 2], "s_name": ["S1", "S2"],
        "total_revenue_c": [10000, 10000]}


def test_dl_block_pairs_true_damerau_law(ray_session):
    """dl_block_pairs: transpositions cost 1 (hte->the), and the TRUE
    Damerau law lets a transposition bridge other edits (ca->abc is 2,
    where the restricted OSA variant says 3) — plus the DuckDB kernel
    parity fuzz on random short strings."""
    import duckdb
    import pyarrow as pa
    import random
    import ray.data

    from name_matching_ray.stages.erblock import (_damerau_levenshtein,
                                                  dl_block_pairs)

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "zzzzzzzz ca",     # blocks with 2: DL(ca, abc) = 2 (bridge;
            "zzzzzzzz abc",    # OSA would say 3 and drop it at k=2)
            "qqqqqqqq theta",  # blocks with 4: one swap -> dl 1
            "qqqqqqqq hteta",
        ], pa.string()),
    }))
    got = dl_block_pairs(docs, k=2).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert got.to_dict("list") == {
        "id_a": [1, 3], "id_b": [2, 4], "dl": [2, 1]}

    con = duckdb.connect()
    rng = random.Random(11)
    for _ in range(300):
        a = "".join(rng.choice("abc") for _ in range(rng.randint(0, 7)))
        b = "".join(rng.choice("abc") for _ in range(rng.randint(0, 7)))
        ref = con.execute("SELECT damerau_levenshtein(?, ?)",
                          [a, b]).fetchone()[0]
        for k in (1, 2, 14):
            assert _damerau_levenshtein(a, b, k) == (ref if ref <= k
                                                     else k + 1), (a, b, k)


def test_cluster_ari_perfect_negative_and_degenerate(ray_session):
    """cluster_ari: a perfect clustering scores exactly 10000; an
    anti-correlated clustering goes NEGATIVE with the DuckDB truncation
    law (-36/99 -> -3636, where Python floor would say -3637); the
    all-one-cluster-vs-one-value degenerate has den = 0 -> NULL."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import cluster_ari

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(["aaa", "aaa", "aaa", "bbb", "bbb", "bbb"],
                         pa.string()),
    }))

    perfect = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "cluster_id": pa.array([1, 1, 1, 4, 4, 4], pa.int64()),
    }))
    got = cluster_ari(perfect, docs).to_pandas()
    assert got["ari_bp"].tolist() == [10000]
    assert got["total_pairs"].tolist() == [15]

    # truth {123},{456}; pred {14},{25},{36}: tp=0, p=3, t=6, T=15
    # -> num=-36, den=99 -> trunc(10000*-36/99) = -3636
    anti = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "cluster_id": pa.array([1, 2, 3, 1, 2, 3], pa.int64()),
    }))
    got = cluster_ari(anti, docs).to_pandas()
    assert got["ari_bp"].tolist() == [-3636]
    assert duckdb.sql("SELECT 10000*(-36)//99").fetchone()[0] == -3636

    same = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "cluster_id": pa.array([1, 1], pa.int64()),
    }))
    uni = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["zz", "zz"], pa.string()),
    }))
    got = cluster_ari(same, uni).to_pandas()
    assert got["ari_bp"].isna().tolist() == [True]


def test_fs_decision_zones_law_and_overlap(ray_session):
    """fs_decision_zones: masses multiply out of the EM m/u and sum to
    exactly 10^12 each; rnk is the exact cross-multiplied likelihood
    ratio order; match zone is a rank PREFIX and nonmatch a SUFFIX
    within the budgets; with both budgets at 10000 every pattern
    satisfies both and MATCH wins the overlap."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import (fs_decision_zones,
                                                  fs_em_round)

    cust = ray.data.from_arrow(pa.table({
        "c_custkey": pa.array(list(range(1, 9)), pa.int64()),
        "c_nationkey": pa.array([1] * 8, pa.int64()),
        "c_name": pa.array([f"Customer#{i}70" if i % 2 else
                            f"Customer#{i}80" for i in range(1, 9)],
                           pa.string()),
        "c_mktsegment": pa.array(["AUTO", "AUTO", "CAR", "CAR"] * 2,
                                 pa.string()),
        "c_acctbal": pa.array([100.0, 100.0, 100.0, 2000.0] * 2,
                              pa.float64()),
    }))
    got = fs_decision_zones(cust).to_pandas()
    em = fs_em_round(cust).to_pandas().set_index("field")
    m_bp = [int(em.loc[f, "m_bp"]) for f in ("seg", "ten", "bal")]
    u_bp = [int(em.loc[f, "u_bp"]) for f in ("seg", "ten", "bal")]

    assert len(got) == 8
    assert sorted(got["rnk"]) == list(range(1, 9))
    assert int(got["m_num"].sum()) == 10_000 ** 3
    assert int(got["u_num"].sum()) == 10_000 ** 3

    # clean-room reimplementation of the law
    exp = {}
    for _, r in got.iterrows():
        bits = (int(r["g_seg"]), int(r["g_ten"]), int(r["g_bal"]))
        m = u = 1
        for f in range(3):
            m *= m_bp[f] if bits[f] else 10_000 - m_bp[f]
            u *= u_bp[f] if bits[f] else 10_000 - u_bp[f]
        exp[bits] = (m, u)
        assert (int(r["m_num"]), int(r["u_num"])) == (m, u), bits

    # zones are a prefix / suffix in rank order
    by_rank = got.sort_values("rnk")
    zs = by_rank["zone"].tolist()
    n_match = zs.count("match")
    n_non = zs.count("nonmatch")
    assert zs[:n_match] == ["match"] * n_match
    assert zs[len(zs) - n_non:] == ["nonmatch"] * n_non
    # budget law on the inclusive cumsums
    cum_u = by_rank["u_num"].cumsum()
    assert all((cum_u.iloc[i] <= 500 * 10 ** 8) == (zs[i] == "match")
               for i in range(8))

    # overlap precedence: everything qualifies for both -> all match
    allm = fs_decision_zones(cust, mu_bp=10_000,
                             lambda_bp=10_000).to_pandas()
    assert allm["zone"].tolist() == ["match"] * 8


def test_meta_blocking_wnp_or_semantics(ray_session):
    """WNP: an edge survives iff it reaches EITHER endpoint's own mean
    (w*deg >= sum_w).  Three tight pairs each carry one heavy edge plus
    weight-1 spokes; every node's mean exceeds 1, so ALL spokes are
    pruned at BOTH endpoints and only the three heavy edges survive —
    the global-mean rule would have kept none of the structure
    node-locally.  Empty corpus -> empty graph."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import meta_blocking_wnp

    def doc(bid, *blocks):
        # per-doc unique separators keep bridging trigrams at df=1
        toks = []
        for i, b in enumerate(blocks):
            if i:
                toks.append(f"sep{bid}x{i}")
            toks.extend(b.split())
        return (bid, " ".join(toks))

    t1, t2, t3 = "a1 a2 a3", "b1 b2 b3", "c1 c2 c3"
    t4, t5, t6 = "d1 d2 d3", "e1 e2 e3", "f1 f2 f3"
    t7, t8 = "g1 g2 g3", "h1 h2 h3"
    rows = [doc(1, t1, t2, t3), doc(2, t1, t2, t3),
            doc(3, t3, t7, t8), doc(4, t3, t7, t8),
            doc(5, t3, t4, t5, t6), doc(6, t3, t4, t5, t6)]
    docs = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = meta_blocking_wnp(docs).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert got.to_dict("list") == {
        "id_a": [1, 3, 5], "id_b": [2, 4, 6], "w": [3, 3, 4]}

    empty = rd.from_pandas(pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                         "text": pd.Series([], dtype="object")}))
    assert len(meta_blocking_wnp(empty).to_pandas()) == 0


def test_progressive_pairs_rank_and_budget(ray_session):
    """progressive_pairs: best-first schedule ordered (w DESC, id_a,
    id_b) with 1-based rank, truncated at the k budget; ties break on
    the REAL pair ids."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import progressive_pairs

    def doc(bid, *blocks):
        toks = []
        for i, b in enumerate(blocks):
            if i:
                toks.append(f"sep{bid}x{i}")
            toks.extend(b.split())
        return (bid, " ".join(toks))

    t1, t2, t3 = "a1 a2 a3", "b1 b2 b3", "c1 c2 c3"
    t4, t5, t6 = "d1 d2 d3", "e1 e2 e3", "f1 f2 f3"
    t7, t8 = "g1 g2 g3", "h1 h2 h3"
    rows = [doc(1, t1, t2, t3), doc(2, t1, t2, t3),
            doc(3, t3, t7, t8), doc(4, t3, t7, t8),
            doc(5, t3, t4, t5, t6), doc(6, t3, t4, t5, t6)]
    docs = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = progressive_pairs(docs, k=3).to_pandas()
    # (5,6) w=4 first; the two w=3 edges tie -> id order (1,2) < (3,4)
    assert got.to_dict("list") == {
        "rank": [1, 2, 3], "id_a": [5, 1, 3], "id_b": [6, 2, 4],
        "w": [4, 3, 3]}
    # k smaller than the edge count truncates, rank stays 1-based dense
    got1 = progressive_pairs(docs, k=1).to_pandas()
    assert got1.to_dict("list") == {
        "rank": [1], "id_a": [5], "id_b": [6], "w": [4]}


def test_setsim_measures_three_coefficients(ray_session):
    """setsim: floor-bp Jaccard/Dice/containment agree with hand math;
    the containment filter is the loosest (a pair at containment exactly
    tau survives with jaccard far below); a pair under tau on
    containment is dropped even though it shares a shingle."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import setsim_measures

    rows = [
        (1, "w1 w2 w3 w4"),            # shingles {w1w2w3, w2w3w4}  n=2
        (2, "w1 w2 w3 w4"),            # identical                  n=2
        (3, "w1 w2 w3 z1 z2"),         # {w1w2w3, w2w3z1, w3z1z2}   n=3
        (4, "w1 w2 w3 y1 y2 y3 y4"),   # 5 shingles, one shared     n=5
    ]
    docs = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = setsim_measures(docs).to_pandas() \
        .sort_values(["left_id", "right_id"]).reset_index(drop=True)
    # (3,4): inter=1, min=3 -> containment 3333 < 5000 -> dropped.
    assert list(zip(got["left_id"], got["right_id"])) \
        == [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
    r12 = got.iloc[0]
    assert (r12["inter"], r12["n_left"], r12["n_right"]) == (2, 2, 2)
    assert (r12["jaccard_bp"], r12["dice_bp"], r12["containment_bp"]) \
        == (10000, 10000, 10000)
    r13 = got.iloc[1]
    # inter=1 union=4 -> jac 2500; dice 2*1e4//5 = 4000; cont 1e4//2 = 5000
    assert (r13["jaccard_bp"], r13["dice_bp"], r13["containment_bp"]) \
        == (2500, 4000, 5000)
    r14 = got.iloc[2]
    # inter=1, n 2 vs 5: jac 1e4//6 = 1666, dice 2e4//7 = 2857, cont 5000
    assert (r14["jaccard_bp"], r14["dice_bp"], r14["containment_bp"]) \
        == (1666, 2857, 5000)


def _q5q7_fixture(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
    }), tmp_path / "region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([1, 2, 3], pa.int64()),
        "n_name": pa.array(["NATION_1", "NATION_2", "NATION_3"],
                           pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int64()),
    }), tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 20, 30], pa.int64()),
        "c_nationkey": pa.array([1, 2, 3], pa.int64()),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([100, 200, 300], pa.int64()),
        "s_nationkey": pa.array([1, 2, 3], pa.int64()),
    }), tmp_path / "supplier.parquet")
    import numpy as np
    d = lambda s: np.datetime64(s, "us")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1000, 1001, 1002, 1003], pa.int64()),
        "o_custkey": pa.array([10, 10, 20, 30], pa.int64()),
        "o_orderdate": pa.array([d("1996-01-01"), d("1997-01-01"),
                                 d("1996-06-01"), d("1996-06-01")],
                                pa.timestamp("us")),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([7, 8, 9], pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt", None], pa.string()),
        "p_type": pa.array(["ECONOMY", "SMALL", "ECONOMY"], pa.string()),
    }), tmp_path / "part.parquet")
    # lines: (orderkey, partkey, suppkey, shipdate, price, disc)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1000, 1000, 1001, 1002, 1003],
                               pa.int64()),
        "l_partkey": pa.array([7, 8, 7, 9, 7], pa.int64()),
        "l_suppkey": pa.array([100, 200, 100, 100, 300], pa.int64()),
        "l_shipdate": pa.array([d("1996-02-01"), d("1996-02-01"),
                                d("1997-02-01"), d("1996-07-01"),
                                d("1996-07-01")], pa.timestamp("us")),
        "l_extendedprice": pa.array([100.005, 50.0, 70.0, 80.0, 90.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.1, 0.0], pa.float64()),
    }), tmp_path / "lineitem.parquet", row_group_size=2)


def test_local_supplier_volume_same_nation_and_dates(ray_session,
                                                     tmp_path):
    """Q5: only lines whose customer AND supplier share a nation of the
    region count; the order date window is [start, end) — the 1996-01-01
    edge is IN, 1997-01-01 is OUT; cents floor per line (100.005 ->
    10001); the cross-nation line on a qualifying order is excluded."""
    from name_matching_ray.pipelines.analytics import local_supplier_volume

    _q5q7_fixture(tmp_path)
    got = local_supplier_volume(str(tmp_path)).to_pandas() \
        .sort_values("n_name").reset_index(drop=True)
    # order 1000 (cust n1, 1996-01-01 IN): line supp100 (n1, same) ->
    # 10001c; line supp200 (n2, cross) -> excluded.  order 1001
    # (1997-01-01) -> date OUT.  order 1002 (cust n2, supp100 n1) ->
    # cross.  order 1003 (cust n3 = EUROPE) -> region OUT.
    assert got.to_dict("list") == {"n_name": ["NATION_1"],
                                   "revenue_c": [10001]}


def test_nation_trade_volume_directions_and_year(ray_session, tmp_path):
    """Q7: the two directions are separate rows; the SHIPDATE picks the
    year and the [start, end) window; same-nation lines never count."""
    from name_matching_ray.pipelines.analytics import nation_trade_volume

    _q5q7_fixture(tmp_path)
    got = nation_trade_volume(str(tmp_path), nation_a="NATION_1",
                              nation_b="NATION_2").to_pandas() \
        .sort_values(["supp_nation", "l_year"]).reset_index(drop=True)
    # supp n2 -> cust n1: order 1000 line supp200 ship 1996 (5000c).
    # supp n1 -> cust n1 (line supp100 order 1000): same nation, out.
    # order 1001 line supp100 (n1) cust n1: same nation, out.
    # order 1002 (cust n2) line supp100 (n1) ship 1996: n1->n2 7200c.
    # order 1003: cust n3 not in the pair, out.
    assert got.to_dict("list") == {
        "supp_nation": ["NATION_1", "NATION_2"],
        "cust_nation": ["NATION_2", "NATION_1"],
        "l_year": [1996, 1996],
        "revenue_c": [7200, 5000]}


def test_market_share_type_region_date_and_ratio(ray_session, tmp_path):
    """Q8: part TYPE is exact-match (SMALL line excluded), the order
    window is [start, end) (the 1997-01-01 order is out), non-region
    customers drop, and share_bp is the floor ratio of the two integer
    cent sums — 10000 when the nation supplies everything, 0 when it
    supplies nothing."""
    from name_matching_ray.pipelines.analytics import market_share

    _q5q7_fixture(tmp_path)
    got = market_share(str(tmp_path)).to_pandas()
    # ECONOMY lines in-window with ASIA customers: L1 (10001c, supp n1)
    # + L4 (7200c, supp n1); the SMALL line L2 excluded on type, L3 on
    # date (exclusive end), L5 on region (cust n3 = EUROPE).
    assert got.to_dict("list") == {
        "o_year": [1996], "total_c": [17201], "nation_c": [17201],
        "share_bp": [10000]}
    # SMALL type: only L2 (supp n2) qualifies -> NATION_1 share 0
    got2 = market_share(str(tmp_path), p_type="SMALL").to_pandas()
    assert got2.to_dict("list") == {
        "o_year": [1996], "total_c": [5000], "nation_c": [0],
        "share_bp": [0]}


def test_product_profit_substring_null_and_years(ray_session, tmp_path):
    """Q9: the part-name filter is substring (NULL name never matches,
    'blue bolt' doesn't contain 'red'); the year comes from the ORDER
    date; no region/date restriction applies."""
    from name_matching_ray.pipelines.analytics import product_profit

    _q5q7_fixture(tmp_path)
    got = product_profit(str(tmp_path)).to_pandas() \
        .sort_values(["n_name", "o_year"]).reset_index(drop=True)
    assert got.to_dict("list") == {
        "n_name": ["NATION_1", "NATION_1", "NATION_3"],
        "o_year": [1996, 1997, 1996],
        "profit_c": [10001, 7000, 9000]}


def test_meta_blocking_cnp_topk_or_union(ray_session):
    """CNP: each node keeps its top-k edges under the total order
    (w DESC, id_a, id_b); the survivor set is the DISTINCT union over
    both endpoints; at k=1 only the three heavy edges survive, at k=2
    each node pulls in exactly one deterministic weight-1 spoke."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import meta_blocking_cnp

    def doc(bid, *blocks):
        toks = []
        for i, b in enumerate(blocks):
            if i:
                toks.append(f"sep{bid}x{i}")
            toks.extend(b.split())
        return (bid, " ".join(toks))

    t1, t2, t3 = "a1 a2 a3", "b1 b2 b3", "c1 c2 c3"
    t4, t5, t6 = "d1 d2 d3", "e1 e2 e3", "f1 f2 f3"
    t7, t8 = "g1 g2 g3", "h1 h2 h3"
    rows = [doc(1, t1, t2, t3), doc(2, t1, t2, t3),
            doc(3, t3, t7, t8), doc(4, t3, t7, t8),
            doc(5, t3, t4, t5, t6), doc(6, t3, t4, t5, t6)]
    docs = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))

    got1 = meta_blocking_cnp(docs, k=1).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert got1.to_dict("list") == {
        "id_a": [1, 3, 5], "id_b": [2, 4, 6], "w": [3, 3, 4]}

    got2 = meta_blocking_cnp(docs, k=2).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # per node the 2nd edge is its lexicographically-first w=1 spoke:
    # node1->(1,3), node2->(2,3), node3->(1,3), node4->(1,4),
    # node5->(1,5), node6->(1,6); distinct-union with the heavies.
    assert got2.to_dict("list") == {
        "id_a": [1, 1, 1, 1, 1, 2, 3, 5],
        "id_b": [2, 3, 4, 5, 6, 3, 4, 6],
        "w": [3, 1, 1, 1, 1, 1, 3, 4]}


def test_monge_elkan_directional_means(ray_session):
    """ME is asymmetric: the mean runs over the LEFT side's distinct
    tokens, each scored by its best inner edit ratio against the right
    side; the inner ratio floors (lev 1 on len-2 tokens -> 50), the
    mean floors at bp; candidates are the tau-50 shingle pairs."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import monge_elkan_pairs

    rows = [(1, "t1 t2 t3 t4 t5"),
            (2, "t1 t2 t3 t4 x5"),
            (3, "t1 t2 t3 t4")]
    docs = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = monge_elkan_pairs(docs).to_pandas() \
        .sort_values(["left_id", "right_id"]).reset_index(drop=True)
    # (1,2): t5<->x5 align at ratio 50 both ways -> 9000/9000.
    # (1,3): t5 has no partner better than 50 -> 9000; B->A is a full
    #        subset -> 10000.
    # (2,3): x5's best against {t1..t4} is 0 (lev 2 of 2) -> 8000;
    #        B->A full subset -> 10000.
    assert got.to_dict("list") == {
        "left_id": [1, 1, 2], "right_id": [2, 3, 3],
        "me_lr_bp": [9000, 9000, 8000],
        "me_rl_bp": [9000, 10000, 10000]}


def test_basket_pairs_distinct_and_tiebreak(ray_session, tmp_path):
    """basket_pairs: a part repeated within an order counts ONCE; the
    support is the number of orders with both parts; equal counts break
    ties on (p1, p2); k truncates."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import basket_pairs

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2, 2, 3, 3], pa.int64()),
        "l_partkey": pa.array([5, 5, 7, 5, 7, 9, 5, 7], pa.int64()),
    }), tmp_path / "lineitem.parquet", row_group_size=3)
    got = basket_pairs(str(tmp_path), k=2).to_pandas()
    assert got.to_dict("list") == {
        "rank": [1, 2], "p1": [5, 5], "p2": [7, 9], "cnt": [3, 1]}


def test_two_hop_pairs_witness_cap_and_direct_subtraction(ray_session):
    """two_hop: a path a-m-c yields (a,c) with paths=1; a middle whose
    degree exceeds max_deg is excluded as witness entirely; pairs that
    are ALREADY direct edges never appear (triangle -> empty)."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import two_hop_pairs

    def doc(bid, *blocks):
        toks = []
        for i, b in enumerate(blocks):
            if i:
                toks.append(f"sep{bid}x{i}")
            toks.extend(b.split())
        return (bid, " ".join(toks))

    t1, t2, t3 = "a1 a2 a3", "b1 b2 b3", "c1 c2 c3"
    # path 1-2-3: edges (1,2) via t1 and (2,3) via t2
    path = rd.from_pandas(pd.DataFrame(
        [doc(1, t1), doc(2, t1, t2), doc(3, t2)],
        columns=["doc_id", "text"]))
    got = two_hop_pairs(path).to_pandas()
    assert got.to_dict("list") == {"id_a": [1], "id_b": [3], "paths": [1]}
    # middle 2 has degree 2 > max_deg=1 -> no witnesses -> empty
    assert len(two_hop_pairs(path, max_deg=1).to_pandas()) == 0

    # triangle: every 2-hop pair is also direct -> empty
    tri = rd.from_pandas(pd.DataFrame(
        [doc(1, t1, t3), doc(2, t1, t2), doc(3, t2, t3)],
        columns=["doc_id", "text"]))
    assert len(two_hop_pairs(tri).to_pandas()) == 0


def test_pair_features_integer_laws(ray_session):
    """pair_features: token Jaccard over DISTINCT tokens, ME both
    directions equals monge_elkan_pairs on the same candidates,
    first_lev is the byte edit distance of the FIRST tokens, len_diff
    the distinct-count gap."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import (monge_elkan_pairs,
                                                  pair_features)

    rows = [(1, "t1 t2 t3 t4 t5"),
            (2, "t1 t2 t3 t4 x5"),
            (3, "t1 t2 t3 t4")]
    docs = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = pair_features(docs).to_pandas() \
        .sort_values(["left_id", "right_id"]).reset_index(drop=True)
    me = monge_elkan_pairs(docs).to_pandas() \
        .sort_values(["left_id", "right_id"]).reset_index(drop=True)
    assert got[["me_lr_bp", "me_rl_bp"]].values.tolist() \
        == me[["me_lr_bp", "me_rl_bp"]].values.tolist()
    # (1,2): inter 4 of {5,5} -> 4*1e4//6 = 6666; first tokens equal;
    # (1,3): inter 4 of {5,4} -> 4*1e4//5 = 8000, len_diff 1;
    # (2,3): inter 4 -> 8000, first tokens equal.
    assert got.to_dict("list") == {
        "left_id": [1, 1, 2], "right_id": [2, 3, 3],
        "tok_jaccard_bp": [6666, 8000, 8000],
        "me_lr_bp": [9000, 9000, 8000],
        "me_rl_bp": [9000, 10000, 10000],
        "first_lev": [0, 0, 0],
        "len_diff": [0, 1, 1]}


def test_revenue_concentration_decile_cut(ray_session, tmp_path):
    """revenue_concentration: the decile is ceil(n/10) (n=11 -> 2
    customers), ordered (rev DESC, custkey) so a revenue tie at the cut
    resolves by id; zero-order customers don't count; cents floor at
    the ORDER level."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import revenue_concentration

    pq.write_table(pa.table({
        "n_nationkey": pa.array([1], pa.int64()),
        "n_name": pa.array(["N1"], pa.string()),
    }), tmp_path / "nation.parquet")
    # 12 customers in nation 1; customer 12 has NO orders -> n=11
    pq.write_table(pa.table({
        "c_custkey": pa.array(list(range(1, 13)), pa.int64()),
        "c_nationkey": pa.array([1] * 12, pa.int64()),
    }), tmp_path / "customer.parquet")
    # cust 1: two orders 10.004 + 10.004 -> 1000 + 1000 = 2000c (order-
    # level floor, NOT floor(20.008*100+0.5)=2001); cust 2 and 3 tie at
    # 2000c -> the cut at k=2 keeps cust 1 then cust 2 (id order);
    # custs 4..11 get 100c each.
    keys = [1, 1, 2, 3] + list(range(4, 12))
    prices = [10.004, 10.004, 20.0, 20.0] + [1.0] * 8
    pq.write_table(pa.table({
        "o_custkey": pa.array(keys, pa.int64()),
        "o_totalprice": pa.array(prices, pa.float64()),
    }), tmp_path / "orders.parquet", row_group_size=3)
    got = revenue_concentration(str(tmp_path)).to_pandas()
    assert got.to_dict("list") == {
        "n_name": ["N1"], "n_customers": [11], "top_k": [2],
        "total_c": [2000 + 2000 + 2000 + 800],
        "top_c": [4000],
        "share_bp": [4000 * 10000 // 6800]}


def test_blocking_rule_coverage_marginal_law(ray_session):
    """Rule stack marginals: exact dups (rule 1) are also 4-gram and
    3-gram pairs but count as NEW only at rule 1; a pair first covered
    by the looser 3-gram rule is new at rule 3; empty corpus keeps the
    fixed 3-row zero shape."""
    import pandas as pd
    import ray.data as rd

    from name_matching_ray.stages.erblock import blocking_rule_coverage

    rows = [
        (1, "q1 q2 q3 q4"),         # exact dup with 2
        (2, "q1 q2 q3 q4"),
        (3, "q1 q2 q3 z9"),         # shares 3-gram "q1 q2 q3" only
    ]
    docs = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = blocking_rule_coverage(docs).to_pandas()
    # rule1: (1,2).  rule2 (4-grams, df>=2): "q1 q2 q3 q4" shared by
    # 1,2 -> (1,2).  rule3 (3-grams): "q1 q2 q3" in all three (df 3),
    # "q2 q3 q4" in 1,2 -> pairs (1,2),(1,3),(2,3).
    assert got.to_dict("list") == {
        "rule_id": [1, 2, 3],
        "n_pairs": [1, 1, 3],
        "n_new": [1, 0, 2]}

    empty = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype="object")}))
    got0 = blocking_rule_coverage(empty).to_pandas()
    assert got0.to_dict("list") == {
        "rule_id": [1, 2, 3], "n_pairs": [0, 0, 0], "n_new": [0, 0, 0]}


def test_waiting_suppliers_exists_not_exists_laws(ray_session, tmp_path):
    """Single-supplier orders never count (EXISTS other supplier);
    two-late orders never count (NOT EXISTS other late); non-'F' orders
    drop; shipdate exactly +60d is NOT late (strict); late is a
    per-(order, supplier) MAX over lines; ties rank numwait DESC then
    s_name; other-nation suppliers drop."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import waiting_suppliers

    ts = lambda s: pd.Timestamp(s)
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": ["NATION_7", "NATION_8"],
    }), tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
        "s_name": ["S1", "S2", "S3", "S4"],
        "s_nationkey": pa.array([0, 0, 0, 1], pa.int32()),
    }), tmp_path / "supplier.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
        "o_orderdate": pa.array([ts("2000-01-01")] * 6,
                                pa.timestamp("us")),
        # 14 is open -> excluded even though its shape would qualify
        "o_orderstatus": ["F", "F", "F", "F", "O", "F"],
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        #  10: S1 late, S2 on time           -> S1 waits
        #  11: S1 late alone (single supp)   -> nobody (EXISTS fails)
        #  12: S1 and S2 both late           -> nobody (NOT-EXISTS fails)
        #  13: S2 has an early line AND a late line (max-fold -> late),
        #      S3 exactly +60d (NOT late)    -> S2 waits
        #  14: open order                    -> dropped by status
        #  15: S4 (other nation) late, S1 on time -> S4 waits but is
        #      filtered by nation
        "l_orderkey": pa.array([10, 10, 11, 12, 12, 13, 13, 13,
                                14, 14, 15, 15], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 1, 2, 2, 2, 3,
                               1, 2, 4, 1], pa.int64()),
        "l_shipdate": pa.array(
            [ts("2000-06-01"), ts("2000-01-05"),   # 10
             ts("2000-06-01"),                     # 11
             ts("2000-06-01"), ts("2000-06-01"),   # 12
             ts("2000-01-02"), ts("2000-06-01"),   # 13: S2 early+late
             ts("2000-03-01"),                     # 13: S3 exactly +60d
             ts("2000-06-01"), ts("2000-01-05"),   # 14
             ts("2000-06-01"), ts("2000-01-05")],  # 15
            pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    got = waiting_suppliers(str(tmp_path), nation="NATION_7").to_pandas()
    # S1 and S2 each wait once; tie breaks on s_name ascending
    assert list(got["s_name"]) == ["S1", "S2"]
    assert list(got["numwait"]) == [1, 1]


def test_graph_triangles_census(ray_session):
    """A 3-clique (1 triangle, 3 wedges) + an open 2-path (1 wedge, no
    triangle) + an isolated doc (never a node): exact census and floor-bp
    transitivity; each triangle counted ONCE at its lowest vertex."""
    import ray.data as rd

    from name_matching_ray.stages.cluster import graph_triangles

    docs = rd.from_items([
        # 3-clique: identical docs, pairwise Jaccard 1
        {"doc_id": 1, "text": "a1 a2 a3 a4 a5"},
        {"doc_id": 2, "text": "a1 a2 a3 a4 a5"},
        {"doc_id": 3, "text": "a1 a2 a3 a4 a5"},
        # open wedge at 5: 4-5 and 5-6 edges, 4∩6 = 0
        {"doc_id": 4, "text": "p1 p2 p3 p4 p5"},
        {"doc_id": 5, "text": "p1 p2 p3 p4 p5 q1 q2 q3 q4 q5"},
        {"doc_id": 6, "text": "q1 q2 q3 q4 q5"},
        # isolated: unique shingles (df=1 all) -> no pairs, not a node
        {"doc_id": 7, "text": "z1 z2 z3 z4 z5"},
    ])
    got = graph_triangles(docs).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert int(r["n_nodes"]) == 6
    assert int(r["n_edges"]) == 5
    assert int(r["n_wedges"]) == 4      # 3 in the clique + 1 at doc 5
    assert int(r["n_triangles"]) == 1
    assert int(r["transitivity_bp"]) == 7500  # 3*1*1e4 // 4


def test_graph_triangles_empty_graph(ray_session):
    """No qualifying pairs -> the fixed one-row zero census."""
    import ray.data as rd

    from name_matching_ray.stages.cluster import graph_triangles

    docs = rd.from_items([
        {"doc_id": 1, "text": "u1 u2 u3 u4"},
        {"doc_id": 2, "text": "v1 v2 v3 v4"},
    ])
    got = graph_triangles(docs).to_pandas()
    assert len(got) == 1
    assert list(got.iloc[0]) == [0, 0, 0, 0, 0]


def test_vocab_growth_min_slice_and_null_text(ray_session):
    """vocab counts a token at its MINIMUM slice only (no double count
    across slices); NULL text contributes a doc but no tokens; the curve
    is cumulative and the k=n_slices row covers the whole corpus."""
    import ray.data as rd

    from name_matching_ray.stages.curation import _md5_low64
    from name_matching_ray.stages.textstats import vocab_growth

    # pick ids landing in different slices so the law is exercised
    ids = list(range(40))
    sl = {i: _md5_low64(str(i)) % 16 for i in ids}
    lo = min(ids, key=lambda i: sl[i])   # earliest slice
    hi = max(ids, key=lambda i: sl[i])   # latest slice
    assert sl[lo] < sl[hi]
    rows = [{"doc_id": lo, "text": "shared alpha"},
            {"doc_id": hi, "text": "shared beta"},
            {"doc_id": [i for i in ids if i not in (lo, hi)][0],
             "text": None}]
    null_doc = rows[2]["doc_id"]
    got = vocab_growth(rd.from_items(rows)).to_pandas()
    assert list(got["k"]) == list(range(1, 17))
    last = got.iloc[-1]
    assert int(last["n_docs"]) == 3
    assert int(last["n_tokens"]) == 4
    # 'shared' appears in two slices but counts once -> 3 distinct
    assert int(last["n_vocab"]) == 3
    # at k just past lo's slice: only lo's doc (unless null doc or hi
    # share that prefix) — check the exact prefix membership law
    for k in range(1, 17):
        r = got.iloc[k - 1]
        exp_docs = sum(1 for i in (lo, hi, null_doc) if sl[i] < k)
        assert int(r["n_docs"]) == exp_docs
        exp_vocab = (2 if sl[lo] < k else 0) + (1 if sl[hi] < k else 0)
        # 'shared' enters at min(sl[lo], sl[hi]) = sl[lo] with 'alpha';
        # 'beta' adds at sl[hi]
        assert int(r["n_vocab"]) == exp_vocab
    # monotone non-decreasing curve
    assert (got["n_vocab"].diff().dropna() >= 0).all()


def test_forecast_revenue_boundaries_and_cents_law(ray_session, tmp_path):
    """forecast_revenue (Q6): inclusive discount band, exclusive qty /
    year-end bounds, item-level floor(ep*disc*100+0.5); empty
    selection keeps the fixed one-row (0, 0) shape."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import forecast_revenue

    ts = lambda s: np.datetime64(s, "us")
    rows = [
        # in: 10.1 * 0.03 * 100 + 0.5 = 30.8 -> 30
        (ts("1996-06-01"), 0.03, 10.0, 10.1),
        # in: exactly 0.5 half -> 25*0.02*100+0.5 = 50.5 -> 50
        (ts("1996-01-01"), 0.02, 24.0, 25.0),
        # out: quantity == 25 (strict <)
        (ts("1996-06-01"), 0.03, 25.0, 100.0),
        # out: discount below band
        (ts("1996-06-01"), 0.01, 10.0, 100.0),
        # in: discount at the top edge (inclusive)
        (ts("1996-12-31"), 0.04, 10.0, 100.0),
        # out: first instant of the next year
        (ts("1997-01-01"), 0.03, 10.0, 100.0),
        # out: previous year
        (ts("1995-12-31"), 0.03, 10.0, 100.0),
    ]
    pq.write_table(pa.table({
        "l_shipdate": pa.array([r[0] for r in rows],
                               pa.timestamp("us")),
        "l_discount": pa.array([r[1] for r in rows], pa.float64()),
        "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[3] for r in rows], pa.float64()),
    }), tmp_path / "lineitem.parquet", row_group_size=2)

    got = forecast_revenue(str(tmp_path)).to_pandas()
    assert got.to_dict("list") == {
        "revenue_c": [30 + 50 + 400], "n_items": [3]}

    # empty selection: the whole file prunes away at the read
    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(pa.table({
        "l_shipdate": pa.array([ts("1990-01-01")], pa.timestamp("us")),
        "l_discount": pa.array([0.03], pa.float64()),
        "l_quantity": pa.array([1.0], pa.float64()),
        "l_extendedprice": pa.array([1.0], pa.float64()),
    }), empty / "lineitem.parquet")
    got = forecast_revenue(str(empty)).to_pandas()
    assert got.to_dict("list") == {"revenue_c": [0], "n_items": [0]}


def test_important_parts_global_threshold(ray_session, tmp_path):
    """important_parts (Q11): only the chosen nation's lines count,
    the threshold is STRICT > on value*frac_den vs the global total
    (a part exactly at the boundary is excluded), and an empty nation
    slice yields zero rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import important_parts

    pq.write_table(pa.table({
        "n_nationkey": pa.array([1, 2], pa.int64()),
        "n_name": pa.array(["NATION_1", "NATION_2"], pa.string()),
    }), tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([1, 2], pa.int64()),
    }), tmp_path / "supplier.parquet")
    # part 1 via s1: 3.0 -> 300c; part 2 via s1: 1.0 -> 100c; part 2
    # via s2 (other nation): ignored.  total = 400.  frac_den=4:
    # part 1 keeps (1200 > 400), part 2 is EXACTLY at the boundary
    # (400 > 400 is false) -> excluded.
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 1, 2], pa.int64()),
        "l_partkey": pa.array([1, 2, 2], pa.int64()),
        "l_extendedprice": pa.array([3.0, 1.0, 999.0], pa.float64()),
    }), tmp_path / "lineitem.parquet", row_group_size=1)

    got = important_parts(str(tmp_path), nation="NATION_1",
                          frac_den=4).to_pandas()
    assert got.to_dict("list") == {"p_partkey": [1], "value_c": [300]}

    got = important_parts(str(tmp_path), nation="NATION_3",
                          frac_den=4).to_pandas()
    assert len(got) == 0


def test_excess_shippers_majority_tie_and_filters(ray_session, tmp_path):
    """excess_shippers (Q20): an exact 50% split dominates NOBODY
    (strict 2*qty > total), out-of-year and non-prefix lines don't
    count, and other-nation dominators are filtered from the output
    (but still beat nation suppliers in the per-part test)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import excess_shippers

    ts = lambda s: np.datetime64(s, "us")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([1, 2], pa.int64()),
        "n_name": pa.array(["NATION_1", "NATION_2"], pa.string()),
    }), tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
        "s_nationkey": pa.array([1, 2, 1], pa.int64()),
    }), tmp_path / "supplier.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_name": pa.array(["blue rod", "blue bolt", "red rod",
                            "blue cap"], pa.string()),
    }), tmp_path / "part.parquet")
    rows = [
        # p1: s1=6, s2=4 -> s1 dominates (12 > 10)
        (1, 1, 6.0, ts("1996-03-01")),
        (1, 2, 4.0, ts("1996-04-01")),
        # p2: s1=5, s3=5 -> exact tie, nobody dominates
        (2, 1, 5.0, ts("1996-05-01")),
        (2, 3, 5.0, ts("1996-06-01")),
        # p1 1995 line (ignored): would hand s3 dominance
        (1, 3, 100.0, ts("1995-06-01")),
        # p3 is non-prefix (ignored)
        (3, 3, 50.0, ts("1996-06-01")),
        # p4: s2 (NATION_2) dominates -> beats everyone but is
        # filtered from the NATION_1 output
        (4, 2, 9.0, ts("1996-07-01")),
        (4, 3, 1.0, ts("1996-07-01")),
    ]
    pq.write_table(pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
        "l_shipdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet", row_group_size=3)

    got = excess_shippers(str(tmp_path), nation="NATION_1").to_pandas()
    assert got.to_dict("list") == {
        "s_suppkey": [1], "s_name": ["S1"], "n_parts": [1]}


def test_cluster_split_merge_identities(ray_session):
    """Split/merge repair costs: a cluster mixing two truth entities
    needs one split; a truth entity scattered over two clusters needs
    one merge; the identities count cells, not docs; empty corpus is
    the all-zero row; a perfect clustering is (0, 0)."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import cluster_split_merge

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        # fps: {1,2}='ab', {3}='b', {4}='c', {5,6}='' (empty collapse)
        "text": ["a b", "A-b!", "b", "c", "", ""],
    }))
    # clusters: {1,3} mixes fps -> 1 split; fp 'ab' spans c1/c2 and
    # fp '' spans c4/c5 -> 2 merges.  cells = 6, clusters = 5, fps = 4.
    cc = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "cluster_id": pa.array([1, 2, 1, 3, 4, 5], pa.int64()),
    }))
    row = cluster_split_merge(cc, docs).to_pandas().iloc[0]
    assert (row["n_docs"], row["n_clusters"], row["n_fps"],
            row["n_cells"]) == (6, 5, 4, 6)
    assert (row["n_splits_needed"], row["n_merges_needed"]) == (1, 2)

    # perfect clustering == truth partition -> (0, 0)
    cc_perfect = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "cluster_id": pa.array([1, 1, 3, 4, 5, 5], pa.int64()),
    }))
    row = cluster_split_merge(cc_perfect, docs).to_pandas().iloc[0]
    assert (row["n_splits_needed"], row["n_merges_needed"]) == (0, 0)

    # empty corpus -> all zeros (SQL COUNT over empty is 0, not NULL)
    e = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    ec = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "cluster_id": pa.array([], pa.int64())}))
    row = cluster_split_merge(ec, e).to_pandas().iloc[0]
    assert row.tolist() == [0, 0, 0, 0, 0, 0]


def test_block_filtering_quota_and_rank(ray_session):
    """block_filtering_pairs: the keep quota is ceil(ratio*n) over
    SURVIVING blocks ranked (df ASC, token ASC); a pair whose only
    shared block was dropped by one side is pruned; ratio 100%
    restores the unfiltered CBS graph."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import block_filtering_pairs

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        # trigram blocks: 'x y z' df=3 (1,2,3); 'y z w' df=3 (1,3,4);
        # 'y z q' / 'z w k' df=1 (purged).  At ratio 50% each doc
        # keeps ceil(n/2): docs 1,3 keep only 'x y z' (lex tie-break
        # on equal df), so the (1,4)/(3,4) pairs vanish.
        "text": ["x y z w", "x y z q", "x y z w", "y z w k"],
    }))
    got = block_filtering_pairs(docs).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert got.to_dict("list") == {
        "id_a": [1, 1, 2], "id_b": [2, 3, 3], "w": [1, 1, 1]}

    full = block_filtering_pairs(docs, ratio_bp=10_000).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert full.to_dict("list") == {
        "id_a": [1, 1, 1, 2, 3], "id_b": [2, 3, 4, 3, 4],
        "w": [1, 2, 1, 1, 1]}

    # empty corpus
    e = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert len(block_filtering_pairs(e).to_pandas()) == 0


def test_greedy_one_to_one_rounds(ray_session):
    """greedy_one_to_one: round 1 is the role-specific mutual-best law;
    a pair whose endpoints both LOST round 1 (their best partners were
    taken) matches in round 2; matched nodes never reappear; empty
    input keeps the empty shape."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import greedy_one_to_one

    # four same-nation customers, names all tens-digit '1', balances
    # 1000/1000/2000/3000 -> weights: seg 1 (all agree), ten 1 (all
    # agree), bal 3 (only the 1000 pair agrees).  scores: (1,2)=5,
    # every other pair 2.  Round 1: (1,2) mutual; (2,3)/(3,4) blocked
    # (r-best of 3 and 4 is node 1).  Round 2: only (3,4) remains.
    cust = ray.data.from_arrow(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": pa.array(["A10", "B10", "C10", "D10"], pa.string()),
        "c_nationkey": pa.array([7, 7, 7, 7], pa.int64()),
        "c_mktsegment": pa.array(["AUTOMOBILE"] * 4, pa.string()),
        "c_acctbal": pa.array([1000.0, 1000.0, 2000.0, 3000.0],
                              pa.float64()),
    }))
    got = greedy_one_to_one(cust).to_pandas() \
        .sort_values(["round", "left_id"]).reset_index(drop=True)
    assert got.to_dict("list") == {
        "round": [1, 2], "left_id": [1, 3], "right_id": [2, 4],
        "score": [5, 2]}

    e = ray.data.from_arrow(pa.table({
        "c_custkey": pa.array([], pa.int64()),
        "c_name": pa.array([], pa.string()),
        "c_nationkey": pa.array([], pa.int64()),
        "c_mktsegment": pa.array([], pa.string()),
        "c_acctbal": pa.array([], pa.float64())}))
    assert len(greedy_one_to_one(e).to_pandas()) == 0


def test_doc_novelty_df_law(ray_session):
    """doc_novelty: df counts DOCUMENTS (a shingle repeated inside one
    doc stays novel), exact-dup docs zero each other out, short/null
    texts emit no row, and the bp floor divides per doc."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.dedup import doc_novelty

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": [
            # doc 1: shingles {a b c, b c a, c a b, a b c(dup->distinct)}
            # = {abc, bca, cab}; 'a b c' occurs twice WITHIN doc 1 but
            # df(abc) counts docs: doc 2 also has it -> not novel.
            "a b c a b c",
            "a b c",            # doc 2: {abc} shared with doc 1 -> 0/1
            "x y z w",          # doc 3: {xyz, yzw} all unique -> 2/2
            "p q",              # doc 4: too short, no row
            None,               # doc 5: null, no row
        ],
    }))
    got = doc_novelty(docs).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got.to_dict("list") == {
        "doc_id": [1, 2, 3],
        "n_grams": [3, 1, 2],
        "n_novel": [2, 0, 2],
        "novelty_bp": [6666, 0, 10000]}


def test_min_cost_supplier_ties_and_region(ray_session, tmp_path):
    """min_cost_supplier (Q2): the per-part MIN keeps ALL tied region
    suppliers; a cheaper out-of-region supplier doesn't steal the win;
    the unit-cost floor law works at the LINE level (min over a
    supplier's own lines first)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import min_cost_supplier

    pq.write_table(pa.table({
        "r_regionkey": pa.array([1, 2], pa.int64()),
        "r_name": pa.array(["EUROPE", "ASIA"], pa.string()),
    }), tmp_path / "region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([1, 2], pa.int64()),
        "n_regionkey": pa.array([1, 2], pa.int64()),
    }), tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
        "s_nationkey": pa.array([1, 1, 2], pa.int64()),
    }), tmp_path / "supplier.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_size": pa.array([5, 99], pa.int64()),
        "p_type": pa.array(["ECONOMY", "ECONOMY"], pa.string()),
    }), tmp_path / "part.parquet")
    # part 1: s1 lines 10.0/2qty=500c then 6.0/2qty=300c (min 300);
    # s2 line 3.0/1qty=300c -> TIE, both win; s3 (ASIA) 1.0/1=100c
    # is cheaper but out of region; part 2 filtered by size.
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 3, 1], pa.int64()),
        "l_extendedprice": pa.array([10.0, 6.0, 3.0, 1.0, 1.0],
                                    pa.float64()),
        "l_quantity": pa.array([2.0, 2.0, 1.0, 1.0, 1.0], pa.float64()),
    }), tmp_path / "lineitem.parquet", row_group_size=2)

    got = min_cost_supplier(str(tmp_path)).to_pandas() \
        .sort_values("s_suppkey").reset_index(drop=True)
    assert got.to_dict("list") == {
        "p_partkey": [1, 1], "s_suppkey": [1, 2],
        "s_name": ["S1", "S2"], "ucost_c": [300, 300]}


def test_source_dup_matrix_unordered_and_null_source(ray_session):
    """source_dup_matrix: pair (a,b) lands in the UNORDERED
    (least, greatest) source cell; a NULL source is the '' group, not
    a dropped row; within-source pairs hit the diagonal; empty corpus
    keeps the typed empty shape."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.dedup import source_dup_matrix

    # near-dup law (n=3, tau 10, df>=2): identical 3-token texts pair.
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["a b c", "a b c", "a b c", "x y z"],
        # sources: B, A, NULL -> pairs (1,2): (A,B); (1,3): ('',B);
        # (2,3): ('',A); doc 4 pairs with nobody.
        "source": pa.array(["B", "A", None, "B"], pa.string()),
    }))
    got = source_dup_matrix(docs).to_pandas() \
        .sort_values(["src_a", "src_b"]).reset_index(drop=True)
    assert got.to_dict("list") == {
        "src_a": ["", "", "A"], "src_b": ["A", "B", "B"],
        "n_dup_pairs": [1, 1, 1]}

    # same-source pair -> diagonal cell
    docs2 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["a b c", "a b c"],
        "source": pa.array(["A", "A"], pa.string()),
    }))
    got = source_dup_matrix(docs2).to_pandas()
    assert got.to_dict("list") == {
        "src_a": ["A"], "src_b": ["A"], "n_dup_pairs": [1]}

    e = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "source": pa.array([], pa.string())}))
    out = source_dup_matrix(e).to_pandas()
    assert list(out.columns) == ["src_a", "src_b", "n_dup_pairs"]
    assert len(out) == 0


def test_shingle_df_hist_counts_docs_not_occurrences(ray_session):
    """shingle_df_hist: df counts DOCUMENTS (within-doc repeats are
    distinct-collapsed), and the histogram counts SHINGLES per df
    value; short docs contribute nothing."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.dedup import shingle_df_hist

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        # doc1: 'a b c' twice WITHIN the doc -> still df 1 from doc1;
        # doc2 repeats it -> df('a b c')=2, df('b c a')=1 (doc1 only),
        # df('c a b')=1, df('b c x')=1 (doc2); doc3 too short.
        "text": ["a b c a b c", "a b c x", "p q"],
    }))
    # doc2 text is 'a b c x' (slice keeps it simple): shingles
    # {'a b c', 'b c x'}; doc1 shingles {'a b c','b c a','c a b'}.
    got = shingle_df_hist(docs).to_pandas().sort_values("df") \
        .reset_index(drop=True)
    assert got.to_dict("list") == {"df": [1, 2], "n_shingles": [3, 1]}


def test_weighted_jaccard_pairs_idf_law(ray_session):
    """weighted_jaccard_pairs: weights are bit_length(N // df) (shared
    shingles weigh less), doc weight sums ALL shingles (df==1 included
    in the denominator), threshold is the exact integer cross-multiply
    at tau 30."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.dedup import weighted_jaccard_pairs

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": [
            "a b c x y z",   # {abc(w1), bcx(3), cxy(3), xyz(2)} W=9
            "a b c p q r",   # {abc(1), bcp(3), cpq(3), pqr(3)} W=10
            "a b c",         # {abc(1)} W=1
            "x y z w",       # {xyz(2), yzw(3)} W=5
            "a b c",         # {abc(1)} W=1
        ],
    }))
    # N=5; df(abc)=4 -> w=bitlen(5//4)=1; df(xyz)=2 -> w=bitlen(2)=2;
    # df-1 shingles w=bitlen(5)=3.  Only (3,5) passes tau 30:
    # 1*100 >= 30*(1+1-1).  (1,4) shares xyz (iw=2) but
    # 200 < 30*(9+5-2); the abc-only pairs all fail on W.
    got = weighted_jaccard_pairs(docs).to_pandas()
    assert got.to_dict("list") == {
        "left_id": [3], "right_id": [5], "inter_w": [1],
        "w_left": [1], "w_right": [1]}


def test_cluster_homogeneity_bit_entropy_law(ray_session):
    """cluster_homogeneity: a perfect clustering scores (10000, 10000);
    merging two entities into one cluster keeps completeness at 10000
    but drops homogeneity; a single-entity corpus is vacuously
    homogeneous (H(truth)=0 -> 10000)."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import cluster_homogeneity

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        # fps: {1,2}, {3,4}
        "text": ["a b", "a-b", "c d", "c:d"],
    }))
    perfect = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "cluster_id": pa.array([1, 1, 3, 3], pa.int64()),
    }))
    row = cluster_homogeneity(perfect, docs).to_pandas().iloc[0]
    # H(truth): two groups of 2 over N=4 -> 2*2*(bitlen(2)-1) = 4
    assert (row["h_truth_bits"], row["cond_truth_bits"]) == (4, 0)
    assert (row["homogeneity_bp"], row["completeness_bp"]) \
        == (10000, 10000)

    merged = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "cluster_id": pa.array([1, 1, 1, 1], pa.int64()),
    }))
    row = cluster_homogeneity(merged, docs).to_pandas().iloc[0]
    # one cluster of 4: H(pred)=0 -> completeness vacuous 10000;
    # cond_truth = 2 cells of 2 in n_k=4: 2*2*(bitlen(4//2)-1)=4
    # -> homogeneity (4-4)*1e4//4 = 0
    assert (row["h_pred_bits"], row["cond_truth_bits"]) == (0, 4)
    assert (row["homogeneity_bp"], row["completeness_bp"]) == (0, 10000)

    # single entity: H(truth)=0 -> homogeneity vacuous
    one = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["a b", "a b"]}))
    cc1 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "cluster_id": pa.array([1, 2], pa.int64())}))
    row = cluster_homogeneity(cc1, one).to_pandas().iloc[0]
    assert (row["homogeneity_bp"], row["completeness_bp"]) == (10000, 0)


def test_cohort_retention_first_week_and_cap(ray_session, tmp_path):
    """cohort_retention: the cohort is the user's FIRST active week
    (multiple events in a week count once), offsets cap at max_offset,
    and offset 0 equals the cohort size."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import cohort_retention

    wk = 7 * 86_400_000_000
    def ts(week, n=0):
        return np.datetime64(int(week * wk + n), "us")
    rows = [
        (1, ts(100)), (1, ts(100, 5)),   # u1 week 100 twice -> once
        (1, ts(101)), (1, ts(103)),      # offsets 1 and 3
        (2, ts(100)), (2, ts(112)),      # offset 12 > cap -> dropped
        (3, ts(101)),                    # second cohort
    ]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }), tmp_path / "events.parquet", row_group_size=2)

    got = cohort_retention(str(tmp_path), max_offset=8).to_pandas() \
        .sort_values(["cohort_week", "offset"]).reset_index(drop=True)
    assert got.to_dict("list") == {
        "cohort_week": [100, 100, 100, 101],
        "offset": [0, 1, 3, 0],
        "n_users": [2, 1, 1, 1]}


def test_containment_keep_directional_law(ray_session):
    """containment_keep: the SMALL side drops when tau-80 covered by a
    strictly bigger partner; equal sizes drop the HIGHER id; partial
    overlap below tau keeps both; shingle-less docs keep."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.erblock import containment_keep

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": [
            "a b c d",          # 1: {abc,bcd} fully inside doc 2 -> drop
            "a b c d e",        # 2: superset (3 shingles) -> keep
            "x y z",            # 3: == doc 4 (1 shingle each): tie ->
            "x y z",            # 4:   higher id drops
            "p q r s",          # 5: shares nothing above df guard
            "t u",              # 6: shingle-less -> keep
        ],
    }))
    got = containment_keep(docs).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got.to_dict("list") == {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "keep": [0, 1, 1, 0, 1, 1]}


def test_order_gap_median_peers_inclusive(ray_session, tmp_path):
    """order_gap_median: even gap counts take the LOWER middle
    (rank*2 >= n), same-day repeats are exact 0 gaps, single-order
    customers emit nothing."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import order_gap_median

    day = lambda d: np.datetime64(f"1996-01-{d:02d}", "us")
    rows = [
        # cust 1: days 1,2,10 -> gaps [1, 8], median = lower mid 1
        (1, day(1)), (1, day(2)), (1, day(10)),
        # cust 2: days 5,5,6 -> gaps [0, 1], median 0
        (2, day(5)), (2, day(5)), (2, day(6)),
        # cust 3: one order -> no row
        (3, day(7)),
    ]
    pq.write_table(pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array([r[1] for r in rows],
                                pa.timestamp("us")),
    }), tmp_path / "orders.parquet", row_group_size=2)

    got = order_gap_median(str(tmp_path)).to_pandas() \
        .sort_values("c_custkey").reset_index(drop=True)
    assert got.to_dict("list") == {
        "c_custkey": [1, 2], "n_orders": [3, 3],
        "median_gap_days": [1, 0]}


def test_basket_lift_margins_and_laws(ray_session, tmp_path):
    """basket_lift: supports count ORDERS (duplicate lines collapse),
    confidences are directional bp floors, lift uses the global
    distinct-order count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import basket_lift

    # orders: o1 {A,B} (B twice -> once), o2 {A,B}, o3 {A}, o4 {C}
    rows = [(1, 10), (1, 20), (1, 20), (2, 10), (2, 20), (3, 10),
            (4, 30)]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    }), tmp_path / "lineitem.parquet", row_group_size=2)

    r = basket_lift(str(tmp_path))
    got = r.to_pandas() if hasattr(r, "to_pandas") else r
    # pair (10,20): cnt 2; n_10 = 3, n_20 = 2, N = 4 orders
    assert got.to_dict("list") == {
        "rank": [1], "p1": [10], "p2": [20], "cnt": [2],
        "n_a": [3], "n_b": [2],
        "conf_ab_bp": [2 * 10000 // 3], "conf_ba_bp": [10000],
        "lift_ppm": [2 * 4 * 1_000_000 // (3 * 2)]}


def test_fact_key_skew_rank_law(ray_session, tmp_path):
    """fact_key_skew: exact counts across row groups, rank ties break
    on the LOWER key, k caps the output."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import fact_key_skew

    keys = [7] * 5 + [3] * 3 + [9] * 3 + [1]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(keys, pa.int64()),
    }), tmp_path / "lineitem.parquet", row_group_size=3)

    r = fact_key_skew(str(tmp_path), k=3)
    got = r.to_pandas() if hasattr(r, "to_pandas") else r
    assert got.to_dict("list") == {
        "rank": [1, 2, 3], "l_orderkey": [7, 3, 9],
        "n_rows": [5, 3, 3]}


def test_k_anonymity_null_qid_and_boundary(ray_session):
    """k_anonymity: NULL lang/source form a real ('') class, the
    length bin splits at exactly bin_chars, and a class of exactly k
    is NOT at risk."""
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.textstats import k_anonymity

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(1, 9)), pa.int64()),
        "lang": pa.array(["en", "en", "en", "en", "en",
                          None, None, "de"], pa.string()),
        "source": pa.array(["s"] * 7 + ["s"], pa.string()),
        # five at bin 0 (class of exactly k=5, NOT at risk); the two
        # NULL-lang rows split bins 0/1 at the 256 boundary (two
        # singleton risk classes); 'de' singleton risk class.
        "n_chars": pa.array([10, 20, 30, 40, 255, 255, 256, 10],
                            pa.int64()),
    }))
    got = k_anonymity(docs, k=5).to_pandas()
    assert got.to_dict("list") == {
        "n_records": [8], "n_groups": [4], "n_risk_groups": [3],
        "n_risk_records": [3], "max_group": [5]}


def test_new_vs_returning_first_week_law(ray_session, tmp_path):
    """new_vs_returning: a user is NEW only in their first active week
    (multiple events that week count once) and RETURNING in every
    later active week; inactive weeks emit no row."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_matching_ray.pipelines.analytics import new_vs_returning

    wk = 7 * 86_400_000_000
    ts = lambda w, n=0: np.datetime64(int(w * wk + n), "us")
    rows = [(1, ts(100)), (1, ts(100, 9)), (1, ts(102)),
            (2, ts(100)), (3, ts(102))]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }), tmp_path / "events.parquet", row_group_size=2)

    got = new_vs_returning(str(tmp_path)).to_pandas() \
        .sort_values("week").reset_index(drop=True)
    assert got.to_dict("list") == {
        "week": [100, 102], "new_users": [2, 1],
        "returning_users": [0, 1]}


def test_dedup_impact_scalars(ray_session, tmp_path):
    """dedup_impact: the keeper is the cluster's MIN id, token counts
    are raw \\S+ runs (NULL text = 0 tokens but the doc counts), and
    the bp rates floor."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as ent

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        # docs 1,2 identical (3 tokens each) -> one cluster, keep 1;
        # doc 3 unique (2 tokens); doc 4 NULL text (0 tokens, kept).
        "text": pa.array(["a b c", "a b c", "x  y", None], pa.string()),
    }), tmp_path / "documents.parquet")

    got = ent._dedup_impact(str(tmp_path)).to_pandas()
    assert got.to_dict("list") == {
        "n_docs": [4], "n_docs_kept": [3],
        "n_tokens": [8], "n_tokens_kept": [5],
        "doc_drop_bp": [1 * 10000 // 4],
        "token_drop_bp": [3 * 10000 // 8]}
