"""Curation operators: deterministic stratified sampling + decontamination."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _md5_low64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def test_stratified_sample_deterministic_and_rates(ray_session):
    import ray.data

    from name_matching_ray.stages.curation import stratified_sample

    n = 4000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": ["keepmost" if i % 2 else "keepfew" for i in range(n)],
    })
    rates = {"keepmost": 9000, "keepfew": 1000}
    ds = ray.data.from_pandas(df)
    got1 = stratified_sample(ds, rates).to_pandas()
    got2 = stratified_sample(ds, rates).to_pandas()  # rerun: identical set
    assert set(got1["doc_id"]) == set(got2["doc_id"])

    # exact membership law, row by row
    want = {int(i) for i, s in zip(df["doc_id"], df["source"])
            if _md5_low64(str(i)) % 10000 < rates[s]}
    assert set(got1["doc_id"]) == want
    # rates land near their targets
    kept = got1.groupby("source").size()
    assert 0.8 < kept["keepmost"] / 2000 < 1.0
    assert 0.03 < kept["keepfew"] / 2000 < 0.2
    # unknown stratum drops by default
    df2 = df.assign(source="unknown")
    assert len(stratified_sample(ray.data.from_pandas(df2),
                                 rates).to_pandas()) == 0


def test_decontaminate_drops_probe_docs(ray_session):
    import ray.data

    from name_matching_ray.stages.curation import (
        build_probe_ngrams,
        decontaminate,
    )

    words = [f"w{i}" for i in range(30)]
    bench_text = " ".join(words[:12])           # the "benchmark" doc
    leaked = " ".join(["x y z"] + words[2:11])  # contains an 8-gram of it
    clean = " ".join(reversed(words))           # same words, no shared 8-gram
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([bench_text, leaked, clean], pa.string()),
    })
    probe = pa.table({"text": pa.array([bench_text], pa.string())})
    ngrams = build_probe_ngrams(ray.data.from_arrow(probe), n=8)
    out = decontaminate(ray.data.from_arrow(docs), ngrams, n=8) \
        .to_pandas().set_index("doc_id")
    assert out.loc[1, "keep"] == 0          # benchmark doc itself flagged
    assert out.loc[1, "n_hits"] == 5        # 12 tokens -> 5 distinct 8-grams
    assert out.loc[2, "keep"] == 0 and out.loc[2, "n_hits"] >= 1
    assert out.loc[3, "keep"] == 1 and out.loc[3, "n_hits"] == 0


def test_redact_pii_counts_and_order(ray_session):
    import ray.data

    from name_matching_ray.stages.curation import redact_pii

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            # email is rewritten FIRST, so its digits never feed the
            # phone pattern; the phone and ip coexist in one doc
            "mail a.b+x@ex-ample.co.uk or call +1 (212) 555-0199",
            "server 10.1.2.3 and 192.168.0.255 talked",
            "no pii at all",
            "edge a@b.c is not an email (single-letter tld)",
        ], pa.string()),
    })
    out = redact_pii(ray.data.from_arrow(docs)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "n_email"] == 1 and out.loc[1, "n_phone"] == 1
    assert out.loc[2, "n_ip"] == 2 and out.loc[2, "n_email"] == 0
    assert out.loc[3, ["n_email", "n_phone", "n_ip"]].sum() == 0
    assert out.loc[4, "n_email"] == 0
    # clean_len reflects the redacted text, not the original
    assert out.loc[1, "clean_len"] == len("mail <EMAIL> or call <PHONE>")
    assert out.loc[3, "clean_len"] == len("no pii at all")


def _pack_reference(ids, toks, cap, shard_size):
    """Independent scalar re-implementation of greedy per-shard packing."""
    rows = sorted(zip(ids, toks))
    out = {}
    prev_shard, b, f = None, 0, 0
    for i, t in rows:
        s = i // shard_size
        if s != prev_shard:
            prev_shard, b, f = s, 0, t
        elif f + t <= cap:
            f += t
        else:
            b, f = b + 1, t
        out[i] = (s, b, f)
    return out


def test_pack_sequences_matches_reference_and_handles_oversize(ray_session):
    import ray.data

    from name_matching_ray.stages.curation import pack_sequences

    rng = np.random.default_rng(7)
    n, cap, shard_size = 500, 100, 64
    ids = np.arange(n, dtype=np.int64)
    toks = rng.integers(1, 140, n)  # some docs EXCEED cap -> own bin
    texts = [" ".join(["w"] * t) for t in toks]
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts})) \
        .repartition(7)  # shards span input blocks
    got = pack_sequences(ds, cap=cap, shard_size=shard_size).to_pandas()
    want = _pack_reference(ids, toks, cap, shard_size)
    assert len(got) == n
    for r in got.itertuples(index=False):
        assert want[r.doc_id] == (r.shard, r.bin, r.fill), r
    # no bin below an oversize doc ever exceeds cap unless it IS one doc
    g = got.sort_values("doc_id").groupby(["shard", "bin"])
    for (_, _), grp in g:
        if len(grp) > 1:
            assert grp["fill"].iloc[-1] <= cap


def test_shuffle_shards_deterministic_permutation(ray_session):
    import ray.data

    from name_matching_ray.stages.curation import shuffle_shards

    n = 300
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64)})).repartition(5)
    got = shuffle_shards(ds, n_shards=8).to_pandas()
    assert len(got) == n and got.doc_id.is_unique
    # exact law: shard = md5_low64 % 8, pos = rank by (h, id) within shard
    h = {i: _md5_low64(str(i)) for i in range(n)}
    for s, grp in got.groupby("shard"):
        ids = sorted(grp.doc_id, key=lambda i: (h[i], i))
        want = {i: p for p, i in enumerate(ids)}
        assert all(h[i] % 8 == s for i in grp.doc_id)
        assert all(want[r.doc_id] == r.pos for r in grp.itertuples())
    # partitioning-independent
    again = shuffle_shards(ds.repartition(2), n_shards=8).to_pandas()
    assert got.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True))


def test_export_shards_resume_skips_done(ray_session, tmp_path):
    import json

    import pyarrow.dataset as pads
    import ray.data

    from name_matching_ray.stages.curation import export_shards, shuffle_shards

    n = 200
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64)}))

    # full export: manifest counts == on-disk counts == shuffle law
    out1 = str(tmp_path / "full")
    man = export_shards(ds, out1, n_shards=4)
    disk = pads.dataset(out1, partitioning="hive").to_table().to_pandas()
    assert sum(man.values()) == n == len(disk)
    want = shuffle_shards(ds, n_shards=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = disk[["doc_id", "shard", "pos"]].astype("int64") \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)

    # resume: pre-claim shard 2 in the manifest -> it is NOT rewritten
    out2 = str(tmp_path / "resumed")
    import os
    os.makedirs(out2)
    with open(os.path.join(out2, "_manifest.json"), "w") as f:
        json.dump({"2": 999}, f)
    man2 = export_shards(ds, out2, n_shards=4)
    assert man2["2"] == 999  # untouched claim
    disk2 = pads.dataset(out2, partitioning="hive").to_table().to_pandas()
    assert set(disk2["shard"].unique()) == {0, 1, 3}
    # the shards it DID write are identical to the single-shot run
    a = disk[disk.shard != 2].astype({"shard": "int64"}) \
        .sort_values("doc_id").reset_index(drop=True)
    b = disk2.astype({"shard": "int64"}).sort_values("doc_id") \
        .reset_index(drop=True)
    assert a[["doc_id", "shard", "pos"]].equals(b[["doc_id", "shard", "pos"]])


def test_redact_pii_re2_parity_with_duckdb():
    """The operator's oracle-exactness rests on pyarrow and DuckDB sharing
    RE2 semantics for count + replace. Differential-check the actual
    kernels (no Ray needed) on adversarial strings: overlaps, adjacency,
    unicode, pattern-order interactions."""
    import duckdb
    import pyarrow.compute as pc

    from name_matching_ray.stages.curation import PII_PATTERNS

    texts = [
        "a@b.co c@d.io e@f.museum",                 # adjacent emails
        "x@y.z +1 (123) 456-7890 10.0.0.1",         # one of each, tight
        "not.an.email@ @nope.com a..b@c.dd",        # partial lookalikes
        "1.2.3.4.5.6.7.8",                          # overlapping dotted runs
        "+12 (345) 678-9012+13 (456) 789-0123",     # phones back-to-back
        "naïve@exämple.com café 192.168.1.255",     # unicode neighbours
        "(555) 555-5555 and 55 (555) 555-5555",     # optional prefix forms
        "",                                          # empty
        "ip 999.999.999.999 pseudo 0.0.0.0",        # out-of-range but matches
        "user+tag@sub.domain.co.uk.",               # trailing dot
    ]
    con = duckdb.connect()
    arr = pa.array(texts, pa.string())
    for _, pat, repl in PII_PATTERNS:
        got_n = pc.count_substring_regex(arr, pat).to_pylist()
        got_r = pc.replace_substring_regex(arr, pattern=pat,
                                           replacement=repl).to_pylist()
        for t, n, r in zip(texts, got_n, got_r):
            o_n, o_r = con.execute(
                "select len(regexp_extract_all(?, ?)),"
                " regexp_replace(?, ?, ?, 'g')",
                [t, pat, t, pat, repl]).fetchone()
            assert n == o_n, (pat, t, n, o_n)
            assert r == o_r, (pat, t, r, o_r)


def test_cross_dedup_plans_agree_and_flag_planted_dups(ray_session):
    import ray.data

    from name_matching_ray.stages.curation import cross_dedup

    # ref corpus: 40 docs; main corpus: 200 docs of which every 5th copies a
    # ref text verbatim (the planted cross-corpus duplicates)
    ref = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [f"ref document number {i} body" for i in range(40)],
    })
    main = pd.DataFrame({
        "doc_id": np.arange(1000, 1200, dtype=np.int64),
        "text": [
            f"ref document number {i % 40} body" if i % 5 == 0
            else f"fresh document {i}"
            for i in range(200)
        ],
    })
    dm = ray.data.from_pandas(main)
    dr = ray.data.from_pandas(ref)

    got_b = cross_dedup(dm, dr, broadcast=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got_s = cross_dedup(dm, dr, broadcast=False).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_b, got_s)

    assert len(got_b) == 200  # every doc annotated, none dropped
    want_keep = {1000 + i: 0 if i % 5 == 0 else 1 for i in range(200)}
    assert dict(zip(got_b["doc_id"], got_b["keep"])) == want_keep


def test_cross_dedup_empty_ref_keeps_everything(ray_session):
    import ray.data

    from name_matching_ray.stages.curation import cross_dedup

    main = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                         "text": [f"t{i}" for i in range(10)]})
    empty = pd.DataFrame({"doc_id": np.empty(0, np.int64),
                          "text": pd.array([], dtype="string")})
    got = cross_dedup(ray.data.from_pandas(main),
                      ray.data.from_pandas(empty),
                      broadcast=True).to_pandas()
    assert sorted(got["doc_id"]) == list(range(10))
    assert (got["keep"] == 1).all()


def test_split_by_cluster_never_straddles_near_dups(ray_session):
    import ray.data

    from name_matching_ray.stages.curation import split_by_cluster

    # labeled table with multi-doc clusters: splits must agree per cluster
    cc = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "cluster_id": (np.arange(300, dtype=np.int64) // 3) * 3,
    })
    got = split_by_cluster(ray.data.from_pandas(cc), train_bp=7000) \
        .to_pandas()
    per_cluster = got.groupby("cluster_id")["is_train"].nunique()
    assert (per_cluster == 1).all()          # leakage-safe: one split/cluster
    # exact membership law, and a non-degenerate mix
    for _, r in got.iterrows():
        want = 1 if _md5_low64(str(r["cluster_id"])) % 10000 < 7000 else 0
        assert r["is_train"] == want
    assert 0 < got["is_train"].mean() < 1


def test_cross_dedup_null_text_and_string_ids(ray_session):
    import pyarrow as pa
    import ray.data

    from name_matching_ray.stages.curation import cross_dedup

    # NULL text follows SQL semantics: never joins (always kept, and a
    # null-text ref row matches nothing); '' is a real value and matches ''
    main = pa.table({
        "doc_id": pa.array(["a", "b", "c", "d"], pa.string()),
        "text": pa.array([None, "", "dup text", "fresh"], pa.string()),
    })
    ref = pa.table({
        "doc_id": pa.array(["r1", "r2", "r3"], pa.string()),
        "text": pa.array([None, "", "dup text"], pa.string()),
    })
    dm, dr = ray.data.from_arrow(main), ray.data.from_arrow(ref)
    want = {"a": 1, "b": 0, "c": 0, "d": 1}
    for bc in (True, False):
        got = cross_dedup(dm, dr, broadcast=bc, id_col="doc_id").to_pandas()
        assert dict(zip(got["doc_id"], got["keep"])) == want, bc


def test_bloom_cross_dedup_membership_and_false_positives(ray_session):
    """Bloom semantics: every true ref member is flagged keep=0 (no false
    negatives); with a deliberately tiny filter, some NON-members collide
    on all k bits — deterministic false positives, the Bloom trade-off;
    with a roomy filter the flags equal exact cross_dedup membership."""
    import pandas as pd
    import ray.data

    from name_matching_ray.stages.curation import bloom_cross_dedup, cross_dedup

    texts = [f"document body number {i}" for i in range(400)] + [None]
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(401), "text": texts})).repartition(5)
    ref = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(100), "text": [f"document body number {i}"
                                        for i in range(0, 200, 2)]}))

    roomy = bloom_cross_dedup(docs, ref, m_bits=1 << 18, k=4).to_pandas() \
        .set_index("doc_id")["keep"]
    exact = cross_dedup(docs, ref).to_pandas().set_index("doc_id")["keep"]
    # members: never kept (no false negatives), in both operators
    members = [i for i in range(0, 200, 2)]
    assert (roomy.loc[members] == 0).all()
    # a roomy filter has no false positives here: equal to the exact join
    pd.testing.assert_series_equal(roomy.sort_index(), exact.sort_index())
    assert roomy.loc[401 - 1] == 1  # null text is kept

    tiny = bloom_cross_dedup(docs, ref, m_bits=64, k=2).to_pandas() \
        .set_index("doc_id")["keep"]
    assert (tiny.loc[members] == 0).all()          # still no false negatives
    nonmembers = [i for i in range(201, 400)]
    assert (tiny.loc[nonmembers] == 0).any(), \
        "a 64-bit filter over 100 texts must produce false positives"
    # determinism: same filter, same flags
    again = bloom_cross_dedup(docs, ref, m_bits=64, k=2).to_pandas() \
        .set_index("doc_id")["keep"]
    pd.testing.assert_series_equal(tiny.sort_index(), again.sort_index())


def test_export_jsonl_roundtrip_and_resume(ray_session, tmp_path):
    """JSONL shards round-trip through the JSONL reader; a resumed export
    skips finished shards and reproduces identical bytes."""
    import json
    import os

    import ray.data

    from name_matching_ray.sources.docs_source import read_docs
    from name_matching_ray.stages.curation import export_jsonl

    docs = ray.data.from_items(
        [{"doc_id": i, "text": f"doc {i} body"} for i in range(40)])
    out = str(tmp_path / "exp")
    man1 = export_jsonl(docs, out, n_shards=4)
    assert sum(man1.values()) == 40 and len(man1) == 4
    # round-trip through the interchange reader
    back = read_docs(os.path.join(out, "shard-0.jsonl")).to_pandas()
    assert len(back) == man1["0"] and set(back.columns) == {"doc_id", "text"}
    # resume: drop one shard file + its manifest entry; re-run restores it
    byte0 = open(os.path.join(out, "shard-1.jsonl"), "rb").read()
    os.remove(os.path.join(out, "shard-1.jsonl"))
    man = json.load(open(os.path.join(out, "_manifest.json")))
    del man["1"]
    json.dump(man, open(os.path.join(out, "_manifest.json"), "w"))
    mtime3 = os.path.getmtime(os.path.join(out, "shard-3.jsonl"))
    man2 = export_jsonl(docs, out, n_shards=4)
    assert man2 == man1
    assert open(os.path.join(out, "shard-1.jsonl"), "rb").read() == byte0
    # finished shard untouched
    assert os.path.getmtime(os.path.join(out, "shard-3.jsonl")) == mtime3
