"""End-to-end pipeline tests on the synthetic interleaved docs table
(SURVEY.md §5d/e: span-sequence invariant, resume, clustering quality).
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from name_matching_ray.synth import generate_docs_batch, synth_docs_dataset

N_DOCS = 400  # 100 entities × 4 variants


@pytest.fixture(scope="module")
def docs_path(tmp_path_factory, ray_session):
    import numpy as np

    path = tmp_path_factory.mktemp("docs") / "docs.parquet"
    table = generate_docs_batch(np.arange(N_DOCS), seed=42)
    pq.write_table(table, path)
    return str(path)


def test_synth_deterministic_and_schema(ray_session):
    import numpy as np

    t1 = generate_docs_batch(np.arange(50), seed=42)
    t2 = generate_docs_batch(np.arange(50), seed=42)
    assert t1.equals(t2)
    t3 = generate_docs_batch(np.arange(50), seed=43)
    assert not t1.equals(t3)
    # partition-independence: distributed generation == driver generation
    ds = synth_docs_dataset(50, seed=42)
    t4 = pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).sort_by("doc_id")
    assert t4.equals(t1.sort_by("doc_id"))


def test_extract_preserves_span_sequence(docs_path, ray_session):
    """Per-row invariant: spans column carried verbatim (kind/text/media_ref/order)."""
    import ray.data

    from name_matching_ray.stages.extract import extract_names

    docs = ray.data.read_parquet(docs_path)
    names = extract_names(docs)
    out = pa.concat_tables(names.iter_batches(batch_format="pyarrow"))
    src = pq.read_table(docs_path)
    src_spans = {d: s for d, s in zip(src.column("doc_id").to_pylist(),
                                      src.column("spans").to_pylist())}
    out_ids = out.column("doc_id").to_pylist()
    assert len(out_ids) == len(set(out_ids)) == src.num_rows  # every doc has a text span
    for doc_id, spans, name in zip(out_ids, out.column("spans").to_pylist(),
                                   out.column("name").to_pylist()):
        assert spans == src_spans[doc_id]  # exact kind/text/media_ref/offset/order
        assert any(s["kind"] == "text" and s["text"] == name for s in spans)


def test_self_link_recovers_entities(docs_path, ray_session):
    """Flagship flow: clusters must group variants of the same entity."""
    import ray.data

    from name_matching_ray.pipelines.linkage import self_link_docs

    docs = ray.data.read_parquet(docs_path)
    names, pairs, clusters = self_link_docs(docs, cap=100, concurrency=(1, 2))
    cl = clusters.to_pandas()
    assert len(cl) == N_DOCS
    cl["entity"] = cl["doc_id"].str.split("x").str[0]
    # B-cubed style purity/completeness vs ground-truth entity
    by_cluster = cl.groupby("cluster_id")["entity"].agg(["nunique", "size"])
    purity = (by_cluster["nunique"] == 1).mean()
    by_entity = cl.groupby("entity")["cluster_id"].nunique()
    completeness = (by_entity == 1).mean()
    # variants are designed to co-block and match; allow a small tail
    assert purity >= 0.95, purity
    assert completeness >= 0.80, completeness


def test_pair_scoring_planted_variants(ray_session):
    """Pre-paired scoring must accept most same-entity variant pairs and
    reject cross-entity pairs (non-vacuous expected-match set)."""
    import ray.data

    from name_matching_ray.pipelines.linkage import score_prepaired
    from name_matching_ray.synth import synth_name_pairs

    t = synth_name_pairs(60)
    positives = {(t.column("name_a")[2 * i].as_py(),
                  t.column("name_b")[2 * i].as_py()) for i in range(60)}
    negatives = {(t.column("name_a")[2 * i + 1].as_py(),
                  t.column("name_b")[2 * i + 1].as_py()) for i in range(60)}
    got = score_prepaired(ray.data.from_arrow(t), concurrency=(1, 2)).to_pandas()
    matched = set(zip(got.name_a, got.name_b))
    assert (got.rule_code > 0).all()
    recall = len(matched & positives) / len(positives)
    false_pos = len(matched & negatives)
    assert recall >= 0.8, recall
    assert false_pos <= 3, matched & negatives


def test_checkpoint_resume(docs_path, tmp_path, ray_session):
    """Kill-and-rerun: completed waves are skipped; outputs identical."""
    import ray.data

    from name_matching_ray.pipelines.linkage import run_linkage_checkpointed
    from name_matching_ray.state.checkpoint import Manifest

    out1 = str(tmp_path / "run1")
    m1 = run_linkage_checkpointed(docs_path, out1, n_waves=4, cap=100,
                                  concurrency=(1, 2))
    assert "clusters" in m1 and m1["names"]["rows"] > 0

    # simulate a crash after two waves: pre-seed a fresh dir with partial state
    out2 = str(tmp_path / "run2")
    m2 = Manifest(out2)
    import shutil

    shutil.copytree(f"{out1}/names", f"{out2}/names")
    man1 = Manifest(out1)
    m2.mark_complete("names", lineage={"input": docs_path},
                     metrics=man1.data["partitions"]["names"]["metrics"])
    for w in (0, 1):
        shutil.copytree(f"{out1}/pairs/wave-{w}", f"{out2}/pairs/wave-{w}")
        e = man1.data["partitions"][f"pairs/wave-{w}"]
        m2.mark_complete(f"pairs/wave-{w}", e["lineage"], e["metrics"])

    res = run_linkage_checkpointed(docs_path, out2, n_waves=4, cap=100,
                                   concurrency=(1, 2))
    assert "clusters" in res
    # pair sets are byte-identical across the resumed run
    p1 = ray.data.read_parquet(f"{out1}/pairs").to_pandas()
    p2 = ray.data.read_parquet(f"{out2}/pairs").to_pandas()
    key = ["left_doc_id", "right_doc_id"]
    assert p1.sort_values(key).reset_index(drop=True).equals(
        p2.sort_values(key).reset_index(drop=True)
    )


def test_job_entrypoint_runs_and_resumes(docs_path, tmp_path, ray_session,
                                         capsys):
    """`python -m name_matching_ray.job` semantics: one summary JSON line;
    a re-submit of the identical command is a no-op resume (all stages
    skipped) with the same tallies; the wrapper never tears down a Ray
    session it does not own."""
    import json

    import ray

    from name_matching_ray.job import main

    out = str(tmp_path / "jobrun")
    argv = ["--docs", docs_path, "--out", out, "--waves", "2", "--cap", "100"]
    assert main(argv) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ray.is_initialized()  # pytest owns the session; job must not stop it
    assert "clusters" in s1["stages_complete"]
    assert s1["pairs_scored"] > 0

    assert main(argv) == 0  # resume: everything already complete
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2 == s1
