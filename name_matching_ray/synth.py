"""Deterministic synthetic interleaved-documents table (FIXTURES.md F1).

The graft's ingest schema (BASELINE.json ``input_hint``) is a Lance table of
interleaved text+media documents; Lance is unavailable in the sandbox, so we
synthesize the identical schema as parquet (SURVEY.md §7.4 risk 7).

Generation is seed-deterministic **per doc_id** (a hash-derived RNG per row),
so the same (n_docs, seed) produces the same table regardless of how the
generation is partitioned across Ray tasks.

Entity ground truth: doc_id is ``d{entity:08d}x{variant}`` — variants of one
entity are surface forms of the same company name (suffix swaps, abbreviation
expansion/contraction, punctuation noise, small typos) mirroring the CRSP
base table's one-permno-many-names structure (stocknames.csv:2-4).  Tests
use the prefix as cluster ground truth; the engine itself never looks at it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .schema import DOCS_SCHEMA

_ADJ = [
    "acme", "global", "united", "advanced", "pacific", "northern", "golden",
    "summit", "pioneer", "liberty", "crown", "sterling", "atlas", "apex",
    "beacon", "cascade", "delta", "evergreen", "frontier", "granite",
    "horizon", "keystone", "meridian", "olympic", "paramount", "quantum",
    "regal", "signal", "titan", "vanguard",
]
_NOUN = [
    "steel", "micro", "data", "energy", "textile", "motor", "chemical",
    "foods", "mining", "media", "telecom", "marine", "timber", "plastics",
    "optical", "electric", "aero", "biotech", "cement", "glass", "paper",
    "rubber", "solar", "grain", "copper", "nickel", "carbide", "circuit",
    "engine", "tractor",
]
_TAIL = [
    "industries", "systems", "holdings", "technologies", "laboratories",
    "resources", "networks", "products", "services", "solutions",
    "international", "manufacturing", "partners", "dynamics", "works",
]
_SUFFIX = ["INC", "CORP", "CO", "LTD", "LLC", "CORPORATION", "COMPANY", "INCORPORATED"]

# Distinctive pseudo proper-noun leads (syllable products, 22*23=506 words):
# the reference's cascade treats a shared distinctive first word as strong
# entity evidence (rule 4, matcher.py:295-300), which is true of REAL company
# names — so the generator must give entities mostly-unique lead words, or
# the cascade (faithfully!) merges thousands of same-prefix entities.
_ONSET = ["zor", "quen", "tal", "vir", "mek", "lor", "san", "bel", "dur",
          "fen", "gar", "hax", "jol", "kam", "nor", "pel", "rud", "tev",
          "wim", "yar", "cob", "maz"]
_CODA = ["van", "tar", "dex", "lin", "mor", "bek", "sol", "tis", "run",
         "fal", "gon", "her", "ix", "jat", "kul", "lum", "nar", "pos",
         "quil", "rem", "sut", "tam", "vex"]
_LEAD = [a + b for a in _ONSET for b in _CODA]
_ABBREV = {
    "industries": "INDS", "international": "INTL", "technologies": "TECH",
    "laboratories": "LABS", "manufacturing": "MFG", "systems": "SYS",
    "services": "SVCS", "products": "PROD", "resources": "RES",
}
_MEDIA_KINDS = ["image", "audio"]


def _entity_name(rng: np.random.Generator) -> str:
    # two distinct pseudo lead words: 506*505 ≈ 255k 2-token prefixes, so
    # prefixes are mostly entity-unique — mirroring real company-name
    # distinctiveness.  The cascade's rule 4 (matcher.py:295-300) treats a
    # shared distinctive 2-word prefix as entity identity, so a generator
    # with colliding prefixes makes the (faithful) cascade merge distinct
    # synthetic entities.  noun/tail stay real words to keep the
    # eng-dictionary rules exercised.
    l1 = int(rng.integers(len(_LEAD)))
    l2 = int(rng.integers(len(_LEAD) - 1))
    if l2 >= l1:
        l2 += 1
    parts = [
        _LEAD[l1],
        _LEAD[l2],
        _NOUN[rng.integers(len(_NOUN))],
        _TAIL[rng.integers(len(_TAIL))],
    ]
    return " ".join(parts)


def _variant(base: str, v: int, rng: np.random.Generator) -> str:
    """Surface form #v of an entity's canonical name."""
    words = base.split()
    suffix = _SUFFIX[rng.integers(len(_SUFFIX))]
    if v == 0:
        return f"{base} {suffix}".upper()
    if v == 1:  # abbreviate the tail word when possible (CRSP style)
        tail = words[-1]
        words2 = words[:-1] + [_ABBREV.get(tail, tail)]
        return (" ".join(words2) + " " + suffix).upper()
    if v == 2:  # mixed case + punctuation noise
        return " ".join(w.capitalize() for w in words) + f", {suffix.capitalize()}."
    if v == 3:  # small typo: double a letter mid-word (survives the cascade)
        w = list(words[0])
        if len(w) > 4:
            i = int(rng.integers(2, len(w) - 1))
            w.insert(i, w[i])
        return ("".join(w) + " " + " ".join(words[1:]) + " " + suffix).upper()
    # v >= 4: drop the middle word (still shares first/last tokens)
    words2 = [words[0], words[-1]]
    return (" ".join(words2) + " " + suffix).upper()


def _doc_rng(seed: int, doc_index: int) -> np.random.Generator:
    h = hashlib.blake2b(f"{seed}:{doc_index}".encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(h, "big"))


def generate_docs_batch(doc_indices: np.ndarray, seed: int = 42,
                        variants_per_entity: int = 4) -> pa.Table:
    """Build one Arrow batch of interleaved docs for the given row indices."""
    doc_ids, spans_col = [], []
    for idx in doc_indices:
        idx = int(idx)
        entity = idx // variants_per_entity
        variant = idx % variants_per_entity
        ent_rng = _doc_rng(seed, entity * 1_000_003)  # entity-stable
        base = _entity_name(ent_rng)
        rng = _doc_rng(seed, idx)
        name = _variant(base, variant, rng)
        doc_id = f"d{entity:08d}x{variant}"

        n_spans = int(rng.integers(1, 6))
        text_pos = int(rng.integers(0, n_spans))
        spans = []
        offset = 0
        for s in range(n_spans):
            if s == text_pos:
                spans.append(
                    {"kind": "text", "text": name, "media_ref": "", "offset": offset}
                )
                offset += len(name)
            else:
                kind = _MEDIA_KINDS[int(rng.integers(len(_MEDIA_KINDS)))]
                ref = f"media://{kind}/{doc_id}/{s}"
                spans.append(
                    {"kind": kind, "text": "", "media_ref": ref, "offset": offset}
                )
                offset += 1
        doc_ids.append(doc_id)
        spans_col.append(spans)
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA
    )


def synth_docs_dataset(n_docs: int, seed: int = 42, variants_per_entity: int = 4):
    """Distributed deterministic generation as a Ray Dataset (streamed)."""
    import ray.data

    ds = ray.data.range(n_docs)

    def gen(batch):
        return generate_docs_batch(batch["id"], seed, variants_per_entity)

    return ds.map_batches(gen, batch_format="numpy", batch_size=None)


def write_synth_docs(path: str, n_docs: int, seed: int = 42,
                     variants_per_entity: int = 4) -> str:
    synth_docs_dataset(n_docs, seed, variants_per_entity).write_parquet(path)
    return path


def synth_name_pairs(n_entities: int, seed: int = 42) -> pa.Table:
    """Deterministic pre-paired raw names (the match_pair.py input shape).

    Two rows per entity: a POSITIVE pair (two surface variants of the same
    planted entity — same rng derivation as ``generate_docs_batch``, doc
    index = entity*4 + variant) and a NEGATIVE pair (a variant of the next
    entity, whose lead words are almost surely distinct).  Gives the
    pre-paired scoring path a non-vacuous expected-match set.
    """
    a_out, b_out = [], []
    for e in range(n_entities):
        base = _entity_name(_doc_rng(seed, e * 1_000_003))
        v_pos = 1 + (e % 3)
        a = _variant(base, 0, _doc_rng(seed, e * 4))
        b = _variant(base, v_pos, _doc_rng(seed, e * 4 + v_pos))
        a_out.append(a)
        b_out.append(b)
        e2 = (e + 1) % n_entities
        base2 = _entity_name(_doc_rng(seed, e2 * 1_000_003))
        a_out.append(a)
        b_out.append(_variant(base2, 0, _doc_rng(seed, e2 * 4)))
    return pa.table({
        "name_a": pa.array(a_out, pa.string()),
        "name_b": pa.array(b_out, pa.string()),
    })


def synth_coname_tables(n_entities: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Deterministic (main, base) tables for the legacy coname matcher.

    base: one (gvkey, name) row per entity — the variant-0 surface form —
    plus every 7th entity REPEATED under the same gvkey with a different
    surface form: duplicate-gvkey rows drive the reference's corpus-stats
    char-iteration branch (coname.py:227-230), which the parity suite keeps
    bit-for-bit.  main: one planted-match row per entity (variant 1+e%3)
    and, for every 3rd entity, an extra row borrowing the NEXT entity's
    variant-2 form (mostly non-matching noise).  ``row_order`` carries the
    file order the duplicate-gvkey semantics depend on.
    """
    b_gv, b_nm = [], []
    m_ix, m_nm = [], []
    for e in range(n_entities):
        base = _entity_name(_doc_rng(seed, e * 1_000_003))
        gv = f"g{e:06d}"
        b_gv.append(gv)
        b_nm.append(_variant(base, 0, _doc_rng(seed, e * 4)))
        if e % 7 == 0:
            b_gv.append(gv)
            b_nm.append(_variant(base, 2, _doc_rng(seed, e * 4 + 2)))
        v = 1 + (e % 3)
        m_ix.append(len(m_ix))
        m_nm.append(_variant(base, v, _doc_rng(seed, e * 4 + v)))
        if e % 3 == 0:
            e2 = (e + 1) % n_entities
            base2 = _entity_name(_doc_rng(seed, e2 * 1_000_003))
            m_ix.append(len(m_ix))
            m_nm.append(_variant(base2, 2, _doc_rng(seed, e2 * 4 + 2)))
    main = pa.table({
        "index": pa.array(m_ix, pa.int64()),
        "name": pa.array(m_nm, pa.string()),
    })
    base = pa.table({
        "gvkey": pa.array(b_gv, pa.string()),
        "name": pa.array(b_nm, pa.string()),
        "row_order": pa.array(range(len(b_gv)), pa.int64()),
    })
    return main, base
