"""Multimodal span processing — decode / feature-extract / frame-sample as
actor-pool ``map_batches`` stages over opaque ``binary``/``media_ref`` spans.

The interleaved-docs schema (BASELINE.json input_hint) carries media as
``spans.kind in ("image","audio",...)`` with a ``media_ref`` URI.  The image/
audio codec libraries are NOT in this container, so the actual byte decode is
STUBBED: :class:`MediaDecoder` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a *deterministic* fake decode
(hash-seeded features) — the Ray-side plumbing (schema, actor pool, batch
sizing, output layout) is real and tested either way.

Scale notes: media batches are large-payload — keep ``batch_size`` small
(default 64) and let per-actor state hold the (stubbed) model.  Output rows
are one per media span, keyed (doc_id, span_idx) so downstream joins can
re-interleave with the text path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_FEATURES_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("span_idx", pa.int32()),
    ("kind", pa.string()),
    ("media_ref", pa.string()),
    ("width", pa.int32()),          # -1 for non-image kinds
    ("height", pa.int32()),
    ("n_frames", pa.int32()),       # sampled frames (video) / 1 (image)
    ("feature", pa.list_(pa.float32(), 8)),  # embedding stub
])


def explode_media_spans(batch: pa.Table) -> pa.Table:
    """docs(doc_id, spans) -> one row per non-text span (vectorized)."""
    import pyarrow.compute as pc

    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    parents = pc.list_parent_indices(spans)
    # span_idx = position within the parent list
    offsets = np.asarray(spans.offsets)
    pidx = parents.to_numpy(zero_copy_only=False)
    span_idx = np.arange(len(flat)) - offsets[pidx]
    not_text = pc.invert(pc.equal(flat.field("kind"), pa.scalar("text")))
    sel = not_text.to_numpy(zero_copy_only=False)
    doc_ids = batch.column("doc_id").take(pa.array(pidx[sel]))
    return pa.table({
        "doc_id": doc_ids,
        "span_idx": pa.array(span_idx[sel].astype(np.int32), pa.int32()),
        "kind": pc.filter(flat.field("kind"), not_text),
        "media_ref": pc.filter(flat.field("media_ref"), not_text),
    })


class MediaDecoder:
    """Actor-pool stage: decode + resize + frame-sample + feature-extract.

    ``fake=True`` → deterministic hash-seeded pseudo-decode (testable without
    codec libraries).  ``fake=False`` → NotImplementedError at decode time
    (codec libs are not installed in this environment).
    """

    def __init__(self, fake: bool = True, target_size: int = 64,
                 frames_per_video: int = 4):
        self.fake = fake
        self.target_size = target_size
        self.frames_per_video = frames_per_video
        # model-load stand-in: done ONCE per actor, never per batch
        self.projection = np.linspace(0.0, 1.0, 8, dtype=np.float32)

    def _decode(self, kind: str, ref: str) -> tuple[int, int, int, np.ndarray]:
        if not self.fake:
            raise NotImplementedError(
                "real media decode requires codec libraries (PIL/ffmpeg) "
                "that are not available in this environment; pass fake=True"
            )
        h = hashlib.blake2b(f"{kind}:{ref}".encode(), digest_size=16).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
        if kind == "image":
            w = hgt = self.target_size
            frames = 1
        elif kind == "video":
            w = hgt = self.target_size
            frames = self.frames_per_video
        else:  # audio & friends: no spatial dims
            w = hgt = -1
            frames = 1
        feat = rng.standard_normal(8).astype(np.float32) * self.projection
        return w, hgt, frames, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        w_l, h_l, f_l, feats = [], [], [], []
        for k, r in zip(kinds, refs):
            w, h, f, feat = self._decode(k, r)
            w_l.append(w)
            h_l.append(h)
            f_l.append(f)
            feats.append(feat)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "span_idx": batch.column("span_idx"),
            "kind": batch.column("kind"),
            "media_ref": batch.column("media_ref"),
            "width": pa.array(w_l, pa.int32()),
            "height": pa.array(h_l, pa.int32()),
            "n_frames": pa.array(f_l, pa.int32()),
            "feature": pa.array(feats, pa.list_(pa.float32(), 8)),
        })


def media_features(docs_ds, *, fake: bool = True, batch_size: int = 64,
                   concurrency=(1, 8)):
    """docs -> per-media-span features (actor pool, small batches)."""
    media = docs_ds.map_batches(explode_media_spans, batch_format="pyarrow")
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
