"""Multimodal span processing — decode / feature-extract / frame-sample as
actor-pool ``map_batches`` stages over opaque ``binary``/``media_ref`` spans.

The interleaved-docs schema (BASELINE.json input_hint) carries media as
``spans.kind in ("image","audio",...)`` with a ``media_ref`` URI.  The
compressed-codec libraries (PIL/ffmpeg) are NOT in this container, so real
decode support is limited to the UNCOMPRESSED formats implemented here in
pure numpy: binary PPM/PGM images and PCM WAV audio
(:func:`decode_ppm` / :func:`decode_wav`).  ``MediaDecoder(fake=False)``
reads the ``media_ref`` (``file://`` or plain path) and decodes those for
real; compressed formats and video raise ``NotImplementedError``.
``fake=True`` (the synth-corpus default) produces a *deterministic*
hash-seeded pseudo-decode — the Ray-side plumbing (schema, actor pool,
batch sizing, output layout) is identical either way and tested on both.

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


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, RGB) / PGM (P5, gray) -> float32 grayscale (H, W)
    in [0, 1].  Pure numpy — no codec library.  Header grammar per the
    netpbm spec: magic, then width/height/maxval as whitespace-separated
    ASCII ints with ``#`` comments allowed between tokens, one whitespace
    byte, then the raw raster (1 or 2 bytes/sample by maxval)."""
    if data[:2] not in (b"P5", b"P6"):
        raise NotImplementedError(
            f"unsupported image magic {data[:2]!r}: only binary PPM (P6) "
            "and PGM (P5) decode without codec libraries")
    rgb = data[:2] == b"P6"
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = tokens
    wide = maxval > 255
    dtype = np.dtype(">u2") if wide else np.uint8
    n = w * h * (3 if rgb else 1)
    raster = np.frombuffer(data, dtype=dtype, count=n, offset=pos)
    img = raster.astype(np.float32) / np.float32(maxval)
    if rgb:
        # ITU-R BT.601 luma — the fixed gray law both tests and any
        # SQL-side re-derivation can reproduce exactly
        img = img.reshape(h, w, 3) @ np.array([0.299, 0.587, 0.114],
                                              np.float32)
    else:
        img = img.reshape(h, w)
    return img


def decode_wav(data: bytes) -> np.ndarray:
    """PCM WAV (8/16-bit, any channel count) -> float32 mono samples in
    [-1, 1].  Pure numpy RIFF walk — no codec library.  Non-PCM encodings
    (format tag != 1) raise."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    tag = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if tag != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only 8/16-bit PCM WAV decodes without codec libraries "
            f"(format tag {tag}, {bits}-bit)")
    if bits == 16:
        s = np.frombuffer(raw, dtype="<i2",
                          count=len(raw) // 2).astype(np.float32) / 32768.0
    else:
        s = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    if n_ch > 1:
        s = s[:len(s) - len(s) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return s


def _resize_nearest(img: np.ndarray, size: int) -> np.ndarray:
    """Nearest-neighbor resize to (size, size) — index sampling only."""
    h, w = img.shape
    yi = np.minimum((np.arange(size) * h) // size, h - 1)
    xi = np.minimum((np.arange(size) * w) // size, w - 1)
    return img[np.ix_(yi, xi)]


class MediaDecoder:
    """Actor-pool stage: decode + resize + frame-sample + feature-extract.

    ``fake=True`` → deterministic hash-seeded pseudo-decode (testable without
    codec libraries).  ``fake=False`` → REAL decode of the uncompressed
    formats (binary PPM/PGM images, PCM WAV audio) read from the
    ``media_ref`` path; compressed formats and video raise
    ``NotImplementedError`` (codec libs are not in this environment).
    """

    def __init__(self, fake: bool = True, target_size: int = 64,
                 frames_per_video: int = 4):
        self.fake = fake
        self.target_size = target_size
        self.frames_per_video = frames_per_video
        # model-load stand-in: done ONCE per actor, never per batch
        self.projection = np.linspace(0.0, 1.0, 8, dtype=np.float32)

    def _decode_real(self, kind: str,
                     ref: str) -> tuple[int, int, int, np.ndarray]:
        if kind not in ("image", "audio"):
            raise NotImplementedError(
                f"real decode for kind={kind!r} requires codec libraries "
                "(PIL/ffmpeg) that are not in this environment; supported "
                "real kinds: image (PPM/PGM), audio (PCM WAV)")
        path = ref[7:] if ref.startswith("file://") else ref
        with open(path, "rb") as f:
            data = f.read()
        if kind == "image":
            img = decode_ppm(data)
            h, w = img.shape
            small = _resize_nearest(img, self.target_size)
            # 8-dim feature = mean gray of 8 horizontal strips of the
            # resized image (fixed, reproducible law)
            feat = np.array([s.mean() for s in np.array_split(small, 8)],
                            np.float32)
            return w, h, 1, feat
        if kind == "audio":
            s = decode_wav(data)
            n = len(s) - len(s) % 8
            if n:
                seg = s[:n].reshape(8, -1)
                feat = np.sqrt((seg * seg).mean(axis=1)).astype(np.float32)
            else:
                feat = np.zeros(8, np.float32)
            # 8-dim feature = RMS energy of 8 equal time segments
            return -1, -1, 1, feat
        raise AssertionError("unreachable: kind gate above")

    def _decode(self, kind: str, ref: str) -> tuple[int, int, int, np.ndarray]:
        if not self.fake:
            return self._decode_real(kind, ref)
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
