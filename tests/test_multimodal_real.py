"""Real (non-fake) media decode: pure-numpy PPM/PGM + PCM WAV through the
actor-pool stage.  The committed assets under tests/assets/ are genuine
files of those formats; expected values below are derived from their known
bytes, so a decoder-law drift fails loudly.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

ASSETS = os.path.join(os.path.dirname(__file__), "assets")
PPM = os.path.join(ASSETS, "sample.ppm")
PGM = os.path.join(ASSETS, "sample.pgm")
WAV = os.path.join(ASSETS, "sample.wav")


def test_decode_ppm_p6_with_comment():
    from name_matching_ray.stages.multimodal import decode_ppm

    img = decode_ppm(open(PPM, "rb").read())
    assert img.shape == (2, 4)
    # pixel (0,0) is RGB (0,10,20)*... raw bytes are i*10 row-major
    pix = (np.arange(2 * 4 * 3, dtype=np.float32) * 10).reshape(2, 4, 3) / 255
    luma = pix @ np.array([0.299, 0.587, 0.114], np.float32)
    assert np.allclose(img, luma, atol=1e-6)


def test_decode_pgm_p5():
    from name_matching_ray.stages.multimodal import decode_ppm

    img = decode_ppm(open(PGM, "rb").read())
    assert img.shape == (3, 3)
    exp = (np.arange(9, dtype=np.float32) * 25).reshape(3, 3) / 255
    assert np.allclose(img, exp)


def test_decode_wav_stereo_downmix():
    from name_matching_ray.stages.multimodal import decode_wav

    s = decode_wav(open(WAV, "rb").read())
    # left = ramp, right = -left -> mono mean is exactly 0
    assert s.shape == (32,)
    assert np.allclose(s, 0.0)


def test_decode_rejects_unknown_formats():
    from name_matching_ray.stages.multimodal import decode_ppm, decode_wav

    with pytest.raises(NotImplementedError):
        decode_ppm(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x03\x00mp3-ish")


def test_media_features_real_decode_through_actor_pool(ray_session):
    import ray.data

    from name_matching_ray.stages.multimodal import (MEDIA_FEATURES_SCHEMA,
                                                     media_features)

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string())])
    docs = pa.table({
        "doc_id": pa.array(["d1", "d2"], pa.string()),
        "spans": pa.array([
            [{"kind": "text", "text": "hello", "media_ref": None},
             {"kind": "image", "text": None, "media_ref": f"file://{PPM}"}],
            [{"kind": "audio", "text": None, "media_ref": WAV}],
        ], pa.list_(span_t)),
    })
    out = media_features(ray.data.from_arrow(docs), fake=False).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)

    assert len(out) == 2
    img, aud = out.iloc[0], out.iloc[1]
    # schema unchanged vs the fake path
    got = media_features(ray.data.from_arrow(docs), fake=False).schema()
    assert [f.name for f in MEDIA_FEATURES_SCHEMA] == got.names

    assert (img["kind"], img["width"], img["height"], img["n_frames"]) == \
        ("image", 4, 2, 1)
    # strip-mean law on the nearest-resized gray — recompute independently
    from name_matching_ray.stages.multimodal import (_resize_nearest,
                                                     decode_ppm)
    small = _resize_nearest(decode_ppm(open(PPM, "rb").read()), 64)
    exp = np.array([s.mean() for s in np.array_split(small, 8)], np.float32)
    assert np.allclose(np.asarray(img["feature"]), exp)

    assert (aud["kind"], aud["width"], aud["height"]) == ("audio", -1, -1)
    assert np.allclose(np.asarray(aud["feature"]), 0.0)  # silence after downmix
