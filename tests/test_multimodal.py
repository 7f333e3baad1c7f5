from __future__ import annotations

import numpy as np
import pytest

from fuzzy_dedupe_pipeline_spark.multimodal import (
    builtin_decode,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    extract_features,
    fake_decode,
    real_decode,
    synth_media,
    synth_real_media,
)


def test_real_decode_is_stubbed():
    # compressed formats still raise (no PIL/ffmpeg in this container) …
    with pytest.raises(NotImplementedError):
        real_decode(b"\xff\xd8\xff jpeg-ish", "image")


def test_ppm_roundtrip_decodes_real_pixels():
    rgb = np.zeros((8, 8, 3), dtype=np.uint8)  # all black
    feat = decode_ppm(encode_ppm(rgb))
    assert feat[0] == pytest.approx(1.0)  # every pixel in the darkest bin
    rgb[:] = 255  # all white
    feat = decode_ppm(encode_ppm(rgb))
    assert feat[-1] == pytest.approx(1.0)
    # comments in header are handled
    raw = b"P6\n# a comment\n2 2\n255\n" + bytes(12)
    assert decode_ppm(raw)[0] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + bytes(4))


def test_wav_roundtrip_decodes_real_samples():
    silence = np.zeros(1600)
    assert decode_wav(encode_wav(silence)).max() == pytest.approx(0.0)
    loud = np.ones(1600) * 0.5
    feat = decode_wav(encode_wav(loud))
    assert np.allclose(feat, 0.5, atol=1e-3)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


def test_builtin_decode_sniffs_magic_bytes():
    img = encode_ppm(np.full((4, 4, 3), 128, dtype=np.uint8))
    wav = encode_wav(np.zeros(256))
    assert builtin_decode(img, "image").shape == (16,)
    assert builtin_decode(wav, "audio").shape == (16,)
    with pytest.raises(NotImplementedError):
        builtin_decode(b"\x89PNG....", "image")


def test_extract_features_real_codec_end_to_end(spark):
    """The full Spark path (mapInPandas over Arrow batches) with REAL byte
    parsing — no stub in the loop."""
    media = synth_real_media(spark, n=20)
    out = extract_features(media, decoder=builtin_decode).collect()
    assert len(out) == 20
    for r in out:
        assert len(r.feature) == 16
        assert all(0.0 <= v <= 1.0 for v in r.feature)
    # image rows: histogram sums to 1; audio rows: silence-free RMS > 0
    imgs = [r for r in out if r.media_type == "image"]
    assert imgs and all(abs(sum(r.feature) - 1.0) < 1e-5 for r in imgs)
    auds = [r for r in out if r.media_type == "audio"]
    assert auds and all(max(r.feature) > 0 for r in auds)


def test_fake_decode_deterministic():
    a = fake_decode(b"payload", "image")
    b = fake_decode(b"payload", "image")
    assert np.array_equal(a, b)
    assert a.dtype == np.float32 and len(a) == 16
    assert not np.array_equal(a, fake_decode(b"other", "image"))


def test_extract_features_plumbing(spark):
    media = synth_media(spark, n=30)
    out = extract_features(media).collect()
    assert len(out) == 30
    for r in out:
        assert r.n_bytes > 0
        assert len(r.feature) == 16
        assert r.media_type in ("image", "audio", "video")
    # deterministic across runs
    again = extract_features(synth_media(spark, n=30)).collect()
    assert sorted(r.media_id for r in out) == sorted(r.media_id for r in again)
    f1 = {r.media_id: list(r.feature) for r in out}
    f2 = {r.media_id: list(r.feature) for r in again}
    assert f1 == f2
