from __future__ import annotations

import numpy as np
import pytest

from fuzzy_dedupe_pipeline_spark.multimodal import (
    extract_features,
    fake_decode,
    real_decode,
    synth_media,
)


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode(b"abc", "image")


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
