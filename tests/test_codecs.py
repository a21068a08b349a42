"""Real-codec gates (multimodal/codecs.py): byte-exact round-trips for
WAV and BMP (every padding case), closed-form feature verification,
malformed-input rejection, resize correctness, and the Spark decode
pipeline end-to-end against driver-side ground truth."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bayesiandatafusion_jl_spark.multimodal.codecs import (
    bmp_features,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    resize_nearest,
    synth_bmp,
    synth_wav,
    wav_features,
)


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32767, size=1001, dtype=np.int16)
    rate, back = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and back.shape == (1001, 1)
    assert np.array_equal(back[:, 0], mono)
    stereo = rng.integers(-32768, 32767, size=(500, 2), dtype=np.int16)
    rate, back = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and np.array_equal(back, stereo)


def test_wav_features_closed_form():
    """A full-scale-0.5 sine: RMS = 0.5/√2, peak = 0.5, duration exact,
    ZCR = 2·freq/rate."""
    rate, freq = 8000, 400
    t = np.arange(rate) / rate  # exactly 1 s
    x = np.round(0.5 * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    f = wav_features(encode_wav(x, rate))
    assert f["duration_s"] == 1.0
    assert math.isclose(f["rms"], 0.5 / math.sqrt(2), rel_tol=1e-3)
    assert math.isclose(f["peak"], 0.5, rel_tol=1e-3)
    assert math.isclose(f["zcr"], 2 * freq / rate, rel_tol=2e-2)
    assert f["rate"] == rate and f["channels"] == 1


def test_wav_rejects_malformed():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    # valid container, unsupported codec id (format 85 ~ mp3)
    good = bytearray(encode_wav(np.zeros(10, dtype=np.int16), 8000))
    good[20:22] = (85).to_bytes(2, "little")
    with pytest.raises(ValueError, match="PCM16"):
        decode_wav(bytes(good))


@pytest.mark.parametrize("w", [16, 17, 18, 19, 20])  # all 4 padding cases
def test_bmp_roundtrip_every_padding(w):
    rng = np.random.default_rng(w)
    img = rng.integers(0, 256, size=(7, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_features_and_rejection():
    img = np.zeros((4, 8, 3), dtype=np.uint8)
    img[:, :, 0] = 255  # pure red
    f = bmp_features(encode_bmp(img))
    assert (f["width"], f["height"]) == (8, 4)
    assert math.isclose(f["mean_luma"], 0.299 * 255, rel_tol=1e-6)
    assert f["contrast"] == 0.0
    with pytest.raises(ValueError, match="BMP"):
        decode_bmp(b"BMgarbage")
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(img)[:-10])


def test_resize_nearest():
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    up = resize_nearest(img, 8, 12)
    assert up.shape == (12, 8, 3)
    # corners preserved under nearest-neighbor
    assert np.array_equal(up[0, 0], img[0, 0])
    assert np.array_equal(up[-1, -1], img[-1, -1])
    down = resize_nearest(img, 2, 3)
    assert down.shape == (3, 2, 3)
    with pytest.raises(ValueError, match=">= 1"):
        resize_nearest(img, 0, 3)


def test_spark_decode_matches_driver_ground_truth(spark):
    """The mapInPandas decode path produces exactly the features the
    same codecs compute driver-side — executor/driver agreement, both
    media types, all 400 rows at sf0.001."""
    from bayesiandatafusion_jl_spark.registry import get_query

    rows = get_query("q_multimodal_decode").fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 400
    for r in rows[:40]:
        if r["media_type"] == "audio/wav":
            want = wav_features(synth_wav(r["doc_id"]))
            assert r["duration_s"] == want["duration_s"]
            assert r["rms"] == want["rms"]
            assert r["peak"] == want["peak"]
            assert r["zcr"] == want["zcr"]
        else:
            want = bmp_features(synth_bmp(r["doc_id"]))
            assert r["pixels"] == want["width"] * want["height"]
            assert r["mean_luma"] == want["mean_luma"]


def test_thumbnail_query_round_trips(spark):
    """Every thumbnail is a decodable 16x16 BMP identical to the
    driver-side decode→resize→encode of the same source payload."""
    from bayesiandatafusion_jl_spark.registry import get_query
    import hashlib

    rows = get_query("q_multimodal_thumbnail").fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 200
    for r in rows[:25]:
        src = synth_bmp(r["doc_id"])
        img = decode_bmp(src)
        assert (r["in_h"], r["in_w"]) == img.shape[:2]
        want = encode_bmp(resize_nearest(img, 16, 16))
        assert r["thumb_md5"] == hashlib.md5(want).hexdigest()
        assert decode_bmp(want).shape == (16, 16, 3)


# --- NPY codec + binaryFile ingestion (r13) --------------------------------


def test_npy_round_trip_and_pickle_rejection():
    import io

    import numpy as np
    import pytest

    from bayesiandatafusion_jl_spark.multimodal.codecs import (
        decode_npy,
        encode_npy,
        npy_features,
    )

    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    back = decode_npy(encode_npy(arr))
    assert back.dtype == arr.dtype and back.shape == arr.shape
    assert (back == arr).all()
    f = npy_features(encode_npy(arr))
    assert f["shape"] == "2x3x4" and f["n_elems"] == 24 and f["ndim"] == 3
    # object arrays refused on BOTH sides (code-execution vector)
    with pytest.raises(ValueError):
        encode_npy(np.array([{"a": 1}], dtype=object))
    buf = io.BytesIO()
    np.save(buf, np.array([{"a": 1}], dtype=object), allow_pickle=True)
    with pytest.raises(ValueError):
        decode_npy(buf.getvalue())


def test_binaryfile_ingest_decodes_every_kind(spark, tmp_path):
    """The file-grain ingest path: binaryFile scan -> per-kind codec
    dispatch; features must equal the direct codec calls byte-exactly."""
    import numpy as np

    from bayesiandatafusion_jl_spark.multimodal.codecs import (
        decode_wav,
        synth_wav,
    )
    from bayesiandatafusion_jl_spark.multimodal.ingest import (
        media_file_features,
        read_media_dir,
        write_sample_media_dir,
    )

    base = write_sample_media_dir(str(tmp_path / "media"), n_per_kind=6)
    media = read_media_dir(spark, base)
    assert media.count() == 18
    feats = {
        (r["kind"], r["shape"]): r
        for r in media_file_features(media).collect()
    }
    assert all(k in {x[0] for x in feats} for k in ("wav", "bmp", "npy"))
    # wav moments match a direct decode of the same synth payload
    _, s0 = decode_wav(synth_wav(0))
    wav_rows = [r for (k, _), r in feats.items() if k == "wav"]
    assert any(
        abs(r["f_mean"] - float(s0.astype(np.float64).mean())) < 1e-9
        for r in wav_rows
    )
    # glob pushdown: only npy files listed
    only_npy = read_media_dir(spark, base, glob="*.npy")
    assert {r["kind"] for r in only_npy.select("kind").distinct().collect()} == {"npy"}
    assert only_npy.count() == 6
