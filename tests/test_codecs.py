"""Real PNG/WAV codec tests: byte-exact round-trips across all filter
types / channel counts, malformed-input rejection, and the Spark-side
featurizer plumbing."""

import numpy as np
import pytest

from warp_spark.pipeline.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    png_decode_features,
    synth_png_payloads,
    synth_wav_payloads,
    wav_decode_features,
)


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(channels, filter_type):
    rng = np.random.RandomState(channels * 10 + filter_type)
    h, w = rng.randint(1, 40), rng.randint(1, 40)
    px = rng.randint(0, 256, (h, w, channels)).astype(np.uint8)
    out = decode_png(encode_png(px, filter_type))
    assert out.shape == (h, w, channels)
    assert (out == px).all()


def test_png_grayscale_2d_input():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = decode_png(encode_png(px, 4))
    assert out.shape == (8, 8, 1)
    assert (out[:, :, 0] == px).all()


def test_png_rejects_garbage_and_bad_crc():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    good = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
    good[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip(channels):
    rng = np.random.RandomState(channels)
    s = rng.randint(-32768, 32767, (500, channels)).astype(np.int16)
    dec, rate = decode_wav(encode_wav(s, 22050))
    assert rate == 22050
    assert dec.shape == (500, channels)
    assert (dec == s).all()


def test_wav_rejects_garbage():
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"OggS....")


def test_png_features_match_pixel_rule(spark):
    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    feats = {
        r["doc_id"]: r
        for r in png_decode_features(synth_png_payloads(df)).collect()
    }
    assert len(feats) == 40
    for d in (0, 7, 31, 39):
        h, w = 8 + d % 8, 16 + d % 16
        i = np.arange(h * w, dtype=np.int64)
        px = (d * 31 + i * 7) % 256
        r = feats[d]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 1)
        assert r["n_pixels"] == h * w
        assert r["sum_pixels"] == int(px.sum())
        assert r["px_first"] == int(px[0]) and r["px_last"] == int(px[-1])


def test_wav_features_match_sample_rule(spark):
    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    feats = {
        r["doc_id"]: r
        for r in wav_decode_features(synth_wav_payloads(df)).collect()
    }
    for d in (0, 5, 17, 39):
        n = 64 + d % 64
        i = np.arange(n, dtype=np.int64)
        s = (d * 131 + i * 17) % 2048 - 1024
        r = feats[d]
        assert r["sample_rate"] == 8000 * (1 + d % 3)
        assert (r["n_samples"], r["n_channels"]) == (n, 1)
        assert r["sum_abs"] == int(np.abs(s).sum())
        assert r["s_first"] == int(s[0]) and r["s_last"] == int(s[-1])


def test_y4m_roundtrip():
    from warp_spark.pipeline.codecs import decode_y4m, encode_y4m

    rng = np.random.RandomState(11)
    frames = rng.randint(0, 256, (7, 10, 24)).astype(np.uint8)
    dec, w, h, fps = decode_y4m(encode_y4m(frames, fps=30))
    assert (w, h, fps) == (24, 10, 30)
    assert dec.shape == frames.shape and (dec == frames).all()


def test_y4m_rejects_bad_input():
    from warp_spark.pipeline.codecs import decode_y4m, encode_y4m

    with pytest.raises(ValueError, match="not a Y4M"):
        decode_y4m(b"RIFF....")
    with pytest.raises(ValueError, match="even dimensions"):
        encode_y4m(np.zeros((1, 3, 4), np.uint8))


def test_y4m_features_match_pixel_rule(spark):
    from warp_spark.pipeline.codecs import synth_y4m_payloads, y4m_decode_features

    df = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    feats = {
        r["doc_id"]: r
        for r in y4m_decode_features(synth_y4m_payloads(df)).collect()
    }
    for d in (0, 3, 9, 19):
        n, h, w = 2 + d % 4, 8 + 2 * (d % 4), 16 + 2 * (d % 8)
        i = np.arange(h * w, dtype=np.int64)
        total = sum(int(((d * 17 + f * 29 + i * 3) % 256).sum()) for f in range(n))
        r = feats[d]
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, n)
        assert r["fps"] == 24 + d % 2
        assert r["sum_luma"] == total
        assert r["frame0_sum"] == int(((d * 17 + i * 3) % 256).sum())


def test_resize_png_nearest_matches_numpy(spark):
    """The distributed resize must equal a direct numpy nearest-neighbor
    resample of the same source pixels — both up- and down-scaling, and
    the re-encoded payload must itself be a valid PNG."""
    from warp_spark.pipeline.codecs import (
        decode_png,
        resize_png_nearest,
        synth_png_payloads,
    )

    df = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    out = {
        r["doc_id"]: bytes(r["payload"])
        for r in resize_png_nearest(
            synth_png_payloads(df), target_h=12, target_w=20
        ).collect()
    }
    for d in (0, 3, 7, 11, 15, 23):  # h 8..15 covers up- AND down-scale
        h, w = 8 + d % 8, 16 + d % 16
        i = np.arange(h * w, dtype=np.int64)
        src = ((d * 31 + i * 7) % 256).astype(np.uint8).reshape(h, w)
        ys = (np.arange(12, dtype=np.int64) * h) // 12
        xs = (np.arange(20, dtype=np.int64) * w) // 20
        want = src[np.ix_(ys, xs)]
        got = decode_png(out[d])
        assert got.shape == (12, 20, 1)
        assert (got[:, :, 0] == want).all(), d


def test_resample_wav_nearest_matches_numpy(spark):
    """The distributed resample must equal a direct numpy zero-order-hold
    resample of the same source samples — 2× upsample (8 kHz source),
    identity (16 kHz), and 2/3× downsample (24 kHz) — and the re-encoded
    payload must itself be a valid 16 kHz WAV."""
    from warp_spark.pipeline.codecs import (
        decode_wav,
        resample_wav_nearest,
        synth_wav_payloads,
    )

    df = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    out = {
        r["doc_id"]: bytes(r["payload"])
        for r in resample_wav_nearest(
            synth_wav_payloads(df), target_rate=16000
        ).collect()
    }
    for d in range(12):  # d%3 cycles 8/16/24 kHz: up, identity, down
        n = 64 + d % 64
        rate = 8000 * (1 + d % 3)
        i = np.arange(n, dtype=np.int64)
        src = ((d * 131 + i * 17) % 2048) - 1024
        n_out = max((n * 16000) // rate, 1)
        want = src[(np.arange(n_out, dtype=np.int64) * n) // n_out]
        got, got_rate = decode_wav(out[d])
        assert got_rate == 16000
        assert got.shape == (n_out, 1)
        assert (got[:, 0] == want).all(), d
        if d % 3 == 1:  # 16 kHz source: resample must be the identity
            assert (got[:, 0] == src).all()


def test_resample_y4m_fps_matches_numpy(spark):
    """The distributed temporal resample must equal a direct numpy
    nearest-frame selection — downsample (24/25 -> 12 fps drops frames)
    AND upsample (24 -> 60 fps replicates frames) — and the re-encoded
    payload must itself be a valid Y4M at the target rate."""
    from warp_spark.pipeline.codecs import (
        decode_y4m,
        resample_y4m_fps,
        synth_y4m_payloads,
    )

    df = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    for target in (12, 60):
        out = {
            r["doc_id"]: bytes(r["payload"])
            for r in resample_y4m_fps(
                synth_y4m_payloads(df), target_fps=target
            ).collect()
        }
        for d in range(8):
            n, h, w = 2 + d % 4, 8 + 2 * (d % 4), 16 + 2 * (d % 8)
            fps = 24 + d % 2
            i = np.arange(h * w, dtype=np.int64)
            src = np.stack(
                [((d * 17 + f * 29 + i * 3) % 256).astype(np.uint8).reshape(h, w)
                 for f in range(n)]
            )
            n_out = max((n * target) // fps, 1)
            want = src[(np.arange(n_out, dtype=np.int64) * n) // n_out]
            got, gw, gh, gfps = decode_y4m(out[d])
            assert (gw, gh, gfps) == (w, h, target)
            assert got.shape == (n_out, h, w)
            assert (got == want).all(), (d, target)
            if target == 60 and fps == 24:
                assert n_out == (5 * n) // 2  # genuine frame replication
