"""RIFF WAV decode path (operators/media.py:wav_decode_one).

WAV blobs are built with the stdlib ``wave`` writer (an independent
implementation of the format) plus hand-rolled RIFF bytes for the
subtypes ``wave`` can't write (float32, 24-bit), then decoded and
checked sample-exact against the known signal.
"""

import struct
import wave
from io import BytesIO

import numpy as np
import pytest

from mediacrawler_spark.operators.media import (
    MEDIA_SCHEMA,
    _audio_feature,
    _stdlib_decode,
    decode_media,
    wav_decode_one,
)


def _wav_stdlib(samples: np.ndarray, rate: int, n_ch: int, sampwidth: int) -> bytes:
    """samples: (n, n_ch) int array at the target bit depth."""
    bio = BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 1:
            w.writeframes(samples.astype(np.uint8).tobytes())
        elif sampwidth == 2:
            w.writeframes(samples.astype("<i2").tobytes())
        else:
            raise ValueError
    return bio.getvalue()


def _wav_manual(raw: bytes, rate: int, n_ch: int, bits: int, audio_fmt: int) -> bytes:
    block = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", audio_fmt, n_ch, rate, rate * block, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_pcm16_mono_sample_exact():
    t = np.arange(400)
    sig = (np.sin(t / 10.0) * 20000).astype(np.int16)
    dec = wav_decode_one(_wav_stdlib(sig.reshape(-1, 1), 8000, 1, 2))
    assert dec is not None
    rate, mono = dec
    assert rate == 8000 and len(mono) == 400
    np.testing.assert_allclose(mono, sig / 32768.0, atol=1e-6)


def test_pcm16_stereo_averages_to_mono():
    left = np.full(50, 10000, dtype=np.int16)
    right = np.full(50, -10000, dtype=np.int16)
    inter = np.stack([left, right], axis=1)
    dec = wav_decode_one(_wav_stdlib(inter, 44100, 2, 2))
    assert dec is not None
    rate, mono = dec
    assert rate == 44100 and len(mono) == 50
    np.testing.assert_allclose(mono, 0.0, atol=1e-6)


def test_pcm8_offset_binary():
    sig = np.array([0, 128, 255], dtype=np.uint8)
    dec = wav_decode_one(_wav_stdlib(sig.reshape(-1, 1), 1000, 1, 1))
    assert dec is not None
    np.testing.assert_allclose(dec[1], [-1.0, 0.0, 127 / 128], atol=1e-6)


def test_float32_and_24bit_paths():
    f = np.array([0.5, -0.25, 1.0, -1.0], dtype="<f4")
    dec = wav_decode_one(_wav_manual(f.tobytes(), 16000, 1, 32, 3))
    assert dec is not None and dec[0] == 16000
    np.testing.assert_allclose(dec[1], f, atol=1e-7)

    v24 = np.array([1 << 22, -(1 << 22), 0], dtype=np.int64)
    raw = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in (v24 & 0xFFFFFF)
    )
    dec = wav_decode_one(_wav_manual(raw, 22050, 1, 24, 1))
    assert dec is not None
    np.testing.assert_allclose(dec[1], [0.5, -0.5, 0.0], atol=1e-6)


@pytest.mark.parametrize(
    "blob",
    [b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00WAVE", b"totally not audio", None],
)
def test_rejects_non_wav(blob):
    assert wav_decode_one(blob) is None


def test_rejects_compressed_format_tag():
    # audio_fmt 85 (MP3-in-WAV): outside the subset -> None
    assert wav_decode_one(_wav_manual(b"\x00" * 64, 8000, 1, 16, 85)) is None


def test_audio_feature_envelope():
    mono = np.concatenate([np.zeros(100), np.ones(100) * 0.5])
    feat = _audio_feature(mono, bins=4)
    np.testing.assert_allclose(feat, [0.0, 0.0, 0.5, 0.5], atol=1e-9)


def test_spark_stdlib_decode_accepts_wav(spark):
    sig = (np.sin(np.arange(1000) / 5.0) * 30000).astype(np.int16)
    rows = [
        ("wav:tone", "audio", bytearray(_wav_stdlib(sig.reshape(-1, 1), 8000, 1, 2))),
        ("junk", "audio", bytearray(b"zzz")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_ref"]: r for r in decode_media(df, decoder=_stdlib_decode).collect()}
    tone = out["wav:tone"]
    assert tone["width"] is None and tone["height"] is None
    assert tone["n_frames"] == 1000
    assert len(tone["feature"]) == 16 and max(tone["feature"]) > 0.1
    assert out["junk"]["n_frames"] is None
