"""Audio energy/silence/clipping stats: integer-exact parity with a
pure-Python reference, plus the end-to-end WAV path — the blob is built
by an INDEPENDENT inline RIFF writer (struct.pack, never the package's
helpers), decoded by the package, and the float→int16 conversion must
round-trip exactly before the stats run."""

import struct

import numpy as np
import pytest

from mediacrawler_spark.operators.media import audio_energy, wav_decode_one


def _ref_stats(samples, silence_abs=10, clip_abs=60):
    n = len(samples)
    return {
        "n_samples": n,
        "energy": sum(int(s) * int(s) for s in samples),
        "peak_abs": max((abs(int(s)) for s in samples), default=0),
        "silence_n": sum(1 for s in samples if abs(int(s)) < silence_abs),
        "clip_n": sum(1 for s in samples if abs(int(s)) >= clip_abs),
        "silence_ratio": round(
            sum(1 for s in samples if abs(int(s)) < silence_abs) / n, 6
        )
        if n
        else 0.0,
    }


def _wav16(samples, rate=8000):
    """Minimal independent RIFF/WAVE writer: PCM mono 16-bit LE."""
    data = b"".join(struct.pack("<h", int(s)) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


CASES = [
    [0, 0, 0, 0],  # pure silence
    [5, -9, 10, -10, 59, -59, 60, -60, 1000, -32768, 32767],  # boundaries
    [],  # empty
    list(range(-100, 101, 7)),
]


def test_matches_reference(spark):
    rows = [(str(i), s) for i, s in enumerate(CASES)]
    df = spark.createDataFrame(rows, "media_ref string, samples array<int>")
    got = {r["media_ref"]: r.asDict() for r in audio_energy(df).collect()}
    for i, s in enumerate(CASES):
        want = _ref_stats(s)
        for k, v in want.items():
            assert got[str(i)][k] == v, (i, k, got[str(i)][k], v)


def test_wav_end_to_end(spark):
    samples = [0, 3, -7, 12, -45, 60, -61, 200, -32768, 32767, 9, -10]
    rate, mono = wav_decode_one(_wav16(samples))
    assert rate == 8000
    # float mono converts back to the EXACT source ints for 16-bit PCM
    back = np.round(mono * 32768.0).astype(np.int64)
    back = np.clip(back, -32768, 32767)  # -32768 clips to -1.0 in decode
    assert back.tolist() == samples
    df = spark.createDataFrame(
        [("w0", [int(x) for x in back])], "media_ref string, samples array<int>"
    )
    got = audio_energy(df).collect()[0].asDict()
    want = _ref_stats(samples)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)


def test_no_python_in_plan(spark):
    df = spark.createDataFrame(
        [("a", [1, 2, 3])], "media_ref string, samples array<int>"
    )
    plan = audio_energy(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
