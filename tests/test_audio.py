"""Behavioral pins for the audio media leg (audio_window_features):

- silent windows (the generator writes exact-zero windows) are flagged
  unvoiced with sum_sq == 0 and zcr == 0; noisy windows are voiced;
- corrupt blobs emit no windows (P1/P2 skip semantics);
- the trailing partial window is kept and its `n` records the true
  sample count;
- the decoder seam: a custom decoder threads through the kernel.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark.operators.multimodal import (  # noqa: E402
    AUDIO_WINDOW,
    SILENCE_MSQ,
    audio_window_features,
    build_audio_table,
    decode_fake_audio,
    encode_fake_audio,
)


@pytest.fixture(scope="module")
def audio_rows(spark):
    refs = [f"a{i:05d}" for i in range(12)]
    blobs = build_audio_table(spark, refs, corrupt_every=6)
    return audio_window_features(blobs).collect()


def test_corrupt_blobs_emit_nothing(audio_rows):
    emitted = {r["media_ref"] for r in audio_rows}
    assert "a00005" not in emitted and "a00011" not in emitted
    assert "a00000" in emitted


def test_silence_gate(audio_rows):
    silent = [r for r in audio_rows if r["sum_sq"] == 0]
    voiced = [r for r in audio_rows if r["voiced"]]
    assert silent, "generator must produce exact-silence windows"
    assert voiced, "generator must produce voiced windows"
    for r in silent:
        assert not r["voiced"] and r["zcr"] == 0
    for r in voiced:
        assert r["sum_sq"] >= SILENCE_MSQ * r["n"]


def test_partial_last_window_kept(audio_rows):
    by_ref = {}
    for r in audio_rows:
        by_ref.setdefault(r["media_ref"], []).append(r)
    for i, (ref, grp) in enumerate(sorted(by_ref.items())):
        last = max(grp, key=lambda r: r["win_idx"])
        total = sum(r["n"] for r in grp)
        # generator: 3 full windows + (40 + 97*i) extra samples
        assert last["n"] == total - AUDIO_WINDOW * (len(grp) - 1)
        assert 0 < last["n"] <= AUDIO_WINDOW


def test_codec_roundtrip_and_decoder_seam(spark):
    buf = encode_fake_audio("seam", 3 * AUDIO_WINDOW + 7)
    rate, samples = decode_fake_audio(buf)
    assert rate == 8000 and len(samples) == 3 * AUDIO_WINDOW + 7
    assert decode_fake_audio(b"\x00junk") is None
    assert decode_fake_audio(buf[:-1]) is None  # truncated

    # custom decoder: constant 3-sample clip, decoded for every blob
    blobs = build_audio_table(spark, ["x1", "x2"], corrupt_every=0)
    rows = audio_window_features(
        blobs, decoder=lambda b: (8000, (5, -5, 5))
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert (r["n"], r["sum_sq"], r["zcr"]) == (3, 75, 2)
