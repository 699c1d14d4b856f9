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


# ---------------------------------------------------------------------------
# audio fingerprint near-dup
# ---------------------------------------------------------------------------

from basicocr_spark.operators.multimodal import (  # noqa: E402
    _afp_of_samples,
    audio_fingerprint,
    build_audio_fp_table,
    perturb_fake_audio,
)


def test_fingerprint_kernel_matches_scalar_twin(spark):
    """The numpy mapInPandas fingerprint is bit-identical to the
    scalar-loop twin for every decodable fixture blob."""
    from basicocr_spark.operators.multimodal import (
        build_audio_fp_blob_list,
    )

    got = {
        r["media_ref"]: r["afp"]
        for r in audio_fingerprint(build_audio_fp_table(spark)).collect()
    }
    want = {}
    for ref, buf in build_audio_fp_blob_list():
        d = decode_fake_audio(buf)
        if d is not None and len(d[1]):
            want[ref] = _afp_of_samples(list(d[1]))
    assert got == want
    assert "a00005" not in got  # corrupt blob skipped


def test_clone_and_perturbed_pairing(spark):
    """Clones collide at hamming 0; zero-window perturbations stay
    inside the ball; unrelated clips stay out."""
    from basicocr_spark import queries as Q
    from basicocr_spark.operators.multimodal import AUDIO_FP_HAM_MAX

    hashes = audio_fingerprint(build_audio_fp_table(spark)).localCheckpoint()
    pairs = {
        (r["ref_a"], r["ref_b"]): r["hamming"]
        for r in Q.hamming_ball_pairs(
            hashes, "afp", "media_ref", 8, AUDIO_FP_HAM_MAX, "ref_a", "ref_b"
        ).collect()
    }
    assert pairs[("a00000", "a00000_clone")] == 0
    assert 0 < pairs[("a00003", "a00003_near")] <= AUDIO_FP_HAM_MAX
    # every surfaced pair is a planted clone/near family member
    for a, b in pairs:
        assert a.split("_")[0] == b.split("_")[0], (a, b)


def test_perturb_roundtrip():
    buf = encode_fake_audio("p", 5 * AUDIO_WINDOW)
    out = perturb_fake_audio(buf, (1, 3))
    _, s0 = decode_fake_audio(buf)
    _, s1 = decode_fake_audio(out)
    assert len(s0) == len(s1)
    for w in (1, 3):
        assert all(v == 0 for v in s1[w * AUDIO_WINDOW : (w + 1) * AUDIO_WINDOW])
    # untouched windows identical
    assert s1[: AUDIO_WINDOW] == s0[: AUDIO_WINDOW]
