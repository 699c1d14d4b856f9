"""The shipped sample recognizer (examples/numpy_crnn.py): real conv
arithmetic through the resolve_recognizer seam, loaded exactly the way
the CLI loads it (module:factory spec), driven end-to-end through
run_extraction.run — proving a model swap is config, not engine code."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import fixtures as FX  # noqa: E402
from basicocr_spark import reference as R  # noqa: E402
from basicocr_spark import schemas as S  # noqa: E402
from basicocr_spark.operators.extraction import decode_ctc_numpy  # noqa: E402
from examples.numpy_crnn import make_recognizer  # noqa: E402
from run_extraction import load_recognizer, run  # noqa: E402


def test_forward_protocol():
    fwd = make_recognizer()
    out = fwd(["m000001", "m000002", None])
    assert out[2] is None
    nclass = len(R.DEFAULT_ALPHABET) + 1
    for lg in out[:2]:
        assert lg.shape[1] == nclass and lg.shape[0] > 1
    # deterministic: same ref -> identical logits
    import numpy as np

    assert np.array_equal(fwd(["m000001"])[0], out[0])
    # a (w=100) fake image yields T = 100 // 4 timesteps
    assert out[0].shape[0] == 25


def test_cli_spec_resolves_the_example():
    fwd = load_recognizer("examples.numpy_crnn:make_recognizer", None)
    assert callable(fwd)
    assert fwd([None]) == [None]


def test_e2e_extraction_with_real_conv_forward(spark, tmp_path):
    """Full pipeline with the numpy CRNN in place of fixture logits:
    every media span's text must equal the reference pipeline applied to
    the ADAPTER's logits (decode_ctc_numpy + correct_word) — the engine
    keeps decode/correction downstream of the seam."""
    docs = FX.gen_documents(8, 8, FX.SEED)
    docs_df = spark.createDataFrame(
        [
            (d, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
            for d, spans in docs
        ],
        schema=S.DOCUMENTS,
    )
    in_dir = str(tmp_path / "in")
    docs_df.write.mode("overwrite").parquet(in_dir)

    recognizer = load_recognizer("examples.numpy_crnn:make_recognizer", None)
    stats = run(spark, in_dir, str(tmp_path / "out"), recognizer=recognizer)
    assert stats["docs"] == len(docs)

    from basicocr_spark.plans.checkpoint import SnapshotWriter

    out = SnapshotWriter(spark, str(tmp_path / "out")).read_committed()
    got = {}
    for row in out.collect():
        for sp in row["spans"]:
            if sp["media_ref"]:
                got[sp["media_ref"]] = sp["text"]
    assert got, "no media spans extracted"

    fwd = make_recognizer()
    entries = R.load_dictionary(FX.gen_dictionary(FX.SEED))
    for ref, text in got.items():
        (lg,) = fwd([ref])
        raw = decode_ctc_numpy(lg, R.DEFAULT_ALPHABET)
        want = R.correct_word(raw, entries, 3) if raw else ""
        assert text == want, (ref, text, want)
    # and the adapter output differs from the fixture-logits default for
    # at least one ref (the swap is observable, not a no-op)
    logits_by_ref = {r: lg for r, lg, _ in FX.gen_media_logits(8, FX.SEED)}
    fixture_texts = {}
    for ref in got:
        lg = logits_by_ref.get(ref)
        raw = decode_ctc_numpy(lg, R.DEFAULT_ALPHABET) if lg is not None else ""
        fixture_texts[ref] = R.correct_word(raw, entries, 3) if raw else ""
    assert any(got[r] != fixture_texts[r] for r in got)
