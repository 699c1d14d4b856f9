"""S3-S5 file-format sources: manifest text parse + binaryFile join,
`word freq` dictionary csv, stop-term text scan with dedup — against
real files written by the test (the reference's own on-disk formats)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark.operators.multimodal import encode_fake_image  # noqa: E402
from basicocr_spark.sources import files as SRC  # noqa: E402


def _write(tmpdir, name, data):
    p = os.path.join(tmpdir, name)
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(p, mode) as f:
        f.write(data)
    return p


def test_manifest_and_binary_join(spark, tmp_path):
    d = str(tmp_path)
    imgdir = os.path.join(d, "imgs")
    os.makedirs(imgdir)
    for i in range(4):
        _write(imgdir, f"img_{i}.bin", encode_fake_image(f"m{i:06d}", 60, 32))
    # manifest lists 3 of the 4 plus one missing file (P3: drops out)
    manifest = _write(
        d,
        "train.txt",
        "imgs/img_0.bin label_zero\nimgs/img_1.bin label_one\n\n"
        "imgs/img_3.bin label_three\nimgs/img_9.bin label_missing\n",
    )
    out = SRC.read_labeled_images(spark, manifest, os.path.join(imgdir, "*.bin")).collect()
    got = {os.path.basename(r.path): (r.label, len(r.content)) for r in out}
    assert set(got) == {"img_0.bin", "img_1.bin", "img_3.bin"}
    assert got["img_0.bin"][0] == "label_zero"
    assert all(n > 0 for _, n in got.values())


def test_same_basename_in_different_dirs_does_not_cross_match(spark, tmp_path):
    """Two files named img.bin in sibling dirs: the manifest's relative
    path must select exactly its own file — a basename-only join would
    duplicate/mislabel both rows."""
    d = str(tmp_path)
    for sub, payload in (("a", b"payload-a-0"), ("b", b"payload-b-longer")):
        os.makedirs(os.path.join(d, sub))
        _write(os.path.join(d, sub), "img.bin", payload)
    manifest = _write(d, "m.txt", "a/img.bin label_a\nb/img.bin label_b\n")
    out = SRC.read_labeled_images(spark, manifest, os.path.join(d, "*", "*.bin")).collect()
    got = {r.path: (r.label, len(r.content)) for r in out}
    assert got == {
        "a/img.bin": ("label_a", len(b"payload-a-0")),
        "b/img.bin": ("label_b", len(b"payload-b-longer")),
    }


def test_manifest_label_split_is_first_whitespace(spark, tmp_path):
    manifest = _write(str(tmp_path), "m.txt", "a/b.png multi word label\n")
    rows = SRC.read_manifest(spark, manifest).collect()
    assert rows[0].path == "a/b.png"
    assert rows[0].label == "multi word label"


def test_dictionary_scan(spark, tmp_path):
    p = _write(str(tmp_path), "dict.txt", "hello 120\nworld 40\nspark 999\n")
    rows = {r.word: r.freq for r in SRC.read_dictionary(spark, p).collect()}
    assert rows == {"hello": 120, "world": 40, "spark": 999}


def test_stop_terms_dedup(spark, tmp_path):
    p = _write(str(tmp_path), "stop.txt", "the\nand\nthe\n  of  \n\n")
    terms = {r.term for r in SRC.read_stop_terms(spark, p).collect()}
    assert terms == {"the", "and", "of"}


def test_dictionary_sink_roundtrip(spark, tmp_path):
    p = os.path.join(str(tmp_path), "dict_out")
    df = spark.createDataFrame([("alpha", 3), ("beta", 9)], SRC.DICTIONARY_SCHEMA)
    SRC.write_dictionary(df, p)
    back = {r.word: r.freq for r in SRC.read_dictionary(spark, p).collect()}
    assert back == {"alpha": 3, "beta": 9}


def test_text_sink_roundtrip(spark, tmp_path):
    p = os.path.join(str(tmp_path), "text_out")
    df = spark.createDataFrame([("line one",), ("line two",)], "text string")
    SRC.write_text_lines(df, p)
    lines = {r.value for r in spark.read.text(p).collect()}
    assert lines == {"line one", "line two"}
