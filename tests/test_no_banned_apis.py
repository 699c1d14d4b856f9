"""Zero-per-row-Python discipline, enforced (SURVEY.md §7 hard part #2):
no row-at-a-time `F.udf`, no `.rdd`, no driver-side collect-and-loop in
the engine package. Arrow-batched pandas UDFs / mapInPandas are the only
sanctioned Python compute."""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "basicocr_spark"

BANNED = [
    (re.compile(r"\bF\.udf\s*\("), "row-at-a-time F.udf"),
    (re.compile(r"@udf\b"), "row-at-a-time @udf"),
    (re.compile(r"\.rdd\b"), "RDD access"),
    (re.compile(r"\bsc\.parallelize\b"), "RDD creation"),
    (re.compile(r"\.toPandas\s*\("), "driver-side full materialization"),
]

# .collect() is allowed only where the collected data is provably
# driver-sized: whole files named here (checkpoint manifest metadata),
# or an individual line carrying an explicit `# sanctioned-collect:`
# marker stating WHY it is bounded (e.g. the BPE trainer's 1-row argmax
# per round). Anything else is a driver-side materialization bug.
COLLECT_ALLOWED = {"checkpoint.py"}
SANCTION_MARK = "# sanctioned-collect:"


def _py_files():
    return [p for p in PKG.rglob("*.py")]


def test_no_banned_apis():
    offenders = []
    for path in _py_files():
        text = path.read_text()
        for pat, why in BANNED:
            for m in pat.finditer(text):
                line = text[: m.start()].count("\n") + 1
                offenders.append(f"{path.name}:{line} {why}")
    assert not offenders, offenders


def test_collect_only_in_sanctioned_sites():
    offenders = []
    for path in _py_files():
        if path.name in COLLECT_ALLOWED:
            continue
        text = path.read_text()
        lines = text.splitlines()
        for m in re.finditer(r"\.collect\s*\(\)", text):
            line = text[: m.start()].count("\n") + 1
            if SANCTION_MARK in lines[line - 1]:
                continue
            offenders.append(f"{path.name}:{line}")
    assert not offenders, offenders
