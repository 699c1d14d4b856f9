"""Vectorized (pandas str-ops) twin of the boilerplate-strip kernel.

Same frozen semantics as reference.extract_main_text / the Catalyst
column pipeline in boilerplate.py — implemented over whole Arrow batches
so the fused extraction pipeline spends its Python time in pandas' C
string kernels instead of per-row Python. Equality with the reference is
pinned by tests/test_boilerplate_vec.py across the fixture corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .. import reference as R

_TAG_RE = R._TAG_RE
_A_RE = R._A_RE
_WS_RE = R._WS_RE
_NEG_CLASS_RE = R._NEG_CLASS_RE


def _clean(series: pd.Series) -> pd.Series:
    return (
        series.str.replace(_TAG_RE, "", regex=True)
        .str.replace(_WS_RE, " ", regex=True)
        .str.strip()
    )


def make_vectorized_extractor(stop_terms: list[str]):
    stop_re = (
        re.compile(
            "|".join(re.escape(t) for t in sorted(stop_terms, key=lambda t: (-len(t), t)))
        )
        if stop_terms
        else None
    )

    def extract(raw: pd.Series) -> pd.Series:
        """Series of raw span texts -> Series of extracted main text.
        Index of the result matches the input index."""
        if raw.empty:
            return raw.astype(object)
        raw = raw.fillna("")
        blocks = raw.str.split("\n").explode()
        span_idx = blocks.index
        tagless = _clean(blocks)

        # link length: total cleaned length of <a>...</a> inners
        inners = blocks.str.findall(_A_RE)
        link_len = inners.map(
            lambda lst: sum(len(_WS_RE.sub(" ", _TAG_RE.sub("", s)).strip()) for s in lst)
            if lst
            else 0
        )

        wc = tagless.str.split().str.len().fillna(0)
        wc = wc.where(tagless != "", 0)

        bonus = np.where(
            blocks.str.contains("<p>", regex=False)
            | blocks.str.contains('class="content"', regex=False),
            25,
            0,
        ) - np.where(
            blocks.str.contains("<li>", regex=False)
            | blocks.str.contains(_NEG_CLASS_RE, regex=True),
            25,
            0,
        )
        denom = tagless.str.len().clip(lower=1)
        score = wc.to_numpy(dtype=float) + bonus - 50.0 * (
            link_len.to_numpy(dtype=float) / denom.to_numpy(dtype=float)
        )
        keep = (score > 0) & (tagless != "").to_numpy()

        kept = tagless[keep]
        joined = kept.groupby(kept.index).agg(" ".join)
        out = joined.reindex(raw.index, fill_value="")
        if stop_re is not None:
            out = out.str.replace(stop_re, "", regex=True)
        out = out.str.replace(_WS_RE, " ", regex=True).str.strip()
        return out

    return extract
