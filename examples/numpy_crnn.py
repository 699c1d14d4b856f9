"""Sample recognizer adapter: a tiny pure-numpy CRNN forward pass.

Proves the resolve_recognizer seam with REAL conv math instead of the
fixture-logits lookup. Load it through the CLI:

    spark-submit ... run_extraction.py --input ... --output ... \
        --recognizer examples.numpy_crnn:make_recognizer

Architecture — a scaled-down analog of the reference CRNN
(contrib/crnn/models/crnn.py:23-79: conv stack -> height collapse ->
per-timestep classifier; the BiLSTM is elided, its role here is the
linear head):

    gray (1, 32, W)
      -> conv 3x3, 8 filters, pad 1, ReLU  -> maxpool 2x2   (8, 16, W/2)
      -> conv 3x3, 16 filters, pad 1, ReLU -> maxpool 2x2   (16, 8, W/4)
      -> max over height (the squeeze(2) step)              (16, T=W/4)
      -> per-timestep linear 16 -> nclass                   (T, nclass)

Weights are DETERMINISTIC (seeded rng) — a stand-in for a trained
checkpoint; a production adapter replaces `_load_weights` with np.load
of real weights and `_fetch_pixels` with its blob-store read (here the
deterministic fake codec stands in for the store, same seam as
operators/multimodal.resolve_decoder). Everything downstream of the
seam — CTC greedy decode, dictionary correction, stitching — is the
engine's, untouched.
"""

from __future__ import annotations

_WEIGHT_SEED = 12345


def _load_weights(nclass: int):
    """Deterministic weight 'checkpoint'. Production: np.load(path)."""
    import numpy as np

    rng = np.random.default_rng(_WEIGHT_SEED)
    return {
        "w1": rng.standard_normal((8, 1, 3, 3)) * 0.2,
        "b1": rng.standard_normal(8) * 0.05,
        "w2": rng.standard_normal((16, 8, 3, 3)) * 0.1,
        "b2": rng.standard_normal(16) * 0.05,
        "wl": rng.standard_normal((nclass, 16)) * 0.3,
        "bl": rng.standard_normal(nclass) * 0.05,
    }


def _fetch_pixels(ref: str):
    """Blob-store stand-in: materialize the ref's deterministic fake
    image and decode it through the decoder seam. Production replaces
    this with `decode(blob_store.get(ref))`."""
    from basicocr_spark.operators.multimodal import (
        encode_fake_image,
        resolve_decoder,
    )

    return resolve_decoder()(encode_fake_image(ref))


def _conv_relu(x, w, b):
    """x (C, H, W) * w (F, C, 3, 3) + b -> ReLU, padding 1 (numpy
    sliding-window einsum — real convolution arithmetic, no framework)."""
    import numpy as np

    c, h, wd = x.shape
    padded = np.pad(x, ((0, 0), (1, 1), (1, 1)))
    win = np.lib.stride_tricks.sliding_window_view(padded, (3, 3), axis=(1, 2))
    # win: (C, H, W, 3, 3); contract channel + kernel dims against w
    out = np.einsum("chwij,fcij->fhw", win, w) + b[:, None, None]
    return np.maximum(out, 0.0)


def _maxpool2(x):
    import numpy as np  # noqa: F401

    c, h, w = x.shape
    return x[:, : h // 2 * 2, : w // 2 * 2].reshape(c, h // 2, 2, w // 2, 2).max(axis=(2, 4))


def make_recognizer():
    """Zero-arg factory for `--recognizer examples.numpy_crnn:make_recognizer`
    (run_extraction.load_recognizer). Returns the forward callable
    `list[media_ref | None] -> list[logits (T, C) | None]`. Weights load
    lazily ONCE per executor process (the factory is pickled into task
    closures; nothing heavy may load at construction)."""
    state: dict = {}

    def forward(refs):
        import numpy as np

        from basicocr_spark.reference import DEFAULT_ALPHABET

        if "w" not in state:
            state["w"] = _load_weights(len(DEFAULT_ALPHABET) + 1)  # +1 CTC blank
        wts = state["w"]
        out = []
        for ref in refs:
            px = _fetch_pixels(ref) if ref is not None else None
            if px is None:
                out.append(None)
                continue
            w, h, buf = px
            img = np.frombuffer(buf, dtype=np.uint8).reshape(h, w)
            x = (img.astype(np.float64) / 127.5 - 1.0)[None]  # (1, H, W)
            x = _maxpool2(_conv_relu(x, wts["w1"], wts["b1"]))
            x = _maxpool2(_conv_relu(x, wts["w2"], wts["b2"]))
            feat = x.max(axis=1)  # collapse height -> (16, T)
            logits = feat.T @ wts["wl"].T + wts["bl"]  # (T, nclass)
            out.append(logits)
        return out

    return forward
