"""KenLM-style character-bigram perplexity scorer (dependency-free numpy).

No reference precedent exists (SURVEY.md §7.0); same architectural shape as
the reference's density scoring in ``Text Cleaner/step2_sort_by_period_genre.py:339-346``
(counts normalized by length -> threshold). A document's perplexity under a
character-bigram LM trained on the clean Latin seed text is the quality
signal: well-formed Latin scores low, boilerplate/garbage scores high.

The model is a (V, V) log-probability matrix over a 64-symbol alphabet
(a-z, digits folded to '0', basic punctuation, space, other) built at import
time from the embedded Latin word pool -- deterministic, trivially
broadcastable inside a pandas-UDF closure.
"""

from __future__ import annotations

import numpy as np

from ..sources import synth

_ALPHABET = "abcdefghijklmnopqrstuvwxyz0 .,;:!?'\"-()"
_OTHER = len(_ALPHABET)  # id for everything else
V = _OTHER + 1

_CHAR_IDS = np.full(0x110000, _OTHER, dtype=np.int32)
for _i, _ch in enumerate(_ALPHABET):
    _CHAR_IDS[ord(_ch)] = _i
for _d in "123456789":
    _CHAR_IDS[ord(_d)] = _ALPHABET.index("0")
for _u in "ABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _CHAR_IDS[ord(_u)] = _ALPHABET.index(_u.lower())


def _ids(text: str) -> np.ndarray:
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    return _CHAR_IDS[np.minimum(codes, 0x10FFFF)]


def _train() -> np.ndarray:
    counts = np.ones((V, V), dtype=np.float64)  # add-one smoothing
    seed = " ".join(synth.LATIN_WORDS) + ". " + ", ".join(synth.LATIN_WORDS[:40]) + "."
    ids = _ids(seed * 3)
    np.add.at(counts, (ids[:-1], ids[1:]), 1.0)
    return np.log(counts / counts.sum(axis=1, keepdims=True))


LOGP = _train()

#: Documents above this perplexity fail the quality gate (tuned on the
#: synthetic corpus: Latin ~12-18, non-Latin ~25-60, garbage >100).
DEFAULT_THRESHOLD = 25.0


def perplexity(text: str) -> float:
    """exp(-mean bigram log-prob); lower is more Latin-like."""
    if not text or len(text) < 2:
        return float("inf")
    ids = _ids(text.lower())
    return float(np.exp(-LOGP[ids[:-1], ids[1:]].mean()))


def perplexity_batch(texts) -> np.ndarray:
    return np.array([perplexity(t or "") for t in texts])
