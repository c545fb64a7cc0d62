"""Hashed character-trigram language identifier (fastText-architecture,
dependency-free).

The reference's closest precedent is the additive linear scorers in
``Text Cleaner/step2_sort_by_period_genre.py:153-419`` (keyword counts x
weights -> argmax) and the modern-language line heuristics in
``Text Cleaner/step3_clean_content.py:259-276``; this generalizes them into
a real langid model: character trigrams hashed into a fixed-width feature
space, one log-probability profile per language, argmax of profile @ counts.

Determinism: profiles are built at import time from the embedded per-language
word pools in sources/synth.py (the same pools that generate the synthetic
corpus's ground-truth labels), so train and eval share one frozen model --
no wheels, no files, no wall-clock, no hash seed dependence (hashing is
arithmetic on codepoints, not Python ``hash``).

Scale path: ``scores_for_batch`` is pure numpy over Arrow batches; the model
matrix (n_langs x N_BUCKETS floats, ~0.5 MB) ships to executors inside the
UDF closure exactly like a broadcast variable.
"""

from __future__ import annotations

import numpy as np

from ..sources import synth

N_BUCKETS = 1 << 14  # 16384 hashed trigram buckets
LANGS = ("la", "en", "de", "fr", "es", "zh")
_LANG_INDEX = {lang: i for i, lang in enumerate(LANGS)}

_P1 = np.int64(1_000_003)
_P2 = np.int64(10_007)


def _trigram_buckets(text: str) -> np.ndarray:
    """Hash every char trigram of `text` to a bucket id. Pure numpy."""
    codes = np.frombuffer(text.lower().encode("utf-32-le"), dtype=np.uint32)
    codes = codes.astype(np.int64)
    if codes.size < 3:
        return np.empty(0, dtype=np.int64)
    tri = codes[:-2] * _P1 + codes[1:-1] * _P2 + codes[2:]
    return np.abs(tri) % N_BUCKETS


def _bucket_counts(text: str) -> np.ndarray:
    buckets = _trigram_buckets(text)
    return np.bincount(buckets, minlength=N_BUCKETS).astype(np.float64)


def _build_profiles() -> np.ndarray:
    """(n_langs, N_BUCKETS) smoothed log-probability matrix."""
    mat = np.ones((len(LANGS), N_BUCKETS), dtype=np.float64)  # add-one smoothing
    seeds = {lang: " ".join(words) for lang, words in synth.WORD_POOLS.items()}
    seeds["zh"] = synth.ZH_CHARS
    for lang, seed_text in seeds.items():
        # pad words so boundary trigrams are represented
        padded = " " + seed_text + " "
        mat[_LANG_INDEX[lang]] += _bucket_counts(padded) * 20.0
    mat /= mat.sum(axis=1, keepdims=True)
    return np.log(mat)


PROFILES = _build_profiles()


def scores_for_text(text: str) -> np.ndarray:
    """Per-language mean log-likelihood of the document's trigrams.

    Sparse gather instead of a dense (n_langs x N_BUCKETS) matmul: a doc
    touches ~len(text) buckets, so summing the touched profile columns is
    ~(N_BUCKETS/len) times cheaper than multiplying the whole matrix."""
    buckets = _trigram_buckets(text or "")
    if buckets.size == 0:
        return np.zeros(len(LANGS))
    if buckets.size > N_BUCKETS:
        # long documents: the gather's (n_langs x n_trigrams) temporary
        # would grow unbounded with text length; the dense bincount path is
        # both smaller (fixed ~1 MB) and faster once n_trigrams > N_BUCKETS
        counts = np.bincount(buckets, minlength=N_BUCKETS).astype(np.float64)
        return (PROFILES @ counts) / buckets.size
    return PROFILES[:, buckets].sum(axis=1) / buckets.size


def predict(text: str) -> tuple[str, float]:
    """(language, confidence margin). Margin = best minus runner-up score.

    Texts with no trigrams (empty / under 3 chars) abstain with ("und", 0.0)
    rather than reporting an arbitrary language at zero margin. The
    no-trigram case is detected from the scores themselves (all-zero; any
    real trigram makes every log-prob sum strictly negative) so the text is
    hashed exactly once."""
    s = scores_for_text(text)
    if not s.any():
        return "und", 0.0
    order = np.argsort(s)
    best, runner = order[-1], order[-2]
    return LANGS[int(best)], float(s[best] - s[runner])


def predict_batch(texts) -> list[str]:
    """Vectorized-per-batch prediction over an iterable of strings."""
    return [predict(t or "")[0] for t in texts]
