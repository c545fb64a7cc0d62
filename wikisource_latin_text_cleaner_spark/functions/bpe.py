"""Byte-pair-encoding tokenizer: distributed word counts -> local merge
training -> distributed application.

This is the production shape for BPE at corpus scale (used by the original
BPE/GPT-2 pipelines): the word-frequency table is broadcast-sized even for
a 10^12-doc corpus (vocabulary grows ~O(sqrt) of tokens), so training runs
driver-side over (word, count) pairs while both the counting and the
tokenization are distributed. No dependency, deterministic.

  train:  segment.vocabulary(df) -> collect (bounded top_words) ->
          iterative most-frequent-pair merging over the weighted word dict
  apply:  merges list captured in an Arrow UDF closure (broadcast analog)
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

#: end-of-word marker (GPT-2 style uses start-of-word spaces; marker keeps
#: the implementation symmetrical and printable)
EOW = "</w>"


def _pair_counts(vocab: dict[tuple, int]) -> dict[tuple, int]:
    counts: dict[tuple, int] = {}
    for symbols, freq in vocab.items():
        for pair in zip(symbols, symbols[1:]):
            counts[pair] = counts.get(pair, 0) + freq
    return counts


def _merge_vocab(vocab: dict[tuple, int], pair: tuple) -> dict[tuple, int]:
    a, b = pair
    merged = a + b
    out: dict[tuple, int] = {}
    for symbols, freq in vocab.items():
        new: list = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                new.append(merged)
                i += 2
            else:
                new.append(symbols[i])
                i += 1
        out[tuple(new)] = out.get(tuple(new), 0) + freq
    return out


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 200,
    top_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from the corpus word-frequency table.

    Only the (word, count) table crosses to the driver -- bounded by
    ``top_words`` (ordered by count, then word, so training is
    deterministic regardless of partitioning).
    """
    from ..operators.segment import vocabulary

    rows = (
        vocabulary(df, text_col=text_col, id_col=id_col, top_n=top_words,
                   doc_counts=False)
        .select("word", "n_occurrences")
        .collect()
    )
    vocab: dict[tuple, int] = {}
    for r in rows:
        for w in _WORD_RE.findall(r["word"]):
            key = tuple(w) + (EOW,)
            vocab[key] = vocab.get(key, 0) + r["n_occurrences"]

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # deterministic tie-break: count desc, then lexicographic
        best = max(counts, key=lambda p: (counts[p], (p[0], p[1])))
        if counts[best] < 2:
            break
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def _encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    symbols: list = list(word) + [EOW]
    while len(symbols) > 1:
        pairs = list(zip(symbols, symbols[1:]))
        ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
        if not ranked:
            break
        _, i = min(ranked)
        symbols = symbols[:i] + [symbols[i] + symbols[i + 1]] + symbols[i + 2:]
    return symbols


def make_bpe_udfs(merges: list[tuple[str, str]]):
    """(tokenize_udf, token_count_udf) applying the learned merges.

    The merge table rides in the closure (broadcast analog); per-word
    encodings are memoized per Python worker."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    cache: dict[str, list[str]] = {}
    _CACHE_CAP = 1 << 20  # bound per-worker memory on open-vocabulary corpora

    def encode_text(text: str) -> list[str]:
        out: list[str] = []
        for w in _WORD_RE.findall((text or "").lower()):
            got = cache.get(w)
            if got is None:
                got = _encode_word(w, ranks)
                if len(cache) < _CACHE_CAP:
                    cache[w] = got
            out.extend(got)
        return out

    @F.pandas_udf(ArrayType(StringType()))
    def tokenize_udf(texts: pd.Series) -> pd.Series:
        return texts.map(encode_text)

    @F.pandas_udf(IntegerType())
    def token_count_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: len(encode_text(t)))

    return tokenize_udf, token_count_udf
