"""Byte-pair encoding: a real, self-contained BPE tokenizer.

Public-knowledge byte-level BPE (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"; the byte-level variant is
the GPT-2 scheme, Radford et al. 2019):

- pre-tokenize with a GPT-2-style regex (contractions, letter runs,
  digit runs, punctuation runs, whitespace — each optionally carrying
  its leading space, which is what keeps merges from crossing word
  boundaries);
- each pre-token becomes its UTF-8 byte sequence (256 base symbols, so
  NO unknown-token case exists for any input string);
- **training** repeatedly merges the globally most frequent adjacent
  symbol pair (deterministic tie-break: lexicographic on the pair), one
  merge per rank — the ranked merge list IS the vocabulary;
- **encoding** applies the lowest-rank applicable merge until none
  apply (the standard rank-greedy loop), yielding ids where 0..255 are
  raw bytes and 256+r is the r-th merge.

This fills the tokenizer seam documented in ``operators/curation.py``
(``chunk_by_tokens``) and ``operators/textstats.py``
(``bpe_ish_token_count``): training is a bounded driver-side pass over a
deterministic document sample; encoding ships the merge ranks to
executors inside Arrow-batched pandas UDFs (the vectorized slow-path
shape — never row-at-a-time Python UDFs). The UDF output (token arrays)
feeds the existing JVM-side window/explode/slice chunking expressions
unchanged.

Replaces the reference's absent tokenizer surface (the reference has no
text tokenization at all); the whitespace and regex token counters in
``textstats.py`` remain the shuffle-free JVM approximations.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

# GPT-2-style pre-tokenizer. Python's stdlib `re` lacks \p{L}/\p{N}, so
# letter/digit classes are ASCII here (non-ASCII letters fall into the
# "other" run class — still deterministic, still byte-complete).
PRETOK_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^\sA-Za-z0-9]+"
    r"|\s+(?!\S)"
    r"|\s+"
)


def pre_tokenize(text: str) -> list[str]:
    return PRETOK_RE.findall(text)


def train_bpe(texts: list[str], num_merges: int = 256) -> list[tuple[bytes, bytes]]:
    """Learn ``num_merges`` ranked merges from a training corpus.

    Classic frequency-greedy training over pre-token byte sequences,
    weighted by pre-token frequency. Ties on count break lexicographically
    on the pair bytes — fully deterministic for a fixed corpus, so the
    same sample always yields the same vocabulary on any machine.
    """
    from collections import Counter

    word_freq: Counter[tuple[bytes, ...]] = Counter()
    for t in texts:
        if not t:
            continue
        for w in pre_tokenize(t):
            b = w.encode("utf-8")
            word_freq[tuple(bytes([c]) for c in b)] += 1

    merges: list[tuple[bytes, bytes]] = []
    words: list[list[bytes]] = [list(w) for w in word_freq]
    freqs: list[int] = [word_freq[w] for w in word_freq]

    for _ in range(num_merges):
        pair_counts: Counter[tuple[bytes, bytes]] = Counter()
        for w, f in zip(words, freqs):
            for i in range(len(w) - 1):
                pair_counts[(w[i], w[i + 1])] += f
        if not pair_counts:
            break
        # max count, then lexicographically smallest pair — deterministic
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged = best[0] + best[1]
        for w in words:
            i = 0
            while i < len(w) - 1:
                if w[i] == best[0] and w[i + 1] == best[1]:
                    w[i : i + 2] = [merged]
                else:
                    i += 1
    return merges


class BpeTokenizer:
    """Rank-greedy BPE encoder over a trained merge list."""

    def __init__(self, merges: list[tuple[bytes, bytes]]):
        self.merges = list(merges)
        self.ranks: dict[tuple[bytes, bytes], int] = {
            m: r for r, m in enumerate(merges)
        }
        # id space: 0..255 raw bytes, 256+r for merge r
        self.vocab: dict[bytes, int] = {bytes([i]): i for i in range(256)}
        for r, (a, b) in enumerate(merges):
            self.vocab[a + b] = 256 + r
        self.id_to_bytes: dict[int, bytes] = {v: k for k, v in self.vocab.items()}

    def _encode_word(self, wb: bytes) -> tuple[bytes, ...]:
        return self._encode_word_cached(wb)

    @lru_cache(maxsize=65536)
    def _encode_word_cached(self, wb: bytes) -> tuple[bytes, ...]:
        parts: list[bytes] = [bytes([c]) for c in wb]
        while len(parts) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        return tuple(parts)

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for w in pre_tokenize(text):
            for sym in self._encode_word(w.encode("utf-8")):
                out.append(self.vocab[sym])
        return out

    def decode(self, ids: list[int]) -> str:
        return b"".join(self.id_to_bytes[i] for i in ids).decode(
            "utf-8", errors="replace"
        )

    def count(self, text: str) -> int:
        return sum(len(self._encode_word(w.encode("utf-8"))) for w in pre_tokenize(text))


def train_bpe_on_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_docs: int = 50,
    num_merges: int = 256,
) -> list[tuple[bytes, bytes]]:
    """Deterministic bounded training sample: the ``sample_docs`` lowest
    ids (orderBy+limit compiles to TakeOrderedAndProject — per-task
    top-k, never a corpus shuffle), collected to the driver for training.
    Vocabulary training is the one intentionally driver-side step (it is
    a tiny, bounded model fit, the same shape as collecting k-means seed
    centroids); ENCODING stays distributed."""
    rows = (
        df.select(id_col, text_col)
        .orderBy(id_col)
        .limit(sample_docs)
        .collect()
    )
    return train_bpe([r[1] or "" for r in rows], num_merges)


def bpe_token_ids(col: Column | str, merges: list[tuple[bytes, bytes]]) -> Column:
    """Arrow-batched encoder UDF: text → array<int> of BPE token ids.
    The merge table rides along as a closure constant (a few KB per
    task); per-word LRU memoization makes repeated vocabulary words
    nearly free within a batch."""
    tok = BpeTokenizer(merges)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _ids(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: tok.encode(t) if t is not None else None)

    return _ids(F.col(col) if isinstance(col, str) else col)


def bpe_token_count(col: Column | str, merges: list[tuple[bytes, bytes]]) -> Column:
    """Arrow-batched count UDF (skips materializing the id arrays when
    only the count is needed)."""
    tok = BpeTokenizer(merges)

    @F.pandas_udf(IntegerType())
    def _n(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: tok.count(t) if t is not None else None).astype(
            "Int32"
        )

    return _n(F.col(col) if isinstance(col, str) else col)


def bpe_decode(col: Column | str, merges: list[tuple[bytes, bytes]]) -> Column:
    """array<int> of token ids → text (chunk reconstruction)."""
    tok = BpeTokenizer(merges)

    @F.pandas_udf(StringType())
    def _dec(ids: pd.Series) -> pd.Series:
        return ids.map(lambda v: tok.decode(list(v)) if v is not None else None)

    return _dec(F.col(col) if isinstance(col, str) else col)
