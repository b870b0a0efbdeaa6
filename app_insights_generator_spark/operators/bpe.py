"""Byte-pair-encoding tokenizer: distributed training + tokenization.

The LLM-pipeline op the token-counting heuristics (operators/text.py
bpe_token_count) approximate: actually LEARN the merge table from the
corpus, then tokenize with it.

Scale split (the same bounded-driver-state pattern as IVF's sampled
k-means, similarity.py):
- the CORPUS-scale work — word frequency counting and final
  tokenization — is distributed (one groupBy; one mapInPandas with the
  merge table broadcast);
- the merge-learning loop runs driver-side over the DISTINCT-WORD
  frequency table, which is vocabulary-bounded (this is how production
  BPE trainers work too: HuggingFace/SentencePiece train single-node on
  word counts, not on the corpus). ``max_word_table`` caps the pull and
  raises loudly if the vocabulary exceeds it rather than silently
  OOMing the driver.

Determinism: merge choice ties break lexicographically on the pair, so
the learned table is a pure function of the word-frequency table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

END = "</w>"  # end-of-word marker, standard BPE


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """[word, freq] — the one corpus-scale pass (explode + groupBy with
    map-side partial counts)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_word(symbols: tuple, pair: tuple[str, str]) -> tuple:
    out, i, n = [], 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe(
    word_freq: DataFrame,
    n_merges: int = 10,
    max_word_table: int = 1_000_000,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges -> [(left, right, pair_count), ...]
    in rank order. Pulls the distinct-word table to the driver (bounded,
    checked) and runs the classic merge loop there."""
    n_words = word_freq.count()
    if n_words > max_word_table:
        raise ValueError(
            f"word table has {n_words} rows > max_word_table={max_word_table}; "
            "raise the cap deliberately or pre-prune the vocabulary"
        )
    vocab: dict[tuple, int] = {}
    for r in word_freq.collect():
        vocab[tuple(r["word"]) + (END,)] = vocab.get(tuple(r["word"]) + (END,), 0) + int(r["freq"])
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # max count, ties broken lexicographically -> deterministic
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        merges.append((a, b, c))
        vocab = {
            _merge_word(syms, (a, b)): f for syms, f in vocab.items()
        }
    return merges


def _apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms: tuple = tuple(word) + (END,)
    for a, b in merges:
        syms = _merge_word(syms, (a, b))
    return list(syms)


def tokenize_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed tokenization with a learned merge table: Arrow-batched
    mapInPandas, merge list shipped in the closure (broadcast-sized by
    construction: n_merges entries). Output: [id, n_words, n_tokens,
    n_chars] per document — token ids are positions in the implied vocab;
    counts are what the curation pipeline consumes."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_words", LongType()),
            StructField("n_tokens", LongType()),
            StructField("n_chars", LongType()),
        ]
    )
    pairs = [(a, b) for a, b, _ in merges] if merges and len(merges[0]) == 3 else merges

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in it:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in str(text).split(" ") if w]
                n_tok = 0
                for w in words:
                    if w not in cache:
                        cache[w] = len(_apply_merges(w, pairs))
                    n_tok += cache[w]
                rows.append(
                    (int(did), len(words), n_tok, sum(len(w) for w in words))
                )
            yield pd.DataFrame(rows, columns=[id_col, "n_words", "n_tokens", "n_chars"])

    return df.select(id_col, text_col).mapInPandas(batches, schema=schema)
