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
    checked) and trains INCREMENTALLY: a pair->count table, a
    pair->containing-words index, and a lazy-invalidation max-heap, so
    each merge touches only the words containing the chosen pair instead
    of rescanning the vocabulary — the production trainer shape
    (HuggingFace/SentencePiece), O(affected updates * log pairs) per
    merge instead of the naive O(vocab) rescan, which made 30k-merge
    vocabularies impractical (r05 verdict note). Output is bit-identical
    to the naive loop: max count, ties broken lexicographically on the
    pair (the heap key (-count, pair) induces exactly that order;
    stale entries are re-validated against the live count at pop time).
    """
    import heapq

    n_words = word_freq.count()
    if n_words > max_word_table:
        raise ValueError(
            f"word table has {n_words} rows > max_word_table={max_word_table}; "
            "raise the cap deliberately or pre-prune the vocabulary"
        )
    vocab: dict[tuple, int] = {}
    for r in word_freq.collect():
        key = tuple(r["word"]) + (END,)
        vocab[key] = vocab.get(key, 0) + int(r["freq"])

    words: list[list] = [[syms, f] for syms, f in vocab.items()]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, f) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        cur = pair_counts.get(best, 0)
        if cur <= 0:
            continue
        if -negc != cur:
            # Stale priority: re-enter at the live count so a decreased
            # pair is never lost, then re-select.
            heapq.heappush(heap, (-cur, best))
            continue
        merges.append((best[0], best[1], cur))
        touched: set[tuple[str, str]] = set()
        for wi in pair_words.pop(best, ()):
            syms, f = words[wi]
            old_pairs = list(zip(syms, syms[1:]))
            if best not in old_pairs:
                continue  # stale index entry (word already rewritten)
            for p in old_pairs:
                pair_counts[p] -= f
                touched.add(p)
            new_syms = _merge_word(syms, best)
            words[wi][0] = new_syms
            for p in zip(new_syms, new_syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(wi)
                touched.add(p)
        pair_counts.pop(best, None)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
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
