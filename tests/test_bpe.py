"""BPE trainer/tokenizer (operators/bpe.py): exact merge tables and token
counts on hand-built corpora, cap enforcement, degenerate inputs."""

import pytest

from app_insights_generator_spark.operators.bpe import (
    END,
    _apply_merges,
    tokenize_bpe,
    train_bpe,
    word_frequencies,
)


def test_train_bpe_learns_expected_merges(spark):
    # corpus: 'ab' x3, 'abc' x2 -> pair counts round 1:
    #   (a,b)=5, (b,</w>)=3, (b,c)=2, (c,</w>)=2 -> merge1 = (a,b)
    # round 2: ('ab',</w>)=3, ('ab',c)=2, (c,</w>)=2 -> merge2 = ('ab',</w>)
    df = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "ab abc")], ["doc_id", "text"]
    )
    merges = train_bpe(word_frequencies(df, "text"), n_merges=2)
    assert [(a, b) for a, b, _ in merges] == [("a", "b"), ("ab", END)]
    assert [c for _, _, c in merges] == [5, 3]


def test_apply_merges_tokenization():
    merges = [("a", "b"), ("ab", END)]
    assert _apply_merges("ab", merges) == ["ab</w>"]
    assert _apply_merges("abc", merges) == ["ab", "c", END]
    assert _apply_merges("xy", merges) == ["x", "y", END]


def test_tokenize_bpe_counts(spark):
    df = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "ab abc")], ["doc_id", "text"]
    )
    merges = train_bpe(word_frequencies(df, "text"), n_merges=2)
    out = {r.doc_id: r for r in tokenize_bpe(df, merges, "doc_id", "text").collect()}
    # doc 1: ab(1 tok) ab(1) abc(3) = 5 tokens, 3 words, 7 chars
    assert (out[1].n_words, out[1].n_tokens, out[1].n_chars) == (3, 5, 7)
    # doc 2: ab(1) abc(3) = 4 tokens, 2 words, 5 chars
    assert (out[2].n_words, out[2].n_tokens, out[2].n_chars) == (2, 4, 5)


def test_train_bpe_word_table_cap(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="max_word_table"):
        train_bpe(word_frequencies(df, "text"), n_merges=2, max_word_table=3)


def test_train_bpe_exhausts_gracefully(spark):
    # single 1-char word: after merging (a,</w>) nothing is left to merge
    df = spark.createDataFrame([(1, "a a")], ["doc_id", "text"])
    merges = train_bpe(word_frequencies(df, "text"), n_merges=5)
    assert [(a, b) for a, b, _ in merges] == [("a", END)]


def test_incremental_trainer_matches_naive_reference(spark):
    """The heap/pair-index trainer (round 6) must produce the EXACT merge
    table of the textbook rescan loop — same max-count selection, same
    lexicographic tie-break — on a corpus large enough to exercise stale
    heap entries, overlapping repeats, and pair exhaustion."""
    import random

    from app_insights_generator_spark.operators.bpe import _merge_word

    rng = random.Random(42)
    alphabet = "abcde"
    docs = [
        (
            i,
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
                for _ in range(rng.randint(3, 30))
            ),
        )
        for i in range(80)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    wf = word_frequencies(df, "text")

    # Naive reference: full pair recount + full vocab rewrite per merge.
    vocab = {}
    for r in wf.collect():
        key = tuple(r["word"]) + (END,)
        vocab[key] = vocab.get(key, 0) + int(r["freq"])
    expected = []
    for _ in range(60):
        counts = {}
        for syms, f in vocab.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((a, b, c))
        vocab = {_merge_word(syms, (a, b)): f for syms, f in vocab.items()}

    assert train_bpe(wf, n_merges=60) == expected
