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
