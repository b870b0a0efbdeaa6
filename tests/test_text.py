"""Text operators (operators/text.py): tokens, lang-id, quality,
fingerprint, shingles."""

from pyspark.sql import functions as F

from app_insights_generator_spark.operators import text as T


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], ["t"]).select(expr.alias("v")).first().v


def test_token_count(spark):
    assert _one(spark, "a b  c", T.token_count(F.col("t"))) == 3
    assert _one(spark, "   ", T.token_count(F.col("t"))) == 0
    assert _one(spark, "", T.token_count(F.col("t"))) == 0


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog of the house", T.lang_id(F.col("t"))) == "en"
    assert _one(spark, "der hund und die katze ist da", T.lang_id(F.col("t"))) == "de"
    assert _one(spark, "le chat et la maison est grande", T.lang_id(F.col("t"))) == "fr"
    assert _one(spark, "el gato es una casa los perros", T.lang_id(F.col("t"))) == "es"
    assert _one(spark, "xyzzy plugh", T.lang_id(F.col("t"))) == "und"
    # tie between en and de markers -> first declared (en) wins
    assert _one(spark, "the und", T.lang_id(F.col("t"))) == "en"


def test_fingerprint_normalization(spark):
    a = _one(spark, "Hello   World", T.fingerprint_md5(F.col("t")))
    b = _one(spark, "  hello world ", T.fingerprint_md5(F.col("t")))
    c = _one(spark, "hello worlds", T.fingerprint_md5(F.col("t")))
    assert a == b != c


def test_shingles(spark):
    got = _one(spark, "a b c d", T.shingles(F.col("t"), 3))
    assert got == ["a b c", "b c d"]
    # short doc -> single full-text shingle
    assert _one(spark, "a b", T.shingles(F.col("t"), 3)) == ["a b"]


def test_occurrences_and_quality(spark):
    assert _one(spark, " the x the ", T.occurrences(F.col("t"), " the ")) == 2
    long_clean = " ".join(["the quick brown fox jumps"] * 5)
    assert _one(spark, long_clean, T.quality_score(F.col("t"))) == 1.0
    assert _one(spark, "!!!", T.quality_score(F.col("t"))) == 0.0


def test_bpe_token_count(spark):
    df = spark.createDataFrame(
        [("don't stop!",), ("abc123",), ("",)], ["text"]
    )
    got = [r.n for r in df.select(T.bpe_token_count(F.col("text")).alias("n")).collect()]
    # don|'|t|stop|! , abc|123 , empty
    assert got == [5, 2, 0]


def test_fingerprint_rolling_deterministic_and_normalized(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("other",)], ["text"]
    )
    got = [r.h for r in df.select(T.fingerprint_rolling(F.col("text")).alias("h")).collect()]
    assert got[0] == got[1]  # normalization collapses case/whitespace
    assert got[0] != got[2]
    h = 0
    for ch in "hello world":
        h = (h * 31 + ord(ch)) % (2**31 - 1)
    assert got[0] == h


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            ("mail a.b+c@x-corp.io or d@e.org today",),
            ("call 555-123-4567 or 555.987.6543",),
            ("host 192.168.1.255 gateway 10.0.0.1",),
            ("mixed: u@v.com 555-000-1111 127.0.0.1",),
            ("clean text, no pii at all",),
            ("not-an-ip 1234.5.6.7890 not-a-phone 12-34-5678",),
        ],
        ["text"],
    )
    out = df.select(
        T.pii_count(F.col("text"), "email").alias("e"),
        T.pii_count(F.col("text"), "phone").alias("p"),
        T.pii_count(F.col("text"), "ipv4").alias("i"),
        T.redact_pii(F.col("text")).alias("red"),
    ).collect()
    assert [(r.e, r.p, r.i) for r in out] == [
        (2, 0, 0),
        (0, 2, 0),
        (0, 0, 2),
        (1, 1, 1),
        (0, 0, 0),
        (0, 0, 0),
    ]
    assert out[0].red == "mail [EMAIL] or [EMAIL] today"
    assert out[1].red == "call [PHONE] or [PHONE]"
    assert out[2].red == "host [IP] gateway [IP]"
    assert out[3].red == "mixed: [EMAIL] [PHONE] [IP]"
    assert out[5].red == "not-an-ip 1234.5.6.7890 not-a-phone 12-34-5678"


def test_repetition_gram_stats_hand_corpus(spark):
    """Gopher repetition metrics on hand-computable documents: an all-
    repeated doc pins both shares at 100%, an all-distinct doc pins the
    top share at 1/total and the dup share at 0, and a doc too short for
    an n-gram is omitted."""
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # 2-grams: 'a a' x3 -> top=dup=10000
            (2, "a b c d"),          # 3 distinct 2-grams -> top=3333, dup=0
            (3, "a b a b a"),        # 'a b' x2, 'b a' x2 -> top=5000, dup=10000
            (4, "solo"),             # 1 token: no 2-grams, omitted
        ],
        ["doc_id", "text"],
    )
    from app_insights_generator_spark.operators.text import repetition_gram_stats

    out = {
        r.doc_id: (r.n2, r.top2_bp, r.dup2_bp)
        for r in repetition_gram_stats(df, "doc_id", "text", 2).collect()
    }
    assert out == {1: (3, 10000, 10000), 2: (3, 3333, 0), 3: (4, 5000, 10000)}

    out3 = {
        r.doc_id: (r.n3, r.top3_bp, r.dup3_bp)
        for r in repetition_gram_stats(df, "doc_id", "text", 3).collect()
    }
    # doc1: 'a a a' x2 -> 10000/10000; doc2: 2 distinct -> 5000/0;
    # doc3: 'a b a' x2? 3-grams: aba, bab, aba -> top 6666, dup 6666
    assert out3 == {1: (2, 10000, 10000), 2: (2, 5000, 0), 3: (3, 6666, 6666)}


def test_split_assignments_pinned(spark, sf_dir):
    """Pin the deterministic sha-bucket assignments at sf0.001 so any
    refactor of the bucket expression that CHANGES assignment (vs merely
    re-expressing it) fails here before it reaches the gate. The
    train/val/test split and the stratified sample share the bucket
    primitive; both engines re-derive it independently in the oracle."""
    from app_insights_generator_spark.queries.trainprep_queries import (
        stratified_sample_documents,
        train_val_test_split_documents,
    )

    split = {
        r.split: r.n_docs
        for r in train_val_test_split_documents(spark, sf_dir).collect()
    }
    # Exact pinned assignment at sf0.001 (500 docs): any change here means
    # the split CHANGED, i.e. existing dataset versions would leak.
    assert split == {"train": 407, "val": 33, "test": 60}

    strat = {
        r.lang: (r.n_total, r.n_kept)
        for r in stratified_sample_documents(spark, sf_dir).collect()
    }
    assert sum(v[0] for v in strat.values()) == 500
    for lang, (n_total, n_kept) in strat.items():
        assert 0 <= n_kept <= n_total
    # Acceptance is by doc hash at per-lang rates: en keeps ~80%, zh ~10%.
    assert strat["en"][1] >= strat["en"][0] // 2
    assert strat["zh"][1] <= strat["zh"][0] // 3


def test_disc_percentiles_preagg_equals_row_level(spark, sf_dir):
    """The pre-aggregated histogram path (the 100 TB form) must return
    byte-identical percentiles to the row-level window form the gate
    checks — same ceil(q*n) rank selection, different physical shape."""
    from app_insights_generator_spark.operators.text import (
        disc_percentiles_from_counts,
    )
    from app_insights_generator_spark.queries.llm_queries import (
        length_percentiles_by_source,
    )
    from app_insights_generator_spark.sources import load_table

    row_level = {
        r.source: (r.n_docs, r.p10_tokens, r.p50_tokens, r.p90_tokens)
        for r in length_percentiles_by_source(spark, sf_dir).collect()
    }

    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != F.lit(""))
    ).cast("long")
    counts = (
        docs.select("source", toks.alias("n_tokens"))
        .groupBy("source", "n_tokens")
        .count()
    )
    preagg = {
        r.source: (r.n_rows, r.p10_n_tokens, r.p50_n_tokens, r.p90_n_tokens)
        for r in disc_percentiles_from_counts(
            counts, "source", "n_tokens", "count"
        ).collect()
    }
    assert preagg == row_level


def test_c4_line_profile_rules(spark):
    docs = spark.createDataFrame(
        [
            # 3 lines: kept, dropped (2 words), dropped (no terminal punct)
            (1, "The cat sat down.\nToo short.\nno punctuation here at all"),
            # banned markers and brace page
            (2, "Accept our cookie policy now.\nvar x = { a: 1 };\nThis one is fine!"),
            # multi-sentence single line + quote terminal
            (3, 'He said "stop here."\nOne. Two. Three. Four sentences here.'),
            # degenerate: no newline, no punctuation (the parquet corpus shape)
            (4, "word soup with no punctuation"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )
    from app_insights_generator_spark.operators.text import c4_line_profile

    rows = {
        r.doc_id: r for r in c4_line_profile(docs, "doc_id", "text").collect()
    }
    assert rows[1].n_lines == 3 and rows[1].n_kept_lines == 1
    assert rows[1].n_sentences == 1 and not rows[1].has_brace
    # line 1 banned (cookie policy), line 2 banned ({ + brace page), line 3 kept
    assert rows[2].n_kept_lines == 1 and rows[2].has_brace
    assert rows[3].n_kept_lines == 2
    # 'He said "stop here."' has 1 '.', the second line has 4 terminals
    assert rows[3].n_sentences == 5
    assert rows[4].n_lines == 1 and rows[4].n_kept_lines == 0
    assert rows[5].n_kept_lines == 0 and rows[5].kept_chars == 0


def test_ngram_novelty_invariants(spark, sf_dir):
    """Corpus-level conservation: every distinct gram is 'new' in exactly
    one document, so sum(n_new) == global distinct gram count; the
    lowest doc_id is all-new by construction."""
    from pyspark.sql import functions as F

    from app_insights_generator_spark.operators.text import shingles
    from app_insights_generator_spark.queries.llm_queries import (
        ngram_novelty_documents,
    )
    from app_insights_generator_spark.sources import load_table

    out = ngram_novelty_documents(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_distinct = (
        docs.select(F.explode(F.array_distinct(shingles(F.col("text"), 3))))
        .distinct()
        .count()
    )
    assert sum(r.n_new for r in out) == n_distinct
    first = min(out, key=lambda r: r.doc_id)
    assert first.n_new == first.n_grams and first.novelty_bp == 10000
    assert all(0 <= r.novelty_bp <= 10000 for r in out)


def test_tfidf_neighbors_duplicate_ranks_first(spark):
    """A verbatim duplicate of a panel doc must be its #1 neighbor at
    cos 1.0; an unrelated doc must not outrank related ones."""
    import tempfile

    from app_insights_generator_spark.queries.llm_queries import (
        tfidf_neighbors_documents,
    )

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "omega psi chi phi upsilon tau"),
        (100, "alpha beta gamma delta epsilon zeta"),      # dup of 0
        (101, "alpha beta gamma something else entirely"), # partial of 0
        (102, "omega psi chi unrelated trailing words"),   # partial of 1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        got = {
            (r.qid, r.rank): (r.cid, r.cos_sim)
            for r in tfidf_neighbors_documents(spark, d).collect()
        }
    assert got[(0, 1)][0] == 100 and abs(got[(0, 1)][1] - 1.0) < 1e-6
    assert got[(0, 2)][0] == 101
    assert got[(1, 1)][0] == 102


def test_heaps_vocab_growth_conservation(spark, sf_dir):
    """The growth curve must conserve totals: final cum_types == corpus
    distinct-type count, final cum_tokens == total token count, both
    cumulative columns strictly monotone non-decreasing, and new_types
    sums to the vocabulary size."""
    from pyspark.sql import functions as F

    from app_insights_generator_spark.operators import text as T
    from app_insights_generator_spark.queries.analytic_queries import (
        heaps_vocab_growth_documents,
    )
    from app_insights_generator_spark.sources import load_table

    rows = sorted(
        heaps_vocab_growth_documents(spark, sf_dir).collect(),
        key=lambda r: r.batch,
    )
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(T.tokens(T.normalized_text(F.col("text")))).alias("term")
    )
    n_types = tok.select("term").distinct().count()
    n_tokens = tok.count()
    assert rows[-1].cum_types == n_types
    assert rows[-1].cum_tokens == n_tokens
    assert sum(r.new_types for r in rows) == n_types
    for a, b in zip(rows, rows[1:]):
        assert b.cum_types >= a.cum_types and b.cum_tokens > a.cum_tokens


def test_bigram_nll_matches_naive_float_scoring(spark, sf_dir):
    """Recompute doc NLL driver-side with float math on the same corpus
    counts: the quantized-integer score must land within the bucket
    quantization error (|p - b/1024| <= 1/1024 -> nll within
    ln(1025/(b+1)) - ln((b+2)/1025) of a bucket step) of the true mean
    NLL — i.e. mean absolute deviation under 3% relative. Also: every
    2+-token document scored exactly once, nll strictly positive."""
    import math
    from collections import Counter, defaultdict

    from app_insights_generator_spark.queries.llm_queries import (
        bigram_nll_quality_documents,
    )
    from app_insights_generator_spark.operators import text as T
    from app_insights_generator_spark.sources import load_table
    from pyspark.sql import functions as F

    toks = {
        r.doc_id: r.toks
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", T.tokens(T.normalized_text(F.col("text"))).alias("toks"))
        .collect()
    }
    c2, c1 = Counter(), Counter()
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    got = {r.doc_id: r for r in bigram_nll_quality_documents(spark, sf_dir).collect()}
    assert set(got) == {d for d, ts in toks.items() if len(ts) >= 2}
    rel_errs = []
    for d, ts in toks.items():
        if len(ts) < 2:
            continue
        true_nll = [
            -math.log(c2[(a, b)] / c1[a]) for a, b in zip(ts, ts[1:])
        ]
        r = got[d]
        assert r.n_bigrams == len(true_nll)
        assert r.avg_nll_ppm > 0
        truth_ppm = sum(true_nll) / len(true_nll) * 1e6
        if truth_ppm > 0:
            rel_errs.append(abs(r.avg_nll_ppm - truth_ppm) / max(truth_ppm, 1))
    assert sum(rel_errs) / len(rel_errs) < 0.03, sum(rel_errs) / len(rel_errs)


def test_cohens_kappa_matches_python_recompute(spark, sf_dir):
    """The kappa gate row must equal a pure-Python recomputation from the
    two labelers' own outputs (pins the integer-bp formula, including the
    truncation direction, against an independent implementation)."""
    from app_insights_generator_spark.queries.llm_queries import (
        cohens_kappa_quality_documents,
        gopher_quality_rules_documents,
        quality_linear_scores_documents,
    )

    gk = {
        r.doc_id: r.ok_word_count
        for r in gopher_quality_rules_documents(spark, sf_dir).collect()
    }
    lk = {
        r.doc_id: r.keep
        for r in quality_linear_scores_documents(spark, sf_dir).collect()
    }
    n11 = sum(1 for d in gk if gk[d] and lk[d])
    n10 = sum(1 for d in gk if gk[d] and not lk[d])
    n01 = sum(1 for d in gk if not gk[d] and lk[d])
    n00 = sum(1 for d in gk if not gk[d] and not lk[d])
    n = len(gk)
    e = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)

    def tdiv(a, b):  # truncate toward zero, the Spark DIV / DuckDB // law
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    row = cohens_kappa_quality_documents(spark, sf_dir).collect()[0]
    assert (row.n, row.n11, row.n10, row.n01, row.n00) == (n, n11, n10, n01, n00)
    assert row.po_bp == tdiv((n11 + n00) * 10000, n)
    assert row.pe_bp == tdiv(e * 10000, n * n)
    want_kappa = 0 if n * n == e else tdiv((n * (n11 + n00) - e) * 10000, n * n - e)
    assert row.kappa_bp == want_kappa
    assert -10000 <= row.kappa_bp <= 10000


def test_mutual_information_matches_python_recompute(spark, sf_dir):
    """The quantized-entropy rows must equal a pure-Python recomputation
    through the same 1/1024 log table, and behave like entropies:
    non-negative, H(joint) <= H(x) + H(y), MI row = the combination."""
    import math
    from collections import Counter

    from app_insights_generator_spark.queries.llm_queries import (
        _IDF_PPM_1024,
        mutual_information_source_lang_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n = len(docs)
    cx = Counter(d.source for d in docs)
    cy = Counter(d.lang for d in docs)
    cxy = Counter((d.source, d.lang) for d in docs)

    def h(counter):
        return sum(
            (c * 1000000 // n) * _IDF_PPM_1024[c * 1024 // n]
            for c in counter.values()
        )

    got = {
        r.component: r.value_ppm2
        for r in mutual_information_source_lang_documents(spark, sf_dir).collect()
    }
    assert got["h_source_ppm2"] == h(cx)
    assert got["h_lang_ppm2"] == h(cy)
    assert got["h_joint_ppm2"] == h(cxy)
    assert got["mi_ppm2"] == h(cx) + h(cy) - h(cxy)
    assert got["h_joint_ppm2"] <= got["h_source_ppm2"] + got["h_lang_ppm2"]
    # quantized entropy stays within ~2 bucket-widths of the true value
    true_hx = -sum(c / n * math.log(c / n) for c in cx.values()) * 1e12
    assert abs(got["h_source_ppm2"] - true_hx) < 0.02e12


def test_roc_auc_matches_sklearn_free_recompute(spark, sf_dir):
    """AUC row must equal the pairwise-comparison definition computed in
    pure Python (wins + half-ties over n_pos*n_neg) — the independent
    check that the doubled-midrank lattice IS the Mann-Whitney AUC."""
    from app_insights_generator_spark.queries.llm_queries import (
        gopher_quality_rules_documents,
        quality_linear_scores_documents,
        roc_auc_quality_documents,
    )

    y = {
        r.doc_id: r.ok_word_count
        for r in gopher_quality_rules_documents(spark, sf_dir).collect()
    }
    s = {
        r.doc_id: r.score_micro
        for r in quality_linear_scores_documents(spark, sf_dir).collect()
    }
    pos = [s[d] for d in y if y[d]]
    neg = [s[d] for d in y if not y[d]]
    assert pos and neg, "degenerate corpus: one class empty"
    wins2 = sum(
        2 * (p > q) + (p == q) for p in pos for q in neg
    )  # doubled to keep ties integral
    row = roc_auc_quality_documents(spark, sf_dir).collect()[0]
    assert (row.np, row.nn) == (len(pos), len(neg))
    assert row.u2_p == wins2
    assert row.auc_ppm == wins2 * 500000 // (len(pos) * len(neg))
    assert 0 <= row.auc_ppm <= 1000000


def test_lang_confusion_matrix_invariants(spark, sf_dir):
    """Confusion cells must tile the corpus (sum n == n_docs), row
    marginals must be consistent, and the predictions must agree with
    the gated per-doc lang_id operator recounted independently."""
    from collections import Counter

    from app_insights_generator_spark.operators.text import lang_id
    from app_insights_generator_spark.queries.llm_queries import (
        lang_confusion_matrix_documents,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    preds = docs.select(
        F.col("lang").alias("t"), lang_id(F.col("text")).alias("p")
    ).collect()
    want = Counter((r.t, r.p) for r in preds)
    rows = lang_confusion_matrix_documents(spark, sf_dir).collect()
    assert {(r.lang_true, r.lang_pred): r.n for r in rows} == dict(want)
    assert sum(r.n for r in rows) == docs.count()
    for r in rows:
        assert r.n_true == sum(
            n for (t, _), n in want.items() if t == r.lang_true
        )
        assert r.cell_bp == r.n * 10000 // r.n_true
