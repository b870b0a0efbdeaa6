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
