"""Bucketing parity with the reference's do_bucketing docstring example
(reference main.py:167-195) and backtick handling of space-named columns
(main.py:201)."""

from app_insights_generator_spark.operators.bucketing import bucketize


def test_docstring_example(spark):
    df = spark.createDataFrame([(i, i) for i in range(1, 10)], ["col1", "col2"])
    out = bucketize(df, {"col1": 2, "col2": 5})
    rows = sorted((r.col1, r.col2) for r in out.collect())
    expected = sorted(
        [(0, 0), (2, 0), (2, 0), (4, 0), (4, 5), (6, 5), (6, 5), (8, 5), (8, 5)]
    )
    assert rows == expected


def test_space_in_column_name(spark):
    df = spark.createDataFrame([(7,), (12,)], ["len screenshots"])
    out = bucketize(df, {"len screenshots": 5})
    assert sorted(r[0] for r in out.collect()) == [5, 10]
    assert out.columns == ["len screenshots"]


def test_untouched_columns_pass_through(spark):
    df = spark.createDataFrame([(3, "x")], ["n", "s"])
    out = bucketize(df, {"n": 2})
    assert out.collect()[0].asDict() == {"n": 2, "s": "x"}


def test_null_buckets_to_null(spark):
    df = spark.createDataFrame([(None,), (4,)], "n int")
    out = bucketize(df, {"n": 3})
    assert sorted(r[0] for r in out.collect() if r[0] is not None) == [3]
    assert sum(1 for r in out.collect() if r[0] is None) == 1
