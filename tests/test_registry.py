"""Registry invariants: the driver gates the FIRST 50 registered queries,
so the front of the registry must stay fully oracled and capability-dense."""

from app_insights_generator_spark.queries import ORACLES, QUERIES


def test_gate_window_is_fully_oracled():
    """Every query in the driver's 50-entry gate window must carry oracle
    SQL — a rows-only query there wastes a hard-signal slot."""
    window = list(QUERIES)[:50]
    missing = [n for n in window if n not in ORACLES]
    assert not missing, f"rows-only queries in the gate window: {missing}"


def test_no_rows_only_queries():
    """Every registered query carries an oracle (invariant framing at
    minimum). The un-anchorable raw-LSH bench twin is deliberately NOT
    registered (bench.py times it directly; its invariant twin
    similarity_join_lsh_embeddings is the gated one)."""
    rows_only = [n for n in QUERIES if n not in ORACLES]
    assert rows_only == [], rows_only


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def _duckdb_with_views():
    import os

    import duckdb

    from app_insights_generator_spark.sources.readers import TPCH_TABLES

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        path = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


# Final-column types the driver's fetch path cannot gate. Two defect
# classes, seven reds across r03–r06, every one invisible to fetchall()-
# based local checks:
#   (1) HUGEINT/UHUGEINT — pandas fetch coerces to float64, so an integer
#       sum 7500 renders "7500.0" and hash-mismatches Spark's "7500" with
#       rows AND schema still matching (six reds, r03–r05).
#   (2) non-scalar finals (list/struct/map) — the driver's canonicalizer
#       lexsorts every column via pandas Categorical/factorize, which
#       raises `TypeError: unhashable type: 'list'` on list cells
#       (inverted_index_documents, r06). DuckDB renders these types with
#       `[]` / `STRUCT(` / `MAP(` in DESCRIBE output.
# DESCRIBE is a bind-only operation, so this covers all oracles in ~seconds.
_DRIVER_UNSAFE = {"HUGEINT", "UHUGEINT"}


def _driver_unsafe(duck_type: str) -> bool:
    ty = duck_type.upper()
    return (
        ty in _DRIVER_UNSAFE
        or "[]" in ty
        or ty.startswith("STRUCT(")
        or ty.startswith("MAP(")
    )


def test_no_oracle_emits_driver_unsafe_types():
    con = _duckdb_with_views()
    bad = {}
    for name, sql in ORACLES.items():
        try:
            cols = con.execute("DESCRIBE " + sql).fetchall()
        except Exception as e:  # noqa: BLE001
            bad[name] = f"DESCRIBE failed: {e}"[:200]
            continue
        unsafe = [(c, ty) for c, ty, *_ in cols if _driver_unsafe(ty)]
        if unsafe:
            bad[name] = unsafe
    assert not bad, (
        "oracle final columns the driver's fetch/canonicalizer cannot gate — "
        "CAST HUGEINT sums to BIGINT; render arrays/structs/maps as strings "
        f"(array_to_string / to_json): {bad}"
    )


def test_unsafe_type_detector_catches_uncast_sum():
    """Self-test: an injected bare integer SUM must be flagged (DuckDB types
    it HUGEINT) — guards against a silent DuckDB behavior change making the
    registry test vacuous."""
    con = _duckdb_with_views()
    cols = con.execute(
        "DESCRIBE SELECT SUM(r_regionkey) AS s FROM region"
    ).fetchall()
    assert any(_driver_unsafe(ty) for _, ty, *_ in cols)


def test_unsafe_type_detector_catches_nonscalar_finals():
    """Self-test for defect class (2): injected list / struct / map final
    columns must all be flagged — the driver's pandas canonicalizer dies
    on any of them (r06 `unhashable type: 'list'` red)."""
    con = _duckdb_with_views()
    cols = con.execute(
        "DESCRIBE SELECT list(r_regionkey) AS l, "
        "{'k': r_name} AS s, MAP([r_name], [r_regionkey]) AS m "
        "FROM region GROUP BY r_name, r_regionkey"
    ).fetchall()
    flagged = [c for c, ty, *_ in cols if _driver_unsafe(ty)]
    assert sorted(flagged) == ["l", "m", "s"], cols
