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


# --- Rotation bookkeeping (VERDICT r07 item #2) ------------------------------
#
# The driver samples only the first 50 registry entries per round. A query
# registered but never rotated into that window never earns the hard driver
# signal — and in r06 one such query (multimodal_gif_codec_features) silently
# fell off the prose checklist in SURVEY.md. These tests make the invariant
# structural: every registered query must either (a) already have a driver
# row in some committed CORRECTNESS_r*.json, (b) sit in the current 50-slot
# gate window (being rotated this round), or (c) be listed in
# queries/__init__.py's ROTATION_NEXT for the next round's window.


def _driver_sampled_names():
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            names.update(json.load(open(f)))
        except Exception:  # noqa: BLE001 — a malformed artifact must not hide queries
            continue
    return names


def test_never_sampled_queries_are_windowed_or_on_rotation_checklist():
    from app_insights_generator_spark.queries import ROTATION_NEXT

    sampled = _driver_sampled_names()
    if not sampled:  # fresh clone without driver artifacts — nothing to pin
        import pytest

        pytest.skip("no CORRECTNESS_r*.json artifacts present")
    window = set(list(QUERIES)[:50])
    orphans = [
        n
        for n in QUERIES
        if n not in sampled and n not in window and n not in ROTATION_NEXT
    ]
    assert not orphans, (
        "registered queries with no driver row, not in the current gate "
        "window, and missing from ROTATION_NEXT — append them to "
        f"ROTATION_NEXT in queries/__init__.py: {orphans}"
    )


def test_rotation_checklist_detector_catches_injected_orphan():
    """Self-test: an injected registered-but-unlisted query must trip the
    orphan detector (guards against the check going vacuous)."""
    from app_insights_generator_spark.queries import ROTATION_NEXT

    sampled = _driver_sampled_names()
    window = set(list(QUERIES)[:50])
    fake = "__injected_never_sampled_query__"
    assert fake not in sampled and fake not in window and fake not in ROTATION_NEXT
    names = list(QUERIES) + [fake]
    orphans = [
        n
        for n in names
        if n not in sampled and n not in window and n not in ROTATION_NEXT
    ]
    assert fake in orphans


def test_rotation_next_names_are_registered():
    from app_insights_generator_spark.queries import ROTATION_NEXT

    unknown = [n for n in ROTATION_NEXT if n not in QUERIES]
    assert not unknown, f"ROTATION_NEXT names not in the registry: {unknown}"


def test_oracle_tiers_cover_registry_with_valid_values():
    """Every registered query carries a machine-readable oracle tier
    (round 9: the sf0.01-only class lived in docstring prose before)."""
    from app_insights_generator_spark.queries import ORACLE_TIERS

    assert set(ORACLE_TIERS) == set(QUERIES)
    assert set(ORACLE_TIERS.values()) <= {"sf0.01", "sf0.1"}


def test_sf001_tier_is_exactly_the_allpairs_jaccard_family():
    """The sf0.01-only tier must stay exactly the queries whose oracle is
    the O(n^2) exact all-pairs Jaccard CTE (DuckDB measured intractable
    at sf0.1, round 8) — a new query silently joining this tier, or one
    of these silently claiming sf0.1, should be a deliberate diff here."""
    from app_insights_generator_spark.queries import ORACLE_TIERS

    got = {n for n, t in ORACLE_TIERS.items() if t == "sf0.01"}
    assert got == {
        "dedup_minhash_documents",
        "dedup_components_documents",
        "dedup_simhash_documents",
        "dedup_incremental_minhash_documents",
        "dedup_canonical_by_quality",
        "jaccard_join_prefix_documents",
        "dedup_components_star_documents",
        "dedup_rate_by_source_documents",
        "dedup_cluster_profile_documents",
        # round 12: the dedup-compaction receipt's pair truth is the same
        # O(n^2) all-pairs Jaccard CTE (attributed by later-member cut).
        "dedup_compaction_receipt_documents",
    }, got
