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
