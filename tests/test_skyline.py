"""Skyline tie semantics (queries/relational_queries.py skyline_2d).

The sf oracle run proves parity on real data; this plants the dominance
edge cases: duplicates on both axes survive together, equal-price/
smaller-size is dominated, equal-size/pricier is dominated.
"""

from __future__ import annotations

import pytest

from app_insights_generator_spark.queries.relational_queries import skyline_2d


@pytest.fixture(scope="module")
def survivors(spark):
    pts = spark.createDataFrame(
        [
            (1, 100, 10),  # frontier
            (2, 100, 10),  # exact duplicate of 1 -> neither dominates, both stay
            (3, 100, 9),  # dominated by 1 (same price, bigger size exists)
            (4, 90, 8),  # frontier (cheapest of its size class)
            (5, 110, 12),  # frontier (biggest size)
            (6, 120, 12),  # dominated by 5 (same size, cheaper exists)
            (7, 80, 8),  # dominates 4? same size, cheaper -> 4 falls off
        ],
        "p_partkey long, price_cents long, p_size long",
    )
    return {r.p_partkey for r in skyline_2d(pts).collect()}


def test_frontier_members(survivors):
    assert survivors == {1, 2, 5, 7}


def test_duplicates_survive_together(survivors):
    assert {1, 2} <= survivors


def test_dominated_rows_excluded(survivors):
    assert survivors.isdisjoint({3, 4, 6})
