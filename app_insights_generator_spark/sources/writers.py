"""Sinks.

The reference writes every batch through ``coalesce(1)`` (main.py:358, 393)
— a single-task bottleneck that cannot scale. Here single-file output is an
explicit opt-in flag; the default lets every shuffle partition write its own
file in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """CSV sink (reference write_to_csv, main.py:241-256)."""
    if single_file:
        df = df.coalesce(1)
    df.write.option("header", header).mode(mode).csv(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """JSON-lines sink (north-star surface: "DataFrame ops over CSV/JSON").
    One file per partition by default — same scale stance as write_csv."""
    if single_file:
        df = df.coalesce(1)
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
