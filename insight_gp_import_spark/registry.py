"""Operator registry — single source of truth for the driver contract.

Every operator from SURVEY.md §2 is registered here by its ``op id``.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry, so an operator is implemented, tested, and declared in exactly
one place.

An op with ``oracle=None`` is declared rows-only (non-SQL-expressible:
tolerant scans, sinks, approx sketches — __spark_entry__.py:36-37).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str


REGISTRY: dict[str, Op] = {}


def op(name: str, oracle: str | None = None, category: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register an operator. ``oracle`` is the DuckDB twin SQL (or None)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate op id {name!r}")
        REGISTRY[name] = Op(name=name, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


def load_all_ops() -> dict[str, Op]:
    """Import every operator module so REGISTRY is fully populated."""
    import insight_gp_import_spark.operators  # noqa: F401  (side-effect imports)

    return REGISTRY
