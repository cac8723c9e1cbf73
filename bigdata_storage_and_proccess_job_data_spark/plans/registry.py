"""Query registry.

Each implemented operator from SURVEY.md §2 registers here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- an equivalent DuckDB oracle SQL string (or None for non-SQL-expressible
  ops, which get the driver's weaker rows-only check)
- tags (operator family) and an optional ``headline`` flag (bench.py runs
  headline queries at sf0.1).

Determinism/parity rules every registered query follows:
- every computed column is aliased identically in Spark and SQL;
- floating-point aggregates are rounded identically on both sides
  (ROUND(x, 2..4)) so summation-order ULP noise can't flip the driver's
  value hash;
- counts are BIGINT on both sides (DuckDB SUM(int) yields HUGEINT --
  always CAST);
- any top-k / dedup winner is made deterministic with an explicit
  tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QueryDef"] = {}


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    headline: bool = False
    doc: str = ""


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    headline: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QueryDef(
            name=name,
            fn=fn,
            oracle=oracle,
            tags=tuple(tags),
            headline=headline,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: qd.fn for name, qd in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _REGISTRY.items() if qd.oracle}


def headline_queries() -> dict[str, QueryDef]:
    return {name: qd for name, qd in _REGISTRY.items() if qd.headline}
