"""Query registry: name -> (Spark callable, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2) registers here as a
named query; the driver harness runs the Spark side and the oracle SQL
side-by-side at sf0.01 and hash-compares. Queries whose semantics are
not ANSI-SQL-expressible (custom stateful streaming, approximate
algorithms) register with ``oracle=None`` and get rows-only checks.

Determinism contract for oracle-paired queries (why they hash-match):

- money/metric doubles are cast to DECIMAL before SUM on BOTH sides —
  decimal addition is exact and order-independent, so shuffle order
  can't change a single bit; the final cast back to double is a single
  deterministic rounding.
- any LIMIT/top-k orders by a unique tie-break key.
- timestamps are emitted as formatted strings (session TZ pinned UTC).
- floating point that must stay float (cosine similarity) is computed
  as the same sequential left-fold in double on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str
    doc: str


def register(
    name: str, *, category: str, oracle: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle.strip() if oracle else None,
            category=category,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def specs() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    return _REGISTRY[name]


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle
    }
