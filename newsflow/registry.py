"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers a named query here,
optionally with a DuckDB-runnable ANSI-SQL oracle. ``__spark_entry__.py``
exposes this registry to the correctness driver; ``tests/test_oracle_parity``
replays the same comparison locally.

Column-name parity rule: the driver sorts result columns by name before
hashing, so every computed column is aliased identically in the Spark
builder and the oracle SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "newsflow.ops.relational",
    "newsflow.ops.joins",
    "newsflow.ops.windows",
    "newsflow.ops.subqueries",
    "newsflow.ops.sampling",
    "newsflow.functions.scalars_queries",
    "newsflow.functions.text_queries",
    "newsflow.dedup.queries",
    "newsflow.sim.queries",
    "newsflow.streaming.queries",
    "newsflow.etl.queries",
    "newsflow.ml.queries",
    "newsflow.nlp.queries",
    "newsflow.multimodal.queries",
    "newsflow.curation",
)


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def _load_all_modules() -> None:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            # Module not built yet (incremental rounds) — skip.
            pass


def all_specs() -> dict[str, QuerySpec]:
    _load_all_modules()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.build for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle
    }
