"""Query/operator registry — the contract surface checked by the driver.

Every operator from SURVEY.md §2 that is expressible as a query over the
TESTDATA tables gets a ``QuerySpec`` here: a Spark callable plus (where
SQL-expressible) the equivalent DuckDB oracle SQL. The driver runs both at
sf0.01 and hash-compares values; ``__spark_entry__.py`` re-exports this
registry.

HARD CAP: the driver grades only the FIRST 50 registry entries (in
registration order — import order in ``load_all`` below). Keep the total
at <= 50; consolidate related operators into one query rather than letting
entries fall off the graded window.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry."""
    from . import relational  # noqa: F401
    from . import text  # noqa: F401
    from . import similarity  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import extended  # noqa: F401
    from . import pipeline  # noqa: F401

    return REGISTRY
