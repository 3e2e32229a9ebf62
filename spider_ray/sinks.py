"""Store sink registry — the engine's user-extension surface for output
formats.

Replaces the reference's DAO plugin machinery: ``BaseDatabase`` subclasses
auto-registered by a metaclass and surfaced as ``--db-type`` choices
(spider/db/core/implementation_injector.py:9-41, spider/db/manager.py:15-45,
default = Postgres at manager.py:33-38). Here a sink is a small class with
``write(dataset, path)`` / ``read(path)``; registration is explicit-by-
decorator (same effect as the metaclass, without the magic), unknown names
fall back to the default (parquet) exactly like the reference falls back to
Postgres on an unsupported ``--db-type`` (manager.py:25-31, tested in the
reference's test_db_ops_controller.py:98-113).
"""

from __future__ import annotations

import ray
from ray.data import Dataset

_REGISTRY: dict[str, type] = {}
DEFAULT_SINK = "parquet"


def register_sink(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        cls.verbose = name
        return cls

    return deco


def get_sink(name: str | None):
    """Unknown/None → default sink (reference fallback semantics)."""
    return _REGISTRY.get(name or DEFAULT_SINK, _REGISTRY[DEFAULT_SINK])()


def sink_choices() -> list[str]:
    return sorted(_REGISTRY)


@register_sink("parquet")
class ParquetSink:
    """Canonical store format: partitioned parquet (one dir per round)."""

    def write(self, ds: Dataset, path: str) -> None:
        ds.write_parquet(path)

    def read(self, path: str) -> Dataset:
        return ray.data.read_parquet(path)


@register_sink("csv")
class CsvSink:
    def write(self, ds: Dataset, path: str) -> None:
        ds.write_csv(path)

    def read(self, path: str) -> Dataset:
        return ray.data.read_csv(path)


@register_sink("json")
class JsonSink:
    def write(self, ds: Dataset, path: str) -> None:
        ds.write_json(path)

    def read(self, path: str) -> Dataset:
        return ray.data.read_json(path)


@register_sink("mongo")
class MongoSink:
    """Parity stub for the reference's FOURTH DAO: its Mongo backend is
    itself unimplemented (mongodb_database.py:56-113 — every operation
    body is a bare ``pass``/``return None``), so the faithful analog is a
    registered-but-stubbed sink that raises where the reference silently
    no-ops (raising is the safer rendition of the same contract: the
    backend is selectable but not usable)."""

    def write(self, ds: Dataset, path: str) -> None:
        raise NotImplementedError(
            "the reference's Mongo DAO is a stub (mongodb_database.py:56-113); "
            "this sink mirrors that — select parquet/csv/json for real output"
        )

    def read(self, path: str) -> Dataset:
        raise NotImplementedError(
            "the reference's Mongo DAO is a stub (mongodb_database.py:56-113)"
        )
