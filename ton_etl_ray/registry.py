"""User-extension surface: Transform protocol + registry (SURVEY §2.10).

The reference's plugin APIs both follow the same 4-hook shape:
- Parser: ``topics() / predicate(obj) / handle_internal(obj, db) /
  prepare(db)`` (reference parser/model/parser.py:36-80), registered in a
  module list and env-filtered (parsers/__init__.py:41-132);
- Converter: ``topics() / timestamp() / convert()``
  (datalake/converters/converter.py:22-65), registered in ``CONVERTERS``
  (datalake/main.py:33-48).

Our Ray-Data-native mirror:
- a **Transform** subclasses declare ``source`` (logical table name), a
  vectorized ``predicate(batch) -> BooleanArray`` and ``apply(batch) ->
  pa.Table`` (1 input batch → 0..n output rows), plus optional
  ``prepare()`` run once per actor — so every transform is a pure
  function over Arrow batches, unit-testable without a cluster (the
  analogue of the reference's DBMock backfill harness,
  parser/backfill.py:29-106);
- a **registry** keyed by source table; ``run_transforms`` fans one
  source Dataset out through every registered transform for it, as a
  single actor-pool ``map_batches`` stage per transform.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ._pickle import ensure_portable
from .ops._util import pool as _pool


class Transform:
    """Base class for user transforms (predicate → apply, both vectorized)."""

    #: logical source table this transform consumes
    source: str = ""
    #: output table name (side output routing)
    emits: str = ""

    def prepare(self) -> None:
        """Once-per-actor setup (compile regexes, load lookup tables) —
        the analogue of Parser.prepare (parser/model/parser.py:63-66)."""

    def predicate(self, batch: pa.Table) -> pa.Array:
        """Vectorized row filter; default: all rows."""
        return pa.array([True] * batch.num_rows)

    def apply(self, batch: pa.Table) -> pa.Table:
        """Transform the predicate-surviving rows (1 → 0..n rows)."""
        raise NotImplementedError

    # -- driver-side helper: full per-batch hook used by the runner
    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = self.predicate(batch)
        sel = batch.filter(mask)
        return self.apply(sel)


class _TransformActor:
    """Actor wrapper: prepare() runs once, batches stream through."""

    def __init__(self, transform_cls, kwargs):
        self.t = transform_cls(**kwargs)
        self.t.prepare()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.t(batch)


class TransformRegistry:
    """Registry keyed by source table (parsers/__init__.py analogue)."""

    def __init__(self):
        self._by_source: dict[str, list[tuple[type, dict]]] = defaultdict(list)

    def register(self, transform_cls: type, **kwargs):
        if not transform_cls.source:
            raise ValueError(f"{transform_cls.__name__} must set .source")
        self._by_source[transform_cls.source].append((transform_cls, kwargs))
        return transform_cls

    def transforms_for(self, source: str) -> list[tuple[type, dict]]:
        return list(self._by_source.get(source, []))

    def select(self, enabled: set[str] | None):
        """Env-filtered subset by class name (SUPPORTED_PARSERS analogue,
        parsers/__init__.py:118-132)."""
        out = TransformRegistry()
        for src, lst in self._by_source.items():
            for cls, kw in lst:
                if enabled is None or cls.__name__ in enabled:
                    out._by_source[src].append((cls, kw))
        return out

    def run(
        self,
        sources: dict[str, "rd.Dataset"],
        *,
        concurrency=None,
        batch_size: int | None = None,
    ) -> dict[str, "rd.Dataset"]:
        """Fan each source Dataset through its transforms.

        Returns one Dataset per output table; transforms emitting the
        same table are unioned (the reference's many-parsers-one-table
        pattern, e.g. 11 DEX parsers → dex_swap_parsed)."""
        ensure_portable()
        outputs: dict[str, list[rd.Dataset]] = defaultdict(list)
        for src, ds in sources.items():
            for cls, kw in self.transforms_for(src):
                out = ds.map_batches(
                    _TransformActor,
                    fn_constructor_args=(cls, kw),
                    batch_format="pyarrow",
                    batch_size=batch_size,
                    concurrency=concurrency or _pool(),
                )
                outputs[cls.emits or f"{src}__{cls.__name__}"].append(out)
        result = {}
        for table, parts in outputs.items():
            ds = parts[0]
            for p in parts[1:]:
                ds = ds.union(p)
            result[table] = ds
        return result


REGISTRY = TransformRegistry()


def register(cls=None, **kwargs):
    """Decorator: ``@register`` on a Transform subclass."""
    if cls is None:
        return lambda c: REGISTRY.register(c, **kwargs)
    return REGISTRY.register(cls, **kwargs)
