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
- a **registry** keyed by source table; ``run`` fans one source
  Dataset out through every registered transform for it, as a single
  ``map_batches`` stage per transform — task-based with the prepared
  instance cached per worker process by default, an explicit actor
  pool on request (heavy per-actor state).
"""

from __future__ import annotations

import uuid
from collections import defaultdict

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ._pickle import ensure_portable


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
    """Actor wrapper: prepare() runs once, batches stream through. Used
    only when the caller asks for an explicit actor pool (heavy state:
    models, connections); the default path is ``_transform_fn``."""

    def __init__(self, transform_cls, kwargs):
        self.t = transform_cls(**kwargs)
        self.t.prepare()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.t(batch)


def _transform_fn(transform_cls, kwargs, token: str):
    """Task-based transform with the prepared instance memoized once
    per worker process (``_util.worker_cache``): the same
    setup-once/stream-batches contract as the actor pool, without the
    per-query actor spin-up + autoscale ramp — tasks reuse the
    session's warm workers. The cache key is the REGISTRATION token
    (unique per ``register()`` call), so re-registering a same-named
    class or equal-repr kwargs can never serve a stale instance, while
    repeat ``run()`` calls over the same registration reuse it. Cached
    instances live for the worker's lifetime — a transform whose
    ``prepare()`` opens a connection/client should be run through the
    explicit-``concurrency`` actor pool instead, whose actors release
    that state when the query ends."""
    from .ops._util import worker_cache

    sig = ("xform", token)

    def apply(batch: pa.Table) -> pa.Table:
        cache = worker_cache()
        t = cache.get(sig)
        if t is None:
            t = transform_cls(**kwargs)
            t.prepare()
            cache[sig] = t
        return t(batch)

    return apply


class TransformRegistry:
    """Registry keyed by source table (parsers/__init__.py analogue)."""

    def __init__(self):
        self._by_source: dict[str, list[tuple[type, dict, str]]] = defaultdict(list)

    def register(self, transform_cls: type, **kwargs):
        if not transform_cls.source:
            raise ValueError(f"{transform_cls.__name__} must set .source")
        # per-REGISTRATION identity token: the worker cache must not key
        # on class name + repr(kwargs) alone — a redefined same-named
        # class, or a callable kwarg whose repr (memory address) happens
        # to collide with a GC'd one, would silently serve a stale
        # prepared instance. The token must also be unique ACROSS
        # registry instances: two registries whose first registration is
        # the same class would collide under a per-instance counter
        # (same id(cls), same .0) and one registry's prepared instance —
        # built with the OTHER registry's kwargs — would be served from
        # the worker cache. uuid4 makes every register() call globally
        # fresh while repeat run() calls on one registration still reuse.
        token = uuid.uuid4().hex
        self._by_source[transform_cls.source].append((transform_cls, kwargs, token))
        return transform_cls

    def transforms_for(self, source: str) -> list[tuple[type, dict, str]]:
        return list(self._by_source.get(source, []))

    def select(self, enabled: set[str] | None):
        """Env-filtered subset by class name (SUPPORTED_PARSERS analogue,
        parsers/__init__.py:118-132)."""
        out = TransformRegistry()
        for src, lst in self._by_source.items():
            for cls, kw, token in lst:
                if enabled is None or cls.__name__ in enabled:
                    out._by_source[src].append((cls, kw, token))
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
        pattern, e.g. 11 DEX parsers → dex_swap_parsed).

        ``concurrency=None`` (default) runs transforms as plain tasks
        with the prepared instance cached once per worker process;
        pass an int or ``(min, max)`` tuple to pin an actor pool
        instead (for transforms holding heavy state — a model, an open
        connection — where per-actor lifecycle matters)."""
        ensure_portable()
        outputs: dict[str, list[rd.Dataset]] = defaultdict(list)
        for src, ds in sources.items():
            for cls, kw, token in self.transforms_for(src):
                if concurrency is not None:
                    out = ds.map_batches(
                        _TransformActor,
                        fn_constructor_args=(cls, kw),
                        batch_format="pyarrow",
                        batch_size=batch_size,
                        concurrency=concurrency,
                    )
                else:
                    out = ds.map_batches(
                        _transform_fn(cls, kw, token),
                        batch_format="pyarrow",
                        batch_size=batch_size,
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
