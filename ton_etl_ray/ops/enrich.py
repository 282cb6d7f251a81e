"""External-fetch enrichment: actor-pool stage with cache/TTL/retry.

Mirrors the reference's metadata parsers (P30/P31: HTTP+IPFS fetch with
retry/backoff, a per-key cache with 24 h TTL, and a fallback source —
reference parser/parsers/jetton_masters/jetton_metadata.py:40-66,
121-128, 188-221) as a Ray Data stage: the fetcher client is built ONCE
per actor in ``__init__`` (connection pools, auth); each batch fetches
each DISTINCT key at most once, consults the per-actor TTL cache first, and
retries transient failures with exponential backoff before falling back
to a null enrichment plus an error marker.

No network exists in this container, so the default fetcher raises —
inject a real client at the call site; tests drive the full cache/TTL/
retry surface with mock fetchers (tests/test_enrich.py).

Scale notes: the cache is per-actor (keys are NOT routed, so the worst
case is one fetch per key per actor); ``enrich_routed`` below is the
``groupby(key)``-routed variant that guarantees one fetch per key per
RUN when the fetch is expensive enough to justify the shuffle. The
concurrent-pressure bound on the external service differs by variant:
``enrich`` is an ``ActorPoolMapOperator`` (actor count × one in-flight
batch each), while ``enrich_routed`` runs as ``map_groups`` TASKS — its
bound is ``num_buckets`` concurrent groups, so size ``num_buckets`` to
the service's quota.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from collections.abc import Callable

import pyarrow as pa

import ray.data as rd

from .._pickle import ensure_portable


def default_fetcher(key: str) -> dict:
    """STUB: a real deployment injects an HTTP/IPFS client factory."""
    raise NotImplementedError("no network in this environment; inject a fetcher")


class FetchError(RuntimeError):
    pass


class FetchEnrichStage:
    """Actor-pool stage: add an enrichment column fetched per key.

    Parameters
    ----------
    fetcher_factory: builds the client once per actor; the client is
        ``Callable[[str], dict]`` and may raise on transient failure.
    key_col: column holding the fetch key.
    ttl_sec: cache entry lifetime (reference uses 24 h,
        jetton_metadata.py:121-128); expired entries are re-fetched.
    neg_ttl_sec: lifetime for CACHED FAILURES (None enrichments) — short
        so a recovered service is retried quickly.
    max_retries / backoff_base_sec: exponential backoff schedule for
        transient errors (jetton_metadata.py:40-66 retries IPFS 3×).
    cache_max: LRU bound so a long-lived actor can't grow unboundedly.
    time_fn / sleep_fn: injectable clocks for deterministic tests.
    """

    def __init__(
        self,
        fetcher_factory: Callable[[], Callable[[str], dict]] = lambda: default_fetcher,
        *,
        key_col: str = "key",
        ttl_sec: float = 24 * 3600.0,
        neg_ttl_sec: float = 60.0,
        max_retries: int = 3,
        backoff_base_sec: float = 0.05,
        cache_max: int = 100_000,
        time_fn: Callable[[], float] = time.monotonic,
        sleep_fn: Callable[[float], None] = time.sleep,
    ):
        self.fetch = fetcher_factory()
        self.key_col = key_col
        self.ttl = ttl_sec
        # failures are cached SEPARATELY and briefly: caching a None for
        # the full 24 h would turn one transient outage into a day of
        # fetch_ok=False for every key it touched
        self.neg_ttl = neg_ttl_sec
        self.max_retries = max_retries
        self.backoff = backoff_base_sec
        self.cache: OrderedDict[str, tuple[float, dict | None]] = OrderedDict()
        self.cache_max = cache_max
        self.now = time_fn
        self.sleep = sleep_fn
        self.counters = {"hits": 0, "fetches": 0, "retries": 0, "failures": 0}

    # -- cache ---------------------------------------------------------
    def _cache_get(self, key: str):
        ent = self.cache.get(key)
        if ent is None:
            return None
        fetched_at, value = ent
        ttl = self.ttl if value is not None else self.neg_ttl
        if self.now() - fetched_at > ttl:
            del self.cache[key]        # expired → refetch
            return None
        self.cache.move_to_end(key)    # LRU touch
        self.counters["hits"] += 1
        return (value,)

    def _cache_put(self, key: str, value: dict | None) -> None:
        self.cache[key] = (self.now(), value)
        self.cache.move_to_end(key)
        while len(self.cache) > self.cache_max:
            self.cache.popitem(last=False)

    # -- fetch with retry/backoff -------------------------------------
    def _fetch_one(self, key: str) -> dict | None:
        for attempt in range(self.max_retries + 1):
            try:
                self.counters["fetches"] += 1
                return self.fetch(key)
            except Exception:
                if attempt == self.max_retries:
                    self.counters["failures"] += 1
                    return None        # fallback: null enrichment
                self.counters["retries"] += 1
                self.sleep(self.backoff * (2 ** attempt))
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pylist()
        resolved: dict[str, dict | None] = {}
        for k in dict.fromkeys(keys):  # distinct, order-preserving
            hit = self._cache_get(k)
            if hit is not None:
                resolved[k] = hit[0]
                continue
            v = self._fetch_one(k)
            self._cache_put(k, v)
            resolved[k] = v

        import json

        enriched = [
            json.dumps(resolved[k], sort_keys=True) if resolved[k] is not None else None
            for k in keys
        ]
        ok = [resolved[k] is not None for k in keys]
        out = batch.append_column("enrichment", pa.array(enriched, pa.string()))
        return out.append_column("fetch_ok", pa.array(ok, pa.bool_()))


def enrich_event_types(sf_dir: str):
    """Oracle-checked demo of the enrichment stage: a deterministic
    fetcher (upper-cases the key — no network) enriches every event by
    its type, so DuckDB can recompute the exact enrichment JSON. Proves
    the full actor path (cache, distinct-key fetch, JSON layout) under
    the driver's value-hash gate."""
    from ._util import read_table

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type"])
    return enrich(
        ds,
        lambda: (lambda k: {"u": k.upper()}),
        key_col="event_type",
        concurrency=2,
        batch_size=4096,
    )


def enrich(
    ds: "rd.Dataset",
    fetcher_factory: Callable[[], Callable[[str], dict]],
    *,
    key_col: str,
    concurrency: int = 2,
    batch_size: int = 1024,
    **stage_kwargs,
) -> "rd.Dataset":
    """Attach (enrichment, fetch_ok) columns to ``ds`` by fetching per
    distinct ``key_col`` value through an actor pool."""
    ensure_portable()
    return ds.map_batches(
        FetchEnrichStage,
        fn_constructor_kwargs={"fetcher_factory": fetcher_factory, "key_col": key_col,
                               **stage_kwargs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def enrich_routed(
    ds: "rd.Dataset",
    fetcher_factory: Callable[[], Callable[[str], dict]],
    *,
    key_col: str,
    num_buckets: int = 16,
    **stage_kwargs,
) -> "rd.Dataset":
    """Key-ROUTED enrichment: the ``groupby(key)`` option from the scale
    notes, made concrete. Rows are shuffled by a hash bucket of the key
    before the fetch stage, so every distinct key is resolved by exactly
    ONE group — one fetch per key per run, however many actors execute —
    where the unrouted ``enrich`` bounds it at one fetch per key per
    ACTOR. Use when the fetch is expensive enough that the extra shuffle
    is cheaper than (actor_count - 1) redundant fetches per key; the
    per-actor TTL cache matters less here because the bucket assignment
    is sticky across runs (same hash). Runs as ``map_groups`` tasks, so
    concurrent external pressure is bounded by ``num_buckets`` (not an
    actor pool — ``concurrency``/``batch_size`` do not apply here)."""
    ensure_portable()
    for bad in ("concurrency", "batch_size"):
        if bad in stage_kwargs:
            raise TypeError(
                f"enrich_routed has no {bad!r}: routing runs as map_groups "
                "tasks; bound concurrency with num_buckets instead"
            )
    from ..core.partition import hash64

    def bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        b = (hash64(t[key_col]) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__kb", pa.array(b, pa.int64()))

    def run_group(g: pa.Table) -> pa.Table:
        if "__kb" in g.column_names:
            g = g.drop_columns(["__kb"])
        stage = FetchEnrichStage(fetcher_factory, key_col=key_col, **stage_kwargs)
        return stage(g)

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("__kb")
        .map_groups(run_group, batch_format="pyarrow")
    )
