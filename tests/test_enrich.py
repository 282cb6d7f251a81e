"""External-fetch enrichment: cache hit, TTL expiry, retry, fallback.

The stage is exercised BOTH as a plain callable (deterministic clock,
no Ray) and through a real actor-pool ``map_batches`` pipeline.
"""

import pyarrow as pa
import pytest

from ton_etl_ray.ops.enrich import FetchEnrichStage, enrich


def _batch(keys):
    return pa.table({"key": pa.array(keys, pa.string())})


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.slept = []

    def now(self):
        return self.t

    def sleep(self, s):
        self.slept.append(s)
        self.t += s


def test_cache_hit_skips_fetch():
    calls = []

    def fetcher(k):
        calls.append(k)
        return {"k": k}

    clock = FakeClock()
    st = FetchEnrichStage(lambda: fetcher, key_col="key",
                          time_fn=clock.now, sleep_fn=clock.sleep)
    out1 = st(_batch(["a", "b", "a"]))          # 'a' fetched once per batch
    assert calls == ["a", "b"]
    assert out1["fetch_ok"].to_pylist() == [True, True, True]
    st(_batch(["a", "b"]))                      # all cache hits
    assert calls == ["a", "b"]
    assert st.counters["hits"] == 2


def test_ttl_expiry_refetches():
    calls = []

    def fetcher(k):
        calls.append(k)
        return {"k": k, "at": len(calls)}

    clock = FakeClock()
    st = FetchEnrichStage(lambda: fetcher, key_col="key", ttl_sec=10.0,
                          time_fn=clock.now, sleep_fn=clock.sleep)
    st(_batch(["x"]))
    clock.t += 5.0
    st(_batch(["x"]))                           # fresh → hit
    assert calls == ["x"]
    clock.t += 6.0                              # total 11 s > ttl
    out = st(_batch(["x"]))
    assert calls == ["x", "x"]                  # expired → refetched
    assert '"at": 2' in out["enrichment"][0].as_py()


def test_flaky_fetcher_retries_then_succeeds():
    attempts = {"n": 0}

    def fetcher(k):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise ConnectionError("transient")
        return {"ok": k}

    clock = FakeClock()
    st = FetchEnrichStage(lambda: fetcher, key_col="key", max_retries=3,
                          backoff_base_sec=1.0,
                          time_fn=clock.now, sleep_fn=clock.sleep)
    out = st(_batch(["k1"]))
    assert out["fetch_ok"].to_pylist() == [True]
    assert attempts["n"] == 3
    assert clock.slept == [1.0, 2.0]            # exponential backoff


def test_persistent_failure_falls_back_to_null():
    def fetcher(k):
        raise ConnectionError("down")

    clock = FakeClock()
    st = FetchEnrichStage(lambda: fetcher, key_col="key", max_retries=2,
                          time_fn=clock.now, sleep_fn=clock.sleep)
    out = st(_batch(["k1", "k2"]))
    assert out["fetch_ok"].to_pylist() == [False, False]
    assert out["enrichment"].null_count == 2
    assert st.counters["failures"] == 2


def test_lru_bound():
    clock = FakeClock()
    st = FetchEnrichStage(lambda: (lambda k: {"k": k}), key_col="key",
                          cache_max=2, time_fn=clock.now, sleep_fn=clock.sleep)
    st(_batch(["a", "b", "c"]))                 # 'a' evicted (LRU, max 2)
    assert set(st.cache) == {"b", "c"}


def test_enrich_actor_pool_pipeline():
    """Full Ray pipeline: deterministic fetcher, distinct-key fetch,
    enrichment JSON lands next to the payload columns."""
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "key": pa.array([f"k{i % 4}" for i in range(100)], pa.string()),
        "val": pa.array(range(100), pa.int64()),
    }))
    out = enrich(ds, lambda: (lambda k: {"meta": k.upper()}), key_col="key",
                 concurrency=2, batch_size=32).to_pandas()
    assert len(out) == 100
    assert out["fetch_ok"].all()
    assert (out.loc[out["key"] == "k1", "enrichment"] == '{"meta": "K1"}').all()


def test_negative_cache_has_short_ttl():
    """A transient outage must not poison keys for the full 24 h TTL:
    failures are cached under neg_ttl_sec only."""
    state = {"up": False}

    def fetcher(k):
        if not state["up"]:
            raise ConnectionError("down")
        return {"ok": k}

    clock = FakeClock()
    st = FetchEnrichStage(lambda: fetcher, key_col="key", max_retries=0,
                          ttl_sec=86400.0, neg_ttl_sec=30.0,
                          time_fn=clock.now, sleep_fn=clock.sleep)
    out = st(_batch(["k"]))
    assert out["fetch_ok"].to_pylist() == [False]
    state["up"] = True
    clock.t += 10.0
    out = st(_batch(["k"]))                 # still inside neg TTL → cached fail
    assert out["fetch_ok"].to_pylist() == [False]
    clock.t += 25.0                         # past neg TTL → refetch succeeds
    out = st(_batch(["k"]))
    assert out["fetch_ok"].to_pylist() == [True]


def test_enrich_routed_fetches_each_key_exactly_once():
    """enrich_routed: the documented groupby(key) routing — every
    distinct key is fetched exactly once across the whole run (the
    unrouted pool bounds it per-actor, not globally), and the output
    matches the unrouted stage row-for-row."""
    import ray
    import ray.data as rd

    from ton_etl_ray.ops.enrich import enrich, enrich_routed

    @ray.remote
    class FetchLog:
        def __init__(self):
            self.counts = {}

        def inc(self, key):
            self.counts[key] = self.counts.get(key, 0) + 1

        def get(self):
            return self.counts

    log = FetchLog.remote()

    def factory():
        def fetch(k):
            ray.get(log.inc.remote(k))
            return {"u": k.upper()}
        return fetch

    keys = [f"k{i % 7}" for i in range(500)]
    ds = rd.from_arrow(pa.table({"id": list(range(500)), "key": keys}))
    routed = enrich_routed(ds, factory, key_col="key", num_buckets=4).to_pandas()
    counts = ray.get(log.get.remote())
    assert set(counts) == {f"k{i}" for i in range(7)}
    assert all(c == 1 for c in counts.values())        # once per key GLOBALLY

    plain = enrich(ds, factory, key_col="key").to_pandas()
    key_of = lambda df: sorted(map(tuple, df[["id", "enrichment", "fetch_ok"]].to_numpy()))
    assert key_of(routed) == key_of(plain)
