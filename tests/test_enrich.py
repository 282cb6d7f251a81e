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


# --- P30 delta-compare loop: metadata_refresh_feed --------------------


@pytest.fixture()
def small_lake(tmp_path, ray_session):
    from ton_etl_ray.cdc.replay import replay
    from ton_etl_ray.gen import write_change_log

    chg, lake = str(tmp_path / "chg"), str(tmp_path / "lake")
    write_change_log(chg, num_events=4_000, num_keys=300, seed=31,
                     num_shards=4, max_tok=8)
    replay(chg, lake, num_partitions=8)
    return lake


def _state(lake):
    from ton_etl_ray.cdc.replay import final_state_table

    df = final_state_table(lake).to_pandas()
    return {r.doc_id: r for r in df.itertuples()}


def test_metadata_refresh_full_loop(small_lake, tmp_path):
    """The P30 loop end-to-end: first refresh adds the metadata column
    for every row (schema evolution); an identical re-fetch produces an
    EMPTY feed that still replays as a no-op epoch; a changed upstream
    value produces exactly the changed keys."""
    import glob
    import json

    import pyarrow.parquet as pq

    from ton_etl_ray.cdc.replay import replay
    from ton_etl_ray.ops.enrich import metadata_refresh_feed

    lake = small_lake
    fetch_v1 = lambda: (lambda k: {"name": k, "v": 1})

    f1 = str(tmp_path / "f1")
    metadata_refresh_feed(lake, f1, fetch_v1, key_col="source",
                          meta_col="metadata")
    rows = pq.read_table(glob.glob(f1 + "/*.parquet"))
    assert rows.num_rows == len(_state(lake))          # every row gains meta
    assert set(rows["op"].to_pylist()) == {"u"}
    replay(f1, lake)
    st = _state(lake)
    some = next(iter(st.values()))
    assert json.loads(some.metadata) == {"name": some.source, "v": 1}

    # no-change: same fetcher (different key order in the dict must NOT
    # count as a change — canonical compare)
    fetch_v1b = lambda: (lambda k: {"v": 1, "name": k})
    f2 = str(tmp_path / "f2")
    metadata_refresh_feed(lake, f2, fetch_v1b, key_col="source",
                          meta_col="metadata")
    shards = glob.glob(f2 + "/*.parquet")
    assert shards and pq.read_table(shards).num_rows == 0   # empty but valid
    res = replay(f2, lake)                                  # replays as no-op
    assert res.counters["rows_in"] == 0
    st2 = _state(lake)
    assert {k: (list(v.tokens), v.metadata) for k, v in st2.items()} == \
           {k: (list(v.tokens), v.metadata) for k, v in st.items()}

    # field change for ONE source: only that source's rows re-emit
    changed_src = some.source

    def fetch_v2_factory():
        def f(k):
            return {"name": k, "v": 2} if k == changed_src else {"name": k, "v": 1}
        return f

    f3 = str(tmp_path / "f3")
    metadata_refresh_feed(lake, f3, fetch_v2_factory, key_col="source",
                          meta_col="metadata")
    rows3 = pq.read_table(glob.glob(f3 + "/*.parquet"))
    want_n = sum(1 for v in st2.values() if v.source == changed_src)
    assert rows3.num_rows == want_n > 0
    assert set(rows3["source"].to_pylist()) == {changed_src}
    replay(f3, lake)
    st3 = _state(lake)
    for k, v in st3.items():
        expect_v = 2 if v.source == changed_src else 1
        assert json.loads(v.metadata)["v"] == expect_v
        assert list(v.tokens) == list(st2[k].tokens)       # payload untouched


def test_metadata_refresh_single_row_and_failure(small_lake, tmp_path):
    """Per-doc keys: a field change on ONE key emits exactly ONE 'u'
    row (verdict r4 item #4's done criterion), and a key whose fetch
    fails after retries is SKIPPED — the stored row survives."""
    import glob
    import json

    import pyarrow.parquet as pq

    from ton_etl_ray.cdc.replay import replay
    from ton_etl_ray.ops.enrich import metadata_refresh_feed

    lake = small_lake
    st0 = _state(lake)
    doc_ids = sorted(st0)
    target, broken = doc_ids[0], doc_ids[1]

    base = lambda: (lambda k: {"d": k})
    f1 = str(tmp_path / "f1")
    metadata_refresh_feed(lake, f1, base, key_col="doc_id",
                          meta_col="metadata", backoff_base_sec=0.0)
    replay(f1, lake)
    st1 = _state(lake)

    def v2_factory():
        def f(k):
            if k == broken:
                raise RuntimeError("boom")       # persistent failure
            return {"d": k, "v": 2} if k == target else {"d": k}
        return f

    f2 = str(tmp_path / "f2")
    metadata_refresh_feed(lake, f2, v2_factory, key_col="doc_id",
                          meta_col="metadata", backoff_base_sec=0.0)
    rows = pq.read_table(glob.glob(f2 + "/*.parquet"))
    assert rows.num_rows == 1                    # exactly one 'u' row
    assert rows["doc_id"].to_pylist() == [target]
    assert rows["op"].to_pylist() == ["u"]
    replay(f2, lake)
    st2 = _state(lake)
    assert json.loads(st2[target].metadata) == {"d": target, "v": 2}
    # failed fetch kept the stored row
    assert st2[broken].metadata == st1[broken].metadata
    assert json.loads(st2[broken].metadata) == {"d": broken}
