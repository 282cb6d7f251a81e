"""End-to-end replay correctness vs a DuckDB rank-1 oracle (FIXTURES.md F5)."""

import glob
import os

import duckdb
import pyarrow as pa
import pytest

from ton_etl_ray.cdc.replay import final_state_table, replay
from ton_etl_ray.gen import write_change_log

ORACLE_SQL = """
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rk
  FROM read_parquet({files}, union_by_name=true)
)
SELECT doc_id, tokens, n_tok, source{extra}
FROM ranked WHERE rk = 1 AND op <> 'd'
"""


def _oracle(change_dir, extra=""):
    files = sorted(glob.glob(os.path.join(change_dir, "*.parquet")))
    sql = ORACLE_SQL.format(files=str(files), extra=extra)
    return duckdb.sql(sql).arrow()


def _as_map(t: pa.Table):
    cols = t.column_names
    return {
        r["doc_id"]: tuple(r[c] for c in cols if c not in ("doc_id", "lsn"))
        for r in t.to_pylist()
    }


def test_replay_matches_oracle(tmp_path):
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_change_log(chg, num_events=20000, num_keys=1500, seed=3, num_shards=6, max_tok=24)
    res = replay(chg, lake, num_partitions=16, hot_share_threshold=0.005)
    assert res.published and res.epoch == 0
    got = final_state_table(lake).select(["doc_id", "tokens", "n_tok", "source"])
    want = _oracle(chg)
    gm, wm = _as_map(got), _as_map(want)
    assert set(gm) == set(wm)
    assert gm == wm
    assert res.rows_total == len(wm)


def test_replay_hot_keys_salted(tmp_path):
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_change_log(chg, num_events=10000, num_keys=200, seed=9, num_shards=4, max_tok=16)
    # zipf s=1.1 over 200 keys → top key has several % share → hot detection fires
    res = replay(chg, lake, num_partitions=8, num_salts=4, hot_share_threshold=0.02)
    assert res.hot_keys, "expected hot keys to be detected"
    assert res.counters["hotspill_parts"] > 0
    gm = _as_map(final_state_table(lake).select(["doc_id", "tokens", "n_tok", "source"]))
    wm = _as_map(_oracle(chg))
    assert gm == wm


def test_replay_many_hot_keys_distributed_fold(tmp_path):
    """≥64 hot keys: the second-stage spill fold must run distributed
    (per-base ray tasks at this size), not a per-partition driver loop
    (VERDICT r3 Wrong #4). The `hotspill_fold_parts` counter is produced
    ONLY by the fold's manifest rows, and the final state must still
    match the rank-1 oracle exactly."""
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_change_log(chg, num_events=30000, num_keys=300, seed=11, num_shards=4, max_tok=12)
    # tiny share threshold → the zipf head through rank ≥64 all flag hot
    res = replay(chg, lake, num_partitions=8, num_salts=4,
                 hot_share_threshold=0.0008)
    assert len(res.hot_keys) >= 64, f"only {len(res.hot_keys)} hot keys"
    assert res.counters["hotspill_parts"] > 0
    # distributed fold ran, touching at most every base partition
    assert 0 < res.counters["hotspill_fold_parts"] <= 8
    assert res.counters["hotspill_fold_mode"] == "tasks"
    gm = _as_map(final_state_table(lake).select(["doc_id", "tokens", "n_tok", "source"]))
    wm = _as_map(_oracle(chg))
    assert gm == wm


def test_replay_fold_dataset_path(tmp_path):
    """Force the groupby-Dataset fold shape (the huge-fan-out route,
    fold_task_product_cap=0) and pin it to the same oracle — both fold
    implementations must be interchangeable."""
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_change_log(chg, num_events=10000, num_keys=200, seed=9, num_shards=4, max_tok=16)
    res = replay(chg, lake, num_partitions=8, num_salts=4,
                 hot_share_threshold=0.02, fold_task_product_cap=0)
    assert res.hot_keys
    assert res.counters["hotspill_fold_mode"] == "dataset"
    assert res.counters["hotspill_fold_parts"] > 0
    gm = _as_map(final_state_table(lake).select(["doc_id", "tokens", "n_tok", "source"]))
    wm = _as_map(_oracle(chg))
    assert gm == wm


def test_replay_schema_evolution(tmp_path):
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_change_log(
        chg, num_events=8000, num_keys=600, seed=4, num_shards=4, max_tok=16,
        evolve_after_shard=2,
    )
    replay(chg, lake, num_partitions=8)
    got = final_state_table(lake)
    assert got.schema.field("lang").type == pa.string()
    assert got.schema.field("n_tok").type == pa.int64()
    gm = _as_map(got.select(["doc_id", "tokens", "n_tok", "source", "lang"]))
    wm = _as_map(_oracle(chg, extra=", lang"))
    assert gm == wm
    # pre-evolution winners carry null lang
    assert any(v[-1] is None for v in gm.values())
    assert any(v[-1] is not None for v in gm.values())


def test_incremental_epochs_equal_oneshot(tmp_path):
    chg = str(tmp_path / "chg")
    write_change_log(chg, num_events=12000, num_keys=800, seed=6, num_shards=6, max_tok=16)
    files = sorted(glob.glob(os.path.join(chg, "*.parquet")))

    lake_a = str(tmp_path / "lake_oneshot")
    replay(files, lake_a, num_partitions=8)

    lake_b = str(tmp_path / "lake_incr")
    r0 = replay(files[:3], lake_b, num_partitions=8)
    r1 = replay(files[3:], lake_b, num_partitions=8)
    assert (r0.epoch, r1.epoch) == (0, 1)
    assert r1.partitions_inherited + r1.partitions_written == 8

    a = _as_map(final_state_table(lake_a).select(["doc_id", "tokens", "n_tok", "source"]))
    b = _as_map(final_state_table(lake_b).select(["doc_id", "tokens", "n_tok", "source"]))
    assert a == b


def test_resume_after_partial_run(tmp_path):
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_change_log(chg, num_events=10000, num_keys=700, seed=8, num_shards=4, max_tok=16)

    # simulate a crash: only half the partitions get applied, no commit
    partial = replay(chg, lake, num_partitions=8, only_parts=frozenset(range(4)),
                     hot_share_threshold=1.0)
    assert not partial.published

    res = replay(chg, lake, resume=True, num_partitions=8, hot_share_threshold=1.0)
    assert res.published and res.epoch == 0
    # committed partitions were skipped, not recomputed
    assert res.partitions_written == 8

    gm = _as_map(final_state_table(lake).select(["doc_id", "tokens", "n_tok", "source"]))
    wm = _as_map(_oracle(chg))
    assert gm == wm


def test_fresh_run_discards_abandoned_staging(tmp_path):
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_change_log(chg, num_events=4000, num_keys=300, seed=10, num_shards=2, max_tok=16)
    replay(chg, lake, num_partitions=4, only_parts=frozenset({0}), hot_share_threshold=1.0)
    res = replay(chg, lake, num_partitions=4, hot_share_threshold=1.0)  # resume=False → restart epoch
    assert res.published
    gm = _as_map(final_state_table(lake).select(["doc_id", "tokens", "n_tok", "source"]))
    assert gm == _as_map(_oracle(chg))


def test_invalid_op_rejected(tmp_path):
    import pyarrow.parquet as pq
    from ton_etl_ray.gen import make_change_batch

    t = make_change_batch(num_events=10, num_keys=5, seed=1)
    bad = t.set_column(t.column_names.index("op"), "op",
                       pa.array(["x"] * t.num_rows, pa.string()))
    chg = str(tmp_path / "chg")
    os.makedirs(chg)
    pq.write_table(bad, os.path.join(chg, "shard-00000.parquet"))
    with pytest.raises(Exception, match="invalid op"):
        replay(chg, str(tmp_path / "lake"), num_partitions=2, hot_share_threshold=1.0)


def test_resume_with_salting_recomputes_hotspills(tmp_path):
    """Regression: committed salted (hotspill) partitions must NOT be
    skipped on resume — their slot assignment is not reproducible across
    runs, so skipping could drop hot-key rows (review finding)."""
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_change_log(chg, num_events=10000, num_keys=200, seed=97, num_shards=4, max_tok=16)

    # partial crash: some base partitions AND their hotspills committed
    partial = replay(chg, lake, num_partitions=8, num_salts=4, hot_share_threshold=0.02,
                     only_parts=frozenset(range(12)))  # bases 0-7 + salted 8-11
    assert not partial.published

    res = replay(chg, lake, resume=True, num_partitions=8, num_salts=4,
                 hot_share_threshold=0.02)
    assert res.published
    gm = _as_map(final_state_table(lake).select(["doc_id", "tokens", "n_tok", "source"]))
    wm = _as_map(_oracle(chg))
    assert gm == wm


def test_coalesced_shuffle_matches_oracle(tmp_path, ray_session):
    """replay(coalesce_shuffle_blocks=…) must produce the identical
    final state — the repartition only changes block boundaries, never
    rows (the single-node escape hatch for high-block-count logs)."""
    import duckdb
    import glob as _glob

    from ton_etl_ray.cdc.replay import final_state_table, replay
    from ton_etl_ray.gen import write_change_log

    chg = str(tmp_path / "chg")
    write_change_log(chg, num_events=40_000, num_keys=3_000, seed=23,
                     num_shards=16, max_tok=16)
    lake = str(tmp_path / "lake")
    replay(chg, lake, num_partitions=32, override_num_blocks=16,
           coalesce_shuffle_blocks=4, hot_share_threshold=0.01)
    got = final_state_table(lake).to_pandas()
    shards = sorted(_glob.glob(chg + "/*.parquet"))
    ora = duckdb.sql(
        f"""WITH ranked AS (SELECT *, row_number() OVER
                (PARTITION BY doc_id ORDER BY lsn DESC) rk
            FROM read_parquet({shards}, union_by_name=true))
            SELECT doc_id, tokens, n_tok, source
            FROM ranked WHERE rk = 1 AND op <> 'd'"""
    ).df()
    g = {r.doc_id: (list(r.tokens), r.n_tok, r.source) for r in got.itertuples()}
    o = {r.doc_id: (list(r.tokens), r.n_tok, r.source) for r in ora.itertuples()}
    assert g == o


def test_auto_coalesce_routing():
    """The auto-router coalesces ONLY on (single node × read-block count
    at/above the profiled one-raylet exchange breakpoint), and never on
    multi-node clusters — pinning verdict r4 next-item #6's decision
    table, including both 40M-sweep legs staying untouched."""
    from ton_etl_ray.cdc.replay import _auto_coalesce_target as route

    # multi-node: never coalesce, regardless of block count
    assert route(4096, nodes_alive=2, cpus=64) is None
    assert route(96, nodes_alive=16, cpus=512) is None
    # single node below the breakpoint: data-sized blocks stay — the
    # scaling-sweep legs (40M log: 64 blocks @32 cpus, ~41 @8 cpus)
    assert route(64, nodes_alive=1, cpus=32) is None
    assert route(41, nodes_alive=1, cpus=8) is None
    assert route(95, nodes_alive=1, cpus=32) is None
    # single node at/above the breakpoint: coalesce to max(64, 2x cpus)
    assert route(96, nodes_alive=1, cpus=32) == 64
    assert route(128, nodes_alive=1, cpus=32) == 64   # the 80M regime
    assert route(128, nodes_alive=1, cpus=8) == 64    # floor holds
    assert route(300, nodes_alive=1, cpus=64) == 128  # 2x cpus on big hosts
    # byte-dominated regime (the 10^9-event log): coalescing to 64 would
    # make ~1 GB blocks — the exchange is bandwidth-bound there, leave
    # the block layout alone (replay_late is the documented tool)
    assert route(128, 5 << 30, nodes_alive=1, cpus=32) == 64   # 80M ≈ 5 GB ok
    assert route(1000, 64 << 30, nodes_alive=1, cpus=32) is None  # 1B ≈ 64 GB


def test_auto_coalesce_zero_disables(tmp_path, ray_session):
    """coalesce_shuffle_blocks=0 must disable coalescing (no repartition
    op in the plan) while None auto-routes; both produce the oracle
    state on a small log (where auto is a no-op anyway)."""
    import duckdb
    import glob as _glob

    from ton_etl_ray.cdc.replay import final_state_table, replay
    from ton_etl_ray.gen import write_change_log

    chg = str(tmp_path / "chg")
    write_change_log(chg, num_events=20_000, num_keys=2_000, seed=29,
                     num_shards=8, max_tok=16)
    shards = sorted(_glob.glob(chg + "/*.parquet"))
    ora = duckdb.sql(
        f"""WITH ranked AS (SELECT *, row_number() OVER
                (PARTITION BY doc_id ORDER BY lsn DESC) rk
            FROM read_parquet({shards}, union_by_name=true))
            SELECT doc_id, tokens, n_tok, source
            FROM ranked WHERE rk = 1 AND op <> 'd'"""
    ).df()
    o = {r.doc_id: (list(r.tokens), r.n_tok, r.source) for r in ora.itertuples()}
    for tag, kw in (("zero", {"coalesce_shuffle_blocks": 0}),
                    ("auto", {})):
        lake = str(tmp_path / f"lake_{tag}")
        replay(chg, lake, num_partitions=16, **kw)
        got = final_state_table(lake).to_pandas()
        g = {r.doc_id: (list(r.tokens), r.n_tok, r.source)
             for r in got.itertuples()}
        assert g == o, tag


def test_noop_epoch_keeps_lsn_watermark(tmp_path, ray_session):
    """A no-op epoch (every partition inherited) must carry the lake's
    lsn high watermark forward, not reset it to -1 — the changefeed
    tombstone lsn and refresh-update lsn are commit.max_lsn+1, so a
    regressed watermark would mint lsns that lose to (or collide with)
    stored rows."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ton_etl_ray.cdc import sink
    from ton_etl_ray.cdc.replay import replay
    from ton_etl_ray.gen import write_change_log

    chg, lake = str(tmp_path / "chg"), str(tmp_path / "lake")
    write_change_log(chg, num_events=5_000, num_keys=400, seed=37,
                     num_shards=4, max_tok=8)
    r0 = replay(chg, lake, num_partitions=8)
    assert r0.max_lsn == 4_999

    # an empty change shard → next epoch writes nothing, inherits all
    schema = pq.read_schema(sorted(glob.glob(chg + "/*.parquet"))[0])
    empty_dir = str(tmp_path / "empty")
    import os as _os
    _os.makedirs(empty_dir)
    pq.write_table(pa.schema(schema).empty_table(),
                   _os.path.join(empty_dir, "chg-empty.parquet"))
    r1 = replay(empty_dir, lake)
    assert r1.counters["rows_in"] == 0 and r1.partitions_written == 0
    assert r1.max_lsn == 4_999
    assert sink.read_commit(lake, r1.epoch)["max_lsn"] == 4_999


def test_replay_repins_epoch_when_raced_by_publisher(tmp_path, monkeypatch):
    """A concurrent publisher can commit replay's pinned target epoch
    between latest_epoch() and the epoch lock; replay must RE-PIN under
    the lock (like incremental.ingest / compact_lake) instead of
    clear_staging-ing the committed epoch's live data. Simulated by a
    one-call-stale latest_epoch."""
    from ton_etl_ray.cdc import sink as S

    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_change_log(chg, num_events=6000, num_keys=400, seed=21,
                     num_shards=4, max_tok=12)
    files = sorted(glob.glob(os.path.join(chg, "*.parquet")))
    replay(files[:2], lake, num_partitions=8)   # epoch 0
    replay(files[2:3], lake)                    # epoch 1 (the "racer")
    state_e1 = _as_map(final_state_table(lake, 1))
    assert S.is_committed(lake, 1)

    real = S.latest_epoch
    calls = {"n": 0}

    def stale_once(lake_dir):
        calls["n"] += 1
        # first call: the pre-race view (epoch 1 not yet visible)
        return 0 if calls["n"] == 1 else real(lake_dir)

    monkeypatch.setattr(S, "latest_epoch", stale_once)
    res = replay(files[3:], lake)
    assert res.epoch == 2                       # re-pinned past the racer
    assert S.is_committed(lake, 1)              # racer's commit survived
    assert _as_map(final_state_table(lake, 1)) == state_e1

    # and the final state equals a clean one-shot of the same log
    clean = str(tmp_path / "clean")
    replay(files, clean, num_partitions=8)
    assert _as_map(final_state_table(lake)) == _as_map(final_state_table(clean))
