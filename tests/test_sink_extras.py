"""Epoch GC and excluded-key corrections."""

import glob
import os

import duckdb

from ton_etl_ray.cdc import sink
from ton_etl_ray.cdc.replay import final_state_table, replay
from ton_etl_ray.gen import write_change_log


def test_gc_keeps_inherited_files(tmp_path):
    chg = str(tmp_path / "chg")
    write_change_log(chg, num_events=6000, num_keys=400, seed=41, num_shards=4, max_tok=16)
    files = sorted(glob.glob(os.path.join(chg, "*.parquet")))
    lake = str(tmp_path / "lake")
    replay(files[:2], lake, num_partitions=8, hot_share_threshold=1.0)
    replay(files[2:3], lake, hot_share_threshold=1.0)   # epoch 1 rewrites SOME parts
    replay(files[3:], lake, hot_share_threshold=1.0)    # epoch 2

    before = {r["doc_id"]: r["n_tok"] for r in final_state_table(lake).to_pylist()}
    res = sink.gc_epochs(lake, keep_epochs=1)
    assert res["deleted_files"] > 0
    after = {r["doc_id"]: r["n_tok"] for r in final_state_table(lake).to_pylist()}
    assert before == after  # inherited (still referenced) files survived GC


def test_excluded_doc_ids_dropped(tmp_path):
    chg = str(tmp_path / "chg")
    write_change_log(chg, num_events=4000, num_keys=300, seed=42, num_shards=2, max_tok=16)
    files = sorted(glob.glob(os.path.join(chg, "*.parquet")))
    lake = str(tmp_path / "lake")
    # pick two keys known to be live in the unfiltered final state
    full = str(tmp_path / "lake_full")
    replay(files, full, num_partitions=4, hot_share_threshold=1.0)
    live = [r["doc_id"] for r in final_state_table(full).to_pylist()][:2]

    replay(files, lake, num_partitions=4, hot_share_threshold=1.0,
           excluded_doc_ids=frozenset(live))
    got = {r["doc_id"] for r in final_state_table(lake).to_pylist()}
    assert not (set(live) & got)

    want = duckdb.sql(
        f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) rk
          FROM read_parquet({files})
        ) SELECT doc_id FROM ranked
        WHERE rk=1 AND op <> 'd' AND doc_id NOT IN ({str(live)[1:-1]})
        """
    ).arrow()
    assert got == set(want["doc_id"].to_pylist())


def test_lake_stats(tmp_path):
    chg = str(tmp_path / "chg")
    write_change_log(chg, num_events=3000, num_keys=200, seed=43, num_shards=2, max_tok=8)
    files = sorted(glob.glob(os.path.join(chg, "*.parquet")))
    lake = str(tmp_path / "lake")
    replay(files[:1], lake, num_partitions=4, hot_share_threshold=1.0)
    replay(files[1:], lake, hot_share_threshold=1.0)
    s = sink.lake_stats(lake)
    assert s["latest"] == 1
    assert len(s["epochs"]) == 2
    e1 = s["epochs"][1]
    assert e1["committed"] and e1["rows_total"] > 0
    assert e1["watermark_lsn"] == 2999
    assert e1["partitions_written"] + e1["partitions_inherited"] == 4
