"""Stateful actor-pool ingestor: micro-batch epochs equal batch replay."""

import glob
import os

import duckdb

from ton_etl_ray.cdc.incremental import IncrementalIngestor
from ton_etl_ray.cdc.replay import final_state_table, replay
from ton_etl_ray.gen import write_change_log


def _state_map(lake):
    t = final_state_table(lake).select(["doc_id", "tokens", "n_tok", "source"])
    return {r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["source"]) for r in t.to_pylist()}


def test_microbatches_equal_oneshot_replay(tmp_path):
    chg = str(tmp_path / "chg")
    write_change_log(chg, num_events=9000, num_keys=700, seed=31, num_shards=6, max_tok=16)
    files = sorted(glob.glob(os.path.join(chg, "*.parquet")))

    lake_a = str(tmp_path / "lake_replay")
    replay(files, lake_a, num_partitions=8, hot_share_threshold=1.0)

    lake_b = str(tmp_path / "lake_actors")
    ing = IncrementalIngestor(lake_b, num_partitions=8, num_actors=3)
    r0 = ing.ingest(files[:2])
    r1 = ing.ingest(files[2:4])
    assert (r0["epoch"], r1["epoch"]) == (0, 1)

    # restart: a NEW ingestor must lazily reload committed state from disk
    ing.close()
    ing2 = IncrementalIngestor(lake_b, num_actors=2)
    r2 = ing2.ingest(files[4:])
    assert r2["epoch"] == 2
    ing2.close()

    assert _state_map(lake_a) == _state_map(lake_b)


def test_microbatch_matches_duckdb_oracle(tmp_path):
    chg = str(tmp_path / "chg")
    write_change_log(chg, num_events=6000, num_keys=500, seed=32, num_shards=4, max_tok=16)
    files = sorted(glob.glob(os.path.join(chg, "*.parquet")))
    lake = str(tmp_path / "lake")
    ing = IncrementalIngestor(lake, num_partitions=4, num_actors=2)
    for f in files:
        ing.ingest([f])
    ing.close()

    want = duckdb.sql(
        f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) rk
          FROM read_parquet({files})
        ) SELECT doc_id, tokens, n_tok, source FROM ranked WHERE rk=1 AND op <> 'd'
        """
    ).arrow()
    wm = {r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["source"]) for r in want.to_pylist()}
    assert _state_map(lake) == wm
