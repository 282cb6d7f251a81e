"""Epoch-pinned (time-travel) lake reads: read_lake(epoch=k) must
reproduce the committed state as of epoch k even after later epochs
supersede it — the audit/debug read path GC is designed to preserve
(gc keeps commit JSONs as lineage and only collects unreferenced data
files)."""

import pyarrow.parquet as pq


def test_read_lake_pinned_epoch(ray_session, tmp_path):
    from ton_etl_ray.cdc.replay import final_state_table, replay
    from ton_etl_ray.gen import write_change_log

    import os
    import shutil

    full = str(tmp_path / "full")
    chg0 = str(tmp_path / "chg0")
    chg1 = str(tmp_path / "chg1")
    lake = str(tmp_path / "lake")
    shards = write_change_log(full, num_events=8000, num_keys=400, seed=11,
                              num_shards=8)
    os.makedirs(chg0); os.makedirs(chg1)
    # LSNs are contiguous across shards: the second half strictly
    # supersedes the first, giving two genuine epochs
    for p in shards[:4]:
        shutil.copy(p, chg0)
    for p in shards[4:]:
        shutil.copy(p, chg1)
    replay(chg0, lake, num_partitions=8)
    state0 = {
        d: n for d, n in zip(
            final_state_table(lake)["doc_id"].to_pylist(),
            final_state_table(lake)["n_tok"].to_pylist())
    }

    # epoch 1: the later half of the log (strictly higher lsns)
    replay(chg1, lake)

    latest = {
        d: n for d, n in zip(
            final_state_table(lake)["doc_id"].to_pylist(),
            final_state_table(lake)["n_tok"].to_pylist())
    }
    pinned = {
        d: n for d, n in zip(
            final_state_table(lake, epoch=0)["doc_id"].to_pylist(),
            final_state_table(lake, epoch=0)["n_tok"].to_pylist())
    }
    assert pinned == state0, "epoch-0 pinned read diverged from the epoch-0 state"
    assert latest != state0, "epoch 1 should have changed the state"


def test_kernels_accept_empty_batches():
    """Every new batch kernel handles a zero-row Arrow batch (the shape
    an empty parquet row group or a filtered-out block produces)."""
    import pyarrow as pa

    from ton_etl_ray.ops.scrub import redact_batch
    from ton_etl_ray.ops.text import _lang_id_frame, _quality_frame

    empty_docs = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    assert len(redact_batch(empty_docs)) == 0
    assert len(_lang_id_frame(empty_docs)) == 0
    assert len(_quality_frame(empty_docs)) == 0


def test_epoch_diff_classifies_all_three(ray_session, tmp_path):
    """epoch_diff over a generic two-epoch lake: keys first seen in
    epoch 1 are 'added', keys whose winning lsn moved are 'updated',
    keys tombstoned in epoch 1 are 'deleted' — all checked against a
    DuckDB derivation from the raw halves."""
    import glob
    import os
    import shutil

    import duckdb

    from ton_etl_ray.cdc.replay import epoch_diff, replay
    from ton_etl_ray.gen import write_change_log

    full = str(tmp_path / "full")
    chg0, chg1 = str(tmp_path / "c0"), str(tmp_path / "c1")
    lake = str(tmp_path / "lake")
    shards = write_change_log(full, num_events=6000, num_keys=900, seed=33,
                              num_shards=6)
    os.makedirs(chg0), os.makedirs(chg1)
    for p in shards[:3]:
        shutil.copy(p, chg0)
    for p in shards[3:]:
        shutil.copy(p, chg1)
    replay(chg0, lake, num_partitions=8)
    replay(chg1, lake)

    got = epoch_diff(lake, 0).to_pandas().sort_values("doc_id").reset_index(drop=True)
    h0 = sorted(glob.glob(f"{chg0}/*.parquet"))
    allp = sorted(glob.glob(f"{full}/*.parquet"))
    want = duckdb.sql(
        f"""
        WITH a AS (SELECT doc_id, lsn FROM (
               SELECT doc_id, lsn, op,
                      row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) rk
               FROM read_parquet({h0!r}, union_by_name=true)) WHERE rk=1 AND op <> 'd'),
        b AS (SELECT doc_id, lsn FROM (
               SELECT doc_id, lsn, op,
                      row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) rk
               FROM read_parquet({allp!r}, union_by_name=true)) WHERE rk=1 AND op <> 'd')
        SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
               CASE WHEN a.doc_id IS NULL THEN 'added'
                    WHEN b.doc_id IS NULL THEN 'deleted'
                    ELSE 'updated' END AS change,
               a.lsn AS lsn_from, b.lsn AS lsn_to
        FROM a FULL JOIN b ON a.doc_id = b.doc_id
        WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.lsn <> b.lsn
        ORDER BY doc_id
        """
    ).df()
    assert len(got) == len(want)
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["change"].to_numpy() == want["change"].to_numpy()).all()
    import numpy as np

    for c in ("lsn_from", "lsn_to"):
        a, b = got[c].to_numpy(), want[c].to_numpy()
        assert ((np.isnan(a) & np.isnan(b)) | (a == b)).all(), c
    # all three classes genuinely occur in this fixture
    assert set(got["change"]) == {"added", "updated", "deleted"}
