"""Changefeed export: snapshot(a) + changefeed(a→b) replayed into a
fresh replica must reproduce the primary's epoch-b state exactly —
the engine's consume→convert→re-produce loop at committed-state level
(reference datalake/streaming.py exporter shape)."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def primary(tmp_path_factory, ray_session):
    from ton_etl_ray.cdc.replay import replay
    from ton_etl_ray.gen import write_change_log

    base = tmp_path_factory.mktemp("cf")
    chg, lake = str(base / "chg"), str(base / "lake")
    write_change_log(chg, num_events=50_000, num_keys=4_000, seed=47,
                     num_shards=8, max_tok=16)
    e0, e1 = str(base / "e0"), str(base / "e1")
    os.makedirs(e0), os.makedirs(e1)
    cut = 25_000
    for p in sorted(glob.glob(os.path.join(chg, "*.parquet"))):
        t = pq.read_table(p)
        lsn = t["lsn"].to_numpy()
        lo, hi = t.filter(pa.array(lsn < cut)), t.filter(pa.array(lsn >= cut))
        if lo.num_rows:
            pq.write_table(lo, os.path.join(e0, os.path.basename(p)))
        if hi.num_rows:
            pq.write_table(hi, os.path.join(e1, os.path.basename(p)))
    replay(e0, lake, num_partitions=16, hot_share_threshold=1.0)
    replay(e1, lake)
    return lake


def _state_map(lake, epoch=None):
    from ton_etl_ray.cdc.replay import final_state_table

    t = final_state_table(lake, epoch).to_pandas()
    return {r.doc_id: (list(r.tokens), r.n_tok, r.source) for r in t.itertuples()}


def test_snapshot_plus_feed_reproduces_primary(primary, tmp_path):
    from ton_etl_ray.cdc.changefeed import emit_changefeed, emit_snapshot
    from ton_etl_ray.cdc.replay import replay

    snap, feed = str(tmp_path / "snap"), str(tmp_path / "feed")
    emit_snapshot(primary, snap, epoch=0)
    emit_changefeed(primary, feed, 0, 1)

    replica = str(tmp_path / "replica")
    replay(snap, replica, num_partitions=8)
    assert _state_map(replica) == _state_map(primary, 0)

    replay(feed, replica)
    assert _state_map(replica) == _state_map(primary, 1)


def test_feed_is_replay_idempotent(primary, tmp_path):
    """Applying the same feed twice must not change the replica (the
    at-least-once-delivery consumer contract)."""
    from ton_etl_ray.cdc.changefeed import emit_changefeed, emit_snapshot
    from ton_etl_ray.cdc.replay import replay

    snap, feed = str(tmp_path / "snap"), str(tmp_path / "feed")
    emit_snapshot(primary, snap, epoch=0)
    emit_changefeed(primary, feed, 0, 1)
    replica = str(tmp_path / "replica")
    replay(snap, replica, num_partitions=8)
    replay(feed, replica)
    once = _state_map(replica)
    replay(feed, replica)
    assert _state_map(replica) == once


def test_feed_carries_classified_ops(primary, tmp_path):
    """Feed rows carry c/u/d matching the diff classes, and tombstones
    outrank every replicated lsn."""
    import duckdb

    from ton_etl_ray.cdc.changefeed import emit_changefeed
    from ton_etl_ray.cdc.replay import epoch_diff
    from ton_etl_ray.cdc.sink import read_commit

    feed = str(tmp_path / "feed")
    emit_changefeed(primary, feed, 0, 1)
    shards = sorted(glob.glob(feed + "/*.parquet"))
    rows = duckdb.sql(
        f"SELECT op, count(*) n, max(lsn) mx FROM read_parquet({shards}, union_by_name=true) GROUP BY op"
    ).df().set_index("op")
    diff = epoch_diff(primary, 0, 1).to_pandas()
    want = diff["change"].value_counts()
    assert rows.loc["d", "n"] == want.get("deleted", 0)
    assert rows.loc["c", "n"] + rows.loc["u", "n"] == (
        want.get("added", 0) + want.get("updated", 0)
    )
    max_lsn = read_commit(primary, 1)["max_lsn"]
    assert rows.loc["d", "mx"] == max_lsn + 1


def test_maintain_cli_exports_feed(primary, tmp_path):
    """run_maintain --snapshot / --changefeed produce replayable logs
    from a fresh process; the replica replays them to the primary's
    state."""
    import json
    import subprocess
    import sys

    from ton_etl_ray.cdc.replay import replay

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snap, feed = str(tmp_path / "snap"), str(tmp_path / "feed")
    out = subprocess.run(
        [sys.executable, "-m", "ton_etl_ray.cdc.run_maintain",
         "--lake", primary, "--diff", "0", "--snapshot", snap,
         "--changefeed", feed, "--num-cpus", "4"],
        capture_output=True, text=True, timeout=600, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    by = {json.loads(l)["action"]: json.loads(l)
          for l in out.stdout.strip().splitlines() if l.startswith("{")}
    assert by["snapshot"]["epoch"] == 0 and by["changefeed"]["to_epoch"] == 1

    replica = str(tmp_path / "replica")
    replay(snap, replica, num_partitions=8)
    replay(feed, replica)
    assert _state_map(replica) == _state_map(primary, 1)


def test_export_refuses_nonempty_dir(primary, tmp_path):
    from ton_etl_ray.cdc.changefeed import emit_changefeed, emit_snapshot

    out = str(tmp_path / "out")
    emit_snapshot(primary, out, epoch=0)
    with pytest.raises(ValueError, match="fresh directory"):
        emit_snapshot(primary, out, epoch=0)
    with pytest.raises(ValueError, match="fresh directory"):
        emit_changefeed(primary, out, 0, 1)


def test_apply_feeds_chain(primary, tmp_path):
    """apply_feeds replays a watcher-layout feed chain one feed per
    replay invocation (the tombstone-lsn safety contract), verifies the
    _feed.json stamps, and refuses gapped chains."""
    from ton_etl_ray.cdc.changefeed import (
        apply_feeds, emit_changefeed, emit_snapshot, read_feed_meta)
    from ton_etl_ray.cdc.sink import read_commit

    root = str(tmp_path / "feeds")
    emit_snapshot(primary, os.path.join(root, "epoch-000000"), epoch=0)
    emit_changefeed(primary, os.path.join(root, "epoch-000001"), 0, 1)

    meta0 = read_feed_meta(os.path.join(root, "epoch-000000"))
    meta1 = read_feed_meta(os.path.join(root, "epoch-000001"))
    assert meta0 == {"kind": "snapshot", "epoch_a": None, "epoch_b": 0,
                     "delete_lsn": None}
    assert meta1["kind"] == "changefeed" and meta1["epoch_b"] == 1
    assert meta1["delete_lsn"] == read_commit(primary, 1)["max_lsn"] + 1

    replica = str(tmp_path / "replica")
    applied = apply_feeds(root, replica, num_partitions=8)
    assert applied == [0, 1]
    assert _state_map(replica) == _state_map(primary, 1)

    # gap: a chain missing epoch 1 must fail loudly, not skip
    gapped = str(tmp_path / "gapped")
    os.makedirs(gapped)
    os.symlink(os.path.join(root, "epoch-000000"),
               os.path.join(gapped, "epoch-000000"))
    os.makedirs(os.path.join(gapped, "epoch-000002"))
    with pytest.raises(ValueError, match="gap"):
        apply_feeds(gapped, str(tmp_path / "r2"))

    # renamed dir: stamp/dirname mismatch must fail
    renamed = str(tmp_path / "renamed")
    os.makedirs(renamed)
    os.symlink(os.path.join(root, "epoch-000001"),
               os.path.join(renamed, "epoch-000000"))
    with pytest.raises(ValueError, match="stamped"):
        apply_feeds(renamed, str(tmp_path / "r3"))
