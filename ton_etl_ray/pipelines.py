"""Flagship pipeline wiring: testdata documents → CDC change log → lake.

``flagship`` derives a deterministic change log from a scale-factor
directory's ``documents`` table (tokens are seeded-hash-derived from the
doc ids), replays it through the full CDC engine, and returns the
committed lake as a Ray Dataset — the miniature of the 10^10-event
production replay (SURVEY.md §7.1).
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .cdc.replay import read_lake, replay
from .gen import TS_BASE_MS, TS_STEP_MS, VOCAB


def docs_to_change_log(sf_dir: str, out_dir: str, *, versions: int = 3, seed: int = 13,
                       num_shards: int = 4) -> list[str]:
    """Deterministic change log over the documents table's doc ids.

    Per doc: versions 0..k-1 as create/update at increasing lsn; every
    10th doc gets a final tombstone (delete) — so the replayed lake must
    drop exactly those keys."""
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"])
    n = docs.num_rows
    doc_ids = np.array([f"doc-{int(d):09d}" for d in docs["doc_id"].to_numpy()])
    sources = docs["source"].to_pylist()

    events = []
    for v in range(versions):
        rng = np.random.default_rng(seed * 1000 + v)
        # n_tok is md5-derived from (doc_id, version) so the FINAL state
        # is SQL-expressible: DuckDB recomputes the same value with
        # 8 + CAST('0x' || substr(md5(did || ':' || v), 1, 8) AS BIGINT) % 56
        # — this is what gives cdc_replay a full value-hash oracle
        lengths = np.array(
            [8 + int(hashlib.md5(f"{d}:{v}".encode()).hexdigest()[:8], 16) % 56
             for d in doc_ids],
            dtype=np.int64,
        )
        flat = rng.integers(0, VOCAB, size=int(lengths.sum()), dtype=np.int32)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int64()).cast(pa.int32()), pa.array(flat))
        lsn = np.arange(v * n, (v + 1) * n, dtype=np.int64)
        events.append(
            pa.table(
                {
                    "lsn": pa.array(lsn),
                    "op": pa.array(["c" if v == 0 else "u"] * n, pa.string()),
                    "doc_id": pa.array(doc_ids, pa.string()),
                    "tokens": tokens,
                    "n_tok": pa.array(lengths, pa.int32()),
                    "source": pa.array(sources, pa.string()),
                    "ts_ms": pa.array(TS_BASE_MS + lsn * TS_STEP_MS, pa.int64()),
                }
            )
        )
    # tombstones for every 10th doc at the highest lsns
    dead = doc_ids[::10]
    lsn = np.arange(versions * n, versions * n + len(dead), dtype=np.int64)
    events.append(
        pa.table(
            {
                "lsn": pa.array(lsn),
                "op": pa.array(["d"] * len(dead), pa.string()),
                "doc_id": pa.array(dead, pa.string()),
                "tokens": pa.nulls(len(dead), pa.list_(pa.int32())),
                "n_tok": pa.nulls(len(dead), pa.int32()),
                "source": pa.nulls(len(dead), pa.string()),
                "ts_ms": pa.array(TS_BASE_MS + lsn * TS_STEP_MS, pa.int64()),
            }
        )
    )
    log = pa.concat_tables(events)
    os.makedirs(out_dir, exist_ok=True)
    per = log.num_rows // num_shards + 1
    paths = []
    for k in range(num_shards):
        shard = log.slice(k * per, per)
        if shard.num_rows == 0:
            break
        p = os.path.join(out_dir, f"shard-{k:05d}.parquet")
        pq.write_table(shard, p)
        paths.append(p)
    return paths


def flagship(sf_dir: str, work_dir: str | None = None, *, num_partitions: int = 16):
    """documents → change log → CDC replay → committed lake Dataset."""
    if work_dir is None:
        tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
        work_dir = f"/tmp/tonray_flagship_{tag}"
    shutil.rmtree(work_dir, ignore_errors=True)
    chg = os.path.join(work_dir, "changes")
    lake = os.path.join(work_dir, "lake")
    docs_to_change_log(sf_dir, chg)
    replay(chg, lake, num_partitions=num_partitions, hot_share_threshold=1.0)
    return read_lake(lake)


def flagship_watch_derived(sf_dir: str, work_dir: str | None = None, *,
                           num_partitions: int = 8):
    """documents → change log → CONTINUOUS micro-batch watcher ingest
    with derive-and-publish (S3's full form): each flushed epoch also
    runs the ``UpdateFeed`` registry transform over its micro-batch and
    commits the ``updated_docs`` side table under the same
    seal-then-publish barrier. Returns the committed derived table — at
    every point in time it reflects exactly the committed epochs, the
    continuous analogue of the reference's streaming exporter
    (datalake/streaming.py:65-191)."""
    from . import transforms  # noqa: F401 — populates REGISTRY
    from .cdc.streaming import DirectoryWatcher, derived_table
    from .registry import REGISTRY

    if work_dir is None:
        tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
        work_dir = f"/tmp/tonray_watchderive_{tag}"
    shutil.rmtree(work_dir, ignore_errors=True)
    chg = os.path.join(work_dir, "changes")
    watch = os.path.join(work_dir, "incoming")
    lake = os.path.join(work_dir, "lake")
    os.makedirs(watch)
    shards = docs_to_change_log(sf_dir, chg)
    w = DirectoryWatcher(
        watch, lake, num_partitions=num_partitions, num_actors=2,
        max_batch_shards=2, stable_polls=0,
        derive=REGISTRY.select({"UpdateFeed"}),
    )
    try:
        for p in shards:  # shards arrive in waves, micro-batched
            shutil.copy(p, watch)
            w.step()
        w.poll()
        while w.pending:
            w.flush()
    finally:
        w.close()
    return derived_table(lake, "updated_docs")


def flagship_epoch_diff(sf_dir: str, work_dir: str | None = None, *,
                        num_partitions: int = 16):
    """documents → change log split into TWO epochs by lsn (epoch 0 =
    versions 0-1, epoch 1 = version 2 + tombstones) → replay both →
    ``epoch_diff(lake, 0)``. The deterministic construction makes the
    diff SQL-derivable: with n docs, epoch 0's winner is version 1
    (lsn = n + rn in doc order), the final winner is version 2
    (lsn = 2n + rn) except every 10th doc which is tombstoned — so the
    diff is exactly 'deleted' for rn % 10 == 0 (lsn_to NULL) and
    'updated' for everything else."""
    from .cdc.replay import epoch_diff, replay

    if work_dir is None:
        tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
        work_dir = f"/tmp/tonray_ediff_{tag}"
    shutil.rmtree(work_dir, ignore_errors=True)
    chg = os.path.join(work_dir, "changes")
    e0, e1 = os.path.join(work_dir, "epoch0"), os.path.join(work_dir, "epoch1")
    lake = os.path.join(work_dir, "lake")
    docs_to_change_log(sf_dir, chg)
    os.makedirs(e0), os.makedirs(e1)
    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    cut = 2 * n  # versions 0-1 below, version 2 + tombstones above
    for p in sorted(glob.glob(os.path.join(chg, "*.parquet"))):
        t = pq.read_table(p)
        lsn = t["lsn"].to_numpy()
        lo, hi = t.filter(pa.array(lsn < cut)), t.filter(pa.array(lsn >= cut))
        base = os.path.basename(p)
        if lo.num_rows:
            pq.write_table(lo, os.path.join(e0, base))
        if hi.num_rows:
            pq.write_table(hi, os.path.join(e1, base))
    replay(e0, lake, num_partitions=num_partitions, hot_share_threshold=1.0)
    replay(e1, lake)
    return epoch_diff(lake, 0)
