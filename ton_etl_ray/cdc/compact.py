"""Lake compaction — the lakehouse OPTIMIZE step.

After many incremental epochs, the committed state is scattered across
per-epoch part files (each epoch rewrites only the partitions it
touched and inherits the rest by reference), so reads fan out over the
whole epoch history and ``gc_epochs`` can never collect an epoch that
still donates a partition. ``compact_lake`` re-materializes the ENTIRE
current state as one fresh epoch — optionally at a new partition count
— under the same two-phase commit (partition manifests → commit JSON →
``_LATEST`` flip) and epoch lock as replay, so a crash mid-compaction
leaves the previous epoch live and a retry restarts cleanly.

Scale shape: one streamed read of the committed files, one shuffle on
the (re)assigned partition id, each partition written by the worker
that holds it (the same worker-side ``sink.write_partition`` pattern
replay uses); nothing but the tiny partition manifest table ever
reaches the driver. Subsequent incremental epochs adopt the compacted
``num_partitions`` exactly as they adopt epoch 0's today.

Reference analogue: the daily re-materialization habit of
datalake_daily_sync.py (full-table rewrite per day) expressed as an
in-place epoch, keeping the incremental history GC-able.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .._pickle import ensure_portable
from ..core import partition as P
from ..core.schema_evolution import conform
from . import sink
from .replay import MANIFEST_ROW_SCHEMA, _manifest_row


def compact_lake(lake_dir: str, *, num_partitions: int | None = None) -> dict:
    """Rewrite the current committed state as epoch ``latest+1``.

    Returns the new commit dict. ``num_partitions`` defaults to the
    current layout; pass a different value to re-shard the lake (later
    incremental epochs adopt it automatically).

    Live-consumer caveat: a SAME-width compaction is safe to run
    between a continuous ingestor's micro-batches (pinned by pytest);
    a RE-SHARD under a live ingestor is rejected by the ingestor's
    layout guard (its actors cache the partition map) — restart the
    watcher/ingestor after re-sharding."""
    ensure_portable()
    # pin latest under the epoch lock: a replay publishing concurrently
    # moves _LATEST, and clear_staging on a COMMITTED epoch would delete
    # live data — retry against the new head instead
    while True:
        latest = sink.latest_epoch(lake_dir)
        if latest is None:
            raise ValueError(f"compact_lake: no committed epoch in {lake_dir}")
        epoch = latest + 1
        lock = sink.acquire_epoch_lock(lake_dir, epoch)
        if not sink.is_committed(lake_dir, epoch):
            break
        sink.release_epoch_lock(lock)  # raced a publisher; re-pin
    prev = sink.read_commit(lake_dir, latest)
    if num_partitions is not None and num_partitions < 1:
        # an explicit bad width must fail loud — `or` would silently
        # treat 0 as "keep the previous width" and a negative value
        # would wrap through the uint64 partition modulo
        sink.release_epoch_lock(lock)
        raise ValueError(f"compact_lake: num_partitions must be >= 1, got {num_partitions}")
    p_new = int(num_partitions if num_partitions is not None else prev["num_partitions"])
    try:
        sink.clear_staging(lake_dir, epoch)
        schema = sink.lake_schema(lake_dir, latest)
        files = sink.lake_files(lake_dir, latest)

        def tag(t: pa.Table) -> pa.Table:
            # inherited old-epoch files may predate schema evolution —
            # conform (cast + null-pad), never bare cast
            t = conform(t, schema)
            part = P.assign_partitions(t["doc_id"], p_new)
            return t.append_column("__part", pa.array(part.astype("int64"), pa.int64()))

        def write_group(g: pa.Table) -> pa.Table:
            if not len(g):
                return MANIFEST_ROW_SCHEMA.empty_table()
            part = int(g["__part"][0].as_py())
            t = g.drop_columns(["__part"]).sort_by("doc_id")
            m = sink.write_partition(
                lake_dir, epoch, sink.part_file(part), t,
                {"kind": "data", "part": part, "rows_in": t.num_rows,
                 "max_lsn": int(pc.max(t["lsn"]).as_py()) if t.num_rows else -1,
                 "tombstones": 0},
            )
            return _manifest_row(part, "data", m)

        manifest_rows = []
        if files:  # an all-tombstoned lake compacts to an empty epoch
            manifest_rows = (
                rd.read_parquet(files)
                .map_batches(tag, batch_format="pyarrow")
                .groupby("__part")
                .map_groups(write_group, batch_format="pyarrow")
                .map_batches(
                    lambda t: t.select(MANIFEST_ROW_SCHEMA.names)
                    if "file" in t.column_names
                    else MANIFEST_ROW_SCHEMA.empty_table(),
                    batch_format="pyarrow",
                )
                .take_all()
            )

        edir = os.path.basename(sink.epoch_dir(lake_dir, epoch))
        partitions: dict[str, dict] = {
            str(p): {"path": "", "rows": 0, "max_lsn": -1} for p in range(p_new)
        }
        rows_total = 0
        for r in manifest_rows:
            partitions[str(r["part"])] = {
                "path": os.path.join(edir, r["file"]),
                "rows": int(r["rows"]),
                "max_lsn": int(r["max_lsn"]),
            }
            rows_total += int(r["rows"])
        commit = sink.publish_epoch(
            lake_dir, epoch, partitions,
            {
                "num_partitions": p_new,
                "num_salts": prev.get("num_salts", 8),
                "hot_keys": [],
                "inputs": [f"<compact:epoch-{latest:06d}>"],
                "rows_total": rows_total,
                # the watermark is carried, not recomputed: compaction
                # applies no changes
                "max_lsn": prev["max_lsn"],
            },
            schema,
        )
        return commit
    finally:
        sink.release_epoch_lock(lock)
