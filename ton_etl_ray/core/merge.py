"""Pure, vectorized last-writer-wins merge kernels over Arrow tables.

These are the engine's core reduce — the analogue of the reference's
rank-1 LWW compaction (``row_number() over (partition by key order by
version desc) = 1``, reference datalake/airflow/dags/
datalake_daily_sync.py:641-653; datalake/metadata_snapshot.py:92-105)
and its write-time LWW guards (``ON CONFLICT ... WHERE existing.lt <
EXCLUDED.lt``, reference parser/db.py:310-330).

Total order for ties: ``(lsn DESC, op DESC)``. ``lsn`` is globally
unique in a well-formed log, so ties only arise from exact duplicate
events (at-least-once replay, analogue of ``ON CONFLICT DO NOTHING``,
reference parser/db.py:279-282) — any deterministic tiebreak is correct
there; we fix one so every code path and the test oracle agree.

All kernels are pure functions pa.Table -> pa.Table (no Ray), so they
unit-test without a cluster — mirroring the reference's host-agnostic
parser contract (parser/backfill.py DBMock harness).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SORT_KEYS = [("doc_id", "ascending"), ("lsn", "descending"), ("op", "descending")]


def _first_per_key_mask(keys: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Boolean mask selecting the first row of each run of equal keys.

    Input must already be sorted so equal keys are adjacent.
    """
    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    n = len(arr)
    mask = np.ones(n, dtype=bool)
    if n > 1:
        neq = pc.not_equal(arr.slice(1, n - 1), arr.slice(0, n - 1))
        mask[1:] = neq.to_numpy(zero_copy_only=False)
    return pa.array(mask)


def compact(changes: pa.Table, *, keep_tombstones: bool = True) -> pa.Table:
    """One winning row per doc_id: max (lsn, op) — vectorized LWW dedup.

    With ``keep_tombstones=True`` the winner may be an ``op='d'`` row;
    callers that compose partial compactions (per-batch combiners, salted
    hot-key partials) MUST keep tombstones so a delete can still beat
    earlier upserts in a later reduce stage (SURVEY.md §7.5).
    """
    if changes.num_rows == 0:
        return changes
    if changes["doc_id"].null_count:
        # fail loud like replay's null-lsn check: the first-of-run mask
        # below builds on pc.not_equal, whose null results coerce to
        # False — null-key rows would VANISH silently instead of erroring
        raise ValueError("null doc_id in change batch")
    idx = pc.sort_indices(changes, sort_keys=SORT_KEYS)
    t = changes.take(idx)
    out = t.filter(_first_per_key_mask(t["doc_id"]))
    if not keep_tombstones:
        out = out.filter(pc.not_equal(out["op"], pa.scalar("d")))
    return out


def merge_state(state: pa.Table | None, changes: pa.Table) -> pa.Table:
    """Fold a change table into a live-rows state table (LWW).

    ``state`` holds live rows only (payload + ``lsn``); ``changes`` holds
    CDC rows (payload + ``lsn`` + ``op``). Returns the new live state
    (payload + ``lsn``), tombstones applied and dropped.
    """
    if state is not None and state.num_rows > 0:
        live = state.append_column("op", pa.array(["u"] * state.num_rows, pa.string()))
        allrows = pa.concat_tables([live, changes], promote_options="permissive")
    else:
        allrows = changes
    won = compact(allrows, keep_tombstones=False)
    keep = [c for c in won.column_names if c not in ("op", "ts_ms")]
    return won.select(keep)


def finalize(state: pa.Table, payload_cols: list[str]) -> pa.Table:
    """User-facing view of a state table: payload columns only."""
    return state.select([c for c in payload_cols if c in state.column_names])


def oracle_apply(changes: pa.Table) -> pa.Table:
    """Sequential row-by-row oracle applier (FIXTURES.md F5).

    Intentionally naive — a dict keyed by doc_id, folded in (lsn, op)
    order — used only to validate the vectorized kernels in tests.
    """
    order = pc.sort_indices(
        changes, sort_keys=[("lsn", "ascending"), ("op", "ascending")]
    )
    rows = changes.take(order).to_pylist()
    state: dict[str, dict] = {}
    for r in rows:
        if r["op"] == "d":
            state.pop(r["doc_id"], None)
        else:
            state[r["doc_id"]] = {k: v for k, v in r.items() if k != "op"}
    if not state:
        empty = changes.schema.remove(changes.schema.get_field_index("op"))
        return pa.Table.from_pylist([], schema=empty)
    out = pa.Table.from_pylist(list(state.values()))
    cols = [c for c in changes.column_names if c != "op" and c in out.column_names]
    return out.select(cols)
