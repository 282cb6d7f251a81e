"""Deterministic synthetic change-log generator (FIXTURES.md F1-F4).

Pure numpy, seedable, no external data. Shard files hold LSN-contiguous
ranges (shard k covers lsns [k*B, k*B+rows)), mirroring the reference's
WAL-ordered Kafka stream where file/offset order is log order
(reference README.md:63-69).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schemas import CHANGE_SCHEMA

VOCAB = 50257
SOURCES = np.array(
    ["web", "code", "books", "wiki", "news", "forum", "social", "docs", "mail", "chat"]
)
TS_BASE_MS = 1_700_000_000_000
TS_STEP_MS = 7


def _zipf_probs(num_keys: int, s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, num_keys + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    return p / p.sum()


def make_change_batch(
    *,
    num_events: int,
    num_keys: int,
    seed: int,
    lsn_start: int = 0,
    max_tok: int = 128,
    evolve: bool = False,
) -> pa.Table:
    """One deterministic change-event table with lsns [lsn_start, +num_events).

    op ratios ≈ 50/40/10 c/u/d; key draw is zipf-skewed (s=1.1) so hot
    keys exist; ``evolve=True`` adds a ``lang`` column and widens
    ``n_tok`` to int64 (F3).
    """
    rng = np.random.default_rng(seed)
    key_idx = rng.choice(num_keys, size=num_events, p=_zipf_probs(num_keys))
    # shuffled key-id mapping so zipf rank != lexical order
    perm = np.random.default_rng(seed ^ 0x5EED).permutation(num_keys)
    key_ids = perm[key_idx]
    doc_ids = np.char.add("doc-", np.char.zfill(key_ids.astype("U12"), 12))

    r = rng.random(num_events)
    op = np.where(r < 0.5, "c", np.where(r < 0.9, "u", "d"))
    lsn = np.arange(lsn_start, lsn_start + num_events, dtype=np.int64)

    live = op != "d"
    n_live = int(live.sum())
    lengths = rng.integers(1, max_tok + 1, size=n_live)
    flat = rng.integers(0, VOCAB, size=int(lengths.sum()), dtype=np.int32)
    offsets = np.zeros(n_live + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    live_tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int64()).cast(pa.int32()), pa.array(flat))

    # scatter live payloads into full-length nullable arrays
    tokens = _scatter_list(live_tokens, live, num_events)
    n_tok = np.full(num_events, -1, dtype=np.int64)
    n_tok[live] = lengths
    n_tok_arr = pa.array(np.where(live, n_tok, 0), pa.int64() if evolve else pa.int32())
    n_tok_arr = _mask_nulls(n_tok_arr, live)
    src = SOURCES[rng.integers(0, len(SOURCES), size=num_events)]
    src_arr = _mask_nulls(pa.array(src.astype(object), pa.string()), live)
    ts_ms = pa.array(TS_BASE_MS + lsn * TS_STEP_MS, pa.int64())

    cols = {
        "lsn": pa.array(lsn),
        "op": pa.array(op.astype(object), pa.string()),
        "doc_id": pa.array(doc_ids.astype(object), pa.string()),
        "tokens": tokens,
        "n_tok": n_tok_arr,
        "source": src_arr,
        "ts_ms": ts_ms,
    }
    if evolve:
        langs = np.array(["en", "de", "fr", "es", "zh"])[rng.integers(0, 5, size=num_events)]
        cols["lang"] = _mask_nulls(pa.array(langs.astype(object), pa.string()), live)
    return pa.table(cols)


def _scatter_list(live_list: pa.ListArray, live_mask: np.ndarray, n: int) -> pa.ListArray:
    """Expand a dense list array over live rows to n rows with nulls elsewhere."""
    lengths = np.zeros(n, dtype=np.int64)
    lengths[live_mask] = np.asarray(live_list.value_lengths())
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    mask = pa.array(~live_mask)
    return pa.ListArray.from_arrays(
        pa.array(offsets).cast(pa.int32()), live_list.values, mask=mask
    )


def _mask_nulls(arr: pa.Array, keep: np.ndarray) -> pa.Array:
    return pa.compute.if_else(pa.array(keep), arr, pa.nulls(len(arr), arr.type))


def write_change_log(
    out_dir: str,
    *,
    num_events: int,
    num_keys: int,
    seed: int = 42,
    num_shards: int = 8,
    max_tok: int = 128,
    evolve_after_shard: int | None = None,
) -> list[str]:
    """Write an LSN-contiguous sharded change log; returns shard paths.

    ``evolve_after_shard=k`` makes shards >= k use the evolved schema
    (added ``lang``, ``n_tok`` as int64) — FIXTURES.md F3.
    """
    os.makedirs(out_dir, exist_ok=True)
    per = num_events // num_shards
    paths = []
    for k in range(num_shards):
        n = per if k < num_shards - 1 else num_events - per * (num_shards - 1)
        evolve = evolve_after_shard is not None and k >= evolve_after_shard
        t = make_change_batch(
            num_events=n,
            num_keys=num_keys,
            seed=seed + 1000 * k,
            lsn_start=per * k,
            max_tok=max_tok,
            evolve=evolve,
        )
        p = os.path.join(out_dir, f"shard-{k:05d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


def make_adversarial_log(seed: int = 7) -> pa.Table:
    """F4 corpus: duplicates, stale updates, delete-then-recreate, hot key."""
    rng = np.random.default_rng(seed)
    base = make_change_batch(num_events=800, num_keys=60, seed=seed, max_tok=32)
    # hot key: ~20% extra events on one key
    hot = make_change_batch(num_events=200, num_keys=1, seed=seed + 1, lsn_start=800, max_tok=32)
    hot = hot.set_column(
        hot.column_names.index("doc_id"),
        "doc_id",
        pa.array(["doc-hot"] * hot.num_rows, pa.string()),
    )
    log = pa.concat_tables([base, hot])
    # exact duplicates of 50 random rows (same lsn, same payload)
    dup_idx = rng.choice(log.num_rows, size=50, replace=False)
    log = pa.concat_tables([log, log.take(pa.array(dup_idx))])
    # a stale update: lower lsn re-appended at the end of the log
    stale = log.slice(10, 5)
    log = pa.concat_tables([log, stale])
    # delete then re-create of the hot key at the highest lsns
    tail = make_change_batch(num_events=2, num_keys=1, seed=seed + 2, lsn_start=2000, max_tok=32)
    tail = tail.set_column(
        tail.column_names.index("doc_id"), "doc_id", pa.array(["doc-hot", "doc-hot"], pa.string())
    )
    ops = tail.column_names.index("op")
    tail = tail.set_column(ops, "op", pa.array(["d", "c"], pa.string()))
    return pa.concat_tables([log, tail]).cast(CHANGE_SCHEMA)
