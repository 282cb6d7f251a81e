"""Deterministic key hashing, hash partitioning and skew-aware salting.

The reference relies on Kafka key partitioning plus coarse 10-way address
bucketing (reference datalake/metadata_snapshot.py:88-89; README.md:63)
and simply eats skew on hot accounts. At 10^10 events we make skew
handling explicit (SURVEY.md §4.2):

- every key hashes to one of ``num_partitions`` base partitions;
- keys detected as hot are *salted*: their rows are spread across
  ``num_salts`` salt slots (deterministic per input block), each slot a
  distinct shuffle partition, so no single reducer sees the full hot key;
- salted partials keep tombstones and are re-reduced in a tiny second
  stage, so a delete still beats earlier upserts across salt slots.

Hashing must be deterministic across processes and runs (resume filters
committed partitions by recomputing the very same hash), so we use
polars' vectorized 64-bit hash with a fixed seed — never Python's
randomized ``hash()``.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

HASH_SEED = 0xA11CE

# Pinned test vectors for polars' 64-bit hash (computed with polars
# 1.42.1). polars documents Series.hash as NOT stable across releases:
# on a cluster whose workers run mismatched polars versions, hash
# partitioning / LSH buckets / term shards would silently disagree and
# drop rows or candidates with no error. Every process that imports
# this module verifies the vector once and fails LOUDLY on mismatch.
_HASH_PIN = (
    ("tonray-hash-probe", 7331, 7684535875120548274),
    (123456789, 4242, 10733335462443107075),
)
_hash_checked = False


def assert_polars_hash_stable() -> None:
    """Verify the pinned polars hash test vectors (once per process).

    Raises RuntimeError if this polars build hashes differently from the
    version the engine's shuffle keys were authored against — a silent
    cross-worker bucket mismatch is converted into a loud startup error."""
    global _hash_checked
    if _hash_checked:
        return
    for value, seed, expected in _HASH_PIN:
        got = int(pl.Series([value]).hash(seed=seed)[0])
        if got != expected:
            raise RuntimeError(
                f"polars {pl.__version__} hash({value!r}, seed={seed}) = {got}, "
                f"expected {expected}: Series.hash is not stable across polars "
                "releases and this build disagrees with the pinned vectors — "
                "hash partitioning / LSH bucketing / term sharding would "
                "silently diverge across workers. Pin polars to one version "
                "cluster-wide (or re-pin core/partition._HASH_PIN)."
            )
    _hash_checked = True


def hash64(values: pa.Array | pa.ChunkedArray | list) -> np.ndarray:
    """Vectorized deterministic 64-bit hash of a key column."""
    assert_polars_hash_stable()
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    s = pl.Series("k", values)
    return s.hash(seed=HASH_SEED).to_numpy()


def assign_partitions(
    doc_ids: pa.Array | pa.ChunkedArray,
    num_partitions: int,
    *,
    hot_keys: frozenset[str] | None = None,
    num_salts: int = 8,
    salt_token: int = 0,
) -> np.ndarray:
    """Partition id per row.

    Base partitions are ``0 .. num_partitions-1``. Rows whose key is in
    ``hot_keys`` are instead routed to the salted range
    ``num_partitions .. num_partitions + num_salts - 1`` using
    ``salt_token`` (e.g. a per-block counter) so one hot key fans out
    over ``num_salts`` reducers. Salted partitions hold *partial* LWW
    states that must be re-reduced (see cdc.replay hot finalize).
    """
    h = hash64(doc_ids)
    part = (h % np.uint64(num_partitions)).astype(np.int64)
    if hot_keys:
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        hot_mask = np.asarray(
            pl.Series("k", doc_ids).is_in(list(hot_keys)).to_numpy()
        )
        if hot_mask.any():
            mix = np.uint64((0x9E3779B97F4A7C15 * int(salt_token)) % (1 << 64))
            with np.errstate(over="ignore"):
                salt = (h + mix) % np.uint64(num_salts)
            part[hot_mask] = num_partitions + salt[hot_mask].astype(np.int64)
    return part


def detect_hot_keys(
    sample_keys: pa.Array | pa.ChunkedArray,
    *,
    share_threshold: float = 0.01,
    min_count: int = 50,
) -> frozenset[str]:
    """Hot keys from a sample: frequency share above ``share_threshold``.

    Cheap driver-side pre-pass over a bounded sample of the change log
    (first row groups of a few shards) — the analogue of choosing bucket
    counts up front in the reference's snapshot jobs, but data-driven.
    """
    s = pl.Series("k", sample_keys.combine_chunks() if isinstance(sample_keys, pa.ChunkedArray) else sample_keys)
    n = len(s)
    if n == 0:
        return frozenset()
    vc = s.value_counts()
    cnt_col = [c for c in vc.columns if c != "k"][0]
    thresh = max(min_count, int(share_threshold * n))
    hot = vc.filter(pl.col(cnt_col) >= thresh)["k"].to_list()
    return frozenset(hot)
