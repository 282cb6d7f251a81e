"""Mergeable sketches: approximate distinct count (HyperLogLog).

The reference exposes ``approx_distinct(trace_id)`` in its example
analytics (reference README.md:244-249). Ray-Data shape: one HLL
register array per batch inside ``map_batches`` (the map-side combine),
then a tiny driver-side merge of ≤num_blocks sketches — no shuffle of
raw values at all.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .._pickle import ensure_portable
from ..core.partition import hash64 as _hash64_impl

P_BITS = 12  # 4096 registers → ~1.6% standard error
M = 1 << P_BITS


def _hash64(values: pa.Array | pa.ChunkedArray) -> np.ndarray:
    return _hash64_impl(values)


def hll_add(registers: np.ndarray, values: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Fold a column into a 4096-register HLL (vectorized)."""
    h = _hash64(values)
    idx = (h >> np.uint64(64 - P_BITS)).astype(np.int64)
    rest = h << np.uint64(P_BITS)
    # rank = leading zeros of the remaining 64-P bits, +1; clip at 64-P+1
    lz = np.full(len(h), 64 - P_BITS + 1, dtype=np.uint8)
    nz = rest != 0
    r = rest[nz].astype(np.float64)
    # leading zeros = 64 - bit_length; bit_length = floor(log2(x)) + 1.
    # float64 rounding can mis-rank values adjacent to powers of two —
    # harmless for an HLL estimate.
    bit_length = np.floor(np.log2(r)).astype(np.int64) + 1
    lz[nz] = np.clip(64 - bit_length, 0, 64 - P_BITS) + 1
    np.maximum.at(registers, idx, lz)
    return registers


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_count(registers: np.ndarray) -> float:
    alpha = 0.7213 / (1 + 1.079 / M)
    est = alpha * M * M / np.sum(2.0 ** -registers.astype(np.float64))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)  # small-range correction
    return float(est)


def approx_distinct(sf_dir: str, table: str = "events", column: str = "user_id") -> pa.Table:
    """approx_distinct(column) with a per-batch HLL combine."""
    ensure_portable()
    ds = rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=[column])

    def sketch(t: pa.Table) -> pa.Table:
        regs = np.zeros(M, dtype=np.uint8)
        hll_add(regs, t[column])
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(M, dtype=np.uint8)
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        merged = hll_merge(merged, np.frombuffer(row["sketch"], dtype=np.uint8))
    return pa.table({"approx_distinct": pa.array([int(round(hll_count(merged)))], pa.int64())})


def approx_distinct_by(sf_dir: str, table: str = "events",
                       key: str = "event_type", column: str = "user_id") -> "rd.Dataset":
    """Per-group approximate distinct count — the GROUPED form of the
    HLL, and the canonical mergeable-sketch shuffle: each block folds
    its rows into one 4 KiB register array PER KEY PRESENT (map-side
    combine over values), so the exchange carries
    (keys-per-block × 4 KiB) sketch rows instead of the raw values; a
    ``groupby(key)`` then max-merges registers per group and emits one
    estimate row per key. Distinct-count work never concentrates: a
    group with 10^9 distinct values still ships 4 KiB per block.

    Approximate (~1.6% standard error at 4096 registers) → rows-only;
    pytest pins the estimates within 5% of exact count(DISTINCT)."""
    ensure_portable()
    import pyarrow.parquet as _pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    ktype = _pq.read_schema(path).field(key).type  # key keeps ITS type
    ds = rd.read_parquet(path, columns=[key, column])
    # the SHUFFLE key is a non-null sentinel string ('n' for the null
    # group, 'v'+str(key) otherwise): Ray's sort-based groupby boundary
    # search np.searchsorted's object arrays and crashes comparing None
    # to str — the typed key column rides along for the output
    sketch_schema = pa.schema([("__gk", pa.string()), (key, ktype),
                               ("sketch", pa.binary())])
    out_schema = pa.schema([(key, ktype), ("approx_distinct", pa.int64())])

    def _sentinel(keys: pa.Array) -> pa.Array:
        vs = pc.cast(keys, pa.string())
        return pc.if_else(
            pc.is_null(vs), pa.scalar("n"),
            pc.binary_join_element_wise(pa.scalar("v"), vs, pa.scalar("")))

    def sketch_by(t: pa.Table) -> pa.Table:
        karr = (t[key].combine_chunks()
                if isinstance(t[key], pa.ChunkedArray) else t[key])
        n = len(karr)
        if n == 0:
            return sketch_schema.empty_table()
        # ONE sort groups equal keys (nulls last, a group of their own —
        # SQL GROUP BY keeps a null group and stratified_sample preserves
        # null strata too); group runs then slice in one pass. The
        # previous form np.unique'd a Python-object array (TypeError on
        # any null) per block AND re-filtered the full column per key
        # (O(keys × rows)), stringifying the key type on the way out.
        idx = pc.sort_indices(karr, null_placement="at_end")
        sk = karr.take(idx)
        vals = t[column].take(idx)
        a, b = sk.slice(1), sk.slice(0, n - 1)
        boundary = pc.or_(
            pc.fill_null(pc.not_equal(a, b), False),
            pc.xor(pc.is_null(a), pc.is_null(b)),
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(([True], boundary)))
        ends = np.append(starts[1:], n)
        out_s = []
        for s0, e0 in zip(starts.tolist(), ends.tolist()):
            regs = np.zeros(M, dtype=np.uint8)
            hll_add(regs, vals.slice(s0, e0 - s0))
            out_s.append(regs.tobytes())
        group_keys = sk.take(pa.array(starts, pa.int64()))
        return pa.table(
            {"__gk": _sentinel(group_keys), key: group_keys,
             "sketch": pa.array(out_s, pa.binary())}, schema=sketch_schema)

    def merge_group(g: pa.Table) -> pa.Table:
        merged = np.zeros(M, dtype=np.uint8)
        for b in g["sketch"].to_pylist():
            merged = hll_merge(merged, np.frombuffer(b, dtype=np.uint8))
        karr = (g[key].combine_chunks()
                if isinstance(g[key], pa.ChunkedArray) else g[key])
        return pa.table(
            {key: karr.slice(0, 1),
             "approx_distinct": pa.array([int(round(hll_count(merged)))], pa.int64())},
            schema=out_schema)

    # string-typed keys with a null group would crash the global sort's
    # boundary search the same way — sort those by the sentinel order
    # (null group first, then lexicographic = the natural string order);
    # numeric keys sort natively (their nulls ride as NaN, no object
    # comparison happens)
    string_key = (pa.types.is_string(ktype) or pa.types.is_large_string(ktype)
                  or pa.types.is_binary(ktype))
    out = (
        ds.map_batches(sketch_by, batch_format="pyarrow")
        .groupby("__gk")
        .map_groups(merge_group, batch_format="pyarrow")
    )
    if string_key:
        out = out.map_batches(
            lambda t: t.append_column("__gk", _sentinel(
                t[key].combine_chunks()
                if isinstance(t[key], pa.ChunkedArray) else t[key]))
            if "approx_distinct" in t.column_names
            else pa.schema(list(out_schema) + [pa.field("__gk", pa.string())]).empty_table(),
            batch_format="pyarrow",
        ).sort("__gk")
        return out.map_batches(lambda t: t.select(out_schema.names),
                               batch_format="pyarrow")
    return (
        out.map_batches(
            lambda t: t.select(out_schema.names)
            if "approx_distinct" in t.column_names else out_schema.empty_table(),
            batch_format="pyarrow",
        )
        .sort(key)
    )
