"""Table profiling — the data-quality validation pass an ingest
pipeline runs before publishing (the reference's count-check /
metrics-sink habit, datalake_daily_sync.py count assertions, widened
into a per-column profile).

``profile_table`` computes, per column: total rows, null count, and
exact distinct count — with every heavy step distributed:

- rows/nulls ride per-block PARTIALS (one tiny row per column per
  block) into a small grouped sum — shuffle volume is
  O(columns x blocks), corpus-size-independent;
- distinct counts hash each column's values per block (64-bit polars
  row hash), per-block dedup FIRST, then one groupby(column) exchange
  over the surviving hashes — the same partial-combiner discipline as
  `exact_dedup_hash`, so the shuffle carries at most
  (distinct-per-block) rows, never the data. Nulls are excluded before
  hashing (matching SQL ``count(DISTINCT col)``).

Only the final #columns summary rows reach the driver. The 64-bit
hash makes the distinct count exact up to hash collisions
(p ≈ n²/2⁶⁵ — negligible below ~10⁸ distincts per column; swap in the
HLL sketch from ops/sketch.py when approximate is acceptable at
larger cardinalities).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._pickle import ensure_portable
from ..core.partition import assert_polars_hash_stable, hash64
from ._util import read_table

# distinct counts key on polars' row hash — fail loudly on a polars
# build whose hash diverges from the pinned vectors (see core.partition)
assert_polars_hash_stable()


def profile_table(sf_dir: str, table: str = "events"):
    """Per-column (column, n_rows, n_nulls, n_distinct) profile of one
    testdata table, ordered by column name. Returns a pa.Table (the
    result is #columns rows — the one legitimately driver-sized
    output)."""
    ensure_portable()
    ds = read_table(sf_dir, table)
    columns = sorted(ds.schema().names)

    def base_partials(t: pa.Table) -> pa.Table:
        rows = {"column": [], "rows": [], "nulls": []}
        for c in columns:
            col = t[c]
            rows["column"].append(c)
            rows["rows"].append(len(col))
            rows["nulls"].append(col.null_count)
        return pa.table(
            {
                "column": pa.array(rows["column"], pa.string()),
                "rows": pa.array(rows["rows"], pa.int64()),
                "nulls": pa.array(rows["nulls"], pa.int64()),
            }
        )

    def hash_partials(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t)
        cols, hashes = [], []
        for c in columns:
            h = (
                df.select(pl.col(c).alias("v"))
                .filter(pl.col("v").is_not_null())
                .select(pl.col("v").hash().alias("h"))
                .unique()["h"]
                .to_numpy()
            )
            cols.append(np.full(len(h), c))
            hashes.append(h.astype(np.uint64))
        return pa.table(
            {
                "column": pa.array(np.concatenate(cols) if cols else [], pa.string()),
                "h": pa.array(
                    np.concatenate(hashes) if hashes else [], pa.uint64()
                ),
            }
        )

    def count_unique(df: "pd.DataFrame") -> pa.Table:
        return pa.table(
            {
                "column": pa.array([df["column"].iloc[0]], pa.string()),
                "n_distinct": pa.array(
                    [len(np.unique(df["h"].to_numpy()))], pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Sum

    base = (
        ds.map_batches(base_partials, batch_format="pyarrow")
        .groupby("column")
        .aggregate(Sum("rows", alias_name="n_rows"), Sum("nulls", alias_name="n_nulls"))
        .to_pandas()
    )
    distinct = (
        ds.map_batches(hash_partials, batch_format="pyarrow")
        .groupby("column")
        .map_groups(count_unique, batch_format="pandas")
        .map_batches(
            lambda t: t.select(["column", "n_distinct"])
            if "n_distinct" in t.column_names
            else pa.schema(
                [("column", pa.string()), ("n_distinct", pa.int64())]
            ).empty_table(),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    # OUTER merge: an all-NULL column emits zero hash_partials rows, so
    # an inner merge would silently drop the column from the profile —
    # exactly the degenerate column a publish gate must report
    # (n_distinct=0, n_nulls=n_rows). ADVICE r3 finding.
    out = base.merge(distinct, on="column", how="left").sort_values("column")
    out["n_distinct"] = out["n_distinct"].fillna(0)
    return pa.table(
        {
            "column": pa.array(out["column"], pa.string()),
            "n_rows": pa.array(out["n_rows"].astype(np.int64), pa.int64()),
            "n_nulls": pa.array(out["n_nulls"].astype(np.int64), pa.int64()),
            "n_distinct": pa.array(out["n_distinct"].astype(np.int64), pa.int64()),
        }
    )


def fk_orphans(sf_dir: str, *, child: str = "orders", child_key: str = "o_custkey",
               parent: str = "customer", parent_key: str = "c_custkey",
               parent_filter=None):
    """Referential-integrity check: child keys with NO matching parent
    row, with per-key row counts — the foreign-key side of the publish
    gate (`profile_table` covers the single-table side). The headline
    use is validating a lake AFTER parent-side deletions (GDPR erasure,
    corrections): every surviving child row must still resolve.

    Scale shape (the anti-join discipline of `anti_join_customers`):
    the child side pre-reduces to (key, count) partials per block and
    the parent side to distinct keys per block, so the single
    hash-bucket shuffle carries key-cardinality rows, never the rows
    themselves; membership is a vectorized isin per bucket. Output is
    proportional to the violation set — empty when integrity holds.

    ``parent_filter`` (an Arrow-table → boolean-mask callable) restricts
    the parent set, e.g. to simulate/audit deletions.

    Null semantics match the SQL LEFT-JOIN formulation: a NULL child
    key never matches any parent (``NULL = x`` is false), so null-keyed
    child rows report as one orphan group with ``orphan_key`` NULL;
    null parent keys match nothing and are dropped. Integer keys only
    (the lake's key model) — other types fail fast."""
    ensure_portable()
    import pyarrow.compute as pc

    child_ds = read_table(sf_dir, child, columns=[child_key])
    parent_ds = read_table(sf_dir, parent, columns=[parent_key])

    def _require_int(col, name):
        if not pa.types.is_integer(col.type):
            raise ValueError(
                f"fk_orphans: {name} must be integer-typed, got {col.type}")

    def tag_child(t: pa.Table) -> pa.Table:
        # pure numpy partial: np.unique(return_counts) over the valid
        # keys + one null-count row. The earlier polars group_by paid a
        # ~190 ms polars import in every fresh worker process (profiled
        # r5: 64 first-tasks × import ≈ half the query's wall)
        col = (t[child_key].combine_chunks()
               if isinstance(t[child_key], pa.ChunkedArray) else t[child_key])
        _require_int(col, child_key)
        valid = pc.drop_null(col).to_numpy(zero_copy_only=False)
        k, n = np.unique(valid, return_counts=True)
        k_arr = pa.array(k.astype(np.int64), pa.int64())
        n_arr = pa.array(n.astype(np.int64), pa.int64())
        nulls = col.null_count
        if nulls:
            k_arr = pa.concat_arrays([k_arr, pa.array([None], pa.int64())])
            n_arr = pa.concat_arrays([n_arr, pa.array([nulls], pa.int64())])
        return pa.table(
            {
                "k": k_arr,
                "n": n_arr,
                "__side": pa.array(np.zeros(len(k_arr), np.int8)),
            }
        )

    def tag_parent(t: pa.Table) -> pa.Table:
        if parent_filter is not None:
            t = t.filter(parent_filter(t))
        col = t[parent_key]
        _require_int(col.combine_chunks()
                     if isinstance(col, pa.ChunkedArray) else col, parent_key)
        keys = pc.unique(pc.drop_null(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col))
        return pa.table(
            {
                "k": keys.cast(pa.int64()),
                "n": pa.array(np.zeros(len(keys), np.int64), pa.int64()),
                "__side": pa.array(np.ones(len(keys), np.int8)),
            }
        )

    both = child_ds.map_batches(tag_child, batch_format="pyarrow").union(
        parent_ds.map_batches(tag_parent, batch_format="pyarrow")
    )
    # The partials are key-cardinality-sized, far smaller than the rows
    # they summarize, but their BLOCK COUNT still tracks the read
    # parallelism — and the groupby sort exchange costs O(blocks ×
    # partitions) scheduling regardless of bytes (profiled r5: 4.0 s
    # exchange wall on 0.5 s of compute over 72 tiny blocks). Coalesce
    # partials to reducer-slot count before the exchange: one partial
    # block per CPU is the natural post-aggregation layout at any
    # cluster size (256 nodes × 32 cpus → 8192 blocks of partials).
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    both = both.repartition(max(8, cpus))

    out_schema = pa.schema([("orphan_key", pa.int64()), ("n_rows", pa.int64())])

    def bucket(t: pa.Table) -> pa.Table:
        # hash64, not raw low bits: stride-aligned id schemes (ids that
        # are multiples of 64) would otherwise collapse into one bucket;
        # nulls route to bucket hash64(0) % 64 (their key stays null in
        # the data)
        filled = pc.fill_null(t["k"], 0)
        b = (hash64(filled) % np.uint64(64)).astype(np.int64)
        return t.append_column("__b", pa.array(b, pa.int64()))

    def anti(g: pa.Table) -> pa.Table:
        # Arrow/numpy int64 end-to-end: the previous pandas form let a
        # null child key coerce the whole 'k' column to float64, so keys
        # ≥ 2^53 compared ROUNDED in np.isin (a real orphan whose parent
        # rounds equal silently vanished) and emitted rounded values —
        # the exact hazard _portable_shuffle_join documents
        side = g["__side"].to_numpy(zero_copy_only=False)
        kids = g.filter(pa.array(side == 0))
        null_mask = pc.is_null(kids["k"])
        n_null = pc.sum(pc.if_else(null_mask, kids["n"],
                                   pa.scalar(0, pa.int64()))).as_py() or 0
        kids = kids.filter(pc.invert(null_mask))
        k = kids["k"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        n = kids["n"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        parents = (g.filter(pa.array(side == 1))["k"].drop_null()
                   .to_numpy(zero_copy_only=False).astype(np.int64, copy=False))
        keep = ~np.isin(k, parents)
        uk, inv = np.unique(k[keep], return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, n[keep])  # exact int64, no float weights
        keys = pa.array(uk, pa.int64())
        rows = pa.array(sums, pa.int64())
        if int(n_null):
            keys = pa.concat_arrays([keys, pa.array([None], pa.int64())])
            rows = pa.concat_arrays([rows, pa.array([int(n_null)], pa.int64())])
        return pa.table({"orphan_key": keys, "n_rows": rows})

    return (
        both.map_batches(bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(anti, batch_format="pyarrow")
        .map_batches(
            lambda t: t.select(out_schema.names)
            if "orphan_key" in t.column_names else out_schema.empty_table(),
            batch_format="pyarrow",
        )
    )
