"""Shared helpers for the operator library."""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(sf_dir: str, name: str, *, columns: list[str] | None = None, **kw) -> "rd.Dataset":
    """read_parquet of one testdata table with schema metadata stripped.

    Parquet files written via pandas carry a b'pandas' schema-metadata
    dict that makes pa.Schema unhashable — every block concat (inside the
    read's SplitBlocks and every downstream groupby/aggregate) then logs
    "Failed to hash the schemas (for deduplication)" per worker, masking
    real warnings. Passing an explicit metadata-free schema to the read
    fixes it at the source with no extra pipeline stage."""
    import pyarrow.parquet as pq

    path = _t(sf_dir, name)
    full = pq.read_schema(path).remove_metadata()
    schema = pa.schema([full.field(c) for c in columns]) if columns else full
    if "override_num_blocks" not in kw:
        # block layout follows DATA SIZE, not the reading process's cpu
        # count: Ray's default parallelism (2×cpus) slices a tiny table
        # into dozens of KB-scale blocks, and every downstream
        # groupby/sort then pays a per-block barrier cost that dwarfs the
        # compute (measured 0.89 s vs 0.14 s per sort at 64 vs 16 input
        # blocks on an 80k-row shuffle). Only genuinely tiny files are
        # clamped — compute-dense tables keep Ray's full parallelism
        # (clamping a 10 MB lineitem to 8 blocks regressed the 3-shuffle
        # order_lifecycle by ~30%).
        sz = os.path.getsize(path)
        if sz < 1 << 20:
            kw["override_num_blocks"] = 8
    return rd.read_parquet(path, columns=columns, schema=schema, **kw)
