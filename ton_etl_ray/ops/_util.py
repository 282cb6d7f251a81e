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
    return rd.read_parquet(path, columns=columns, schema=schema, **kw)
