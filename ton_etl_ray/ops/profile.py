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
from ._util import read_table


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
    out = base.merge(distinct, on="column").sort_values("column")
    return pa.table(
        {
            "column": pa.array(out["column"], pa.string()),
            "n_rows": pa.array(out["n_rows"].astype(np.int64), pa.int64()),
            "n_nulls": pa.array(out["n_nulls"].astype(np.int64), pa.int64()),
            "n_distinct": pa.array(out["n_distinct"].astype(np.int64), pa.int64()),
        }
    )
