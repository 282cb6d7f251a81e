"""Corpus sampling and budget packing for training-data curation.

The reference's datalake sync materializes fixed slices of each table
per day (datalake_daily_sync.py); a training-data pipeline additionally
needs REPRODUCIBLE sub-corpus selection: Bernoulli samples, per-stratum
quotas, and byte/token budgets. All three operators here are
deterministic functions of the data (no RNG state), so identical runs —
and the DuckDB oracles — reproduce the exact row set at any cluster
size:

- ``hash_sample``: Bernoulli-style p% sample keyed on a multiplicative
  integer hash of doc_id — pure uint64 arithmetic, so it vectorizes in
  numpy AND recomputes exactly in SQL (md5-style hashes would force a
  per-row Python loop on the hot path);
- ``stratified_sample``: the k pseudo-randomly-first docs of EVERY
  stratum (window rank over the same hash);
- ``budget_pack``: per-stratum prefix under a character budget
  (cumulative sum in doc_id order) — the "fill each source's quota"
  step of mixture construction.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .._pickle import ensure_portable
from ._util import read_table

#: Knuth multiplicative constant; the hash must stay exactly
#: reproducible in ANSI SQL: ((doc_id * 2654435761) % 4294967296)
_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(4294967296)


def _doc_hash(doc_id: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (doc_id.astype(np.uint64) * _KNUTH) % _MOD32


def hash_sample(sf_dir: str, rate_pct: int = 10):
    """Deterministic ~``rate_pct``% Bernoulli sample of ``documents``.

    Every task decides membership locally from the row alone (no
    shuffle, no driver state, no RNG object to synchronize) — the only
    sampling form that is simultaneously cheap at 100 TB and
    byte-reproducible across runs and cluster sizes."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = (_doc_hash(ids) % np.uint64(100)) < np.uint64(rate_pct)
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(sf_dir: str, per_group: int = 20, group_col: str = "source"):
    """The ``per_group`` pseudo-randomly-first docs of every stratum:
    rank by (hash, doc_id) inside each ``group_col`` group. One shuffle
    on the stratum key; per-batch partial top-k first, so at most
    ``per_group`` rows per stratum per block reach the exchange (the
    map-side-combine pattern — a hot stratum can't flood one reducer)."""
    ensure_portable()
    import pyarrow.parquet as _pq

    # the stratum column keeps ITS type: hard-coded pa.string() crashed
    # with ArrowTypeError for any non-string group_col
    gtype = _pq.read_schema(
        os.path.join(sf_dir, "documents.parquet")).field(group_col).type
    ds = read_table(sf_dir, "documents",
                    columns=list(dict.fromkeys(["doc_id", group_col, "n_chars"])))

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            group_col: t[group_col].to_pylist(),
            "n_chars": t["n_chars"].to_numpy(zero_copy_only=False),
        })
        df["__h"] = _doc_hash(df["doc_id"].to_numpy()).astype(np.int64)
        df = (
            df.sort_values(["__h", "doc_id"], kind="mergesort")
            # dropna=False: a null stratum is still a stratum (SQL
            # PARTITION BY groups nulls together; pandas' default would
            # silently discard those rows before the shuffle)
            .groupby(group_col, sort=False, dropna=False)
            .head(per_group)
        )
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            group_col: pa.array(df[group_col].tolist(), gtype),
            "n_chars": pa.array(df["n_chars"].to_numpy(), pa.int64()),
            "__h": pa.array(df["__h"].to_numpy(), pa.int64()),
        })

    def final(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["__h", "doc_id"], kind="mergesort").head(per_group)
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
            group_col: pa.array(g[group_col].tolist(), gtype),
            "n_chars": pa.array(g["n_chars"].to_numpy(), pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pandas")
        .map_batches(
            lambda t: t.select(["doc_id", group_col, "n_chars"])
            if "doc_id" in t.column_names
            else pa.schema([
                ("doc_id", pa.int64()), (group_col, gtype),
                ("n_chars", pa.int64()),
            ]).empty_table(),
            batch_format="pyarrow",
        )
    )


def budget_pack(sf_dir: str, budget_chars: int = 5_000, group_col: str = "source"):
    """Per-stratum PREFIX under a character budget: walk each stratum in
    doc_id order and keep documents while the running ``n_chars`` total
    stays ≤ ``budget_chars`` — the quota-filling step of training-mixture
    construction. One shuffle on the stratum key; the cumulative sum is
    vectorized inside each group."""
    ensure_portable()
    import pyarrow.parquet as _pq

    gtype = _pq.read_schema(
        os.path.join(sf_dir, "documents.parquet")).field(group_col).type
    ds = read_table(sf_dir, "documents",
                    columns=list(dict.fromkeys(["doc_id", group_col, "n_chars"])))
    out_schema = pa.schema([
        ("doc_id", pa.int64()), (group_col, gtype),
        ("n_chars", pa.int64()), ("cum_chars", pa.int64()),
    ])

    def pack(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("doc_id", kind="mergesort")
        cum = g["n_chars"].to_numpy().cumsum()
        keep = cum <= budget_chars
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy()[keep], pa.int64()),
            group_col: pa.array(np.asarray(g[group_col])[keep].tolist(), gtype),
            "n_chars": pa.array(g["n_chars"].to_numpy()[keep], pa.int64()),
            "cum_chars": pa.array(cum[keep], pa.int64()),
        })

    return (
        ds.groupby(group_col)
        .map_groups(pack, batch_format="pandas")
        .map_batches(
            lambda t: t.select(out_schema.names)
            if "cum_chars" in t.column_names else out_schema.empty_table(),
            batch_format="pyarrow",
        )
    )
