"""Token-payload analytics over the CDC lake — the ops that make the
replayed table (doc_id, tokens:list<int32>, n_tok, source) useful as
TRAINING DATA, not just a correct upsert target: corpus token-frequency
histogram (vocabulary coverage / BPE retraining input) and per-source
token-budget accounting (mixture weighting).

Both read the committed lake (``pipelines.flagship`` replay → the
miniature of the 10^10-event production table) and reduce token arrays
with zero-copy Arrow kernels: ``list_flatten`` + ``value_counts``
partials inside each map task bound the shuffle to
(distinct-token-ids-per-block) rows — at a fixed vocabulary that is
O(V) per block regardless of corpus size, so the exchange stays tiny at
100 TB while the flatten work scales embarrassingly parallel.

No SQL oracle: the driver's DuckDB views cover the INPUT tables, and
token values are PRNG-derived inside the change log (pipelines.py:48),
so these are rows-only queries; tests/test_tokens.py instead checks
them against DuckDB ``unnest(tokens)`` over the committed lake parquet
itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._pickle import ensure_portable

_HIST_SCHEMA = pa.schema([("token", pa.int32()), ("n_occurrences", pa.int64())])


def _lake(sf_dir: str):
    # cached committed flagship lake: one replay serves every
    # lake-analytics query in a run (and bench builds it untimed, so the
    # timing measures the analytic, not the setup replay)
    from ..cdc.replay import read_lake
    from ..pipelines import ensure_flagship_lake

    return read_lake(ensure_flagship_lake(sf_dir))


def lake_token_histogram(sf_dir: str, k: int = 50):
    """Top-``k`` token ids by occurrence count over the FINAL lake state
    (rank-1 LWW winners only — superseded versions and tombstoned docs
    contribute nothing). Ties broken by token id ascending."""
    ensure_portable()
    from ray.data.aggregate import Sum

    ds = _lake(sf_dir).select_columns(["tokens"])

    def partial_counts(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(t["tokens"])
        vc = flat.combine_chunks().value_counts() if isinstance(
            flat, pa.ChunkedArray) else flat.value_counts()
        return pa.table(
            {
                "token": vc.field("values").cast(pa.int32()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n_occurrences"))
    )
    return agg.sort(["n_occurrences", "token"], descending=[True, False]).limit(k)


def source_token_budget(sf_dir: str):
    """Per-source token accounting over the final lake state: docs,
    total tokens, mean doc length — the mixture-weighting table a
    training run samples from. Partial sums per block, one tiny grouped
    reduce (source cardinality ≈ dozens)."""
    ensure_portable()
    from ray.data.aggregate import Sum

    ds = _lake(sf_dir).select_columns(["source", "n_tok"])

    def partials(t: pa.Table) -> pa.Table:
        import polars as pl

        g = (
            pl.DataFrame(
                {
                    "source": t["source"].to_pylist(),
                    "n_tok": t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64),
                }
            )
            .group_by("source")
            .agg(pl.len().alias("docs"), pl.col("n_tok").sum().alias("toks"))
        )
        return pa.table(
            {
                "source": pa.array(g["source"].to_list(), pa.string()),
                "docs": pa.array(g["docs"].to_numpy().astype(np.int64), pa.int64()),
                "toks": pa.array(g["toks"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("docs", alias_name="n_docs"),
                   Sum("toks", alias_name="total_tokens"))
    )

    def finish(t: pa.Table) -> pa.Table:
        if "n_docs" not in t.column_names:
            return pa.schema(
                [("source", pa.string()), ("n_docs", pa.int64()),
                 ("total_tokens", pa.int64()), ("mean_tokens", pa.float64())]
            ).empty_table()
        mean = np.round(
            t["total_tokens"].to_numpy(zero_copy_only=False)
            / t["n_docs"].to_numpy(zero_copy_only=False), 4,
        )
        return t.append_column("mean_tokens", pa.array(mean, pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")
