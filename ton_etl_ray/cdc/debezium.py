"""Debezium-envelope JSONL source: the reference's wire format.

The reference consumes flattened Debezium JSON records — payload fields
plus ``__op`` ('c' create / 'r' snapshot-read / 'u' update / 'd'
delete), ``__table``, ``__lsn``, ``__source_ts_ms``, with Postgres
numerics encoded as ``{"scale": s, "value": b64-bigint}`` (reference
README.md:65-69; datalake/main.py:50,213-215;
datalake/converters/converter.py:41-47). This module normalizes that
envelope onto the engine's change schema so a Debezium JSONL dump can
be replayed directly:

    ds = read_debezium_jsonl(paths, numeric_fields=["score"])
    # → columns lsn:int64, op:string ('r' folded to 'c'), ts_ms, payload
    # then feed it through gen-agnostic replay via parquet staging or
    # hand the Dataset's batches to the same Normalize→apply pipeline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .._pickle import ensure_portable
from ..functions import decode_debezium_numeric

ENVELOPE_MAP = {"__lsn": "lsn", "__op": "op", "__source_ts_ms": "ts_ms"}
DROP_FIELDS = ("__table", "__deleted", "__source_name")  # FIELDS_TO_REMOVE analogue


def normalize_debezium_batch(
    batch: pa.Table, *, numeric_fields: tuple[str, ...] = ()
) -> pa.Table:
    """Envelope → engine change columns; snapshot reads fold to creates."""
    # a payload column named like an envelope TARGET would silently
    # collide in the cols dict: iteration order decides whether the
    # payload data vanishes or the op/lsn discriminator gets overwritten
    # with payload values — both corrupt the change stream. Fail loud.
    clash = [n for n in batch.column_names
             if n in set(ENVELOPE_MAP.values()) and n not in ENVELOPE_MAP]
    if clash:
        raise ValueError(
            f"debezium payload column(s) {clash} collide with the engine's "
            "envelope targets (op/lsn/ts_ms); rename them upstream"
        )
    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    for name in batch.column_names:
        if name in DROP_FIELDS:
            continue
        out_name = ENVELOPE_MAP.get(name, name)
        col = batch.column(name)
        if out_name == "op":
            col = pc.if_else(pc.equal(col, pa.scalar("r")), pa.scalar("c"), col)
        elif out_name == "lsn" or out_name == "ts_ms":
            col = col.cast(pa.int64())
        elif name in numeric_fields:
            # Debezium numeric struct → float64 (Decimal string repr
            # would also work; float keeps the demo oracle simple)
            vals = [
                None if v is None else float(decode_debezium_numeric(v))
                for v in col.to_pylist()
            ]
            col = pa.array(vals, pa.float64())
        cols[out_name] = col
    order = ["lsn", "op"] + [c for c in cols if c not in ("lsn", "op", "ts_ms")] + ["ts_ms"]
    return pa.table({c: cols[c] for c in order if c in cols})


def read_debezium_jsonl(
    paths: str | list[str], *, numeric_fields: tuple[str, ...] = ()
) -> "rd.Dataset":
    ensure_portable()
    ds = rd.read_json(paths)
    return ds.map_batches(
        lambda t: normalize_debezium_batch(t, numeric_fields=numeric_fields),
        batch_format="pyarrow",
    )
