"""Canonical Arrow schemas for the CDC engine.

Mirrors the reference's data model (SURVEY.md §1): the lake table of
pre-tokenized sequences (BASELINE.json input_hint) and the flattened
Debezium-style change envelope (``__op``/``__lsn``/``__source_ts_ms``,
reference datalake/main.py:50,213-215; README.md:65-69) re-expressed as
Arrow columns ``op``/``lsn``/``ts_ms``.
"""

from __future__ import annotations

import pyarrow as pa

# Lake table: one row per live document (FIXTURES.md F1).
LAKE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

# Change-log table (FIXTURES.md F2): lake payload + CDC envelope.
CHANGE_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),  # 'c' | 'u' | 'd'
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
        pa.field("ts_ms", pa.int64()),
    ]
)

# Columns that belong to the CDC envelope, not the payload.
ENVELOPE_COLS = ("lsn", "op", "ts_ms")

# Columns appearing in persisted per-partition state files on top of the
# payload: the version stamp needed for incremental LWW merges.
STATE_EXTRA_COLS = ("lsn",)

VALID_OPS = ("c", "u", "d")


def payload_fields(schema: pa.Schema) -> list[pa.Field]:
    """Payload (non-envelope) fields of a change schema, in order."""
    return [schema.field(i) for i in range(len(schema)) if schema.field(i).name not in ENVELOPE_COLS]


def state_schema_for(change_schema: pa.Schema) -> pa.Schema:
    """Schema of persisted partition state for a given change schema."""
    return pa.schema(payload_fields(change_schema) + [pa.field("lsn", pa.int64())])
