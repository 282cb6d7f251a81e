"""Scalar/codec functions (SURVEY §2.9 parity, vectorized where hot).

Each maps 1:1 onto a reference scalar fn:
- ``opcode_signed``: uint32→int32 reinterpret (model/parser.py:85-87)
- ``decode_debezium_numeric``: Debezium ``{scale, value: b64-bigint}`` →
  Decimal (converters/converter.py:41-47; parsers/utils.py:8-9)
- ``encode_debezium_numeric``: inverse, for round-trip tests
- ``b64_to_bytes`` / ``bytes_to_b64`` (converters/account_states.py:19-25)
- ``date_partition``: epoch-ms → 'YYYYMMDD' (converters/converter.py:35-36)
- ``strip_surrogates``: utf-8 sanitize (parser/db.py:57-60)
- ``normalize_json``: canonical JSON for delta compare
  (jetton_metadata.py:76-84)
"""

from __future__ import annotations

import base64
import decimal
import json

import numpy as np
import pyarrow as pa

# the reference sets an 80-digit context for unbounded Postgres numerics
CTX = decimal.Context(prec=80)


def opcode_signed(op: int | np.ndarray) -> int | np.ndarray:
    """Reinterpret a uint32 opcode as int32 (vectorized for arrays)."""
    if isinstance(op, np.ndarray):
        return op.astype(np.uint32).view(np.int32)
    v = op & 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def decode_debezium_numeric(obj: dict) -> decimal.Decimal:
    """{'scale': s, 'value': base64(signed big-endian bigint)} → Decimal."""
    raw = base64.b64decode(obj["value"])
    unscaled = int.from_bytes(raw, byteorder="big", signed=True)
    return CTX.divide(decimal.Decimal(unscaled), decimal.Decimal(10) ** int(obj["scale"]))


def encode_debezium_numeric(d: decimal.Decimal, scale: int) -> dict:
    unscaled = int(d.scaleb(scale).to_integral_value())
    nbytes = max(1, (unscaled.bit_length() + 8) // 8)
    return {"scale": scale, "value": base64.b64encode(unscaled.to_bytes(nbytes, "big", signed=True)).decode()}


def b64_to_bytes(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized base64 string column → binary column (null-safe)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = [None if v is None else base64.b64decode(v) for v in arr.to_pylist()]
    return pa.array(out, pa.binary())


def bytes_to_b64(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = [None if v is None else base64.b64encode(v).decode() for v in arr.to_pylist()]
    return pa.array(out, pa.string())


def date_partition(ts_ms: pa.Array | pa.ChunkedArray) -> pa.Array:
    """epoch-ms int64 column → 'YYYYMMDD' partition strings, vectorized."""
    import pyarrow.compute as pc

    ts = pc.cast(ts_ms, pa.timestamp("ms"))
    return pc.strftime(ts, format="%Y%m%d")


def strip_surrogates(s: str) -> str:
    return s.encode("utf-8", errors="replace").decode("utf-8") if s else s


def normalize_json(obj) -> str:
    """Canonical JSON string for field-by-field delta comparison."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False)
