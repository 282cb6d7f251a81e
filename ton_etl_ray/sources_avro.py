"""Minimal pure-Python Avro Object Container File source/sink.

The reference lake's native format is Avro (reference
datalake/main.py:121-186 writes sha256-named .avro files per topic;
generate_schema.py emits the .avsc). No Avro library ships in this
environment, so this is a self-contained codec for the subset the lake
needs — primitives (null/boolean/int/long/float/double/bytes/string),
``["null", T]`` unions for nullable columns, arrays, and
timestamp-micros — implementing the public Avro 1.11 spec binary
encoding (zigzag varints, length-prefixed bytes, OCF header with
schema + codec metadata and 16-byte sync markers; null and deflate
codecs).

Distributed shape: ``read_avro_dataset`` maps one decode task per file
over ``read_binary_files`` (decode happens ON the workers, never the
driver); ``write_avro_dir`` writes one .avro file per block from inside
``map_batches`` — both ends stream.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

import pyarrow as pa

MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# binary primitives
# --------------------------------------------------------------------------

def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    n = _zigzag_encode(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _zigzag_decode(acc)
        shift += 7


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf) -> bytes:
    return buf.read(_read_long(buf))


# --------------------------------------------------------------------------
# Arrow <-> Avro schema
# --------------------------------------------------------------------------

_PRIMITIVE = {
    "boolean": pa.bool_(),
    "int": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bytes": pa.binary(),
    "string": pa.string(),
}


def _arrow_to_avro_type(t: pa.DataType):
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
        return "int"
    if pa.types.is_int64(t) or pa.types.is_uint32(t):
        return "long"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_binary(t):
        return "bytes"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if pa.types.is_decimal(t):
        return {"type": "bytes", "logicalType": "decimal",
                "precision": t.precision, "scale": t.scale}
    if pa.types.is_list(t):
        # items are a ["null", T] union: Arrow list elements are
        # nullable, and a bare T would crash _encode_value with a
        # cryptic int(None) TypeError mid-file on the first null item
        return {"type": "array", "items": ["null", _arrow_to_avro_type(t.value_type)]}
    raise TypeError(f"unsupported Arrow type for Avro: {t}")


def arrow_schema_to_avro(schema: pa.Schema, name: str = "Row") -> dict:
    fields = []
    for f in schema:
        at = _arrow_to_avro_type(f.type)
        fields.append({"name": f.name, "type": ["null", at]})  # nullable cols
    return {"type": "record", "name": name, "fields": fields}


def _avro_to_arrow_type(at) -> pa.DataType:
    if isinstance(at, str):
        return _PRIMITIVE[at]
    if isinstance(at, list):  # union — we only emit ["null", T]
        non_null = [x for x in at if x != "null"]
        return _avro_to_arrow_type(non_null[0])
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "timestamp-micros":
            return pa.timestamp("us")
        if lt == "decimal":
            return pa.decimal128(at["precision"], at["scale"])
        if at["type"] == "array":
            return pa.list_(_avro_to_arrow_type(at["items"]))
        return _avro_to_arrow_type(at["type"])
    raise TypeError(f"unsupported Avro type {at!r}")


def avro_schema_to_arrow(avsc: dict) -> pa.Schema:
    return pa.schema([(f["name"], _avro_to_arrow_type(f["type"])) for f in avsc["fields"]])


# --------------------------------------------------------------------------
# datum encode/decode
# --------------------------------------------------------------------------

def _encode_value(buf: io.BytesIO, at, v) -> None:
    if isinstance(at, list):  # ["null", T]
        if v is None:
            _write_long(buf, 0)
            return
        _write_long(buf, 1)
        at = [x for x in at if x != "null"][0]
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "timestamp-micros":
            _write_long(buf, int(v))
            return
        if lt == "decimal":
            # exact: the Decimal's scaled integer, big-endian two's complement
            from decimal import Decimal

            d = v if isinstance(v, Decimal) else Decimal(str(v))
            unscaled = int(d.scaleb(at["scale"]))
            raw = unscaled.to_bytes((unscaled.bit_length() + 8) // 8 or 1, "big", signed=True)
            _write_bytes(buf, raw)
            return
        if at["type"] == "array":
            if len(v):
                _write_long(buf, len(v))
                for item in v:
                    _encode_value(buf, at["items"], item)
            _write_long(buf, 0)
            return
        at = at["type"]
    if at == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif at in ("int", "long"):
        _write_long(buf, int(v))
    elif at == "float":
        buf.write(struct.pack("<f", float(v)))
    elif at == "double":
        buf.write(struct.pack("<d", float(v)))
    elif at == "bytes":
        _write_bytes(buf, bytes(v))
    elif at == "string":
        _write_bytes(buf, v.encode("utf-8"))
    else:
        raise TypeError(f"unsupported Avro type {at!r}")


def _decode_value(buf, at):
    if isinstance(at, list):
        idx = _read_long(buf)
        branch = at[idx]
        if branch == "null":
            return None
        return _decode_value(buf, branch)
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "timestamp-micros":
            return _read_long(buf)
        if lt == "decimal":
            from decimal import Decimal

            raw = _read_bytes(buf)
            unscaled = int.from_bytes(raw, "big", signed=True)
            return Decimal(unscaled).scaleb(-at["scale"])
        if at["type"] == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(buf)  # skip byte-size hint
                for _ in range(n):
                    out.append(_decode_value(buf, at["items"]))
        at = at["type"]
    if at == "boolean":
        return buf.read(1) == b"\x01"
    if at in ("int", "long"):
        return _read_long(buf)
    if at == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if at == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if at == "bytes":
        return _read_bytes(buf)
    if at == "string":
        return _read_bytes(buf).decode("utf-8")
    raise TypeError(f"unsupported Avro type {at!r}")


# --------------------------------------------------------------------------
# OCF write/read
# --------------------------------------------------------------------------

def write_avro(table: pa.Table, path: str, *, codec: str = "deflate",
               rows_per_block: int = 8192, sync_seed: bytes = b"tonrayavrosync16") -> int:
    """Write one Arrow table as an Avro OCF; returns file size."""
    assert codec in ("null", "deflate")
    avsc = arrow_schema_to_avro(table.schema)
    types = [f["type"] for f in avsc["fields"]]
    sync = sync_seed[:16].ljust(16, b"\x00")

    # timestamps encode as microseconds since epoch
    cols = []
    for f in table.schema:
        col = table.column(f.name)
        if pa.types.is_timestamp(f.type):
            col = col.cast(pa.timestamp("us")).cast(pa.int64())
        cols.append(col.to_pylist())

    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(avsc).encode(), "avro.codec": codec.encode(),
            # Avro has no int8/int16/uint32/timestamp-unit distinctions;
            # stash the exact Arrow schema so the read side restores the
            # original types instead of silently widening (int16→int32)
            "arrow.schema": table.schema.serialize().to_pybytes()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)

    n = table.num_rows
    for start in range(0, n, rows_per_block):
        stop = min(start + rows_per_block, n)
        block = io.BytesIO()
        for i in range(start, stop):
            for c, at in enumerate(types):
                _encode_value(block, at, cols[c][i])
        data = block.getvalue()
        if codec == "deflate":
            data = zlib.compress(data)[2:-4]  # raw deflate per Avro spec
        _write_long(out, stop - start)
        _write_long(out, len(data))
        out.write(data)
        out.write(sync)

    payload = out.getvalue()
    tmp = f"{path}.tmp.{os.getpid()}"  # unique per writer: two workers
    # writing the same content-named part must not clobber each other's tmp
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    return len(payload)


def read_avro(path: str) -> pa.Table:
    """Read one Avro OCF into an Arrow table."""
    with open(path, "rb") as f:
        raw = f.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    avsc = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    types = [f["type"] for f in avsc["fields"]]
    names = [f["name"] for f in avsc["fields"]]
    rows: list[list] = [[] for _ in names]
    while buf.tell() < len(raw):
        count = _read_long(buf)
        size = _read_long(buf)
        data = buf.read(size)
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        bb = io.BytesIO(data)
        for _ in range(count):
            for c, at in enumerate(types):
                rows[c].append(_decode_value(bb, at))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
    schema = avro_schema_to_arrow(avsc)
    arrays = []
    for c, f in enumerate(schema):
        if pa.types.is_timestamp(f.type):
            arrays.append(pa.array(rows[c], pa.int64()).cast(pa.timestamp("us")))
        else:
            arrays.append(pa.array(rows[c], f.type))
    t = pa.Table.from_arrays(arrays, schema=schema)
    if "arrow.schema" in meta:
        # restore the writer's exact Arrow types (see write_avro): the
        # Avro wire types widen int8/int16→int32, uint32→int64 and fix
        # timestamps at microseconds; values are unchanged so the cast
        # back is safe (and loudly checked)
        original = pa.ipc.read_schema(pa.py_buffer(meta["arrow.schema"]))
        t = t.cast(original)
    return t


# --------------------------------------------------------------------------
# Ray Data integration
# --------------------------------------------------------------------------

def read_avro_dataset(paths: str | list[str], *, columns: list[str] | None = None):
    """Avro files → Dataset: one decode task per file, ON the workers."""
    import glob as _glob

    import ray.data as rd

    from ._pickle import ensure_portable

    ensure_portable()
    if isinstance(paths, str):
        files = sorted(_glob.glob(os.path.join(paths, "*.avro"))) if os.path.isdir(paths) else [paths]
    else:
        files = list(paths)
    if not files:
        raise FileNotFoundError(f"no .avro files under {paths!r}")

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for p in batch["path"].to_pylist():
            t = read_avro(p)
            tables.append(t.select(columns) if columns else t)
        return pa.concat_tables(tables, promote_options="permissive")

    # one BLOCK per file: from_arrow would produce a single block, and a
    # map task covers a whole block, so without the split every decode
    # would run serially in one task
    listing = rd.from_items(
        [{"path": f} for f in files], override_num_blocks=len(files)
    )
    return listing.map_batches(decode, batch_format="pyarrow", batch_size=1)


def write_avro_dir(ds, out_dir: str, *, codec: str = "deflate",
                   naming: str = "content") -> list[str]:
    """Dataset → directory of .avro part files, one per block, written
    from inside the map tasks.

    ``naming`` picks the exactly-once trade-off (Ray Data gives map
    tasks no stable identity, so no scheme gets both properties):

    - ``"content"`` (default): sha256 of the full serialized block —
      the reference's naming (datalake/main.py:161-164). A RETRIED task
      rewrites the same bytes to the same name (idempotent), but two
      byte-identical blocks dedupe to one file (duplicated data across
      block boundaries collapses — acceptable for the lake's
      append-dedup semantics, wrong if exact multiplicity matters).
    - ``"unique"``: content hash + a uuid4 salt — every block persists
      (exact multiplicity preserved), but a task retried AFTER its
      write leaves a duplicate part behind.
    """
    import hashlib
    import uuid

    from ._pickle import ensure_portable

    assert naming in ("content", "unique")
    ensure_portable()
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        # hash the FULL serialized block (first-column-only hashing
        # collided for low-cardinality leading columns and silently
        # overwrote DISTINCT blocks)
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        digest = hashlib.sha256(sink.getvalue().to_pybytes()).hexdigest()[:20]
        if naming == "unique":
            digest = f"{digest}-{uuid.uuid4().hex[:8]}"
        path = os.path.join(out_dir, f"part-{digest}.avro")
        write_avro(t, path, codec=codec)
        return pa.table({"file": pa.array([os.path.basename(path)], pa.string()),
                         "rows": pa.array([t.num_rows], pa.int64())})

    manifest = ds.map_batches(write_block, batch_format="pyarrow").take_all()
    return [r["file"] for r in manifest]
