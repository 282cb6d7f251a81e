"""Arrow schema evolution: unify schemas across change-log shards.

The reference evolves schemas by regenerating Avro schemas from the
Postgres information_schema (reference datalake/generate_schema.py:26-63)
and ``ALTER TABLE ... ADD COLUMN IF NOT EXISTS`` (parser/createdb.sql:93),
with converters tolerating missing keys. Our batch analogue: compute one
unified Arrow schema over all input shards (added columns → nullable,
numeric widening), then ``conform`` every batch to it before the merge
(FIXTURES.md F3: late shards add ``lang:string`` and widen
``n_tok`` int32→int64).
"""

from __future__ import annotations

import pyarrow as pa

_INT_RANK = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
_UINT_RANK = {pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2, pa.uint64(): 3}
_FLOAT_RANK = {pa.float16(): 0, pa.float32(): 1, pa.float64(): 2}


def widen(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """The narrowest type both ``a`` and ``b`` losslessly cast to."""
    if a.equals(b):
        return a
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    if a in _INT_RANK and b in _INT_RANK:
        return a if _INT_RANK[a] >= _INT_RANK[b] else b
    if a in _UINT_RANK and b in _UINT_RANK:
        return a if _UINT_RANK[a] >= _UINT_RANK[b] else b
    if a in _FLOAT_RANK and b in _FLOAT_RANK:
        return a if _FLOAT_RANK[a] >= _FLOAT_RANK[b] else b
    # signed/unsigned int mix, or int/float mix → float64 (safe superset)
    num = lambda t: t in _INT_RANK or t in _UINT_RANK or t in _FLOAT_RANK
    if num(a) and num(b):
        if a in _FLOAT_RANK or b in _FLOAT_RANK:
            return pa.float64()
        if pa.uint64() in (a, b):
            # no integer type holds both uint64 and signed values; a
            # silent int64 choice would raise mid-pipeline on cast
            raise TypeError("cannot losslessly unify uint64 with a signed integer type")
        return pa.int64()
    if pa.types.is_decimal(a) and pa.types.is_decimal(b):
        # decimal(p1,s1) ∪ decimal(p2,s2): keep the larger scale and
        # enough integer digits for both (reference carries decimal(20/38)
        # lake columns, datalake/schemas/jetton_events.avsc:34-56;
        # converter.py:41-47 uses an 80-digit context)
        scale = max(a.scale, b.scale)
        precision = max(a.precision - a.scale, b.precision - b.scale) + scale
        if precision > 38:
            raise TypeError(f"cannot unify decimals {a} and {b}: precision {precision} > 38")
        return pa.decimal128(precision, scale)
    if pa.types.is_list(a) and pa.types.is_list(b):
        return pa.list_(widen(a.value_type, b.value_type))
    if pa.types.is_large_string(a) and pa.types.is_string(b):
        return a
    if pa.types.is_string(a) and pa.types.is_large_string(b):
        return b
    raise TypeError(f"cannot unify incompatible types {a} and {b}")


def unify_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Union of field names, each at its widened type; order of first sight."""
    fields: dict[str, pa.DataType] = {}
    for s in schemas:
        for f in s:
            if f.name in fields:
                fields[f.name] = widen(fields[f.name], f.type)
            else:
                fields[f.name] = f.type
    return pa.schema([pa.field(n, t) for n, t in fields.items()])


def conform(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast/extend ``batch`` to exactly ``schema`` (missing cols → nulls)."""
    cols = []
    for f in schema:
        if f.name in batch.column_names:
            col = batch.column(f.name)
            if not col.type.equals(f.type):
                col = col.cast(f.type)
        else:
            col = pa.nulls(batch.num_rows, f.type)
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)
