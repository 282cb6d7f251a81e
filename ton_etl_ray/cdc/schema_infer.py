"""Schema discovery from source samples (reference
datalake/generate_schema.py:26-63, which walks information_schema and
maps Postgres column types onto the lake schema, injecting the CDC
bookkeeping fields at the end).

Here the source is a sampled record stream (JSONL / CSV rows as dicts)
instead of a catalog, so the mapping keys on observed Python values but
keeps the reference's rules:

- text / varchar / jsonb            → string   (dict/list values are the
  jsonb analogue: mapped to string with a warning, :44-46)
- bigint / integer / smallint       → long — declared widths are not
  observable from samples, so the widening-safe int64 is used for all
- numeric                           → double (float64)
- boolean                           → boolean
- column with no observable type    → string + warning (the
  USER-DEFINED fallback, :44-46)
- irreconcilable mixed types        → raise (the unsupported-type
  error, :47-48)
- CDC bookkeeping fields (__lsn long, __op string) are appended when
  missing (the reference appends __lsn/__id, :57-64)

``debezium_preprocessor(infer_stable_schema=True)`` uses this to pin
scalar column types across a DRIFTING shard stream: without it, a shard
whose column happens to be all-null infers ``null`` type and a
numeric-looking string flips types shard-to-shard; with it, every shard
parses against the schema sampled from the first shard, and genuinely
new columns still flow through (unexpected_field_behavior="infer" +
the engine's schema evolution unify).
"""

from __future__ import annotations

import json
import logging
from itertools import islice
from typing import Iterable

import pyarrow as pa

_LOG = logging.getLogger("ton_etl_ray.cdc.schema_infer")

#: CDC bookkeeping injected when absent (generate_schema.py:57-64 shape,
#: with __op instead of __id — our envelope's operation discriminator)
_INJECTED = (("__lsn", pa.int64()), ("__op", pa.string()))


def infer_schema(
    records: Iterable[dict],
    *,
    max_records: int = 1000,
    inject_cdc: bool = True,
    json_as_string: bool = True,
    omit_unknown: bool = False,
) -> pa.Schema:
    """Sample up to ``max_records`` dict records → ``pa.Schema``.

    ``json_as_string=False`` omits dict/list-valued columns from the
    schema instead of stringifying them — for callers that hand the
    schema to a parser which must keep nested values structured (e.g.
    Debezium decimal structs decoded downstream).

    ``omit_unknown=True`` omits all-null columns instead of the string
    fallback — for callers that PIN the result as a parser schema: a
    column with no observed type pinned to string would reject the
    first shard that reveals it to be numeric."""
    seen: dict[str, set] = {}
    order: list[str] = []
    for rec in islice(iter(records), max_records):
        for k, v in rec.items():
            if k not in seen:
                seen[k] = set()
                order.append(k)
            if v is not None:
                seen[k].add(type(v))
    fields: list[pa.Field] = []
    for name in order:
        t = seen[name]
        if not t:
            if omit_unknown:
                _LOG.warning(
                    "infer_schema: column %r has no non-null sample — omitted", name
                )
                continue
            _LOG.warning(
                "infer_schema: column %r has no non-null sample — using string", name
            )
            fields.append(pa.field(name, pa.string()))
            continue
        if t & {dict, list}:
            # ANY nested value makes the column nested — a str/dict MIX
            # used to fall through to the `str in t` branch and pin the
            # column to pa.string(), making every later shard with a
            # struct value fail the explicit-schema read (exactly the
            # type flip the stable-schema pin exists to prevent)
            if not json_as_string:
                continue  # leave nested columns to the parser
            _LOG.warning(
                "infer_schema: column %r holds nested json — mapping to string", name
            )
            fields.append(pa.field(name, pa.string()))
        elif t == {bool}:
            fields.append(pa.field(name, pa.bool_()))
        elif t <= {int, bool}:
            fields.append(pa.field(name, pa.int64()))
        elif t <= {int, float}:
            fields.append(pa.field(name, pa.float64()))
        elif str in t:
            fields.append(pa.field(name, pa.string()))
        else:
            raise TypeError(
                f"infer_schema: unsupported sampled types {sorted(x.__name__ for x in t)} "
                f"for column {name!r}"
            )
    if inject_cdc:
        have = {f.name for f in fields}
        fields.extend(pa.field(n, t) for n, t in _INJECTED if n not in have)
    return pa.schema(fields)


def infer_schema_jsonl(path: str, **kw) -> pa.Schema:
    """``infer_schema`` over the first ``max_records`` lines of a JSONL
    file."""

    def gen():
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    yield json.loads(line)

    return infer_schema(gen(), **kw)
