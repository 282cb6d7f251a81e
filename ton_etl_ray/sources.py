"""Source/sink helpers: the engine's operators are host-agnostic.

The reference proves its parsers are source-independent by replaying
them over CSV extracts through a DBMock (parser/backfill.py:24-106,
S5/K5 in SURVEY §2.1-2.2). Here the same holds structurally: every
operator consumes a ``ray.data.Dataset``, so parquet, CSV and JSON
sources are interchangeable at the read call."""

from __future__ import annotations

import os

import ray.data as rd


def read_table(path: str, *, columns: list[str] | None = None, **kwargs) -> "rd.Dataset":
    """Read parquet/csv/json by extension into a Dataset.

    Column pruning is pushed into the read for parquet; for row-oriented
    formats it is applied as an immediate projection."""
    import glob as _glob

    def _other_data_files(d: str) -> list[str]:
        # ANY non-avro data file makes the directory mixed — not just
        # parquet (a stray .csv/.json part would otherwise be silently
        # dropped by the avro-only read)
        out = []
        for e in ("parquet", "csv", "json", "jsonl"):
            out += _glob.glob(os.path.join(d, f"*.{e}"))
        return out

    ext = os.path.splitext(path)[1].lower()
    if ext == ".avro" or (
        os.path.isdir(path)
        and _glob.glob(os.path.join(path, "*.avro"))
        and not _other_data_files(path)
    ):
        # a directory written by write_table(fmt="avro") has no extension
        # — sniff its contents so the round-trip is symmetric. A MIXED
        # directory (both formats) is ambiguous: refuse loudly rather
        # than silently dropping one side, and likewise refuse reader
        # kwargs the avro path can't honor.
        if kwargs:
            raise ValueError(
                f"avro source does not support reader kwargs {sorted(kwargs)}"
            )
        from .sources_avro import read_avro_dataset

        return read_avro_dataset(path, columns=columns)
    if os.path.isdir(path) and _glob.glob(os.path.join(path, "*.avro")):
        raise ValueError(
            f"{path}: directory mixes .avro with other data formats — pass "
            "an explicit file or a single-format directory"
        )
    if ext in ("", ".parquet"):
        return rd.read_parquet(path, columns=columns, **kwargs)
    if ext == ".csv":
        ds = rd.read_csv(path, **kwargs)
    elif ext in (".json", ".jsonl"):
        ds = rd.read_json(path, **kwargs)
    else:
        raise ValueError(f"unsupported source extension {ext!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_table(ds: "rd.Dataset", path: str, *, fmt: str = "parquet", **kwargs) -> None:
    """Write a Dataset as a directory of part files (parquet/csv/json)."""
    if fmt == "parquet":
        ds.write_parquet(path, **kwargs)
    elif fmt == "csv":
        ds.write_csv(path, **kwargs)
    elif fmt == "json":
        ds.write_json(path, **kwargs)
    elif fmt == "avro":
        from .sources_avro import write_avro_dir

        # the generic table sink must preserve row MULTIPLICITY: the
        # content-hash naming scheme collapses byte-identical blocks
        # into one part file, which is the LAKE's append-dedup contract
        # but surprising for a plain write — default to unique names
        # here and let lake callers opt into naming="content". The
        # trade-off (write_avro_dir docstring): a map task retried
        # AFTER its write leaves a duplicate part; pass
        # naming="content" for retry-idempotent appends instead.
        kwargs.setdefault("naming", "unique")
        write_avro_dir(ds, path, **kwargs)
    else:
        raise ValueError(f"unsupported sink format {fmt!r}")
