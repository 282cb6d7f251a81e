"""Pure-Python Avro OCF source/sink: round-trips, codecs, Ray wiring."""

from decimal import Decimal

import pandas as pd
import pyarrow as pa
import pytest

from ton_etl_ray.sources_avro import (
    arrow_schema_to_avro,
    avro_schema_to_arrow,
    read_avro,
    read_avro_dataset,
    write_avro,
    write_avro_dir,
)


def _sample_table(n=100):
    return pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "name": pa.array([f"row-{i}" if i % 7 else None for i in range(n)], pa.string()),
            "score": pa.array([i * 0.5 if i % 5 else None for i in range(n)], pa.float64()),
            "flag": pa.array([i % 2 == 0 for i in range(n)], pa.bool_()),
            "blob": pa.array([bytes([i % 256, 255 - i % 256]) for i in range(n)], pa.binary()),
            "toks": pa.array([[i, i + 1, i + 2] if i % 3 else [] for i in range(n)],
                             pa.list_(pa.int32())),
            "ts": pa.array([pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i)
                            for i in range(n)], pa.timestamp("us")),
            "price": pa.array([Decimal(i) / Decimal(100) for i in range(n)],
                              pa.decimal128(18, 2)),
        }
    )


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(tmp_path, codec):
    t = _sample_table()
    p = str(tmp_path / "t.avro")
    size = write_avro(t, p, codec=codec)
    assert size > 0
    back = read_avro(p)
    assert back.schema.names == t.schema.names
    assert back.to_pylist() == t.to_pylist()


def test_multi_block_roundtrip(tmp_path):
    t = _sample_table(1000)
    p = str(tmp_path / "t.avro")
    write_avro(t, p, rows_per_block=64)
    assert read_avro(p).to_pylist() == t.to_pylist()


def test_corrupt_sync_detected(tmp_path):
    t = _sample_table(50)
    p = str(tmp_path / "t.avro")
    write_avro(t, p, codec="null")
    raw = bytearray(open(p, "rb").read())
    raw[-3] ^= 0xFF  # clobber the final sync marker
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="sync marker"):
        read_avro(p)


def test_schema_mapping_bijection():
    t = _sample_table(1)
    avsc = arrow_schema_to_avro(t.schema)
    assert avro_schema_to_arrow(avsc).names == t.schema.names


def test_ray_dataset_roundtrip(tmp_path):
    """write_avro_dir from map tasks → read_avro_dataset one task/file."""
    import ray.data as rd

    t = _sample_table(500)
    ds = rd.from_arrow(t).repartition(4)
    files = write_avro_dir(ds, str(tmp_path / "out"))
    assert len(files) >= 1
    back = read_avro_dataset(str(tmp_path / "out")).to_pandas()
    assert len(back) == 500
    assert sorted(back["id"].tolist()) == list(range(500))
    # column pruning at the decode task
    pruned = read_avro_dataset(str(tmp_path / "out"), columns=["id", "price"]).to_pandas()
    assert list(pruned.columns) == ["id", "price"]


def test_sources_dispatch(tmp_path):
    from ton_etl_ray.sources import read_table, write_table
    import ray.data as rd

    t = _sample_table(60)
    ds = rd.from_arrow(t)
    write_table(ds, str(tmp_path / "avdir"), fmt="avro")
    import glob

    f = glob.glob(str(tmp_path / "avdir" / "*.avro"))[0]
    back = read_table(f)  # dispatch by .avro extension
    assert back.count() <= 60


def test_write_avro_dir_distinct_blocks_no_collision(tmp_path):
    """Distinct blocks whose FIRST column is identical must land in
    distinct files (naming hashes the full block content)."""
    import ray.data as rd

    t = pa.table({
        "kind": pa.array(["x"] * 400, pa.string()),   # constant first col
        "v": pa.array(range(400), pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(4)
    files = write_avro_dir(ds, str(tmp_path / "out"))
    assert len(set(files)) == len(files)              # no overwrites
    back = read_avro_dataset(str(tmp_path / "out")).to_pandas()
    assert sorted(back["v"].tolist()) == list(range(400))


def test_sources_roundtrip_dir(tmp_path):
    """write_table(fmt='avro') directory reads back through read_table."""
    import ray.data as rd

    from ton_etl_ray.sources import read_table, write_table

    t = _sample_table(80)
    write_table(rd.from_arrow(t), str(tmp_path / "d"), fmt="avro")
    back = read_table(str(tmp_path / "d"))
    assert back.count() == 80


def test_write_avro_dir_unique_naming_preserves_duplicates(tmp_path):
    """naming='unique' must persist byte-identical blocks separately
    (exact multiplicity), where the default content naming dedupes."""
    import ray.data as rd

    t = pa.table({"v": pa.array([1, 2, 3, 4] * 100, pa.int64())})
    # two byte-identical blocks
    ds = rd.from_arrow(pa.concat_tables([t, t])).repartition(2)
    files_u = write_avro_dir(ds, str(tmp_path / "uniq"), naming="unique")
    back = read_avro_dataset(str(tmp_path / "uniq")).to_pandas()
    assert len(back) == 800
    assert len(set(files_u)) == len(files_u)


def test_avro_null_list_elements_roundtrip(tmp_path):
    """List items are a ['null', T] union: a null ELEMENT inside tokens
    used to crash _encode_value (int(None)) mid-file."""
    t = pa.table({
        "doc_id": pa.array(["a", "b"], pa.string()),
        "tokens": pa.array([[1, None, 3], None], pa.list_(pa.int32())),
    })
    p = str(tmp_path / "x.avro")
    write_avro(t, p)
    back = read_avro(p)
    assert back.equals(t)


def test_avro_roundtrip_preserves_narrow_types(tmp_path):
    """Avro wire types widen int8/int16→int32, uint32→long and pin
    timestamps at micros; the stored Arrow schema must restore the
    writer's exact types on read."""
    t = pa.table({
        "i8": pa.array([1, -2], pa.int8()),
        "i16": pa.array([300, -5], pa.int16()),
        "u32": pa.array([7, 2**31], pa.uint32()),
        "ts": pa.array([1000, 2000], pa.timestamp("ms")),
    })
    p = str(tmp_path / "narrow.avro")
    write_avro(t, p)
    back = read_avro(p)
    assert back.schema == t.schema
    assert back.equals(t)
