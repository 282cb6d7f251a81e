import pyarrow as pa
import pytest

from ton_etl_ray.core.schema_evolution import conform, unify_schemas, widen


def test_widen_ints_and_floats():
    assert widen(pa.int32(), pa.int64()) == pa.int64()
    assert widen(pa.float32(), pa.float64()) == pa.float64()
    assert widen(pa.int64(), pa.float32()) == pa.float64()
    assert widen(pa.uint32(), pa.int32()) == pa.int64()


def test_widen_lists():
    assert widen(pa.list_(pa.int32()), pa.list_(pa.int64())) == pa.list_(pa.int64())


def test_widen_incompatible_raises():
    with pytest.raises(TypeError):
        widen(pa.string(), pa.int64())


def test_unify_added_column():
    a = pa.schema([("x", pa.int32())])
    b = pa.schema([("x", pa.int64()), ("lang", pa.string())])
    u = unify_schemas([a, b])
    assert u.field("x").type == pa.int64()
    assert u.field("lang").type == pa.string()


def test_conform_adds_nulls_and_casts():
    u = pa.schema([("x", pa.int64()), ("lang", pa.string())])
    t = pa.table({"x": pa.array([1, 2], pa.int32())})
    c = conform(t, u)
    assert c.schema == u
    assert c["lang"].null_count == 2
    assert c["x"].type == pa.int64()


def test_widen_uint64_signed_raises():
    with pytest.raises(TypeError, match="uint64"):
        widen(pa.uint64(), pa.int32())
