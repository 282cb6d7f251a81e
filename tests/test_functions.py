"""Codec/scalar function tests (§2.9 parity; mirrors the reference's
numeric round-trip tests, tests/datalake/test_converter.py)."""

import decimal

import numpy as np
import pyarrow as pa
import pytest

from ton_etl_ray.functions import (
    b64_to_bytes,
    bytes_to_b64,
    date_partition,
    decode_debezium_numeric,
    encode_debezium_numeric,
    normalize_json,
    opcode_signed,
    strip_surrogates,
)


@pytest.mark.parametrize(
    "value,scale",
    [
        (decimal.Decimal("123.456"), 3),
        (decimal.Decimal("-9876543210.01"), 2),
        (decimal.Decimal("0"), 0),
        (decimal.Decimal(2**256) / 100, 2),  # beyond int64/float range
        (decimal.Decimal("-0.000000001"), 9),
    ],
)
def test_debezium_numeric_roundtrip(value, scale):
    enc = encode_debezium_numeric(value, scale)
    assert decode_debezium_numeric(enc) == value


def test_debezium_known_payload():
    # {scale: 2, unscaled 12345} == 123.45
    import base64

    payload = {"scale": 2, "value": base64.b64encode((12345).to_bytes(2, "big", signed=True)).decode()}
    assert decode_debezium_numeric(payload) == decimal.Decimal("123.45")


def test_opcode_signed_scalar_and_vector():
    assert opcode_signed(0x9C610DE3) == -1671361053  # dedust opcode wraps negative
    assert opcode_signed(0x10) == 16
    arr = np.array([0x9C610DE3, 0x10], dtype=np.uint32)
    out = opcode_signed(arr)
    assert out.tolist() == [-1671361053, 16]


def test_b64_roundtrip_null_safe():
    col = pa.array(["aGVsbG8=", None], pa.string())
    raw = b64_to_bytes(col)
    assert raw[0].as_py() == b"hello" and raw[1].as_py() is None
    back = bytes_to_b64(raw)
    assert back[0].as_py() == "aGVsbG8=" and back[1].as_py() is None


def test_date_partition():
    ts = pa.array([1_700_000_000_000], pa.int64())  # 2023-11-14 UTC
    assert date_partition(ts)[0].as_py() == "20231114"


def test_strip_surrogates():
    s = "ok\ud800bad"
    assert "\ud800" not in strip_surrogates(s)


def test_normalize_json_canonical():
    assert normalize_json({"b": 1, "a": [2, 3]}) == normalize_json({"a": [2, 3], "b": 1})


def test_hll_accuracy():
    from ton_etl_ray.ops.sketch import M, hll_add, hll_count, hll_merge

    rng = np.random.default_rng(3)
    vals_a = pa.array([f"u{i}" for i in rng.integers(0, 50_000, 80_000)])
    vals_b = pa.array([f"u{i}" for i in rng.integers(25_000, 75_000, 80_000)])
    ra, rb = np.zeros(M, np.uint8), np.zeros(M, np.uint8)
    hll_add(ra, vals_a)
    hll_add(rb, vals_b)
    exact = len(set(vals_a.to_pylist()) | set(vals_b.to_pylist()))
    est = hll_count(hll_merge(ra, rb))
    assert abs(est - exact) / exact < 0.05  # 4096 registers → ~1.6% σ
