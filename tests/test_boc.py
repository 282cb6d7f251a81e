"""BOC codec / address / TEP-64 tests: pinned public check values,
HAND-DERIVED byte vectors (independent of the serializer, so a
symmetric encode/decode bug cannot pass), and hypothesis round-trips.
"""

import base64

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ton_etl_ray.boc import (
    Builder,
    Cell,
    crc16_xmodem,
    crc32c,
    decode_comment,
    decode_tep64,
    encode_comment,
    encode_tep64_offchain,
    encode_tep64_onchain,
    opcode_of,
    parse_boc,
    raw2uf,
    serialize_boc,
    uf2raw,
)

# --- public CRC check values (catalogue standards, not derived from us)


def test_crc_check_values():
    assert crc16_xmodem(b"123456789") == 0x31C3
    assert crc32c(b"123456789") == 0xE3069283


# --- hand-derived BOC byte vectors


def test_boc_hand_vector_single_byte_cell():
    """Serialize a 1-byte cell and compare against bytes assembled BY
    HAND from the published layout (magic, flags, sizes, d1/d2, data)."""
    cell = Builder().store_uint(0xAB, 8).end_cell()
    got = serialize_boc(cell)

    body = bytes([0, 2, 0xAB])  # d1=0 refs, d2=floor+ceil=2, data
    head = (
        bytes.fromhex("b5ee9c72")  # magic
        + bytes([0b0100_0001])     # has_crc32c, ref_size=1
        + bytes([1])               # offset_size=1
        + bytes([1, 1, 0])         # cells=1, roots=1, absent=0
        + bytes([len(body)])       # tot_cells_size
        + bytes([0])               # root index
        + body
    )
    want = head + crc32c(head).to_bytes(4, "little")
    assert got == want
    assert parse_boc(got) == cell


def test_boc_hand_vector_partial_byte_and_ref():
    """12-bit cell with one child: completion tag and d1/d2 by hand."""
    child = Builder().store_uint(0x7F, 8).end_cell()
    parent = Builder().store_uint(0xABC, 12).store_ref(child).end_cell()
    got = serialize_boc(parent, with_crc=False)

    # parent: d1=1 ref, d2 = 1 + 2 = 3 (odd → partial), data AB C8
    # (0xC0 from the 12 bits + completion tag at bit 4: 0x08), ref -> 1
    # child:  d1=0, d2=2, data 7F
    body = bytes([1, 3, 0xAB, 0xC8, 1]) + bytes([0, 2, 0x7F])
    head = (
        bytes.fromhex("b5ee9c72")
        + bytes([0b0000_0001, 1])
        + bytes([2, 1, 0])
        + bytes([len(body)])
        + bytes([0])
        + body
    )
    assert got == head
    back = parse_boc(got)
    assert back.bit_len == 12 and back.refs[0] == child


def test_boc_crc_detects_corruption():
    raw = bytearray(serialize_boc(Builder().store_uint(5, 32).end_cell()))
    raw[-6] ^= 0x40  # flip a data bit, keep the old crc
    with pytest.raises(ValueError, match="crc32c mismatch"):
        parse_boc(bytes(raw))


# --- addresses (TEP-2): hand-derived friendly form


def test_address_hand_vector_zero_address():
    """Friendly form of the zero address derived by hand: tag 0x11,
    wc 0, 32 zero bytes, CRC16 appended, base64url."""
    raw = "0:" + "00" * 32
    body = bytes([0x11, 0x00]) + bytes(32)
    want = base64.urlsafe_b64encode(
        body + crc16_xmodem(body).to_bytes(2, "big")
    ).decode()
    assert raw2uf(raw) == want
    assert uf2raw(want) == raw


def test_address_roundtrip_and_validation():
    raw = "-1:" + "AB" * 32
    uf = raw2uf(raw, bounceable=False)
    assert uf2raw(uf) == raw
    # standard-alphabet input accepted too
    assert uf2raw(uf.replace("-", "+").replace("_", "/")) == raw
    # corrupt the checksum
    bad = uf[:-1] + ("A" if uf[-1] != "A" else "B")
    with pytest.raises(ValueError):
        uf2raw(bad)
    with pytest.raises(ValueError):
        uf2raw("short")


# --- comments / opcodes


def test_comment_roundtrip_and_sanitize():
    body = encode_comment("hello world")
    assert decode_comment(serialize_boc(body)) == "hello world"
    assert opcode_of(body) == 0
    # NULs stripped (reference db.py:57-60 sanitization)
    assert decode_comment(encode_comment("a\x00b")) == "ab"
    # long comment spans the snake-ref chain
    long = "x" * 500
    assert decode_comment(encode_comment(long)) == long
    # non-comment op → None
    other = Builder().store_uint(0x0F8A7EA5, 32).store_uint(7, 64).end_cell()
    assert decode_comment(other) is None
    assert opcode_of(other) == 0x0F8A7EA5


# --- TEP-64 metadata


def test_tep64_onchain_snake_and_chunked():
    attrs = {"name": "Spark Jetton", "symbol": "SPK",
             "description": "d" * 300, "decimals": "9"}
    for chunk in (None, 8, 64):
        cell = encode_tep64_onchain(attrs, chunk=chunk)
        out = decode_tep64(serialize_boc(cell))
        assert out == attrs, f"chunk={chunk}"


def test_tep64_offchain_uri():
    cell = encode_tep64_offchain("https://example.com/meta.json")
    assert decode_tep64(serialize_boc(cell)) == {
        "_offchain_uri": "https://example.com/meta.json"
    }


def test_tep64_empty_dict():
    assert decode_tep64(encode_tep64_onchain({})) == {}


# --- hypothesis round-trips


@st.composite
def cells(draw, depth: int = 2):
    bits = draw(st.integers(0, 200))
    value = draw(st.integers(0, (1 << bits) - 1)) if bits else 0
    n_refs = draw(st.integers(0, 2 if depth else 0))
    b = Builder().store_uint(value, bits)
    for _ in range(n_refs):
        b.store_ref(draw(cells(depth=depth - 1)))
    return b.end_cell()


@settings(max_examples=60, deadline=None)
@given(cells())
def test_boc_roundtrip_random_cells(cell):
    assert parse_boc(serialize_boc(cell)) == cell


@settings(max_examples=30, deadline=None)
@given(st.dictionaries(
    st.sampled_from(["name", "symbol", "description", "image", "uri"]),
    st.text(min_size=0, max_size=120), max_size=5,
), st.sampled_from([None, 8, 32]))
def test_tep64_roundtrip_random(attrs, chunk):
    # chunked encoding of an empty string still yields one empty chunk
    out = decode_tep64(encode_tep64_onchain(attrs, chunk=chunk))
    assert out == attrs


@settings(max_examples=40, deadline=None)
@given(st.integers(-128, 127), st.binary(min_size=32, max_size=32),
       st.booleans())
def test_address_roundtrip_random(wc, h, bounceable):
    raw = f"{wc}:{h.hex().upper()}"
    assert uf2raw(raw2uf(raw, bounceable=bounceable)) == raw


# --- decode stage over a tiny in-memory table (no Ray needed)


def test_boc_decode_stage_branches():
    import pyarrow as pa

    from ton_etl_ray.ops.messages import BocDecodeStage, OP_BY_TYPE, encode_event_body

    rows = [
        (1, 10, "click"),
        (2, 20, "purchase"),
        (3, 30, "view"),
        (4, 40, "error"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "body_boc": pa.array(
                [encode_event_body(*r) for r in rows], pa.binary()
            ),
        }
    )
    out = BocDecodeStage()(t).to_pydict()
    assert out["opcode"] == [0, OP_BY_TYPE["purchase"], OP_BY_TYPE["view"], OP_BY_TYPE["error"]]
    assert out["comment"] == ["evt 1", None, None, None]
    assert out["query_id"] == [-1, 2, 3, 4]
    assert out["amount_nano"] == [-1, 2007, -1, -1]
    import hashlib
    h = hashlib.md5(b"user-20").hexdigest()
    assert out["dest_addr"] == [None, f"0:{(h + h).upper()}", None, None]


def test_serialize_boc_256_cell_tree():
    """ref_size must be sized for the CELL COUNT, not max index: a snake
    chain landing on exactly 256 cells crashed the count field write."""
    from ton_etl_ray.boc import decode_comment, encode_comment, parse_boc, serialize_boc

    text = "x" * 32508  # lands on a 256-cell chain (review repro)
    blob = serialize_boc(encode_comment(text))
    assert decode_comment(parse_boc(blob)) == text


def test_parse_boc_rejects_missing_completion_tag():
    """A partial cell whose last byte carries no completion-tag bit is
    malformed and must raise, not yield a negative bit_len."""
    import pytest

    from ton_etl_ray.boc import Builder, parse_boc, serialize_boc

    blob = bytearray(serialize_boc(Builder().store_uint(0, 7).end_cell(), with_crc=False))
    # d1 d2 data for the root start right after the 11-byte header here;
    # zero the data byte so the completion tag disappears (d2 stays odd)
    blob[-1] = 0
    with pytest.raises(ValueError, match="completion tag"):
        parse_boc(bytes(blob))


def test_cell_hash_eq_contract():
    from ton_etl_ray.boc import Builder

    a = Builder().store_uint(5, 16).store_ref(Builder().store_uint(7, 8).end_cell()).end_cell()
    b = Builder().store_uint(5, 16).store_ref(Builder().store_uint(7, 8).end_cell()).end_cell()
    assert a == b and hash(a) == hash(b)


def test_build_hashmap_uint_rejects_out_of_range_keys():
    import pytest

    from ton_etl_ray.boc import Builder, build_hashmap_uint

    v = Builder().store_uint(1, 8).end_cell()
    with pytest.raises(ValueError, match="outside"):
        build_hashmap_uint({-1: v}, 64)
    with pytest.raises(ValueError, match="outside"):
        build_hashmap_uint({1 << 64: v}, 64)


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=(1 << 64) - 1),
        st.integers(min_value=0, max_value=255),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=40, deadline=None)
def test_hashmap_uint_roundtrip(items):
    from ton_etl_ray.boc import (
        Builder,
        build_hashmap_uint,
        parse_boc,
        parse_hashmap_uint,
        serialize_boc,
    )

    cells = {k: Builder().store_uint(v, 8).end_cell() for k, v in items.items()}
    root = build_hashmap_uint(cells, 64)
    back = parse_hashmap_uint(parse_boc(serialize_boc(root)), 64)
    got = {k: c.begin_parse().load_uint(8) for k, c in back.items()}
    assert got == items
