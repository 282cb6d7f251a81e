"""DeDust-shaped DEX swap parser (SURVEY.md §2.3 P1): the EXT-OUT
event-message claim family with a source BLACKLIST and a tagged-union
Asset codec.

Reference: parsers/message/dedust_swap.py — the claim is
``opcode == 0x9c610de3 ∧ direction == 'out' ∧ destination IS NULL ∧
source ∉ blacklist`` (dedust_swap.py:35-40; the launchpad trades family
uses the same ext-out claim but a WHITELIST — tonfun.py:113-117), and
the body is the public DeDust swap event TL-B:

    swap#9c610de3 asset_in:Asset asset_out:Asset
                  amount_in:Coins amount_out:Coins
                  ^[ sender:MsgAddress referral:MsgAddress
                     reserve0:Coins reserve1:Coins ]

``Asset`` is the 4-bit-tagged union ``native$0000`` (the TON side) /
``jetton$0001 wc:uint8 hash:uint256`` — the decode the reference does
via pytoniq slice reads (dedust_swap.py:47-58). The factory/valid-pool
TVM emulation half of P1 stays out of scope (VERDICT scope ruling);
this closes the CLAIM + CODEC half as its own oracled query.

Cluster shape: one vectorized claim (typed columns + ``pc.is_in``
blacklist, zero BOC work) → per-claimed-row body decode
(decode-after-claim). No joins, no shuffles — the scale cost is the
scan.

Synthetic table, derived from part (``k = p_partkey``; the part table
is otherwise only used by the TEP-64 metadata query, so this family
gets its own source like each sibling):

- event  (msg md5('dd-k')): ext-out (direction 'out', destination
  null) from pool addr(dpool, k%24) — except every 9th row comes from
  addr(blkd, k%4), which IS blacklisted and must be dropped
  (dedust_swap.py:35-40 source-blacklist branch).
  Body: asset_in = TON if k%4==0 else jetton(dj, k%8);
  asset_out = TON if k%4==1 else jetton(dj, (k+3)%8);
  amount_in=k*40+11, amount_out=k*17+5;
  ref{sender=addr(du, k%2000), referral=addr(dref, k%6) iff k%5==0
  else addr_none, reserve0=k*1000+3, reserve1=k*700+9}.
- noise (k%6==0, msg md5('dn-k')): ext-out from the SAME whitequeued
  pool with a different opcode — the opcode predicate must drop it.
- noise (k%8==0, msg md5('di-k')): an INTERNAL ('in', destination set)
  message carrying the swap opcode — the direction/dest-null claim
  must drop it.

Every output field is an arithmetic function of k, so a DuckDB oracle
recomputes the full parse and any claim/codec bug value-hash-
mismatches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._pickle import ensure_portable
from ..boc import Builder, Cell, parse_boc, serialize_boc
from ._util import addr_bytes, addr_str, cached_synth_table, fmt_addr, md5_tag, read_synth_dir, read_table

OP_DEDUST_SWAP = 0x9C610DE3
OP_OTHER_EVENT = 0x00D1FF00
N_DEDUST_POOLS = 24

# dedust_swap.py:35-40: specific broken/legacy pool addresses whose
# events must be ignored — a literal constant set, like the reference's
DEDUST_BLACKLIST = tuple(sorted(addr_str("blkd", i) for i in range(4)))

_MSG_SCHEMA = pa.schema(
    [
        ("msg_hash", pa.string()),
        ("opcode", pa.int32()),
        ("direction", pa.string()),
        ("source", pa.string()),
        ("destination", pa.string()),
        ("body_boc", pa.binary()),
    ]
)

_SWAP_SCHEMA = pa.schema(
    [
        ("pool", pa.string()),
        ("sender", pa.string()),
        ("asset_in", pa.string()),
        ("asset_out", pa.string()),
        ("amount_in", pa.int64()),
        ("amount_out", pa.int64()),
        ("reserve0", pa.int64()),
        ("reserve1", pa.int64()),
        ("referral", pa.string()),
    ]
)


def _store_asset(b: Builder, jetton: tuple[int, bytes] | None) -> Builder:
    """Asset: native$0000 | jetton$0001 wc:uint8 hash:uint256."""
    if jetton is None:
        return b.store_uint(0, 4)
    wc, h = jetton
    b.store_uint(1, 4)
    b.store_uint(wc & 0xFF, 8)
    return b.store_uint(int.from_bytes(h, "big"), 256)


def _load_asset(s) -> str:
    tag = s.load_uint(4)
    if tag == 0:
        return "TON"
    if tag != 1:
        raise ValueError(f"unknown Asset tag {tag}")
    wc = s.load_uint(8)
    h = s.load_uint(256)
    return f"{wc}:{h:064X}"


def encode_dedust_swap(k: int) -> bytes:
    """The DeDust swap event body (module doc layout)."""
    b = Builder().store_uint(OP_DEDUST_SWAP, 32)
    _store_asset(b, None if k % 4 == 0 else (0, addr_bytes("dj", k % 8)))
    _store_asset(b, None if k % 4 == 1 else (0, addr_bytes("dj", (k + 3) % 8)))
    b.store_coins(k * 40 + 11)
    b.store_coins(k * 17 + 5)
    r = Builder()
    r.store_address((0, addr_bytes("du", k % 2000)))
    r.store_address((0, addr_bytes("dref", k % 6)) if k % 5 == 0 else None)
    r.store_coins(k * 1000 + 3)
    r.store_coins(k * 700 + 9)
    b.store_ref(r.end_cell())
    return serialize_boc(b.end_cell())


def synth_dedust_messages(sf_dir: str):
    """SF-scaled synthetic ext-out message table (module doc),
    generated as a distributed ``map_batches`` stage over part."""
    ensure_portable()
    from ..functions import opcode_signed

    ds = read_table(sf_dir, "part", columns=["p_partkey"])
    op_swap = opcode_signed(OP_DEDUST_SWAP)
    op_other = opcode_signed(OP_OTHER_EVENT)
    other_body = serialize_boc(
        Builder().store_uint(OP_OTHER_EVENT, 32).end_cell()
    )

    def gen(t: pa.Table) -> pa.Table:
        rows: list[tuple] = []
        for k in t["p_partkey"].to_pylist():
            src = addr_str("blkd", k % 4) if k % 9 == 0 else addr_str("dpool", k % 24)
            body = encode_dedust_swap(k)
            rows.append((md5_tag("dd", k), op_swap, "out", src, None, body))
            if k % 6 == 0:
                rows.append(
                    (md5_tag("dn", k), op_other, "out",
                     addr_str("dpool", k % 24), None, other_body)
                )
            if k % 8 == 0:
                rows.append(
                    (md5_tag("di", k), op_swap, "in",
                     addr_str("dpool", k % 24), addr_str("x", 1), body)
                )
        cols = list(zip(*rows)) if rows else [[] for _ in _MSG_SCHEMA]
        return pa.table(
            {f.name: pa.array(list(col), f.type)
             for f, col in zip(_MSG_SCHEMA, cols)},
            schema=_MSG_SCHEMA,
        )

    return ds.map_batches(gen, batch_format="pyarrow")


def ensure_dedust_table(sf_dir: str) -> str:
    """Cached parquet copy (content-fingerprinted on part.parquet):
    the query times the PARSER, not the synthetic body encoding."""
    return cached_synth_table(sf_dir, "dedust", "part", synth_dedust_messages)


def dedust_message_dataset(sf_dir: str):
    return read_synth_dir(ensure_dedust_table(sf_dir), _MSG_SCHEMA)


def decode_swaps(t: pa.Table) -> pa.Table:
    """Decode-after-claim body parse for the claimed ext-out events."""
    pools = t["source"].to_pylist()
    senders, a_in, a_out = [], [], []
    amt_in, amt_out, r0s, r1s, refs = [], [], [], [], []
    for body in t["body_boc"].to_pylist():
        s = parse_boc(body).begin_parse()
        if s.load_uint(32) != OP_DEDUST_SWAP:
            raise ValueError("claimed row is not a dedust swap event")
        a_in.append(_load_asset(s))
        a_out.append(_load_asset(s))
        amt_in.append(s.load_coins())
        amt_out.append(s.load_coins())
        r = s.load_ref().begin_parse()
        sender = r.load_address()
        referral = r.load_address()
        senders.append(fmt_addr(sender))
        refs.append(fmt_addr(referral))
        r0s.append(r.load_coins())
        r1s.append(r.load_coins())
    return pa.table(
        {
            "pool": pa.array(pools, pa.string()),
            "sender": pa.array(senders, pa.string()),
            "asset_in": pa.array(a_in, pa.string()),
            "asset_out": pa.array(a_out, pa.string()),
            "amount_in": pa.array(amt_in, pa.int64()),
            "amount_out": pa.array(amt_out, pa.int64()),
            "reserve0": pa.array(r0s, pa.int64()),
            "reserve1": pa.array(r1s, pa.int64()),
            "referral": pa.array(refs, pa.string()),
        },
        schema=_SWAP_SCHEMA,
    )


def dedust_swaps(sf_dir: str, *, batch_size: int = 4096):
    """The P1 claim+codec pipeline: vectorized ext-out claim with the
    source blacklist (dedust_swap.py:35-40) FIRST — typed columns only,
    zero BOC work on dropped rows — then the tagged-union Asset decode
    over claimed rows (dedust_swap.py:47-58)."""
    ensure_portable()
    from ..functions import opcode_signed

    op_swap = pa.scalar(
        opcode_signed(OP_DEDUST_SWAP), pa.int32()
    )
    blacklist = pa.array(DEDUST_BLACKLIST, pa.string())

    def claim_and_decode(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.equal(t["opcode"], op_swap),
                pc.equal(t["direction"], pa.scalar("out")),
            ),
            pc.and_(
                pc.is_null(t["destination"]),
                pc.invert(pc.is_in(t["source"], blacklist)),
            ),
        )
        t = t.filter(pc.fill_null(keep, False))
        if not t.num_rows:
            return _SWAP_SCHEMA.empty_table()
        return decode_swaps(t)

    return dedust_message_dataset(sf_dir).map_batches(
        claim_and_decode, batch_format="pyarrow", batch_size=batch_size
    )
