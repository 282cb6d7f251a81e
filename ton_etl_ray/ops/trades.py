"""Launchpad trade-event parser family: the reference's EXT-OUT
single-message decode shape (SURVEY.md §2.3 P12-P16) re-expressed as
Ray Data stages.

The reference's TonFun parser (parsers/message/tonfun.py:103-135) is
the canonical P12 form shared by Blum/GasPump/MemesLab/Uranus
(P13-P16): bonding-curve contracts emit EXTERNAL-OUT event messages
(direction out, no destination), the parser predicate is a small
multi-opcode set plus a contract whitelist (the reference checks
jetton-wallet/sender code hashes — tonfun.py:20-23, gaspump.py:34-41),
and each opcode selects a DIFFERENT body layout that normalizes into
one trade table (tonfun_bcl_trade).

Here the whitelist is a tiny constant set compiled into the vectorized
predicate (``pc.is_in`` — the reference's code-hash whitelists are
literal constants too), the three layouts decode in one task-based
``map_batches`` branch-by-opcode pass, and buy/sell rows normalize to
``bcl_trades`` while graduation events (the token-state transition,
tonfun.py:106-111 third opcode) go to ``bcl_graduations`` — separate
outputs rather than one nullable union, so every column stays
non-null and value-hash-checkable.

The message table is DETERMINISTIC, derived from lineitem (a different
source table than the events-derived decode table and orders-derived
swap table): per lineitem row, ``k = l_orderkey * 8 + l_linenumber``,
``c = l_suppkey``, contract index ``k % 12``. ``k`` is NOT unique in
the synthetic lineitem (~(orderkey, linenumber) pairs repeat); that is
harmless — every decoded field is a row-local function of (k, c), so
duplicate-``k`` rows produce identical-by-construction independent
output rows and the value-hash oracle compares multisets:

- kind = k % 3: 0 → buy#cd78325d  (query_id=k, trader=addr(t,c),
  ton_in=k*50+7, jetton_out=k*20+3, fee=k%100),
  1 → sell#5e97d116 (query_id=k, trader=addr(t,c), jetton_in=k*20+5,
  ton_out=k*50+2, fee=k%100),
  2 → graduation#0f6ab54f (query_id=k, total_supply=k*1000+1).
- source contract: addr(bcl, k%12) — except every 13th row comes from
  addr(rogue, k%12), which is NOT whitelisted and must be dropped by
  the predicate exactly like the reference's non-whitelisted-sender
  branch (tonfun.py:113-117).

Every decoded field is an arithmetic function of (k, c), so a DuckDB
oracle recomputes the full output from lineitem and any codec /
predicate / branch bug value-hash-mismatches.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._pickle import ensure_portable
from ..boc import Builder, parse_boc, serialize_boc
from ._util import (
    addr_bytes as _addr_bytes,
    addr_str as _addr_str,
    cached_synth_table,
    fmt_addr as _fmt_addr,
    read_synth_dir,
    read_table,
)

OP_BUY = 0xCD78325D
OP_SELL = 0x5E97D116
OP_GRADUATION = 0x0F6AB54F
N_CONTRACTS = 12

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


def contract_whitelist() -> list[str]:
    """The P12-P16 sender whitelist (code-hash constants in the
    reference — tonfun.py:20-23; here the contract address set)."""
    return [_addr_str("bcl", i) for i in range(N_CONTRACTS)]


def encode_trade_event(k: int, c: int) -> bytes:
    kind = k % 3
    if kind == 0:
        b = Builder().store_uint(OP_BUY, 32).store_uint(k, 64)
        b.store_address((0, _addr_bytes("t", c)))
        b.store_coins(k * 50 + 7)   # ton_in
        b.store_coins(k * 20 + 3)   # jetton_out
        b.store_coins(k % 100)      # fee
    elif kind == 1:
        b = Builder().store_uint(OP_SELL, 32).store_uint(k, 64)
        b.store_address((0, _addr_bytes("t", c)))
        b.store_coins(k * 20 + 5)   # jetton_in
        b.store_coins(k * 50 + 2)   # ton_out
        b.store_coins(k % 100)      # fee
    else:
        b = Builder().store_uint(OP_GRADUATION, 32).store_uint(k, 64)
        b.store_coins(k * 1000 + 1)  # total_supply
    return serialize_boc(b.end_cell())


def synth_trade_messages(sf_dir: str):
    """SF-scaled synthetic ext-out event table (module doc), generated
    as a distributed ``map_batches`` stage over lineitem."""
    ensure_portable()
    from ..functions import opcode_signed

    ds = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_suppkey"]
    )
    ops_by_kind = {
        0: opcode_signed(OP_BUY),
        1: opcode_signed(OP_SELL),
        2: opcode_signed(OP_GRADUATION),
    }

    def gen(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = t["l_linenumber"].to_numpy(zero_copy_only=False)
        cs = t["l_suppkey"].to_numpy(zero_copy_only=False)
        ks = ok * 8 + ln
        hashes, opcodes, sources, bodies = [], [], [], []
        for k, c in zip(ks.tolist(), cs.tolist()):
            hashes.append(hashlib.md5(f"trade-{k}".encode()).hexdigest())
            opcodes.append(ops_by_kind[k % 3])
            tag = "rogue" if k % 13 == 0 else "bcl"
            sources.append(_addr_str(tag, k % N_CONTRACTS))
            bodies.append(encode_trade_event(k, c))
        n = len(hashes)
        return pa.table(
            {
                "msg_hash": pa.array(hashes, pa.string()),
                "opcode": pa.array(opcodes, pa.int32()),
                "direction": pa.array(["out"] * n, pa.string()),
                "source": pa.array(sources, pa.string()),
                "destination": pa.array([None] * n, pa.string()),
                "body_boc": pa.array(bodies, pa.binary()),
            },
            schema=_MSG_SCHEMA,
        )

    return ds.map_batches(gen, batch_format="pyarrow")


def ensure_trade_table(sf_dir: str) -> str:
    """Cached parquet copy (content-fingerprinted on lineitem.parquet):
    trade queries time the PARSER, not the synthetic body encoding."""
    return cached_synth_table(sf_dir, "trades", "lineitem", synth_trade_messages)


def trade_message_dataset(sf_dir: str):
    return read_synth_dir(ensure_trade_table(sf_dir), _MSG_SCHEMA)



def _claim(t: pa.Table, ops: list[int]) -> pa.Table:
    """The P12-P16 predicate, fully vectorized: ext-out (direction out,
    no destination), opcode ∈ the parser's set, sender whitelisted
    (tonfun.py:14-18, 113-117)."""
    from ..functions import opcode_signed

    signed = [opcode_signed(o) for o in ops]  # scalar path, no arrays
    mask = pc.and_(
        pc.and_(
            pc.is_in(t["opcode"], value_set=pa.array(signed, pa.int32())),
            pc.is_in(
                t["source"], value_set=pa.array(contract_whitelist(), pa.string())
            ),
        ),
        pc.and_(
            pc.equal(t["direction"], pa.scalar("out")),
            pc.is_null(t["destination"]),
        ),
    )
    return t.filter(mask)


_TRADE_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("contract", pa.string()),
        ("trader", pa.string()),
        ("side", pa.string()),
        ("ton_amount", pa.int64()),
        ("jetton_amount", pa.int64()),
        ("fee", pa.int64()),
    ]
)


def decode_trades(t: pa.Table) -> pa.Table:
    """Buy/sell decode, branch by opcode (the per-opcode layouts of
    tonfun.py:119-135 normalized into one trade row shape)."""
    from ..functions import opcode_signed

    t = _claim(t, [OP_BUY, OP_SELL])
    buy_op = opcode_signed(OP_BUY)
    contracts = t["source"].to_pylist()
    opcodes = t["opcode"].to_pylist()
    qids, traders, sides, tons, jettons, fees = [], [], [], [], [], []
    for op, body in zip(opcodes, t["body_boc"].to_pylist()):
        s = parse_boc(body).begin_parse()
        s.load_uint(32)
        qids.append(s.load_uint(64))
        traders.append(_fmt_addr(s.load_address()))
        a1, a2 = s.load_coins(), s.load_coins()
        if op == buy_op:
            sides.append("buy")
            tons.append(a1)
            jettons.append(a2)
        else:
            sides.append("sell")
            jettons.append(a1)
            tons.append(a2)
        fees.append(s.load_coins())
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "contract": pa.array(contracts, pa.string()),
            "trader": pa.array(traders, pa.string()),
            "side": pa.array(sides, pa.string()),
            "ton_amount": pa.array(tons, pa.int64()),
            "jetton_amount": pa.array(jettons, pa.int64()),
            "fee": pa.array(fees, pa.int64()),
        },
        schema=_TRADE_SCHEMA,
    )


_GRAD_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("contract", pa.string()),
        ("total_supply", pa.int64()),
    ]
)


def decode_graduations(t: pa.Table) -> pa.Table:
    """Graduation decode (the token-state transition event —
    tonfun.py:106-111 third opcode)."""
    t = _claim(t, [OP_GRADUATION])
    contracts = t["source"].to_pylist()
    qids, supplies = [], []
    for body in t["body_boc"].to_pylist():
        s = parse_boc(body).begin_parse()
        s.load_uint(32)
        qids.append(s.load_uint(64))
        supplies.append(s.load_coins())
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "contract": pa.array(contracts, pa.string()),
            "total_supply": pa.array(supplies, pa.int64()),
        },
        schema=_GRAD_SCHEMA,
    )


def bcl_trades(sf_dir: str, *, batch_size: int = 4096):
    """Normalized buy/sell trade rows from whitelisted ext-out events
    (P12-P16 — one task-based decode pass, zero shuffles)."""
    ensure_portable()
    return trade_message_dataset(sf_dir).map_batches(
        decode_trades, batch_format="pyarrow", batch_size=batch_size
    )


def bcl_graduations(sf_dir: str, *, batch_size: int = 4096):
    """Graduation events from whitelisted ext-out messages."""
    ensure_portable()
    return trade_message_dataset(sf_dir).map_batches(
        decode_graduations, batch_format="pyarrow", batch_size=batch_size
    )
