"""Moon.cx-shaped DEX parser (SURVEY.md §2.3 P9/P10): a parser over a
DERIVED jetton_transfers table whose claim and payload both live in the
transfers' FORWARD PAYLOAD cells.

Reference: parsers/message/moon_swap_ton.py:13-144 and
parsers/jetton_transfer/moon_swap_jetton.py:12-121 — the jetton form
consumes the jetton_transfers topic, claims the payout leg by
``source ∈ pools`` + forward-payload opcode == SWAP_SUCCEED (dropping
pool transfers whose payload carries a NON_SWAP opcode,
moon_swap_jetton.py:21-30), then walks the trace to the PARENT jetton
transfer and decodes ITS forward payload — swap opcode, min_out,
deadline, excess, referral (moon_swap_jetton.py:43-57). This is the
family's distinguishing composite: unlike megaton (typed columns only)
the derived table carries OPAQUE payload cells on both legs.

Cluster shape:

1. vectorized claim FIRST (``!tx_aborted`` + pool-membership
   ``pc.is_in`` on the address column) — the cheap column predicate
   prunes before any BOC work,
2. per-surviving-row ``opcode_of`` on the forward payload (the 32-bit
   peek, not a full parse) picks swap-request vs swap-succeed legs and
   drops NON_SWAP pool traffic,
3. full payload decode (min_out / deadline / referral) only for
   CLAIMED in-legs — decode-after-claim, the order that survives
   100 TB,
4. the reference's per-record ``get_parent_jetton_transfer`` DB walk
   becomes ONE hash join on ``trace_id``.

Synthetic transfers, derived from orders (``k = o_orderkey`` — a
UNIQUE key; the lineitem composite (orderkey, linenumber) is not
unique in the synthetic testdata and would fan the trace join out);
both legs aborted iff k % 7 == 0:

- IN leg  (tx md5('wi-k')): user(k%5000) → pool(k%32), master w0,
  amount k*19+3, payload = [SWAP_OP, min_out k*11+1, deadline k*100+60,
  excess user, referral addr(ref, k%10) or addr_none when k % 3 == 0].
- OUT leg (tx md5('wo-k')): pool → user, master w1, amount k*7+2,
  payload = [SUCCEED_OP].
- NOISE  (k % 5 == 0): two extra transfers in the SAME trace with a
  NON_SWAP payload opcode — one pool → user (md5('wn-k')) and one
  user → pool (md5('wm-k')); address membership alone would claim
  both legs, so the payload-opcode check must drop each.

Every output field is arithmetically recomputable in DuckDB, so the
``moon_swaps`` query carries a full value-hash oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .._pickle import ensure_portable
from ..boc import Builder, opcode_of, parse_boc, serialize_boc
from ._util import addr_bytes, addr_str, cached_synth_table, fmt_addr, md5_tag, read_synth_dir, read_table

N_MOON_POOLS = 32
MOON_POOLS = [addr_str("mpool", i) for i in range(N_MOON_POOLS)]
SWAP_OPCODE = 0x4D4F4F4E  # "MOON"
SWAP_SUCCEED_OPCODE = 0x53554343  # "SUCC"
NON_SWAP_OPCODE = 0x4E4F4E45  # "NONE"

_TRANSFER_SCHEMA = pa.schema(
    [
        ("tx_hash", pa.string()),
        ("trace_id", pa.string()),
        ("tx_aborted", pa.bool_()),
        ("source", pa.string()),
        ("destination", pa.string()),
        ("jetton_master", pa.string()),
        ("amount", pa.int64()),
        ("lt", pa.int64()),
        ("forward_payload", pa.binary()),
    ]
)


def encode_swap_request(k: int) -> bytes:
    """In-leg forward payload (moon_swap_jetton.py:47-57 field order):
    swap opcode, min_out coins, deadline, excess address, referral
    address (addr_none for every 3rd request — a legal TL-B form the
    decoder must map to null)."""
    b = Builder().store_uint(SWAP_OPCODE, 32)
    b.store_coins(k * 11 + 1)
    b.store_uint(k * 100 + 60, 64)
    b.store_address((0, addr_bytes("muser", k % 5000)))
    b.store_address(None if k % 3 == 0 else (0, addr_bytes("ref", k % 10)))
    return serialize_boc(b.end_cell())


def _payload_op_only(op: int) -> bytes:
    return serialize_boc(Builder().store_uint(op, 32).end_cell())


def synth_moon_transfers(sf_dir: str):
    """SF-scaled typed-plus-payload jetton_transfers table (module
    doc), generated as a distributed ``map_batches`` stage over
    orders."""
    ensure_portable()
    ds = read_table(sf_dir, "orders", columns=["o_orderkey"])
    succeed = _payload_op_only(SWAP_SUCCEED_OPCODE)
    nonswap = _payload_op_only(NON_SWAP_OPCODE)

    def gen(t: pa.Table) -> pa.Table:
        rows: list[tuple] = []
        for k in t["o_orderkey"].to_pylist():
            pool = addr_str("mpool", k % N_MOON_POOLS)
            user = addr_str("muser", k % 5000)
            trace, aborted = md5_tag("wtr", k), k % 7 == 0
            rows.append(
                (md5_tag("wi", k), trace, aborted, user, pool,
                 addr_str("w0", k % N_MOON_POOLS), k * 19 + 3, 2 * k,
                 encode_swap_request(k))
            )
            rows.append(
                (md5_tag("wo", k), trace, aborted, pool, user,
                 addr_str("w1", k % N_MOON_POOLS), k * 7 + 2, 2 * k + 1,
                 succeed)
            )
            if k % 5 == 0:
                # pool-side noise: source ∈ pools but NON_SWAP payload
                rows.append(
                    (md5_tag("wn", k), trace, False, pool, user,
                     addr_str("w0", k % N_MOON_POOLS), k * 3, 2 * k,
                     nonswap)
                )
                # user-side noise: destination ∈ pools but NON_SWAP payload
                rows.append(
                    (md5_tag("wm", k), trace, False, user, pool,
                     addr_str("w0", k % N_MOON_POOLS), k * 2, 2 * k,
                     nonswap)
                )
        cols = list(zip(*rows)) if rows else [[] for _ in _TRANSFER_SCHEMA]
        return pa.table(
            {f.name: pa.array(list(col), f.type)
             for f, col in zip(_TRANSFER_SCHEMA, cols)},
            schema=_TRANSFER_SCHEMA,
        )

    return ds.map_batches(gen, batch_format="pyarrow")


def ensure_transfer_table(sf_dir: str) -> str:
    return cached_synth_table(sf_dir, "moon", "orders", synth_moon_transfers)


_SWAP_SCHEMA = pa.schema(
    [
        ("tx_hash", pa.string()),
        ("trace_id", pa.string()),
        ("swap_user", pa.string()),
        ("pool", pa.string()),
        ("swap_src_token", pa.string()),
        ("swap_src_amount", pa.int64()),
        ("swap_dst_token", pa.string()),
        ("swap_dst_amount", pa.int64()),
        ("min_out", pa.int64()),
        ("deadline", pa.int64()),
        ("referral", pa.string()),
    ]
)


def moon_swaps(sf_dir: str):
    """P9/P10 composite (module doc): column-predicate claim →
    payload-opcode peek → full request-payload decode on claimed
    in-legs only → ONE trace_id hash join replacing the reference's
    per-record parent walk."""
    ensure_portable()
    from .relational import join_auto

    pools = pa.array(MOON_POOLS, pa.string())
    ds = read_synth_dir(ensure_transfer_table(sf_dir), _TRANSFER_SCHEMA)

    def in_legs(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.invert(t["tx_aborted"]), pc.is_in(t["destination"], pools))
        )
        keep, min_outs, deadlines, refs = [], [], [], []
        for body in t["forward_payload"].to_pylist():
            # parse ONCE and branch on the opcode — opcode_of() is a
            # FULL parse (CRC32C + cell-tree build), and per-row BOC
            # decode dominates this family's cost, so peeking then
            # re-parsing claimed rows doubled the dominant work
            s = parse_boc(body).begin_parse()
            if s.remaining_bits < 32 or s.load_uint(32) != SWAP_OPCODE:
                keep.append(False)
                continue
            min_outs.append(s.load_coins())
            deadlines.append(s.load_uint(64))
            s.load_address()  # excess (not projected by the reference row)
            refs.append(fmt_addr(s.load_address()))
            keep.append(True)
        t = t.filter(pa.array(keep, pa.bool_()))
        return pa.table(
            {
                "trace_id": t["trace_id"],
                "swap_user": t["source"],
                "pool": t["destination"],
                "swap_src_token": t["jetton_master"],
                "swap_src_amount": t["amount"],
                "min_out": pa.array(min_outs, pa.int64()),
                "deadline": pa.array(deadlines, pa.int64()),
                "referral": pa.array(refs, pa.string()),
            }
        )

    def out_legs(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.invert(t["tx_aborted"]), pc.is_in(t["source"], pools))
        )
        ops = pa.array(
            [opcode_of(b) == SWAP_SUCCEED_OPCODE for b in t["forward_payload"].to_pylist()],
            pa.bool_(),
        )
        t = t.filter(ops)
        return pa.table(
            {
                "trace_id": t["trace_id"],
                "tx_hash": t["tx_hash"],
                "swap_dst_token": t["jetton_master"],
                "swap_dst_amount": t["amount"],
            }
        )

    joined = join_auto(
        ds.map_batches(in_legs, batch_format="pyarrow"),
        ds.map_batches(out_legs, batch_format="pyarrow"),
        on="trace_id",
    )

    def assemble(t: pa.Table) -> pa.Table:
        return t.select([f.name for f in _SWAP_SCHEMA]).cast(_SWAP_SCHEMA)

    return joined.map_batches(assemble, batch_format="pyarrow")
