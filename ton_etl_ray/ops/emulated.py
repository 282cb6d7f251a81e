"""Emulator-backed account-state parser families — the reference
capabilities whose core is a TVM get-method call, run through the
engine's own ``tvm.TvmEmulator`` (P1 factory validation, P6-P8/P11
pool-data reads, P23 Hipo/Storm/Ethena vault prices; reference
parsers/accounts/emulator.py:123-160 is the execution seam, tvl.py:
46-217 / core_prices.py:132-170 / dedust_swap.py:47-58 the consumers).

Cluster shape, per family:

- **emu_pool_states** (tvl.py get_reserves/get_trade_fee family):
  code-hash whitelist predicate → LWW rank-1 per account (map-side
  partial argmax + ONE coarse shuffle) → run get-methods on the
  WINNERS ONLY inside an autoscaling actor pool. Emulation is
  per-row by nature (it is a virtual machine), so the scalable order
  is emulate-after-reduce: at 100 TB the state feed is huge but the
  winner set is O(pools), and that is all the VM ever touches — the
  same reason the reference only emulates ``latest_account_states``.
- **emu_core_prices** (core_prices.py Hipo/Ethena shape): two contract
  families in one feed, routed per code hash to their method sets
  (getTotalAssets/getTotalShares vs get_treasury_state), price =
  ``muldiv(x, 10^9, y)`` in exact integer nano-units.
- **dedust_swaps_verified** (dedust_swap.py:47-58): the P1 factory
  half — every claimed swap's source pool is validated by calling
  ``get_pool_address(pool_type, asset0, asset1)`` on the FACTORY
  contract (one singleton emulator per actor, built in ``__init__``)
  and comparing the returned address slice to the message source, with
  the reference's valid-pool memo cache as actor state and its
  zero-amount guard (dedust_swap.py:70-72).

All contract code here is REAL bytecode assembled by ``tvm.asm`` and
executed instruction-by-instruction — the get-method outputs are
computed BY THE VM (loads from the c4 data cell, MULDIV arithmetic,
address construction), not recomputed in Python; the DuckDB oracles
recompute the same arithmetic from the synthetic keys, so a VM decode
or dispatch bug value-hash-mismatches.

Synthetic tables (deterministic, SF-scaled, arithmetic in the source
key ``k``) are documented at their generators below.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .._pickle import ensure_portable
from ..boc import Builder, Cell, cell_hash, parse_boc, serialize_boc
from ..tvm import TvmEmulator, contract
from ._util import addr_str, cached_synth_table, fmt_addr, hex2, md5_tag, pool, read_synth_dir, read_table

NANO = 1_000_000_000


# ---------------------------------------------------------------------------
# Contract code (assembled once per process; deterministic cells)
# ---------------------------------------------------------------------------

def amm_code() -> Cell:
    """AMM pool: c4 = (reserve0 u64, reserve1 u64, fee_num u16).
    Methods mirror tvl.py:92-95 (get_reserves / get_trade_fee) plus a
    VM-computed liquidity (muldiv over the reserves)."""
    load2 = [("PUSHCTR", 4), ("CTOS",), ("LDU", 64), ("LDU", 64)]
    return contract({
        "get_reserves": load2 + [("DROP",)],
        "get_trade_fee": load2 + [("LDU", 16), ("DROP",),
                                  ("XCHG", 0, 2), ("DROP",), ("DROP",),
                                  ("PUSHINT", 10_000)],
        "get_lp_liquidity": load2 + [("DROP",), ("PUSHINT", NANO), ("MULDIV",)],
    })


def vault_code() -> Cell:
    """Ethena-shaped vault (core_prices.py:168-170): c4 =
    (total_assets u64, total_shares u64)."""
    return contract({
        "getTotalAssets": [("PUSHCTR", 4), ("CTOS",), ("LDU", 64), ("DROP",)],
        "getTotalShares": [("PUSHCTR", 4), ("CTOS",), ("LDU", 64),
                           ("LDU", 64), ("DROP",), ("NIP",)],
    })


def treasury_code() -> Cell:
    """Hipo-shaped treasury (core_prices.py:132-148): c4 =
    (total_coins u64, total_tokens u64, flags u32); the get method
    returns the (coins, tokens) prefix of the state tuple."""
    return contract({
        "get_treasury_state": [("PUSHCTR", 4), ("CTOS",), ("LDU", 64),
                               ("LDU", 64), ("LDU", 32), ("DROP",), ("DROP",)],
    })


def wallet_code() -> Cell:
    """Non-whitelisted noise contract (the code-hash predicate must
    drop its accounts, tvl.py:35-38)."""
    return contract({"seqno": [("PUSHINT", 1)]})


def factory_code() -> Cell:
    """DeDust-shaped factory: ``get_pool_address(pool_type, asset0,
    asset1)`` (dedust_swap.py:47-58; the public factory contract
    derives the pool address from the asset pair — here an arithmetic
    derivation over the assets' 64-bit tails so the DuckDB oracle can
    recompute it). Assets arrive as 4-bit-tagged jetton slices
    (tag u4, wc u8, hash u256); the method returns the pool address
    as an addr_std slice BUILT BY THE VM (NEWC/STU/ENDC/CTOS)."""
    load_tail = [("LDU", 4), ("NIP",), ("LDU", 8), ("NIP",),
                 ("LDU", 256), ("DROP",)]
    return contract({
        "get_pool_address": (
            # stack: t a0 a1
            load_tail + [("MULINT", 7),                # t a0 7*j1
                         ("SWAP",)] + load_tail +      # t 7*j1 j0
            [("MULINT", 3), ("ADD",),                  # t (7j1+3j0)
             ("SWAP",), ("MULINT", 11), ("ADD",), ("ADDINT", 5),  # v
             ("PUSHINT", 4), ("NEWC",), ("STU", 3),    # addr_std$100 tag
             ("PUSHINT", 0), ("SWAP",), ("STU", 8),    # wc 0
             ("PUSHINT", 0), ("SWAP",), ("STU", 192),  # hash high bits
             ("STU", 64), ("ENDC",), ("CTOS",)]        # hash tail = v
        ),
    })


def _code_entry(cell: Cell) -> tuple[str, bytes]:
    return cell_hash(cell).hex().upper(), serialize_boc(cell)


# ---------------------------------------------------------------------------
# Synthetic account-state tables
# ---------------------------------------------------------------------------

_STATE_SCHEMA = pa.schema([
    ("account", pa.string()),
    ("lt", pa.int64()),
    ("code_hash", pa.string()),
    ("code_boc", pa.binary()),
    ("data_boc", pa.binary()),
])

N_EMU_POOLS = 512
N_EMU_VAULTS = 256


def encode_amm_data(k: int) -> bytes:
    return serialize_boc(Builder()
                         .store_uint(k * 1000 + 17, 64)
                         .store_uint(k * 377 + 29, 64)
                         .store_uint(k % 97 + 3, 16).end_cell())


def encode_vault_data(k: int) -> bytes:
    return serialize_boc(Builder()
                         .store_uint(k * 991 + 7, 64)
                         .store_uint(k * 500 + 3, 64).end_cell())


def encode_treasury_data(k: int) -> bytes:
    return serialize_boc(Builder()
                         .store_uint(k * 777 + 11, 64)
                         .store_uint(k * 333 + 5, 64)
                         .store_uint(k % 16, 32).end_cell())


def synth_emu_pool_states(sf_dir: str):
    """Per customer key ``k``: account=addr(epool, k%512), lt=k, AMM
    code+data — except every 11th row carries the wallet code (not
    whitelisted, dropped)."""
    ensure_portable()
    ds = read_table(sf_dir, "customer", columns=["c_custkey"])
    amm_h, amm_b = _code_entry(amm_code())
    wal_h, wal_b = _code_entry(wallet_code())

    def gen(t: pa.Table) -> pa.Table:
        rows = []
        for k in t["c_custkey"].to_pylist():
            noise = k % 11 == 0
            rows.append((addr_str("epool", k % N_EMU_POOLS), k,
                         wal_h if noise else amm_h,
                         wal_b if noise else amm_b, encode_amm_data(k)))
        return _state_table(rows)

    return ds.map_batches(gen, batch_format="pyarrow")


def synth_emu_vault_states(sf_dir: str):
    """Per supplier key ``k``: odd keys are vaults (addr(evault,
    k%256)), even keys treasuries (addr(etreas, k%256)) — two contract
    families in one feed, routed by code hash like the reference's
    per-platform map (core_prices.py predicate). Every 9th row is
    wallet-code noise."""
    ensure_portable()
    ds = read_table(sf_dir, "supplier", columns=["s_suppkey"])
    vau_h, vau_b = _code_entry(vault_code())
    tre_h, tre_b = _code_entry(treasury_code())
    wal_h, wal_b = _code_entry(wallet_code())

    def gen(t: pa.Table) -> pa.Table:
        rows = []
        for k in t["s_suppkey"].to_pylist():
            if k % 9 == 0:
                rows.append((addr_str("ew", k % 64), k, wal_h, wal_b,
                             encode_vault_data(k)))
            elif k % 2 == 1:
                rows.append((addr_str("evault", k % N_EMU_VAULTS), k,
                             vau_h, vau_b, encode_vault_data(k)))
            else:
                rows.append((addr_str("etreas", k % N_EMU_VAULTS), k,
                             tre_h, tre_b, encode_treasury_data(k)))
        return _state_table(rows)

    return ds.map_batches(gen, batch_format="pyarrow")


def _state_table(rows: list[tuple]) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[] for _ in _STATE_SCHEMA]
    return pa.table({f.name: pa.array(list(c), f.type)
                     for f, c in zip(_STATE_SCHEMA, cols)}, schema=_STATE_SCHEMA)


def emu_pool_dataset(sf_dir: str):
    return read_synth_dir(
        cached_synth_table(sf_dir, "emupool", "customer", synth_emu_pool_states),
        _STATE_SCHEMA)


def emu_vault_dataset(sf_dir: str):
    return read_synth_dir(
        cached_synth_table(sf_dir, "emuvault", "supplier", synth_emu_vault_states),
        _STATE_SCHEMA)


# ---------------------------------------------------------------------------
# Rank-1 reduce keeping the code columns
# ---------------------------------------------------------------------------

def _rank1_with_code(ds, code_hashes: list[str], *, num_buckets: int):
    """prices._rank1_states generalized to a code-hash SET and a
    code-carrying payload: map-side partial argmax per (account) per
    block, one coarse shuffle, vectorized final argmax per bucket."""
    from .relational import _bucketed

    want = pa.array(code_hashes, pa.string())
    cols = ["account", "lt", "code_hash", "code_boc", "data_boc"]
    out_schema = pa.schema([_STATE_SCHEMA.field(c) for c in cols])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["code_hash"], want))
        df = t.select(cols).to_pandas()
        df = df.sort_values(["account", "lt"], kind="mergesort")
        return pa.Table.from_pandas(
            df.drop_duplicates(["account"], keep="last"), preserve_index=False
        ).replace_schema_metadata(None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["account", "lt"], kind="mergesort")
        return g.drop_duplicates(["account"], keep="last")[cols]

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _bucketed(partials, "account", per_bucket, out_schema,
                     num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# Emulation stages (actor pools; per-actor code cache)
# ---------------------------------------------------------------------------

class _EmulateWinners:
    """Actor stage: run a per-code-hash method plan over rank-1
    winners. Code cells are parsed ONCE per hash per actor (the state
    feed repeats a handful of codes across millions of accounts); data
    cells are per-row by nature. ``plan`` maps code_hash -> callable
    (emulator, account, lt) -> output row dict or None."""

    def __init__(self, plan_builder, out_schema: pa.Schema):
        self.plan = plan_builder()
        self.out_schema = out_schema
        self._codes: dict[str, Cell] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = []
        for account, lt, ch, cb, db in zip(
            t["account"].to_pylist(), t["lt"].to_pylist(),
            t["code_hash"].to_pylist(), t["code_boc"].to_pylist(),
            t["data_boc"].to_pylist(),
        ):
            handler = self.plan.get(ch)
            if handler is None:
                continue
            code = self._codes.get(ch)
            if code is None:
                code = self._codes[ch] = parse_boc(cb)
            emu = TvmEmulator(code, parse_boc(db))
            row = handler(emu, account, lt)
            if row is not None:
                rows.append(row)
        if not rows:
            return self.out_schema.empty_table()
        return pa.table(
            {f.name: pa.array([r[f.name] for r in rows], f.type)
             for f in self.out_schema}, schema=self.out_schema)


def _run(emu: TvmEmulator, method: str, args: list | None = None) -> list:
    """_execute_method semantics (emulator.py:134-155): non-zero exit
    raises; callers treat it as a non-critical skip."""
    r = emu.run_get_method(method, args)
    if r["vm_exit_code"] != 0:
        raise ValueError(f"{method} exited {r['vm_exit_code']}")
    return r["stack"]


_POOL_SCHEMA = pa.schema([
    ("account", pa.string()), ("lt", pa.int64()),
    ("reserve0", pa.int64()), ("reserve1", pa.int64()),
    ("fee_num", pa.int64()), ("fee_den", pa.int64()),
    ("liquidity", pa.int64()),
])


def _pool_plan():
    amm_h, _ = _code_entry(amm_code())

    def handle(emu, account, lt):
        r0, r1 = _run(emu, "get_reserves")
        fee_num, fee_den = _run(emu, "get_trade_fee")
        (liq,) = _run(emu, "get_lp_liquidity")
        return {"account": account, "lt": lt, "reserve0": r0, "reserve1": r1,
                "fee_num": fee_num, "fee_den": fee_den, "liquidity": liq}

    return {amm_h: handle}


def emu_pool_states(sf_dir: str, *, num_buckets: int = 64):
    """tvl.py:92-95 as a pipeline: whitelist → rank-1 → emulate
    winners (get_reserves + get_trade_fee + VM muldiv liquidity)."""
    ensure_portable()
    amm_h, _ = _code_entry(amm_code())
    winners = _rank1_with_code(emu_pool_dataset(sf_dir), [amm_h],
                               num_buckets=num_buckets)
    return winners.map_batches(
        _EmulateWinners, fn_constructor_args=(_pool_plan, _POOL_SCHEMA),
        batch_format="pyarrow", concurrency=pool())


_PRICE_SCHEMA = pa.schema([
    ("account", pa.string()), ("lt", pa.int64()),
    ("kind", pa.string()), ("price_nano", pa.int64()),
])


def _price_plan():
    vau_h, _ = _code_entry(vault_code())
    tre_h, _ = _code_entry(treasury_code())

    def vault(emu, account, lt):
        (assets,) = _run(emu, "getTotalAssets")
        (shares,) = _run(emu, "getTotalShares")
        return {"account": account, "lt": lt, "kind": "vault",
                "price_nano": assets * NANO // shares}

    def treasury(emu, account, lt):
        coins, tokens = _run(emu, "get_treasury_state")
        return {"account": account, "lt": lt, "kind": "treasury",
                "price_nano": coins * NANO // tokens}

    return {vau_h: vault, tre_h: treasury}


def emu_core_prices(sf_dir: str, *, num_buckets: int = 64):
    """core_prices.py:132-170 as a pipeline: two code families routed
    per hash, rank-1 per account, price = muldiv in nano-units from
    the get-method outputs (Hipo total_coins/total_tokens, Ethena
    totalAssets/totalShares)."""
    ensure_portable()
    vau_h, _ = _code_entry(vault_code())
    tre_h, _ = _code_entry(treasury_code())
    winners = _rank1_with_code(emu_vault_dataset(sf_dir), [vau_h, tre_h],
                               num_buckets=num_buckets)
    return winners.map_batches(
        _EmulateWinners, fn_constructor_args=(_price_plan, _PRICE_SCHEMA),
        batch_format="pyarrow", concurrency=pool())


# ---------------------------------------------------------------------------
# DeDust factory validation (P1, dedust_swap.py:47-58)
# ---------------------------------------------------------------------------

OP_DEDUST_SWAP = 0x9C610DE3
N_DV_ASSETS = 8


def _asset_slice(j: int):
    """write_dedust_asset analogue: jetton$0001 wc:0 hash:=j (the
    synthetic assets' 256-bit hash IS the index, so both the VM and
    the DuckDB oracle can derive the pool address arithmetically)."""
    return Builder().store_uint(1, 4).store_uint(0, 8).store_uint(j, 256) \
                    .end_cell().begin_parse()


def asset_str(j: int) -> str:
    return f"0:{j:064X}"


def pool_addr_of(j0: int, j1: int, t: int) -> str:
    """The factory's address derivation, in Python (test oracle only —
    the pipeline gets it from the VM)."""
    v = 3 * j0 + 7 * j1 + 11 * t + 5
    return f"0:{v:064X}"


def encode_dv_body(k: int) -> bytes:
    """Swap event body: opcode, asset_in, asset_out, amounts (zero
    amounts on every 13th key — the dedust_swap.py:70-72 guard)."""
    zero = k % 13 == 0
    b = Builder().store_uint(OP_DEDUST_SWAP, 32)
    b.store_uint(1, 4).store_uint(0, 8).store_uint(k % N_DV_ASSETS, 256)
    b.store_uint(1, 4).store_uint(0, 8).store_uint((k + 3) % N_DV_ASSETS, 256)
    b.store_coins(0 if zero else k * 40 + 11)
    b.store_coins(0 if zero else k * 17 + 5)
    r = Builder()
    r.store_address((0, bytes.fromhex(hex2("du2", k % 2000))))
    b.store_ref(r.end_cell())
    return serialize_boc(b.end_cell())


_DV_MSG_SCHEMA = pa.schema([
    ("msg_hash", pa.string()),
    ("opcode", pa.int32()),
    ("direction", pa.string()),
    ("source", pa.string()),
    ("destination", pa.string()),
    ("body_boc", pa.binary()),
])

_DV_SCHEMA = pa.schema([
    ("tx_hash", pa.string()),
    ("pool", pa.string()),
    ("sender", pa.string()),
    ("asset_in", pa.string()),
    ("asset_out", pa.string()),
    ("amount_in", pa.int64()),
    ("amount_out", pa.int64()),
])


def synth_dv_messages(sf_dir: str):
    """Per part key ``k``: one ext-out swap event from the FACTORY-
    DERIVED pool address (pool_type = k%2) — except every 7th key's
    event claims a WRONG source (must fail factory validation and be
    dropped, dedust_swap.py:73-75) and every 13th key carries zero
    amounts (dropped before validation, dedust_swap.py:70-72)."""
    ensure_portable()
    from ..functions import opcode_signed

    ds = read_table(sf_dir, "part", columns=["p_partkey"])
    op_swap = int(opcode_signed(np.array([OP_DEDUST_SWAP], np.uint32))[0])

    def gen(t: pa.Table) -> pa.Table:
        rows = []
        for k in t["p_partkey"].to_pylist():
            j0, j1 = k % N_DV_ASSETS, (k + 3) % N_DV_ASSETS
            src = (addr_str("dbad", k % 4) if k % 7 == 0
                   else pool_addr_of(j0, j1, k % 2))
            rows.append((md5_tag("dv", k), op_swap, "out", src, None,
                         encode_dv_body(k)))
        cols = list(zip(*rows)) if rows else [[] for _ in _DV_MSG_SCHEMA]
        return pa.table({f.name: pa.array(list(c), f.type)
                         for f, c in zip(_DV_MSG_SCHEMA, cols)},
                        schema=_DV_MSG_SCHEMA)

    return ds.map_batches(gen, batch_format="pyarrow")


def dv_message_dataset(sf_dir: str):
    return read_synth_dir(
        cached_synth_table(sf_dir, "dedustv2", "part", synth_dv_messages),
        _DV_MSG_SCHEMA)


class _FactoryVerify:
    """Actor stage: decode claimed swap bodies and validate each source
    pool against the factory emulator — built ONCE per actor in
    ``__init__`` (deterministic singleton contract; the reference
    fetches the factory's account state in prepare(), dedust_swap.py:
    27-31), with the valid-pool memo as actor state (dedust_swap.py:
    48-50: ``self.valid_pools``). Tries both pool types like the
    reference's ``for pool_type in [0, 1]`` loop."""

    def __init__(self):
        self.factory = TvmEmulator(factory_code(), Builder().end_cell())
        self.valid: dict[tuple[int, int, str], bool] = {}

    def _validate(self, j0: int, j1: int, source: str) -> bool:
        key = (j0, j1, source)
        hit = self.valid.get(key)
        if hit is not None:
            return hit
        ok = False
        for pool_type in (0, 1):
            (addr,) = _run(self.factory, "get_pool_address",
                           [pool_type, _asset_slice(j0), _asset_slice(j1)])
            if fmt_addr(addr.load_address()) == source:
                ok = True
                break
        self.valid[key] = ok
        return ok

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = []
        for mh, src, body in zip(t["msg_hash"].to_pylist(),
                                 t["source"].to_pylist(),
                                 t["body_boc"].to_pylist()):
            s = parse_boc(body).begin_parse()
            if s.load_uint(32) != OP_DEDUST_SWAP:
                continue
            s.load_uint(4), s.load_uint(8)
            j0 = s.load_uint(256)
            s.load_uint(4), s.load_uint(8)
            j1 = s.load_uint(256)
            amount_in = s.load_coins()
            amount_out = s.load_coins()
            if amount_in == 0 or amount_out == 0:
                continue  # dedust_swap.py:70-72
            if not self._validate(j0, j1, src):
                continue  # dedust_swap.py:73-75
            sender = fmt_addr(s.load_ref().begin_parse().load_address())
            rows.append((mh, src, sender, asset_str(j0), asset_str(j1),
                         amount_in, amount_out))
        if not rows:
            return _DV_SCHEMA.empty_table()
        cols = list(zip(*rows))
        return pa.table({f.name: pa.array(list(c), f.type)
                         for f, c in zip(_DV_SCHEMA, cols)}, schema=_DV_SCHEMA)


def dedust_swaps_verified(sf_dir: str, *, batch_size: int = 4096):
    """The FULL P1 pipeline: vectorized ext-out claim, decode-after-
    claim, then per-pool factory get_pool_address validation in the
    emulator — claim column work stays Arrow; only claimed rows reach
    the VM, and only DISTINCT pools reach it more than once (memo)."""
    ensure_portable()
    from ..functions import opcode_signed

    op_swap = pa.scalar(
        int(opcode_signed(np.array([OP_DEDUST_SWAP], np.uint32))[0]), pa.int32())

    def claim(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.equal(t["opcode"], op_swap),
                    pc.equal(t["direction"], pa.scalar("out"))),
            pc.is_null(t["destination"]),
        )
        return t.filter(pc.fill_null(keep, False))

    return (dv_message_dataset(sf_dir)
            .map_batches(claim, batch_format="pyarrow")
            .map_batches(_FactoryVerify, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=pool()))
