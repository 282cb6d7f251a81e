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
            try:
                code = self._codes.get(ch)
                if code is None:
                    code = self._codes[ch] = parse_boc(cb)
                emu = TvmEmulator(code, parse_boc(db))
                row = handler(emu, account, lt)
            except ValueError:
                # non-zero VM exit or corrupt code/data BOC: skip THIS
                # row, never the pipeline — the reference's
                # EmulatorException non-critical-skip path
                # (emulator.py:134-155)
                continue
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

# the claim opcode is owned by the claim+codec half of the P1 family —
# import, don't redefine, so the two halves can never drift apart
from .dedust import OP_DEDUST_SWAP  # noqa: E402

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
    op_swap = opcode_signed(OP_DEDUST_SWAP)

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
            try:
                (addr,) = _run(self.factory, "get_pool_address",
                               [pool_type, _asset_slice(j0), _asset_slice(j1)])
            except ValueError:
                continue  # emulation failed for this pool type: not valid
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


_COFFEE_EV_OP = 0xC0FFEE30
_COFFEE_IN_OP = 0xC0FFEE20
# factory derivation constants — positional weights chosen INJECTIVE
# over the feasible identity space (a1 < 6, a2 in 6..10, amm < 3), so
# no two asset pairs share a pool address
_CPF = {"a1": 1, "a2": 6, "amm": 30, "c": 5}


def coffee_pool_code() -> Cell:
    """Coffee-shaped pool (coffee_swap.py:67): c4 = (asset1 u64,
    asset2 u64, amm u8, reserve1 u64, reserve2 u64, lp_fee u16);
    ``get_pool_data`` returns (ver, asset1, asset2, amm, is_active,
    reserve1, reserve2, lp_fee) — the reference's 11-tuple trimmed to
    the fields its parser consumes."""
    return contract({
        "get_pool_data": [
            ("PUSHINT", 3),                                  # ver
            ("PUSHCTR", 4), ("CTOS",), ("LDU", 64), ("LDU", 64),
            ("LDU", 8),                                      # … amm s
            ("PUSHINT", -1), ("SWAP",),                      # is_active
            ("LDU", 64), ("LDU", 64), ("LDU", 16), ("DROP",),
        ],
    })


def coffee_factory_code() -> Cell:
    """Coffee-shaped factory: ``get_pool_address(asset1, asset2, amm,
    amm_settings)`` (coffee_swap.py:41) — asset slices + amm int +
    settings cell (ignored), address derived arithmetically from the
    assets' 64-bit tails so the oracle can recompute it."""
    load_tail = [("LDU", 4), ("NIP",), ("LDU", 8), ("NIP",),
                 ("LDU", 256), ("DROP",)]
    return contract({
        "get_pool_address": (
            # stack: a1 a2 amm settings
            [("DROP",), ("MULINT", _CPF["amm"]), ("SWAP",)] + load_tail +
            [("MULINT", _CPF["a2"]), ("ADD",), ("SWAP",)] + load_tail +
            [("MULINT", _CPF["a1"]), ("ADD",), ("ADDINT", _CPF["c"]),
             ("PUSHINT", 4), ("NEWC",), ("STU", 3),
             ("PUSHINT", 0), ("SWAP",), ("STU", 8),
             ("PUSHINT", 0), ("SWAP",), ("STU", 192),
             ("STU", 64), ("ENDC",), ("CTOS",)]
        ),
    })


def coffee_pool_of(k: int) -> tuple[int, int, int, int]:
    """(asset1, asset2, amm, v): pool identity derived from the source
    key — 30 distinct pools (k mod 30 decides)."""
    a1, a2, amm = k % 6, 6 + k % 5, k % 3
    v = _CPF["a1"] * a1 + _CPF["a2"] * a2 + _CPF["amm"] * amm + _CPF["c"]
    return a1, a2, amm, v


def encode_coffee_pool_data(k: int) -> bytes:
    a1, a2, amm, _ = coffee_pool_of(k)
    return serialize_boc(Builder()
                         .store_uint(a1, 64).store_uint(a2, 64)
                         .store_uint(amm, 8)
                         .store_uint(k * 211 + 19, 64)
                         .store_uint(k * 97 + 31, 64)
                         .store_uint(k % 100 + 1, 16).end_cell())


def synth_coffee_states(sf_dir: str):
    """Pool state feed from orders: per key one state row at the
    FACTORY-DERIVED pool address; every 15th key carries wallet-code
    noise (and keys ≡ 0, 15 mod 30 therefore leave two pools with NO
    valid state — their events must be dropped downstream, the
    reference's get_account_state_safe failure path)."""
    ensure_portable()
    ds = read_table(sf_dir, "orders", columns=["o_orderkey"])
    cof_h, cof_b = _code_entry(coffee_pool_code())
    wal_h, wal_b = _code_entry(wallet_code())

    def gen(t: pa.Table) -> pa.Table:
        rows = []
        for k in t["o_orderkey"].to_pylist():
            _, _, _, v = coffee_pool_of(k)
            noise = k % 15 == 0
            rows.append((f"0:{v:064X}", k,
                         wal_h if noise else cof_h,
                         wal_b if noise else cof_b,
                         encode_coffee_pool_data(k)))
        return _state_table(rows)

    return ds.map_batches(gen, batch_format="pyarrow")


_COFFEE_MSG_SCHEMA = pa.schema([
    ("msg_hash", pa.string()),
    ("parent_hash", pa.string()),
    ("opcode", pa.int32()),
    ("direction", pa.string()),
    ("source", pa.string()),
    ("destination", pa.string()),
    ("body_boc", pa.binary()),
])


def encode_coffee_event(k: int) -> bytes:
    """swap_successful_event#c0ffee30 (coffee_swap.py:52-60):
    query_id, asset_in, amount_in, amount_out, reserve_in,
    reserve_out, protocol_fee — zero amounts on every 19th key."""
    a1, a2, _, _ = coffee_pool_of(k)
    zero = k % 19 == 0
    b = Builder().store_uint(_COFFEE_EV_OP, 32).store_uint(k, 64)
    b.store_uint(1, 4).store_uint(0, 8).store_uint(a1 if k % 2 == 0 else a2, 256)
    b.store_coins(0 if zero else k * 31 + 7)
    b.store_coins(0 if zero else k * 11 + 3)
    b.store_coins(k + 1)
    b.store_coins(k + 2)
    b.store_coins(k % 50)
    return serialize_boc(b.end_cell())


def encode_coffee_parent(k: int) -> bytes:
    """swap_internal#c0ffee20 (coffee_swap.py:79-93): parent query_id,
    previous_amount, optional asset variant (absent), min_output,
    maybe next_body (absent), swap_params ref (deadline, recipient,
    referral)."""
    b = Builder().store_uint(_COFFEE_IN_OP, 32).store_uint(k, 64)
    b.store_coins(k * 5 + 1)
    b.store_bit(0)               # no asset variant
    b.store_coins(k * 3 + 2)     # min_output
    b.store_bit(0)               # no next_body
    p = Builder().store_uint(k % 1_000_000 + 60, 32)
    p.store_address((0, bytes.fromhex(hex2("cu", k % 3000))))
    p.store_address((0, bytes.fromhex(hex2("cref", k % 5))) if k % 4 == 0 else None)
    b.store_ref(p.end_cell())
    return serialize_boc(b.end_cell())


def synth_coffee_messages(sf_dir: str):
    """Two-message feed from orders (the parent-join shape the stonfi
    family established): per key one ext-out event from its pool (a
    WRONG source on every 23rd key — factory validation must drop it)
    plus one in-router swap_internal parent."""
    ensure_portable()
    from ..functions import opcode_signed

    ds = read_table(sf_dir, "orders", columns=["o_orderkey"])
    op_ev = opcode_signed(_COFFEE_EV_OP)
    op_in = opcode_signed(_COFFEE_IN_OP)

    def gen(t: pa.Table) -> pa.Table:
        rows = []
        for k in t["o_orderkey"].to_pylist():
            _, _, _, v = coffee_pool_of(k)
            pool = f"0:{v:064X}"
            src = addr_str("cbad", k % 4) if k % 23 == 0 else pool
            rows.append((md5_tag("ce", k), md5_tag("cp", k), op_ev, "out",
                         src, None, encode_coffee_event(k)))
            rows.append((md5_tag("cp", k), md5_tag("cx", k), op_in, "in",
                         addr_str("cu", k % 3000), pool,
                         encode_coffee_parent(k)))
        cols = list(zip(*rows)) if rows else [[] for _ in _COFFEE_MSG_SCHEMA]
        return pa.table({f.name: pa.array(list(c), f.type)
                         for f, c in zip(_COFFEE_MSG_SCHEMA, cols)},
                        schema=_COFFEE_MSG_SCHEMA)

    return ds.map_batches(gen, batch_format="pyarrow")


def coffee_state_dataset(sf_dir: str):
    return read_synth_dir(
        cached_synth_table(sf_dir, "coffeest", "orders", synth_coffee_states),
        _STATE_SCHEMA)


def coffee_message_dataset(sf_dir: str):
    return read_synth_dir(
        cached_synth_table(sf_dir, "coffeemsg", "orders", synth_coffee_messages),
        _COFFEE_MSG_SCHEMA)


_COFFEE_EV_SCHEMA = pa.schema([
    ("parent_hash", pa.string()),
    ("pool", pa.string()),
    ("query_id", pa.int64()),
    ("asset_in", pa.int64()),
    ("amount_in", pa.int64()),
    ("amount_out", pa.int64()),
])

_COFFEE_REQ_SCHEMA = pa.schema([
    ("parent_hash", pa.string()),
    ("min_out", pa.int64()),
    ("deadline", pa.int64()),
    ("recipient", pa.string()),
    ("referral", pa.string()),
])

_COFFEE_SCHEMA = pa.schema([
    ("query_id", pa.int64()),
    ("pool", pa.string()),
    ("amm", pa.int64()),
    ("swap_src_token", pa.string()),
    ("swap_dst_token", pa.string()),
    ("swap_src_amount", pa.int64()),
    ("swap_dst_amount", pa.int64()),
    ("reserve1", pa.int64()),
    ("reserve2", pa.int64()),
    ("lp_fee", pa.int64()),
    ("min_out", pa.int64()),
    ("deadline", pa.int64()),
    ("recipient", pa.string()),
    ("referral", pa.string()),
])


_COFFEE_INFO_COLS = ["pool", "a1", "a2", "amm", "reserve1", "reserve2", "lp_fee"]
_COFFEE_INFO_SCHEMA = pa.schema([("pool", pa.string())] + [
    (c, pa.int64()) for c in _COFFEE_INFO_COLS[1:]])


def _coffee_pool_info(t: pa.Table) -> pa.Table:
    """Winner state rows → validated pool-info rows: get_pool_data on
    each pool's rank-1 state, factory get_pool_address authenticity
    check (coffee_swap.py:20-23 prepare, 69-71 validation). Runs as
    map_batches over the DIM-SIZED winner dataset, so every pool's VM
    runs execute exactly ONCE globally — the previous per-enrich-actor
    memo re-ran them in every actor of the pool (~24 s aggregate CPU
    at sf0.1/32 cpus for 28 pools × 32 actors)."""
    factory = TvmEmulator(coffee_factory_code(), Builder().end_cell())
    rows = []
    for a, cb, db in zip(t["account"].to_pylist(), t["code_boc"].to_pylist(),
                         t["data_boc"].to_pylist()):
        try:
            emu = TvmEmulator(parse_boc(cb), parse_boc(db))
            ver, a1, a2, amm, active, r1, r2, fee = _run(emu, "get_pool_data")
            (s,) = _run(factory, "get_pool_address",
                        [_asset_slice(a1), _asset_slice(a2), amm,
                         Builder().end_cell()])
        except ValueError:
            continue  # failed emulation skips the pool, not the stage
        if fmt_addr(s.load_address()) != a:
            continue  # coffee_swap.py:69-71: not a factory pool
        rows.append((a, a1, a2, amm, r1, r2, fee))
    cols = list(zip(*rows)) if rows else [[] for _ in _COFFEE_INFO_COLS]
    return pa.table({n: pa.array(list(c), f.type) for (n, c), f in
                     zip(zip(_COFFEE_INFO_COLS, cols), _COFFEE_INFO_SCHEMA)},
                    schema=_COFFEE_INFO_SCHEMA)


def _coffee_enrich(t: pa.Table, info: pd.DataFrame) -> pa.Table:
    """Stateless vectorized enrich: pandas merge against the dim-sized
    validated pool-info frame + numpy side-pick masks — no per-row
    Python dispatch, no VM anywhere near the row stream (pools whose
    state is missing or failed factory validation drop via the inner
    merge, matching get_account_state_safe/validation semantics)."""
    if not t.num_rows or not len(info):
        return _COFFEE_SCHEMA.empty_table()
    df = t.to_pandas().merge(info, on="pool", how="inner")
    if not len(df):
        return _COFFEE_SCHEMA.empty_table()
    asset_in = df["asset_in"].to_numpy()
    a1 = df["a1"].to_numpy()
    a2 = df["a2"].to_numpy()
    is_a1 = asset_in == a1
    keep = is_a1 | (asset_in == a2)  # else: asset/pool mismatch
    df = df[keep]
    asset_out = np.where(is_a1[keep], a2[keep], a1[keep])
    fmt = np.frompyfunc(lambda j: f"0:{j:064X}", 1, 1)
    return pa.table(
        {
            "query_id": pa.array(df["query_id"].to_numpy(np.int64)),
            "pool": pa.array(df["pool"], pa.string(), from_pandas=True),
            "amm": pa.array(df["amm"].to_numpy(np.int64)),
            "swap_src_token": pa.array(fmt(asset_in[keep]), pa.string()),
            "swap_dst_token": pa.array(fmt(asset_out), pa.string()),
            "swap_src_amount": pa.array(df["amount_in"].to_numpy(np.int64)),
            "swap_dst_amount": pa.array(df["amount_out"].to_numpy(np.int64)),
            "reserve1": pa.array(df["reserve1"].to_numpy(np.int64)),
            "reserve2": pa.array(df["reserve2"].to_numpy(np.int64)),
            "lp_fee": pa.array(df["lp_fee"].to_numpy(np.int64)),
            "min_out": pa.array(df["min_out"].to_numpy(np.int64)),
            "deadline": pa.array(df["deadline"].to_numpy(np.int64)),
            "recipient": pa.array(df["recipient"], pa.string(), from_pandas=True),
            "referral": pa.array(df["referral"], pa.string(), from_pandas=True),
        },
        schema=_COFFEE_SCHEMA,
    )


def coffee_swaps(sf_dir: str, *, batch_size: int = 4096,
                 num_buckets: int = 32):
    """The P6-P8/P11 family end to end (coffee_swap.py): vectorized
    event claim + decode ∥ parent swap_internal decode → ONE hash join
    on the parent hash → pandas merge against the validated pool-info
    dim. The pool-state side reduces to rank-1 winners FIRST (dim-sized
    — 30 pools here, thousands on mainnet), then ``_coffee_pool_info``
    runs get_pool_data + factory validation ONCE per pool, distributed
    over the winner dataset, on a second driver thread overlapping the
    decode materialize; the row stream never touches the VM."""
    ensure_portable()
    from ..functions import opcode_signed
    from .relational import join_auto

    msgs = coffee_message_dataset(sf_dir)
    op_ev = pa.scalar(opcode_signed(_COFFEE_EV_OP), pa.int32())
    op_in = pa.scalar(opcode_signed(_COFFEE_IN_OP), pa.int32())

    def decode_events(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.equal(t["opcode"], op_ev),
                    pc.equal(t["direction"], pa.scalar("out"))),
            pc.is_null(t["destination"]),
        )
        t = t.filter(pc.fill_null(keep, False))
        rows = []
        for ph, src, body in zip(t["parent_hash"].to_pylist(),
                                 t["source"].to_pylist(),
                                 t["body_boc"].to_pylist()):
            s = parse_boc(body).begin_parse()
            s.load_uint(32)
            qid = s.load_uint(64)
            s.load_uint(4), s.load_uint(8)
            asset_in = s.load_uint(256)
            amount_in = s.load_coins()
            amount_out = s.load_coins()
            if amount_in == 0 or amount_out == 0:
                continue  # coffee_swap.py:61-63
            rows.append((ph, src, qid, asset_in, amount_in, amount_out))
        cols = list(zip(*rows)) if rows else [[] for _ in _COFFEE_EV_SCHEMA]
        return pa.table({f.name: pa.array(list(c), f.type)
                         for f, c in zip(_COFFEE_EV_SCHEMA, cols)},
                        schema=_COFFEE_EV_SCHEMA)

    def decode_parents(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["opcode"], op_in))
        rows = []
        for mh, body in zip(t["msg_hash"].to_pylist(),
                            t["body_boc"].to_pylist()):
            s = parse_boc(body).begin_parse()
            s.load_uint(32)
            s.load_uint(64)   # parent query_id
            s.load_coins()    # previous_amount
            if s.load_bit():  # optional asset variant
                tag = s.load_uint(2)
                if tag == 1:
                    s.load_uint(8), s.load_uint(256)
                elif tag == 2:
                    s.load_uint(32)
            min_out = s.load_coins()
            if s.load_bit():
                s.load_ref()  # next_body
            p = s.load_ref().begin_parse()
            deadline = p.load_uint(32)
            recipient = fmt_addr(p.load_address())
            referral = fmt_addr(p.load_address())
            rows.append((mh, min_out, deadline, recipient, referral))
        cols = list(zip(*rows)) if rows else [[] for _ in _COFFEE_REQ_SCHEMA]
        return pa.table({f.name: pa.array(list(c), f.type)
                         for f, c in zip(_COFFEE_REQ_SCHEMA, cols)},
                        schema=_COFFEE_REQ_SCHEMA)

    # ONE decode pass over the message table emitting both sides tagged
    # (side 0 = ext-out events, side 1 = in-router parents), materialized
    # once: the old two-branch plan read + claimed the 272k-row table
    # TWICE and join_auto's size probe serialized the whole parent pass
    # before the event pass could start (profiled r5: ~5 s of the 8.9 s
    # query was that second read + barrier). The decoded stream is
    # swap-dimensional (far narrower than the message table) and
    # object-store-spillable, so the materialize is bounded at scale.
    _union_fields = list(_COFFEE_EV_SCHEMA) + [
        f for f in _COFFEE_REQ_SCHEMA if f.name != "parent_hash"]
    _union_schema = pa.schema(_union_fields + [pa.field("side", pa.int8())])

    def _tagged(t: pa.Table, side: int) -> pa.Table:
        n = t.num_rows
        cols = {}
        for f in _union_schema:
            if f.name == "side":
                cols["side"] = pa.array(np.full(n, side, np.int8), pa.int8())
            elif f.name in t.column_names:
                cols[f.name] = t[f.name]
            else:
                cols[f.name] = pa.nulls(n, f.type)
        return pa.table(cols, schema=_union_schema)

    def decode_both(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [_tagged(decode_events(t), 0), _tagged(decode_parents(t), 1)])

    # the pool-winner reduction is an INDEPENDENT DAG branch (state
    # table, not the message table) — run it on a second driver thread
    # so its shuffle overlaps the decode materialize below instead of
    # serializing after it (each Dataset execution owns its streaming
    # executor; measured ~1.3 s saved at sf0.1/32 cpus)
    import threading

    win_box: dict = {}

    def _winners():
        try:
            cof_h, _ = _code_entry(coffee_pool_code())
            w = _rank1_with_code(coffee_state_dataset(sf_dir), [cof_h],
                                 num_buckets=num_buckets)
            info = w.map_batches(_coffee_pool_info, batch_format="pyarrow")
            win_box["t"] = pa.Table.from_pylist(
                info.take_all(), schema=_COFFEE_INFO_SCHEMA).to_pandas()
        except BaseException as e:  # surface on the caller thread
            win_box["err"] = e

    win_thread = threading.Thread(target=_winners, name="coffee-winners")
    win_thread.start()

    decoded = msgs.map_batches(decode_both, batch_format="pyarrow",
                               batch_size=batch_size).materialize()
    ev_names = _COFFEE_EV_SCHEMA.names
    req_names = _COFFEE_REQ_SCHEMA.names
    events = decoded.map_batches(
        lambda t: t.filter(pc.equal(t["side"], pa.scalar(0, pa.int8())))
                   .select(ev_names),
        batch_format="pyarrow")
    parents = decoded.map_batches(
        lambda t: t.filter(pc.equal(t["side"], pa.scalar(1, pa.int8())))
                   .select(req_names),
        batch_format="pyarrow")
    joined = join_auto(events, parents, on="parent_hash")

    # dim-sized validated pool-info frame (30 pools here, thousands on
    # mainnet): one driver pull, captured by the stateless enrich task
    # closure (switch to ray.put + per-worker cache when the pool dim
    # outgrows closure pickling)
    win_thread.join()
    if "err" in win_box:
        raise win_box["err"]
    info_df = win_box["t"]

    return joined.map_batches(
        lambda t, _info=info_df: _coffee_enrich(t, _info),
        batch_format="pyarrow", batch_size=batch_size)


def dedust_swaps_verified(sf_dir: str, *, batch_size: int = 4096):
    """The FULL P1 pipeline: vectorized ext-out claim, decode-after-
    claim, then per-pool factory get_pool_address validation in the
    emulator — claim column work stays Arrow; only claimed rows reach
    the VM, and only DISTINCT pools reach it more than once (memo)."""
    ensure_portable()
    from ..functions import opcode_signed

    op_swap = pa.scalar(
        opcode_signed(OP_DEDUST_SWAP), pa.int32())

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
