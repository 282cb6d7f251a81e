"""Jetton-wallet recover parser (SURVEY.md §2.3 P28): code-hash
whitelist predicate over account states, decode the wallet storage,
then verify AUTHENTICITY by recomputing the account address the
(code, data) StateInit deploys to and comparing it with the account's
actual address.

Reference: parsers/accounts/jetton_wallets_recover.py:15-60 — the
wallet-authenticity check asks the master contract for
``get_wallet_address(owner)`` through the TVM emulator and compares.
Mathematically that call returns ``hash(StateInit(wallet_code,
wallet_data(owner, master)))`` — pure public-spec arithmetic
(``boc.cell_hash`` / ``state_init_address``), so the same semantics run
here with no VM: a forged row (state copied under a different account
address) fails the recomputation exactly as it fails the reference's
get-method comparison.

Synthetic account-state table, derived from customer. Per key ``k``:

- wallet storage: balance ``k*11+1``, owner addr('own', k),
  master addr('jm', k % 8).
- code: the whitelisted WALLET_CODE cell, except ``k % 7 == 0`` rows
  carry OTHER_CODE — the predicate must drop those (never decoded).
- address: the REAL ``state_init_address(code, data)`` when
  ``k % 5 != 0``; a forged addr('forged', k) otherwise — so
  ``authentic`` is exactly ``k % 5 != 0``, which the DuckDB oracle
  recomputes while the engine derives it from actual sha256 cell
  hashing. A value-hash match proves the whole codec → StateInit →
  address pipeline classifies every row correctly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .._pickle import ensure_portable
from ..boc import Builder, Cell, parse_boc, serialize_boc, state_init_address
from ._util import addr_bytes, addr_str, cached_synth_table, read_synth_dir, read_table


def wallet_code() -> Cell:
    return Builder().store_uint(0x57414C4C, 32).end_cell()  # "WALL"


def other_code() -> Cell:
    return Builder().store_uint(0x0BAD, 32).end_cell()


def encode_wallet_data(k: int) -> Cell:
    """TEP-74 jetton-wallet storage: balance:Coins owner:MsgAddress
    master:MsgAddress."""
    b = Builder().store_coins(k * 11 + 1)
    b.store_address((0, addr_bytes("own", k)))
    b.store_address((0, addr_bytes("jm", k % 8)))
    return b.end_cell()


_STATE_SCHEMA = pa.schema(
    [
        ("account_id", pa.int64()),
        ("address", pa.string()),
        ("code_boc", pa.binary()),
        ("data_boc", pa.binary()),
        ("lt", pa.int64()),
    ]
)


def synth_wallet_states(sf_dir: str):
    ensure_portable()
    ds = read_table(sf_dir, "customer", columns=["c_custkey"])

    def gen(t: pa.Table) -> pa.Table:
        ids, addrs, codes, datas, lts = [], [], [], [], []
        wc, oc = wallet_code(), other_code()
        for k in t["c_custkey"].to_pylist():
            code = oc if k % 7 == 0 else wc
            data = encode_wallet_data(k)
            ids.append(k)
            addrs.append(
                state_init_address(code, data)
                if k % 5
                else addr_str("forged", k)
            )
            codes.append(serialize_boc(code))
            datas.append(serialize_boc(data))
            lts.append(k * 3)
        return pa.table(
            {
                "account_id": pa.array(ids, pa.int64()),
                "address": pa.array(addrs, pa.string()),
                "code_boc": pa.array(codes, pa.binary()),
                "data_boc": pa.array(datas, pa.binary()),
                "lt": pa.array(lts, pa.int64()),
            },
            schema=_STATE_SCHEMA,
        )

    return ds.map_batches(gen, batch_format="pyarrow")


def ensure_state_table(sf_dir: str) -> str:
    return cached_synth_table(sf_dir, "wallets", "customer", synth_wallet_states)


def state_dataset(sf_dir: str):
    return read_synth_dir(ensure_state_table(sf_dir), _STATE_SCHEMA)


_OUT_SCHEMA = pa.schema(
    [
        ("account_id", pa.int64()),
        ("balance", pa.int64()),
        ("owner", pa.string()),
        ("master", pa.string()),
        ("authentic", pa.bool_()),
    ]
)


def wallets_recover(sf_dir: str):
    """P28 pipeline (module doc): vectorized code whitelist (byte
    equality on the canonical BOC ≡ code-hash membership — the
    serialization is deterministic) → per-claimed-row storage decode
    (inherent for opaque binary) → StateInit address recomputation →
    authenticity flag. Zero shuffles; plain task stage over the warm
    worker pool."""
    ensure_portable()
    from ._util import fmt_addr

    whitelist = pa.array([serialize_boc(wallet_code())], pa.binary())
    wc = wallet_code()

    def recover(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["code_boc"], whitelist))
        ids = t["account_id"].to_pylist()
        addrs = t["address"].to_pylist()
        bals, owners, masters, auth = [], [], [], []
        for addr, body in zip(addrs, t["data_boc"].to_pylist()):
            data = parse_boc(body)
            s = data.begin_parse()
            bals.append(s.load_coins())
            owners.append(fmt_addr(s.load_address()))
            masters.append(fmt_addr(s.load_address()))
            auth.append(state_init_address(wc, data) == addr)
        return pa.table(
            {
                "account_id": pa.array(ids, pa.int64()),
                "balance": pa.array(bals, pa.int64()),
                "owner": pa.array(owners, pa.string()),
                "master": pa.array(masters, pa.string()),
                "authentic": pa.array(auth, pa.bool_()),
            },
            schema=_OUT_SCHEMA,
        )

    return state_dataset(sf_dir).map_batches(recover, batch_format="pyarrow")
