"""Account-state parser family: the reference's latest_account_states
decode shape (SURVEY.md §2.3 P21-P29) re-expressed as Ray Data stages.

The reference's CorePrices* and TVLPoolStateParser (P21-P24,
parsers/accounts/core_prices.py:14-72, tvl.py:22-233) consume account
STATE rows — (account, lt, data cell) — with a predicate on the
account address / code hash, decode pool reserves out of the state
data cell, and derive a price / TVL from the latest state per pool.
(The per-platform TVM-emulator get-method calls some of those parsers
use are a virtual machine, not a data transform — out of scope by the
standing SURVEY §2.3 ruling; the data-cell decode path here is the
real parser shape.)

Cluster shape (contrast with the reference's row-at-a-time consumer):

1. vectorized predicate on the code-hash column (the whitelist check,
   staking_pools.py:16-27 / tvl.py:35-38),
2. LWW rank-1 per account on lt — the engine's core reduce (A2), run
   as a map-side partial argmax (≤ one row per account per block
   leaves the map stage) + ONE coarse-bucket shuffle with the per-key
   argmax vectorized inside each bucket,
3. decode reserves from the WINNER bodies only (decode-after-reduce:
   the reference parses every state it polls; at 100 TB decoding only
   rank-1 survivors is the scalable order),
4. price from integer reserve arithmetic — ``price_nano =
   reserve1 * 10^9 // reserve0`` (core_prices.py derives
   price-from-reserves the same way; integer nano-units keep the
   DuckDB oracle bit-exact, no floats).

The state table is DETERMINISTIC, derived from orders: per order key
``k``, pool index ``a = k % 4096``, one state row
(account=addr(pool,a), lt=k, code_hash=md5('amm-code-v1')) whose data
cell carries reserve0=k*1000+17, reserve1=k*377+29 — except every 17th
row carries code_hash md5('wallet-code') (NOT whitelisted, dropped by
the predicate like non-pool accounts in tvl.py:35-38). A DuckDB oracle
recomputes rank-1 per pool with a window function and the reserves /
price arithmetically.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .._pickle import ensure_portable
from ..boc import (
    Builder,
    build_hashmap_uint,
    decode_tep64,
    encode_tep64_onchain,
    parse_boc,
    parse_hashmap_uint,
    serialize_boc,
)
from ._util import addr_str as _addr_str_u, cached_synth_table, fmt_addr, hex2 as _hex2_u, read_synth_dir, read_table

N_POOLS = 4096
POOL_MAGIC = 0x504F4F4C  # "POOL"
AMM_CODE_HASH = hashlib.md5(b"amm-code-v1").hexdigest()
_TVL_WINDOW = 65536  # lt-range bucket for the TVL history series

_STATE_SCHEMA = pa.schema(
    [
        ("account", pa.string()),
        ("lt", pa.int64()),
        ("code_hash", pa.string()),
        ("data_boc", pa.binary()),
    ]
)


# shared synthetic-address helpers (ops/_util.py)
_hex2 = _hex2_u
_addr_str = _addr_str_u


def encode_pool_state(k: int) -> bytes:
    """Pool state data cell: magic, reserve0, reserve1, admin address
    (exercising coins + address loads like the reference's reserve
    slices in tvl.py:46-217)."""
    b = Builder().store_uint(POOL_MAGIC, 32)
    b.store_coins(k * 1000 + 17)
    b.store_coins(k * 377 + 29)
    b.store_address((0, bytes.fromhex(_hex2("admin", k % N_POOLS))))
    return serialize_boc(b.end_cell())


def synth_state_feed(
    sf_dir: str,
    *,
    source: str,
    key_col: str,
    tag: str,
    n_pools: int,
    code_hash: str,
    other_code: bytes,
    skip_mod: int,
    encode,
):
    """Shared SF-scaled synthetic latest_account_states generator
    behind every account-state parser family: per source key ``k`` one
    state row (account=addr(tag, k % n_pools), lt=k,
    data_boc=encode(k)), with every ``skip_mod``-th row carrying the
    NON-whitelisted md5(other_code) hash the predicate must drop.
    Runs as a distributed ``map_batches`` stage over the source table."""
    ensure_portable()
    ds = read_table(sf_dir, source, columns=[key_col])
    other_hash = hashlib.md5(other_code).hexdigest()

    def gen(t: pa.Table) -> pa.Table:
        ks = t[key_col].to_numpy(zero_copy_only=False)
        accounts, hashes, bodies = [], [], []
        for k in ks.tolist():
            accounts.append(_addr_str(tag, k % n_pools))
            hashes.append(other_hash if k % skip_mod == 0 else code_hash)
            bodies.append(encode(k))
        return pa.table(
            {
                "account": pa.array(accounts, pa.string()),
                "lt": pa.array(ks, pa.int64()),
                "code_hash": pa.array(hashes, pa.string()),
                "data_boc": pa.array(bodies, pa.binary()),
            },
            schema=_STATE_SCHEMA,
        )

    return ds.map_batches(gen, batch_format="pyarrow")


def synth_account_states(sf_dir: str):
    """SF-scaled synthetic latest_account_states feed (module doc)."""
    return synth_state_feed(
        sf_dir, source="orders", key_col="o_orderkey", tag="pool",
        n_pools=N_POOLS, code_hash=AMM_CODE_HASH, other_code=b"wallet-code",
        skip_mod=17, encode=encode_pool_state,
    )


def ensure_state_table(sf_dir: str) -> str:
    """Cached parquet copy (content-fingerprinted on orders.parquet):
    price queries time the PARSER + reduce, not the body encoding."""
    return cached_synth_table(sf_dir, "states", "orders", synth_account_states)


def state_dataset(sf_dir: str):
    return read_synth_dir(ensure_state_table(sf_dir), _STATE_SCHEMA)


def _rank1_states(ds, code_hash: str, key_cols: list[str], *, num_buckets: int):
    """Shared rank-1-by-lt reduce over code-hash-whitelisted states,
    keyed on ``key_cols`` (account, or account+window): map-side
    partial argmax per block, then ONE coarse-bucket shuffle on the
    first key with the final argmax vectorized inside each bucket (the
    engine's A2 reduce in the proven _bucketed shape — never one
    Python call per key). The single implementation behind every
    account-state parser family (P21-P26)."""
    from .relational import _bucketed

    whitelist = pa.scalar(code_hash)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["code_hash"], whitelist))
        df = t.select(key_cols + ["lt", "data_boc"]).to_pandas()
        df = df.sort_values(key_cols + ["lt"], kind="mergesort")
        return pa.Table.from_pandas(
            df.drop_duplicates(key_cols, keep="last"), preserve_index=False
        ).replace_schema_metadata(None)

    out_schema = pa.schema(
        [(c, pa.string() if c == "account" else pa.int64()) for c in key_cols]
        + [("lt", pa.int64()), ("data_boc", pa.binary())]
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_cols + ["lt"], kind="mergesort")
        return g.drop_duplicates(key_cols, keep="last")[
            key_cols + ["lt", "data_boc"]
        ]

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _bucketed(partials, "account", per_bucket, out_schema,
                     num_buckets=num_buckets)


def _latest_states(sf_dir: str, key_cols: list[str], *, num_buckets: int):
    """AMM-pool rank-1 (P21-P24): the shared reduce over the
    orders-derived state table, optionally windowed on lt."""
    ds = state_dataset(sf_dir)
    if "window_id" in key_cols:
        def add_window(t: pa.Table) -> pa.Table:
            w = t["lt"].to_numpy(zero_copy_only=False) // _TVL_WINDOW
            return t.append_column("window_id", pa.array(w, pa.int64()))

        ds = ds.map_batches(add_window, batch_format="pyarrow")
    return _rank1_states(ds, AMM_CODE_HASH, key_cols, num_buckets=num_buckets)


def _nano_price(r0: "pa.ChunkedArray | pa.Array", r1) -> pa.Array:
    """reserve1/reserve0 in nano units — the ONE price formula behind
    core_prices and price_history (and the DuckDB oracles pinned to
    it). Python-int arithmetic: r1 * 1e9 overflows int64 at large sf."""
    return pa.array(
        [b * 10**9 // a for a, b in zip(r0.to_pylist(), r1.to_pylist())],
        pa.int64(),
    )


def _decode_reserves(t: pa.Table, extra_cols: list[str]) -> pa.Table:
    """Winner-body reserve decode (per-row BOC parse is inherent for
    opaque binary payloads; runs over rank-1 survivors only)."""
    accounts = t["account"].to_pylist()
    lts = t["lt"].to_pylist()
    r0s, r1s = [], []
    for body in t["data_boc"].to_pylist():
        s = parse_boc(body).begin_parse()
        if s.load_uint(32) != POOL_MAGIC:
            raise ValueError("not a pool state cell")
        r0s.append(s.load_coins())
        r1s.append(s.load_coins())
    cols = {"account": pa.array(accounts, pa.string())}
    for c in extra_cols:
        cols[c] = t[c]
    cols["lt"] = pa.array(lts, pa.int64())
    cols["reserve0"] = pa.array(r0s, pa.int64())
    cols["reserve1"] = pa.array(r1s, pa.int64())
    return pa.table(cols)


def core_prices(sf_dir: str, *, num_buckets: int = 64):
    """Latest price per pool (P21-P23 CorePrices shape): whitelist →
    LWW rank-1 per account → decode winner reserves → integer
    nano-price. Output: account, lt, reserve0, reserve1, price_nano."""
    ensure_portable()

    def finish(t: pa.Table) -> pa.Table:
        t = _decode_reserves(t, [])
        return t.append_column(
            "price_nano", _nano_price(t["reserve0"], t["reserve1"]))

    return _latest_states(sf_dir, ["account"], num_buckets=num_buckets).map_batches(
        finish, batch_format="pyarrow"
    )


def price_history(sf_dir: str, *, accounts: list[str] | None = None):
    """Full price OBSERVATION series per pool account — every
    whitelisted state decoded, NOT just the rank-1 winner (the rows the
    reference stores into its ``prices`` table over time,
    parsers/accounts/core_prices.py → db.insert_core_price; the as-of
    consumer is ``get_core_price``, parser/db.py:392-405). Output:
    account, lt, price_nano.

    ``accounts``: optional small account subset (the handful of core
    price pools — USDT/TON-class assets). Pruned map-side right after
    the read via a compiled ``pc.is_in`` set, so only the tracked
    pools' states ever leave the scan — at 100 TB the state feed is
    huge but the surviving series is tiny per asset."""
    ensure_portable()
    ds = state_dataset(sf_dir)
    whitelist = pa.scalar(AMM_CODE_HASH)
    acct_set = pa.array(sorted(accounts), pa.string()) if accounts is not None else None

    def decode(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["code_hash"], whitelist))
        if acct_set is not None:
            t = t.filter(pc.is_in(t["account"], acct_set))
        t = _decode_reserves(t.select(["account", "lt", "data_boc"]), [])
        # Python-int arithmetic: r1 * 1e9 overflows int64 at large sf
        return pa.table(
            {
                "account": t["account"],
                "lt": t["lt"],
                "price_nano": _nano_price(t["reserve0"], t["reserve1"]),
            }
        )

    return ds.map_batches(decode, batch_format="pyarrow")


def pool_tvl_history(sf_dir: str, *, num_buckets: int = 64):
    """TVL history series (P24 TVLPoolStateParser shape: current state
    + history rows, tvl.py:222-233): rank-1 per (account, lt-window)
    keeps the last state of each pool in each window; TVL is the
    decoded reserve sum. Output: account, window_id, lt, reserve0,
    reserve1, tvl_nano."""
    ensure_portable()

    def finish(t: pa.Table) -> pa.Table:
        t = _decode_reserves(t, ["window_id"])
        tvl = pc.add(t["reserve0"], t["reserve1"])
        return t.append_column("tvl_nano", tvl.cast(pa.int64()))

    return _latest_states(
        sf_dir, ["account", "window_id"], num_buckets=num_buckets
    ).map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# P25 StakingPoolsParser shape: account-state 1→many flat-map.
# The reference iterates a lisp-list/hashmap of nominators inside the
# pool's state cell and emits ONE ROW PER NOMINATOR
# (parsers/accounts/staking_pools.py:22-67 — "one state → many rows").
# Cluster shape: whitelist → rank-1 LWW per pool (only the LATEST state
# fans out, like the reference's latest_account_states feed) → parse the
# winner's Hashmap(32, nominator) → flat-map to typed rows.
# ---------------------------------------------------------------------------

N_STAKE_POOLS = 512
STAKE_MAGIC = 0x5354414B  # "STAK"
STAKING_CODE_HASH = hashlib.md5(b"staking-pool-code-v1").hexdigest()


def encode_stake_state(k: int) -> bytes:
    """Staking-pool state cell: magic + ^Hashmap(32, nominator) where
    nominator value = address + stake coins. ``k % 5 + 1`` nominators;
    nominator i = addr(nom, (k*7+i) % 100000), stake = k*31 + i*13 —
    all arithmetic, so DuckDB recomputes the fan-out with
    unnest(range(...))."""
    items = {}
    for i in range(k % 5 + 1):
        v = Builder()
        v.store_address((0, bytes.fromhex(_hex2("nom", (k * 7 + i) % 100000))))
        v.store_coins(k * 31 + i * 13)
        items[i] = v.end_cell()
    b = Builder().store_uint(STAKE_MAGIC, 32)
    b.store_ref(build_hashmap_uint(items, 32))
    return serialize_boc(b.end_cell())


def synth_stake_states(sf_dir: str):
    """SF-scaled synthetic staking-pool state feed derived from
    customer: per c_custkey ``k``, pool = addr(stake, k % 512), lt = k;
    every 23rd row carries a non-whitelisted code hash and must be
    dropped by the predicate (staking_pools.py:16-27)."""
    return synth_state_feed(
        sf_dir, source="customer", key_col="c_custkey", tag="stake",
        n_pools=N_STAKE_POOLS, code_hash=STAKING_CODE_HASH,
        other_code=b"other-code", skip_mod=23, encode=encode_stake_state,
    )


def ensure_stake_table(sf_dir: str) -> str:
    return cached_synth_table(sf_dir, "stakes", "customer", synth_stake_states)


def stake_dataset(sf_dir: str):
    return read_synth_dir(ensure_stake_table(sf_dir), _STATE_SCHEMA)


_NOM_SCHEMA = pa.schema(
    [
        ("account", pa.string()),
        ("lt", pa.int64()),
        ("nominator_idx", pa.int64()),
        ("nominator", pa.string()),
        ("stake", pa.int64()),
    ]
)


def staking_nominators(sf_dir: str, *, num_buckets: int = 64):
    """Latest nominator set per staking pool (P25): code-hash whitelist
    → rank-1 LWW per account on lt (map-side partial + ONE coarse-bucket
    shuffle, the engine's A2 reduce) → parse the WINNER state's
    nominator hashmap → one row per nominator (the 1→many flat-map over
    account states). Output: account, lt, nominator_idx, nominator,
    stake."""
    ensure_portable()
    winners = _rank1_states(
        stake_dataset(sf_dir), STAKING_CODE_HASH, ["account"],
        num_buckets=num_buckets,
    )

    def fan_out(t: pa.Table) -> pa.Table:
        accounts = t["account"].to_pylist()
        lts = t["lt"].to_pylist()
        oa, ol, oi, on, ost = [], [], [], [], []
        for acc, lt, body in zip(accounts, lts, t["data_boc"].to_pylist()):
            s = parse_boc(body).begin_parse()
            if s.load_uint(32) != STAKE_MAGIC:
                raise ValueError("not a staking-pool state cell")
            for idx, cell in sorted(parse_hashmap_uint(s.load_ref(), 32).items()):
                v = cell.begin_parse()
                nom = fmt_addr(v.load_address())
                if nom is None:
                    raise ValueError("addr_none nominator in staking state")
                oa.append(acc)
                ol.append(lt)
                oi.append(idx)
                on.append(nom)
                ost.append(v.load_coins())
        return pa.table(
            {
                "account": pa.array(oa, pa.string()),
                "lt": pa.array(ol, pa.int64()),
                "nominator_idx": pa.array(oi, pa.int64()),
                "nominator": pa.array(on, pa.string()),
                "stake": pa.array(ost, pa.int64()),
            },
            schema=_NOM_SCHEMA,
        )

    return winners.map_batches(fan_out, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# P26 NFTItemsParser shape: account-state decode with TEP-64 metadata.
# The reference filters states by code hash (with a LEARNED blacklist,
# nfts_parser.py:40-43, 140-143), decodes owner + TEP-64 content out of
# the state data cell (:45-100), and LWW-upserts into nft_items (K2).
# Cluster shape: blacklist predicate → rank-1 LWW per item on lt →
# decode owner + TEP-64 attrs from WINNER states only.
# ---------------------------------------------------------------------------

N_NFT_ITEMS = 2048
NFT_MAGIC = 0x4E465449  # "NFTI"
NFT_CODE_HASH = hashlib.md5(b"nft-item-code-v1").hexdigest()


def encode_nft_state(k: int, name: str, description: str) -> bytes:
    """NFT item state cell: magic + owner address + ^TEP-64 on-chain
    content (name/description) — the decode surface of
    nfts_parser.py:45-100; every 7th item uses the CHUNKED value form."""
    b = Builder().store_uint(NFT_MAGIC, 32)
    b.store_address((0, bytes.fromhex(_hex2("own", k))))
    b.store_ref(
        encode_tep64_onchain(
            {"name": name, "description": description},
            chunk=8 if k % 7 == 0 else None,
        )
    )
    return serialize_boc(b.end_cell())


def synth_nft_states(sf_dir: str):
    """SF-scaled synthetic nft-item state feed derived from part: per
    p_partkey ``k``, item account = addr(nft, k % 2048), lt = k,
    metadata = (p_name, p_brand); every 19th row carries a BLACKLISTED
    code hash (the learned code_hash_blacklist idiom,
    nfts_parser.py:140-143) and must be dropped."""
    ensure_portable()
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand"])
    scam_hash = hashlib.md5(b"scam-code").hexdigest()

    def gen(t: pa.Table) -> pa.Table:
        ks = t["p_partkey"].to_pylist()
        names = t["p_name"].to_pylist()
        brands = t["p_brand"].to_pylist()
        accounts, hashes, bodies = [], [], []
        for k, nm, br in zip(ks, names, brands):
            accounts.append(_addr_str("nft", k % N_NFT_ITEMS))
            hashes.append(scam_hash if k % 19 == 0 else NFT_CODE_HASH)
            bodies.append(encode_nft_state(k, nm, br))
        return pa.table(
            {
                "account": pa.array(accounts, pa.string()),
                "lt": pa.array(ks, pa.int64()),
                "code_hash": pa.array(hashes, pa.string()),
                "data_boc": pa.array(bodies, pa.binary()),
            },
            schema=_STATE_SCHEMA,
        )

    return ds.map_batches(gen, batch_format="pyarrow")


def ensure_nft_state_table(sf_dir: str) -> str:
    return cached_synth_table(sf_dir, "nftstates", "part", synth_nft_states)


_NFT_SCHEMA = pa.schema(
    [
        ("account", pa.string()),
        ("lt", pa.int64()),
        ("owner", pa.string()),
        ("name", pa.string()),
        ("description", pa.string()),
    ]
)


def nft_item_states(sf_dir: str, *, num_buckets: int = 64):
    """Latest NFT item rows (P26): code-hash blacklist → rank-1 LWW per
    item on lt → decode owner + TEP-64 name/description from WINNER
    states only (decode-after-reduce). Output: account, lt, owner,
    name, description."""
    ensure_portable()
    winners = _rank1_states(
        read_synth_dir(ensure_nft_state_table(sf_dir), _STATE_SCHEMA),
        NFT_CODE_HASH, ["account"], num_buckets=num_buckets,
    )

    def decode(t: pa.Table) -> pa.Table:
        owners, names, descs = [], [], []
        for body in t["data_boc"].to_pylist():
            s = parse_boc(body).begin_parse()
            if s.load_uint(32) != NFT_MAGIC:
                raise ValueError("not an nft item state cell")
            owners.append(fmt_addr(s.load_address()))
            attrs = decode_tep64(s.load_ref(), keys=("name", "description"))
            names.append(attrs.get("name"))
            descs.append(attrs.get("description"))
        return pa.table(
            {
                "account": t["account"],
                "lt": t["lt"],
                "owner": pa.array(owners, pa.string()),
                "name": pa.array(names, pa.string()),
                "description": pa.array(descs, pa.string()),
            },
            schema=_NFT_SCHEMA,
        )

    return winners.map_batches(decode, batch_format="pyarrow")
