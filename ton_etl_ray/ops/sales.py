"""P29 NFTSalesParser shape (reference parsers/accounts/nft_sales.py:16-78):
the getgems-v4 fixprice sale-contract decoder over latest account states.

The reference filters states by a sale-contract code-hash whitelist
(nft_sales.py:20-21), calls the contract's ``get_fix_price_data_v4``
get-method, and serializes an ExtraNFTSale row: completion flag,
marketplace / nft / owner addresses, price, fee and royalty addresses
plus DERIVED integer fee amounts (``full_price * fee_percent /
100000``, nft_sales.py:65-68), and — the distinguishing branch — a
JETTON-PRICE FALLBACK: when ``full_price`` is zero and the state
carries a jetton-price dict, the FIRST value of that Hashmap(256)
supplies the price and the asset address (nft_sales.py:44-48);
otherwise the asset is the literal 'TON'.

Cluster shape (same decode-after-reduce order as the rest of the
account-state family, ops/prices.py):

1. vectorized code-hash whitelist,
2. rank-1 LWW per sale contract on lt (map-side partial argmax + ONE
   coarse-bucket shuffle — the engine's A2 reduce via
   ``prices._rank1_states``),
3. decode the WINNER state cells only: fixed fields, then the
   maybe-ref jetton-price hashmap branch,
4. integer fee arithmetic (no floats — keeps the DuckDB oracle
   bit-exact).

The state table is DETERMINISTIC, derived from supplier: per
``s_suppkey k``, contract = addr(sale, k % 1024), lt = k; every 13th
row carries a non-whitelisted code hash (dropped, like non-getgems
contracts); every 5th surviving row has full_price=0 plus the
jetton-price dict (exercising the fallback), the rest a plain TON
price. A DuckDB oracle recomputes rank-1 with a window function and
every field arithmetically (see __ray_entry__.oracle_sql()['nft_sales']).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from .._pickle import ensure_portable
from ..boc import Builder, build_hashmap_uint, parse_boc, parse_hashmap_uint, serialize_boc
from ._util import addr_bytes, cached_synth_table, fmt_addr, read_synth_dir
from .prices import _STATE_SCHEMA, _rank1_states, synth_state_feed

N_SALES = 1024
SALE_MAGIC = 0x53414C45  # "SALE"
SALES_CODE_HASH = hashlib.md5(b"getgems-sale-v4").hexdigest()

N_AUCTIONS = 512
AUCTION_MAGIC = 0x41554354  # "AUCT"
AUCTION_CODE_HASH = hashlib.md5(b"getgems-auction-v1").hexdigest()


def encode_sale_state(k: int) -> bytes:
    """Fixprice-v4 sale data cell in ``get_fix_price_data_v4`` field
    order (nft_sales.py:27-42): flags, created_at, marketplace / nft /
    owner addresses, full_price coins, fee + royalty address/percent
    pairs, then the maybe-ref jetton-price Hashmap(256) the fallback
    branch reads."""
    jetton_priced = k % 5 == 0
    b = Builder().store_uint(SALE_MAGIC, 32)
    b.store_bit(k % 2)  # is_complete
    b.store_uint((k * 1009) % 2**31, 32)  # created_at
    b.store_address((0, addr_bytes("mkt", k % 16)))
    b.store_address((0, addr_bytes("snft", k % 2048)))
    b.store_address((0, addr_bytes("sown", k % 1000)))
    b.store_coins(0 if jetton_priced else k * 113 + 5)
    # fee/royalty pair lives in its own ref (a root cell caps at 1023
    # bits — five 267-bit addresses cannot share one cell)
    fees = Builder()
    fees.store_address((0, addr_bytes("fee", k % 8)))
    fees.store_uint(k % 2500, 24)  # fee_percent (1e5 = 100%)
    fees.store_address((0, addr_bytes("roy", k % 8)))
    fees.store_uint(k % 1500, 24)  # royalty_percent
    b.store_ref(fees.end_cell())
    if jetton_priced:
        jet = addr_bytes("jet", k % 64)
        v = Builder()
        v.store_coins(k * 991 + 7)
        v.store_address((0, jet))
        b.store_bit(1)
        b.store_ref(build_hashmap_uint({int.from_bytes(jet, "big"): v.end_cell()}, 256))
    else:
        b.store_bit(0)
    return serialize_boc(b.end_cell())


def synth_sale_states(sf_dir: str):
    """SF-scaled synthetic sale-contract state feed (module doc),
    generated over supplier via the family's shared generator."""
    return synth_state_feed(
        sf_dir, source="supplier", key_col="s_suppkey", tag="sale",
        n_pools=N_SALES, code_hash=SALES_CODE_HASH,
        other_code=b"other-sale-code", skip_mod=13, encode=encode_sale_state,
    )


def ensure_sale_table(sf_dir: str) -> str:
    return cached_synth_table(sf_dir, "salestates", "supplier", synth_sale_states)


_SALE_SCHEMA = pa.schema(
    [
        ("account", pa.string()),
        ("lt", pa.int64()),
        ("is_complete", pa.int64()),
        ("created_at", pa.int64()),
        ("marketplace", pa.string()),
        ("nft", pa.string()),
        ("owner", pa.string()),
        ("full_price", pa.int64()),
        ("asset", pa.string()),
        ("marketplace_fee_address", pa.string()),
        ("marketplace_fee", pa.int64()),
        ("royalty_address", pa.string()),
        ("royalty_amount", pa.int64()),
    ]
)


def encode_auction_state(k: int) -> bytes:
    """Auction-contract data cell: end flag, end_at, marketplace / nft /
    owner addresses, then last_bid + min_bid coins (every 4th auction
    has no bids yet — last_bid 0, so the union normalizer must fall
    back to min_bid, the auction twin of the fixprice jetton branch)."""
    b = Builder().store_uint(AUCTION_MAGIC, 32)
    b.store_bit(1 if k % 3 == 0 else 0)  # is_end
    b.store_uint((k * 577) % 2**31, 32)  # end_at
    b.store_address((0, addr_bytes("mkt", k % 16)))
    b.store_address((0, addr_bytes("snft", (k * 3) % 2048)))
    b.store_address((0, addr_bytes("sown", (k * 7) % 1000)))
    b.store_coins(0 if k % 4 == 0 else k * 209 + 11)  # last_bid
    b.store_coins(k * 57 + 3)  # min_bid
    return serialize_boc(b.end_cell())


def synth_auction_states(sf_dir: str):
    """SF-scaled synthetic auction-contract state feed, also derived
    from supplier: contract = addr(auc, k % 512), lt = k; every 11th
    row carries a non-whitelisted code hash (dropped)."""
    return synth_state_feed(
        sf_dir, source="supplier", key_col="s_suppkey", tag="auc",
        n_pools=N_AUCTIONS, code_hash=AUCTION_CODE_HASH,
        other_code=b"other-auction-code", skip_mod=11,
        encode=encode_auction_state,
    )


def ensure_auction_table(sf_dir: str) -> str:
    return cached_synth_table(sf_dir, "aucstates", "supplier", synth_auction_states)


def nft_sales(sf_dir: str, *, num_buckets: int = 64):
    """Latest sale row per contract (P29): whitelist → rank-1 LWW per
    account on lt → decode WINNER fixprice cells, taking the first
    jetton-price hashmap value when full_price is zero
    (nft_sales.py:44-48) → integer fee/royalty amounts
    (nft_sales.py:65-68). ``is_complete`` is emitted as int64 0/1 so
    the DuckDB oracle hash stays type-stable."""
    ensure_portable()

    winners = _rank1_states(
        read_synth_dir(ensure_sale_table(sf_dir), _STATE_SCHEMA),
        SALES_CODE_HASH,
        ["account"],
        num_buckets=num_buckets,
    )

    def decode(t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            c: [] for c in _SALE_SCHEMA.names if c not in ("account", "lt")
        }
        for body in t["data_boc"].to_pylist():
            s = parse_boc(body).begin_parse()
            if s.load_uint(32) != SALE_MAGIC:
                raise ValueError("not a fixprice sale state cell")
            cols["is_complete"].append(s.load_bit())
            cols["created_at"].append(s.load_uint(32))
            cols["marketplace"].append(fmt_addr(s.load_address()))
            cols["nft"].append(fmt_addr(s.load_address()))
            cols["owner"].append(fmt_addr(s.load_address()))
            full_price = s.load_coins()
            fees = s.load_ref().begin_parse()
            cols["marketplace_fee_address"].append(fmt_addr(fees.load_address()))
            fee_percent = fees.load_uint(24)
            cols["royalty_address"].append(fmt_addr(fees.load_address()))
            royalty_percent = fees.load_uint(24)
            asset = "TON"
            if s.load_bit():  # maybe-ref jetton price dict
                items = parse_hashmap_uint(s.load_ref(), 256)
                if not full_price and items:
                    v = items[min(items)].begin_parse()
                    full_price = v.load_coins()
                    asset = fmt_addr(v.load_address())
            cols["full_price"].append(full_price)
            cols["asset"].append(asset)
            cols["marketplace_fee"].append(full_price * fee_percent // 100000)
            cols["royalty_amount"].append(full_price * royalty_percent // 100000)
        out = {"account": t["account"], "lt": t["lt"]}
        for name in _SALE_SCHEMA.names:
            if name not in out:
                out[name] = pa.array(cols[name], _SALE_SCHEMA.field(name).type)
        return pa.table(out, schema=_SALE_SCHEMA)

    return winners.map_batches(decode, batch_format="pyarrow")


_UNION_SCHEMA = pa.schema(
    [
        ("account", pa.string()),
        ("lt", pa.int64()),
        ("sale_type", pa.string()),
        ("nft", pa.string()),
        ("owner", pa.string()),
        ("marketplace", pa.string()),
        ("price", pa.int64()),
        ("asset", pa.string()),
        ("is_complete", pa.int64()),
    ]
)


def nft_sale_union(sf_dir: str, *, num_buckets: int = 64):
    """The reference's ``get_nft_sale`` set-union (J4, parser/db.py:
    211-229: getgems_nft_sales ∪ getgems_nft_auctions) and the
    NFTSalesConverter sales+auctions union (C10, datalake converters):
    both contract families decoded by their own rank-1 pipeline, then
    normalized into ONE typed table — sale_type, nft, owner,
    marketplace, price (an auction's current price is its last bid,
    falling back to min_bid while unbid), asset, is_complete. A lazy
    ``Dataset.union`` — no shuffle; each side stays streaming."""
    ensure_portable()

    def norm_fix(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "account": t["account"],
                "lt": t["lt"],
                "sale_type": pa.array(["fixprice"] * len(t), pa.string()),
                "nft": t["nft"],
                "owner": t["owner"],
                "marketplace": t["marketplace"],
                "price": t["full_price"],
                "asset": t["asset"],
                "is_complete": t["is_complete"],
            },
            schema=_UNION_SCHEMA,
        )

    fix = nft_sales(sf_dir, num_buckets=num_buckets).map_batches(
        norm_fix, batch_format="pyarrow"
    )

    winners = _rank1_states(
        read_synth_dir(ensure_auction_table(sf_dir), _STATE_SCHEMA),
        AUCTION_CODE_HASH,
        ["account"],
        num_buckets=num_buckets,
    )

    def decode_auction(t: pa.Table) -> pa.Table:
        types, nfts, owners, mkts, prices, assets, ends = [], [], [], [], [], [], []
        for body in t["data_boc"].to_pylist():
            s = parse_boc(body).begin_parse()
            if s.load_uint(32) != AUCTION_MAGIC:
                raise ValueError("not an auction state cell")
            ends.append(s.load_bit())
            s.load_uint(32)  # end_at (not part of the union projection)
            mkts.append(fmt_addr(s.load_address()))
            nfts.append(fmt_addr(s.load_address()))
            owners.append(fmt_addr(s.load_address()))
            last_bid = s.load_coins()
            min_bid = s.load_coins()
            prices.append(last_bid if last_bid else min_bid)
            types.append("auction")
            assets.append("TON")
        return pa.table(
            {
                "account": t["account"],
                "lt": t["lt"],
                "sale_type": pa.array(types, pa.string()),
                "nft": pa.array(nfts, pa.string()),
                "owner": pa.array(owners, pa.string()),
                "marketplace": pa.array(mkts, pa.string()),
                "price": pa.array(prices, pa.int64()),
                "asset": pa.array(assets, pa.string()),
                "is_complete": pa.array(ends, pa.int64()),
            },
            schema=_UNION_SCHEMA,
        )

    auc = winners.map_batches(decode_auction, batch_format="pyarrow")
    return fix.union(auc)
