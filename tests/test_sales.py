"""P29 NFT-sales parser family (ops/sales.py): fixprice-v4 state codec
round-trip (both price branches), the whitelist -> rank-1 -> decode
pipeline vs a DuckDB window-function recomputation, and the
jetton-price fallback semantics."""

import duckdb
import pandas as pd

from ton_etl_ray.boc import parse_boc, parse_hashmap_uint
from ton_etl_ray.ops import sales
from ton_etl_ray.ops._util import addr_str

SF = "/root/testdata/sf0.001"


def test_sale_state_roundtrip_ton_price():
    # k=42: k%5 != 0 -> plain TON price, no jetton dict
    s = parse_boc(sales.encode_sale_state(42)).begin_parse()
    assert s.load_uint(32) == sales.SALE_MAGIC
    assert s.load_bit() == 0  # 42 % 2
    assert s.load_uint(32) == (42 * 1009) % 2**31
    for tag, n in (("mkt", 42 % 16), ("snft", 42 % 2048), ("sown", 42 % 1000)):
        wc, h = s.load_address()
        assert f"{wc}:{h.hex().upper()}" == addr_str(tag, n)
    assert s.load_coins() == 42 * 113 + 5
    fees = s.load_ref().begin_parse()
    fees.load_address()
    assert fees.load_uint(24) == 42 % 2500
    fees.load_address()
    assert fees.load_uint(24) == 42 % 1500
    assert s.load_bit() == 0  # no jetton-price dict


def test_sale_state_roundtrip_jetton_fallback():
    # k=40: k%5 == 0 -> full_price 0, price carried by the hashmap value
    s = parse_boc(sales.encode_sale_state(40)).begin_parse()
    s.load_uint(32), s.load_bit(), s.load_uint(32)
    s.load_address(), s.load_address(), s.load_address()
    assert s.load_coins() == 0
    s.load_ref()  # fees
    assert s.load_bit() == 1
    items = parse_hashmap_uint(s.load_ref(), 256)
    assert len(items) == 1
    v = items[min(items)].begin_parse()
    assert v.load_coins() == 40 * 991 + 7
    wc, h = v.load_address()
    assert f"{wc}:{h.hex().upper()}" == addr_str("jet", 40 % 64)


def test_nft_sales_matches_duckdb(ray_session):
    got = (
        sales.nft_sales(SF)
        .to_pandas()
        .sort_values("account")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW supplier AS SELECT * FROM read_parquet('{SF}/supplier.parquet')"
    )
    exp = con.execute(
        """
        WITH w AS (
            SELECT s_suppkey AS k, s_suppkey % 1024 AS pool
            FROM supplier WHERE s_suppkey % 13 <> 0
        ), r AS (
            SELECT k, pool,
                   row_number() OVER (PARTITION BY pool ORDER BY k DESC) AS rn
            FROM w
        ), f AS (
            SELECT k, pool,
                   CASE WHEN k%5=0 THEN k*991+7 ELSE k*113+5 END AS full_price,
                   k % 2500 AS feep, k % 1500 AS royp
            FROM r WHERE rn = 1
        )
        SELECT '0:' || upper(md5('sale-'||pool)||md5('sale-'||pool)) AS account,
               k AS lt,
               k % 2 AS is_complete,
               (k*1009) % 2147483648 AS created_at,
               '0:' || upper(md5('mkt-'||(k%16))||md5('mkt-'||(k%16))) AS marketplace,
               '0:' || upper(md5('snft-'||(k%2048))||md5('snft-'||(k%2048))) AS nft,
               '0:' || upper(md5('sown-'||(k%1000))||md5('sown-'||(k%1000))) AS owner,
               full_price,
               CASE WHEN k%5=0 THEN '0:'||upper(md5('jet-'||(k%64))||md5('jet-'||(k%64)))
                    ELSE 'TON' END AS asset,
               '0:' || upper(md5('fee-'||(k%8))||md5('fee-'||(k%8))) AS marketplace_fee_address,
               full_price * feep // 100000 AS marketplace_fee,
               '0:' || upper(md5('roy-'||(k%8))||md5('roy-'||(k%8))) AS royalty_address,
               full_price * royp // 100000 AS royalty_amount
        FROM f ORDER BY account
        """
    ).df()
    for c in exp.columns:
        if exp[c].dtype.kind in "iu":
            exp[c] = exp[c].astype("int64")
    assert len(got)  # whitelist must not drop everything
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()], check_dtype=True)
    # non-whitelisted contracts never win: every 13th key absent
    assert not (got["lt"] % 13 == 0).any()
    # both price branches present and consistent with the fallback rule
    jet = got["asset"] != "TON"
    assert (got.loc[jet, "lt"] % 5 == 0).all()
    assert (got.loc[~jet, "full_price"] == got.loc[~jet, "lt"] * 113 + 5).all()


def test_nft_sale_union_matches_duckdb(ray_session):
    got = (
        sales.nft_sale_union(SF)
        .to_pandas()
        .sort_values(["sale_type", "account"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW supplier AS SELECT * FROM read_parquet('{SF}/supplier.parquet')"
    )
    exp = con.execute(
        """
        WITH wf AS (
            SELECT s_suppkey AS k, s_suppkey % 1024 AS pool
            FROM supplier WHERE s_suppkey % 13 <> 0
        ), rf AS (
            SELECT k, pool,
                   row_number() OVER (PARTITION BY pool ORDER BY k DESC) AS rn
            FROM wf
        ), wa AS (
            SELECT s_suppkey AS k, s_suppkey % 512 AS pool
            FROM supplier WHERE s_suppkey % 11 <> 0
        ), ra AS (
            SELECT k, pool,
                   row_number() OVER (PARTITION BY pool ORDER BY k DESC) AS rn
            FROM wa
        )
        SELECT '0:' || upper(md5('sale-'||pool)||md5('sale-'||pool)) AS account,
               k AS lt, 'fixprice' AS sale_type,
               '0:' || upper(md5('snft-'||(k%2048))||md5('snft-'||(k%2048))) AS nft,
               '0:' || upper(md5('sown-'||(k%1000))||md5('sown-'||(k%1000))) AS owner,
               '0:' || upper(md5('mkt-'||(k%16))||md5('mkt-'||(k%16))) AS marketplace,
               CASE WHEN k%5=0 THEN k*991+7 ELSE k*113+5 END AS price,
               CASE WHEN k%5=0 THEN '0:'||upper(md5('jet-'||(k%64))||md5('jet-'||(k%64)))
                    ELSE 'TON' END AS asset,
               k % 2 AS is_complete
        FROM rf WHERE rn = 1
        UNION ALL
        SELECT '0:' || upper(md5('auc-'||pool)||md5('auc-'||pool)) AS account,
               k AS lt, 'auction' AS sale_type,
               '0:' || upper(md5('snft-'||((k*3)%2048))||md5('snft-'||((k*3)%2048))) AS nft,
               '0:' || upper(md5('sown-'||((k*7)%1000))||md5('sown-'||((k*7)%1000))) AS owner,
               '0:' || upper(md5('mkt-'||(k%16))||md5('mkt-'||(k%16))) AS marketplace,
               CASE WHEN k%4=0 THEN k*57+3 ELSE k*209+11 END AS price,
               'TON' AS asset,
               CASE WHEN k%3=0 THEN 1 ELSE 0 END AS is_complete
        FROM ra WHERE rn = 1
        ORDER BY sale_type, account
        """
    ).df()
    for c in exp.columns:
        if exp[c].dtype.kind in "iu":
            exp[c] = exp[c].astype("int64")
    assert set(got["sale_type"]) == {"fixprice", "auction"}
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()], check_dtype=True)
    # unbid auctions fall back to min_bid (the auction price branch)
    auc = got[got["sale_type"] == "auction"]
    unbid = auc["lt"] % 4 == 0
    assert (auc.loc[unbid, "price"] == auc.loc[unbid, "lt"] * 57 + 3).all()
