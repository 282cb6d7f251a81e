"""DeDust ext-out event parser (ops/dedust.py, P1 claim+codec half):
Asset tagged-union codec round-trip, the blacklist/opcode/direction
claim rules, and the full parse vs a DuckDB recomputation."""

import duckdb
import pandas as pd

from ton_etl_ray.boc import parse_boc
from ton_etl_ray.ops import dedust
from ton_etl_ray.ops._util import addr_str

SF = "/root/testdata/sf0.001"


def test_asset_codec_roundtrip():
    # k=4: asset_in native (k%4==0), asset_out jetton dj-(4+3)%8
    body = dedust.encode_dedust_swap(4)
    s = parse_boc(body).begin_parse()
    assert s.load_uint(32) == dedust.OP_DEDUST_SWAP
    assert dedust._load_asset(s) == "TON"
    assert dedust._load_asset(s) == addr_str("dj", 7)
    assert s.load_coins() == 4 * 40 + 11
    assert s.load_coins() == 4 * 17 + 5
    r = s.load_ref().begin_parse()
    wc, h = r.load_address()
    assert f"{wc}:{h.hex().upper()}" == addr_str("du", 4)
    assert r.load_address() is None  # 4 % 5 != 0 -> addr_none referral
    assert r.load_coins() == 4 * 1000 + 3
    assert r.load_coins() == 4 * 700 + 9
    # k=5: asset_in jetton, asset_out native, referral present (5%5==0)
    s5 = parse_boc(dedust.encode_dedust_swap(5)).begin_parse()
    s5.load_uint(32)
    assert dedust._load_asset(s5) == addr_str("dj", 5)
    assert dedust._load_asset(s5) == "TON"
    s5.load_coins(), s5.load_coins()
    r5 = s5.load_ref().begin_parse()
    r5.load_address()
    wc, h = r5.load_address()
    assert f"{wc}:{h.hex().upper()}" == addr_str("dref", 5 % 6)


def test_dedust_swaps_matches_duckdb(ray_session):
    got = (
        dedust.dedust_swaps(SF)
        .to_pandas()
        .sort_values(["amount_in"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{SF}/part.parquet'"
    )
    exp = con.execute(
        """
        WITH w AS (
            SELECT p_partkey AS k FROM part WHERE p_partkey % 9 <> 0
        )
        SELECT '0:' || upper(md5('dpool-'||(k%24))||md5('dpool-'||(k%24))) AS pool,
               '0:' || upper(md5('du-'||(k%2000))||md5('du-'||(k%2000))) AS sender,
               CASE WHEN k%4=0 THEN 'TON'
                    ELSE '0:'||upper(md5('dj-'||(k%8))||md5('dj-'||(k%8))) END AS asset_in,
               CASE WHEN k%4=1 THEN 'TON'
                    ELSE '0:'||upper(md5('dj-'||((k+3)%8))||md5('dj-'||((k+3)%8))) END AS asset_out,
               k*40 + 11 AS amount_in, k*17 + 5 AS amount_out,
               k*1000 + 3 AS reserve0, k*700 + 9 AS reserve1,
               CASE WHEN k%5=0
                    THEN '0:'||upper(md5('dref-'||(k%6))||md5('dref-'||(k%6)))
                    ELSE NULL END AS referral
        FROM w ORDER BY amount_in
        """
    ).df()
    assert len(got) == len(exp) > 0
    for col in ("pool", "sender", "asset_in", "asset_out", "referral"):
        assert got[col].where(pd.notna(got[col]), None).tolist() == \
            exp[col].where(pd.notna(exp[col]), None).tolist()
    for col in ("amount_in", "amount_out", "reserve0", "reserve1"):
        assert got[col].tolist() == exp[col].astype("int64").tolist()
    # claim rules actually exercised: blacklist drops every 9th source,
    # noise rows (other opcode / internal direction) never surface
    assert not any(p in dedust.DEDUST_BLACKLIST for p in got["pool"])
    assert got["referral"].isna().any() and got["referral"].notna().any()
    assert ("TON" == got["asset_in"]).any() and ("TON" == got["asset_out"]).any()
