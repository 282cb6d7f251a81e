"""Moon-shaped payload-in-derived-table parser (ops/moon.py): request
payload codec round-trip, the claim -> opcode-peek -> decode -> trace
join pipeline vs a DuckDB recomputation, and the noise-drop rules."""

import duckdb
import pandas as pd

from ton_etl_ray.boc import opcode_of, parse_boc
from ton_etl_ray.ops import moon
from ton_etl_ray.ops._util import addr_str

SF = "/root/testdata/sf0.001"


def test_swap_request_roundtrip():
    body = moon.encode_swap_request(44)
    assert opcode_of(body) == moon.SWAP_OPCODE
    s = parse_boc(body).begin_parse()
    s.load_uint(32)
    assert s.load_coins() == 44 * 11 + 1
    assert s.load_uint(64) == 44 * 100 + 60
    wc, h = s.load_address()  # excess
    assert f"{wc}:{h.hex().upper()}" == addr_str("muser", 44 % 5000)
    wc, h = s.load_address()  # referral
    assert f"{wc}:{h.hex().upper()}" == addr_str("ref", 44 % 10)
    # every 3rd request carries addr_none referral
    s2 = parse_boc(moon.encode_swap_request(45)).begin_parse()
    s2.load_uint(32), s2.load_coins(), s2.load_uint(64), s2.load_address()
    assert s2.load_address() is None


def test_moon_swaps_matches_duckdb(ray_session):
    got = (
        moon.moon_swaps(SF)
        .to_pandas()
        .sort_values("trace_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    exp = con.execute(
        """
        WITH w AS (
            SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 <> 0
        )
        SELECT md5('wo-' || k) AS tx_hash,
               md5('wtr-' || k) AS trace_id,
               '0:' || upper(md5('muser-'||(k%5000))||md5('muser-'||(k%5000))) AS swap_user,
               '0:' || upper(md5('mpool-'||(k%32))||md5('mpool-'||(k%32))) AS pool,
               '0:' || upper(md5('w0-'||(k%32))||md5('w0-'||(k%32))) AS swap_src_token,
               k*19 + 3 AS swap_src_amount,
               '0:' || upper(md5('w1-'||(k%32))||md5('w1-'||(k%32))) AS swap_dst_token,
               k*7 + 2 AS swap_dst_amount,
               k*11 + 1 AS min_out,
               k*100 + 60 AS deadline,
               CASE WHEN k%3=0 THEN NULL
                    ELSE '0:' || upper(md5('ref-'||(k%10))||md5('ref-'||(k%10))) END AS referral
        FROM w ORDER BY trace_id
        """
    ).df()
    for c in ("swap_src_amount", "swap_dst_amount", "min_out", "deadline"):
        exp[c] = exp[c].astype("int64")
    assert len(got)
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()], check_dtype=True)
    # exactly one swap per surviving trace: the NON_SWAP noise legs in
    # the same trace never reach the join
    assert got["trace_id"].is_unique
    # addr_none referrals surface as nulls
    assert got["referral"].isna().any()
