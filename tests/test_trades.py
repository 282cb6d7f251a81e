"""Launchpad ext-out trade parser family (ops/trades.py): codec
round-trips, the branch-by-opcode decode vs a DuckDB recomputation,
and the whitelist/direction predicate drops."""

import duckdb
import pandas as pd

from ton_etl_ray.boc import parse_boc
from ton_etl_ray.ops import trades

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    return con


def test_trade_event_roundtrip():
    buy = parse_boc(trades.encode_trade_event(9, 4)).begin_parse()  # 9%3==0
    assert buy.load_uint(32) == trades.OP_BUY
    assert buy.load_uint(64) == 9
    assert buy.load_address() == (0, trades._addr_bytes("t", 4))
    assert buy.load_coins() == 9 * 50 + 7
    assert buy.load_coins() == 9 * 20 + 3
    assert buy.load_coins() == 9 % 100

    sell = parse_boc(trades.encode_trade_event(10, 4)).begin_parse()  # 10%3==1
    assert sell.load_uint(32) == trades.OP_SELL
    sell.load_uint(64), sell.load_address()
    assert sell.load_coins() == 10 * 20 + 5  # jetton_in first on sells

    grad = parse_boc(trades.encode_trade_event(11, 4)).begin_parse()  # 11%3==2
    assert grad.load_uint(32) == trades.OP_GRADUATION
    assert grad.load_uint(64) == 11
    assert grad.load_coins() == 11 * 1000 + 1


def test_bcl_trades_matches_duckdb(ray_session):
    got = trades.bcl_trades(SF).to_pandas()
    cols = list(got.columns)
    got = got.sort_values(cols).reset_index(drop=True)
    exp = _con().execute(
        """
        WITH w AS (
            SELECT l_orderkey*8 + l_linenumber AS k, l_suppkey AS c
            FROM lineitem WHERE (l_orderkey*8 + l_linenumber) % 13 <> 0
        )
        SELECT k AS query_id,
               '0:' || upper(md5('bcl-' || (k%12)) || md5('bcl-' || (k%12))) AS contract,
               '0:' || upper(md5('t-' || c) || md5('t-' || c)) AS trader,
               CASE WHEN k%3=0 THEN 'buy' ELSE 'sell' END AS side,
               CASE WHEN k%3=0 THEN k*50+7 ELSE k*50+2 END AS ton_amount,
               CASE WHEN k%3=0 THEN k*20+3 ELSE k*20+5 END AS jetton_amount,
               k % 100 AS fee
        FROM w WHERE k % 3 < 2
        """
    ).df()
    for c in ("query_id", "ton_amount", "jetton_amount", "fee"):
        exp[c] = exp[c].astype("int64")
    # k collides in the synthetic lineitem (module doc) — compare as a
    # multiset by sorting on every column, exactly like the driver's hash
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(got)
    pd.testing.assert_frame_equal(got, exp, check_dtype=True)
    # every 13th k comes from a non-whitelisted contract and must be gone
    assert not (got["query_id"] % 13 == 0).any()


def test_bcl_graduations_matches_duckdb(ray_session):
    got = trades.bcl_graduations(SF).to_pandas()
    cols = list(got.columns)
    got = got.sort_values(cols).reset_index(drop=True)
    exp = _con().execute(
        """
        WITH w AS (
            SELECT l_orderkey*8 + l_linenumber AS k
            FROM lineitem WHERE (l_orderkey*8 + l_linenumber) % 13 <> 0
        )
        SELECT k AS query_id,
               '0:' || upper(md5('bcl-' || (k%12)) || md5('bcl-' || (k%12))) AS contract,
               k*1000+1 AS total_supply
        FROM w WHERE k % 3 = 2
        """
    ).df()
    for c in ("query_id", "total_supply"):
        exp[c] = exp[c].astype("int64")
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(got)
    pd.testing.assert_frame_equal(got, exp, check_dtype=True)


def test_predicate_requires_ext_out():
    """Direction/destination checks (the ext-out claim) drop rows even
    when opcode and whitelist match."""
    import pyarrow as pa

    t = pa.table(
        {
            "msg_hash": ["a", "b", "c"],
            "opcode": pa.array([trades.OP_BUY - (1 << 32)] * 3, pa.int32()),
            "direction": ["out", "in", "out"],
            "source": pa.array([trades.contract_whitelist()[0]] * 3),
            "destination": pa.array([None, None, "0:AB"], pa.string()),
            "body_boc": pa.array([trades.encode_trade_event(0, 1)] * 3, pa.binary()),
        }
    )
    kept = trades._claim(t, [trades.OP_BUY])
    assert kept["msg_hash"].to_pylist() == ["a"]
