"""Account-state parser family (ops/prices.py): pool-state codec
round-trip, the whitelist -> rank-1 -> decode-winners -> price pipeline
vs a DuckDB window-function recomputation, and the TVL window series."""

import duckdb
import pandas as pd

from ton_etl_ray.boc import parse_boc
from ton_etl_ray.ops import prices

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    return con


def test_pool_state_roundtrip():
    s = parse_boc(prices.encode_pool_state(42)).begin_parse()
    assert s.load_uint(32) == prices.POOL_MAGIC
    assert s.load_coins() == 42 * 1000 + 17
    assert s.load_coins() == 42 * 377 + 29
    wc, h = s.load_address()
    assert wc == 0 and len(h) == 32


def test_core_prices_matches_duckdb(ray_session):
    got = (
        prices.core_prices(SF)
        .to_pandas()
        .sort_values("account")
        .reset_index(drop=True)
    )
    exp = _con().execute(
        """
        WITH w AS (
            SELECT o_orderkey AS k, o_orderkey % 4096 AS pool
            FROM orders WHERE o_orderkey % 17 <> 0
        ), r AS (
            SELECT '0:' || upper(md5('pool-' || pool) || md5('pool-' || pool)) AS account,
                   k AS lt, k*1000+17 AS reserve0, k*377+29 AS reserve1,
                   row_number() OVER (PARTITION BY pool ORDER BY k DESC) AS rn
            FROM w
        )
        SELECT account, lt, reserve0, reserve1,
               CAST(CAST(reserve1 AS HUGEINT) * 1000000000 // reserve0 AS BIGINT) AS price_nano
        FROM r WHERE rn = 1 ORDER BY account
        """
    ).df()
    for c in ("lt", "reserve0", "reserve1", "price_nano"):
        exp[c] = exp[c].astype("int64")
    assert len(got)  # whitelist must not drop everything
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()], check_dtype=True)
    # non-whitelisted (wallet-code) states never win: every 17th key absent
    assert not (got["lt"] % 17 == 0).any()


def test_pool_tvl_history_matches_duckdb(ray_session):
    got = (
        prices.pool_tvl_history(SF)
        .to_pandas()
        .sort_values(["account", "window_id"])
        .reset_index(drop=True)
    )
    exp = _con().execute(
        """
        WITH w AS (
            SELECT o_orderkey AS k, o_orderkey % 4096 AS pool,
                   o_orderkey // 65536 AS win
            FROM orders WHERE o_orderkey % 17 <> 0
        ), r AS (
            SELECT '0:' || upper(md5('pool-' || pool) || md5('pool-' || pool)) AS account,
                   win AS window_id, k AS lt, k*1000+17 AS reserve0, k*377+29 AS reserve1,
                   row_number() OVER (PARTITION BY pool, win ORDER BY k DESC) AS rn
            FROM w
        )
        SELECT account, window_id, lt, reserve0, reserve1,
               reserve0 + reserve1 AS tvl_nano
        FROM r WHERE rn = 1 ORDER BY account, window_id
        """
    ).df()
    for c in ("window_id", "lt", "reserve0", "reserve1", "tvl_nano"):
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()], check_dtype=True)
    # windowed rank-1 keeps AT LEAST the pools of the unwindowed rank-1
    assert len(got) >= got["account"].nunique()


def test_decode_rejects_non_pool_cell():
    """The winner decode validates the state magic — a foreign cell
    fails loudly instead of yielding garbage reserves."""
    import pyarrow as pa
    import pytest

    from ton_etl_ray.boc import Builder, serialize_boc

    bad = serialize_boc(Builder().store_uint(0xDEAD, 32).end_cell())
    t = pa.table(
        {
            "account": ["0:AB"],
            "lt": pa.array([1], "int64"),
            "data_boc": pa.array([bad], pa.binary()),
        }
    )
    with pytest.raises(ValueError, match="pool state"):
        prices._decode_reserves(t, [])


def test_stake_state_roundtrip():
    """Hashmap fan-out codec: k=7 → 3 nominators with arithmetic stakes."""
    from ton_etl_ray.boc import parse_hashmap_uint

    s = parse_boc(prices.encode_stake_state(7)).begin_parse()
    assert s.load_uint(32) == prices.STAKE_MAGIC
    items = parse_hashmap_uint(s.load_ref(), 32)
    assert sorted(items) == [0, 1, 2]
    v = items[2].begin_parse()
    wc, h = v.load_address()
    assert wc == 0
    assert v.load_coins() == 7 * 31 + 2 * 13


def test_staking_nominators_matches_duckdb(ray_session):
    got = (
        prices.staking_nominators(SF)
        .to_pandas()
        .sort_values(["account", "nominator_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')"
    )
    exp = con.execute(
        """
        WITH w AS (
            SELECT c_custkey AS k, c_custkey % 512 AS pool
            FROM customer WHERE c_custkey % 23 <> 0
        ), r AS (
            SELECT k, pool,
                   row_number() OVER (PARTITION BY pool ORDER BY k DESC) AS rn
            FROM w
        ), win AS (SELECT k, pool FROM r WHERE rn = 1)
        SELECT '0:' || upper(md5('stake-' || pool) || md5('stake-' || pool)) AS account,
               k AS lt, CAST(i AS BIGINT) AS nominator_idx,
               '0:' || upper(md5('nom-' || ((k*7+i) % 100000)) || md5('nom-' || ((k*7+i) % 100000))) AS nominator,
               k*31 + i*13 AS stake
        FROM (SELECT k, pool, unnest(range(0, k % 5 + 1)) AS i FROM win)
        ORDER BY account, nominator_idx
        """
    ).df()
    for c in ("lt", "nominator_idx", "stake"):
        exp[c] = exp[c].astype("int64")
    assert len(got)
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()], check_dtype=True)
    # non-whitelisted states never win: every 23rd key absent
    assert not (got["lt"] % 23 == 0).any()
    # the 1->many fan-out really happened (pools with >1 nominator)
    assert (got.groupby("account").size() > 1).any()


def test_nft_state_roundtrip():
    """TEP-64-in-state codec: chunked form every 7th key (k=7), snake
    otherwise."""
    from ton_etl_ray.boc import decode_tep64

    body = prices.encode_nft_state(7, "Name Seven", "BRAND#7")
    s = parse_boc(body).begin_parse()
    assert s.load_uint(32) == prices.NFT_MAGIC
    wc, h = s.load_address()
    assert wc == 0 and len(h) == 32
    attrs = decode_tep64(s.load_ref(), keys=("name", "description"))
    assert attrs == {"name": "Name Seven", "description": "BRAND#7"}


def test_nft_item_states_matches_duckdb(ray_session):
    got = (
        prices.nft_item_states(SF)
        .to_pandas()
        .sort_values("account")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{SF}/part.parquet')"
    )
    exp = con.execute(
        """
        WITH w AS (
            SELECT p_partkey AS k, p_partkey % 2048 AS pool, p_name, p_brand
            FROM part WHERE p_partkey % 19 <> 0
        ), r AS (
            SELECT *, row_number() OVER (PARTITION BY pool ORDER BY k DESC) AS rn
            FROM w
        )
        SELECT '0:' || upper(md5('nft-' || pool) || md5('nft-' || pool)) AS account,
               k AS lt,
               '0:' || upper(md5('own-' || k) || md5('own-' || k)) AS owner,
               p_name AS name, p_brand AS description
        FROM r WHERE rn = 1 ORDER BY account
        """
    ).df()
    exp["lt"] = exp["lt"].astype("int64")
    assert len(got)
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()], check_dtype=True)
    # blacklisted (scam-code) states never win: every 19th key absent
    assert not (got["lt"] % 19 == 0).any()
