"""P4/P20/P28 parser shapes: the standard cell hash + StateInit address
math, megaton trace reassembly over a derived table, nft-history
classification via the sale-contract dim, and wallet authenticity by
StateInit address recomputation — each vs a DuckDB recomputation."""

import hashlib

import duckdb
import pandas as pd

from ton_etl_ray.boc import Builder, cell_hash, state_init_address
from ton_etl_ray.ops import megaton, nft_history, wallets

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("orders", "part", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_cell_hash_leaf_vector():
    # hand-derived: leaf repr = d1=0, d2=8, 4 data bytes, no refs
    c = Builder().store_uint(0x25938561, 32).end_cell()
    exp = hashlib.sha256(b"\x00\x08" + bytes.fromhex("25938561")).digest()
    assert cell_hash(c) == exp


def test_cell_hash_ref_vector():
    # parent: 1 data bit set + completion tag -> 0xC0; d1=1, d2=1;
    # then child depth (2 bytes BE, 0) and the child's 32-byte hash
    leaf = Builder().store_uint(7, 8).end_cell()
    parent = Builder().store_bit(1).store_ref(leaf).end_cell()
    leaf_h = hashlib.sha256(b"\x00\x02\x07").digest()
    exp = hashlib.sha256(b"\x01\x01\xc0" + b"\x00\x00" + leaf_h).digest()
    assert cell_hash(parent) == exp


def test_state_init_address_shape():
    a1 = state_init_address(wallets.wallet_code(), wallets.encode_wallet_data(1))
    a2 = state_init_address(wallets.wallet_code(), wallets.encode_wallet_data(2))
    assert a1.startswith("0:") and len(a1) == 66 and a1 == a1.upper()
    assert a1 != a2  # different data -> different account
    # deterministic
    assert a1 == state_init_address(
        wallets.wallet_code(), wallets.encode_wallet_data(1)
    )


def test_wallets_recover_matches_duckdb(ray_session):
    got = (
        wallets.wallets_recover(SF)
        .to_pandas()
        .sort_values("account_id")
        .reset_index(drop=True)
    )
    exp = _con().execute(
        """
        SELECT c_custkey AS account_id, c_custkey*11+1 AS balance,
               '0:' || upper(md5('own-' || c_custkey) || md5('own-' || c_custkey)) AS owner,
               '0:' || upper(md5('jm-' || (c_custkey % 8)) || md5('jm-' || (c_custkey % 8))) AS master,
               c_custkey % 5 <> 0 AS authentic
        FROM customer WHERE c_custkey % 7 <> 0 ORDER BY account_id
        """
    ).df()
    for c in ("account_id", "balance"):
        exp[c] = exp[c].astype("int64")
    assert len(got) and not got["authentic"].all()  # forged rows present
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()], check_dtype=True)


def test_megaton_matches_duckdb(ray_session):
    got = (
        megaton.megaton_swaps(SF)
        .to_pandas()
        .sort_values("trace_id")
        .reset_index(drop=True)
    )
    exp = _con().execute(
        """
        WITH w AS (
            SELECT o_orderkey AS k, o_custkey AS c, o_orderkey % 16 AS pool
            FROM orders WHERE o_orderkey % 9 <> 0
        )
        SELECT md5('mo-' || k) AS tx_hash, md5('mtr-' || k) AS trace_id,
               '0:' || upper(md5('user-' || c) || md5('user-' || c)) AS swap_user,
               '0:' || upper(md5('mrouter-' || (k % 2)) || md5('mrouter-' || (k % 2))) AS router,
               '0:' || upper(md5('m0-' || pool) || md5('m0-' || pool)) AS swap_src_token,
               k * 21 + 5 AS swap_src_amount,
               '0:' || upper(md5('m1-' || pool) || md5('m1-' || pool)) AS swap_dst_token,
               k * 13 + 2 AS swap_dst_amount
        FROM w ORDER BY trace_id
        """
    ).df()
    for c in ("swap_src_amount", "swap_dst_amount"):
        exp[c] = exp[c].astype("int64")
    assert len(got)
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()], check_dtype=True)


def test_nft_history_matches_duckdb(ray_session):
    got = (
        nft_history.nft_history(SF)
        .to_pandas()
        .sort_values("tx_hash")
        .reset_index(drop=True)
    )
    exp = _con().execute(
        """
        WITH w AS (SELECT p_partkey AS k, p_partkey % 32 AS s, p_partkey % 5 AS m FROM part)
        SELECT md5('nt-' || k) AS tx_hash,
               '0:' || upper(md5('nft-' || k) || md5('nft-' || k)) AS nft_address,
               CASE m WHEN 0 THEN 'init_sale' WHEN 1 THEN 'sale'
                      WHEN 2 THEN 'cancel_sale' WHEN 3 THEN 'burn'
                      ELSE 'transfer' END AS event_type,
               CASE WHEN m IN (1, 2)
                    THEN '0:' || upper(md5('sale-' || s) || md5('sale-' || s))
                    ELSE '0:' || upper(md5('u-' || k) || md5('u-' || k)) END AS old_owner,
               CASE m WHEN 0 THEN '0:' || upper(md5('sale-' || s) || md5('sale-' || s))
                      WHEN 1 THEN '0:' || upper(md5('u-' || k) || md5('u-' || k))
                      WHEN 2 THEN '0:' || upper(md5('seller-' || s) || md5('seller-' || s))
                      WHEN 3 THEN NULL
                      ELSE '0:' || upper(md5('v-' || k) || md5('v-' || k)) END AS new_owner,
               k * 10 AS lt
        FROM w ORDER BY tx_hash
        """
    ).df()
    exp["lt"] = exp["lt"].astype("int64")
    assert len(got) and set(got["event_type"]) == {
        "init_sale", "sale", "cancel_sale", "burn", "transfer"
    }
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()], check_dtype=True)
