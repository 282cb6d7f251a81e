"""Emulator-backed parser families (ops/emulated.py): each pipeline's
output must match a DuckDB recomputation of the same arithmetic — a VM
dispatch/decode/arith bug value-hash-mismatches."""

import duckdb
import pandas as pd
import pytest

from ton_etl_ray.ops import emulated
from ton_etl_ray.tvm import TvmEmulator
from ton_etl_ray.boc import Builder

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("customer", "supplier", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_contract_methods_direct():
    """The assembled contracts compute in the VM what the synth data
    encodes — checked without Ray."""
    emu = TvmEmulator(emulated.amm_code(),
                      emulated.encode_amm_data(42))
    assert emulated._run(emu, "get_reserves") == [42 * 1000 + 17, 42 * 377 + 29]
    assert emulated._run(emu, "get_trade_fee") == [42 % 97 + 3, 10_000]
    assert emulated._run(emu, "get_lp_liquidity") == [
        (42 * 1000 + 17) * (42 * 377 + 29) // emulated.NANO]
    vau = TvmEmulator(emulated.vault_code(), emulated.encode_vault_data(7))
    assert emulated._run(vau, "getTotalAssets") == [7 * 991 + 7]
    assert emulated._run(vau, "getTotalShares") == [7 * 500 + 3]
    tre = TvmEmulator(emulated.treasury_code(), emulated.encode_treasury_data(9))
    assert emulated._run(tre, "get_treasury_state") == [9 * 777 + 11, 9 * 333 + 5]


def test_factory_address_derivation():
    fac = TvmEmulator(emulated.factory_code(), Builder().end_cell())
    for (j0, j1, t) in [(0, 3, 0), (5, 0, 1), (7, 2, 1)]:
        (s,) = emulated._run(fac, "get_pool_address",
                             [t, emulated._asset_slice(j0), emulated._asset_slice(j1)])
        wc, h = s.load_address()
        assert f"{wc}:{h.hex().upper()}" == emulated.pool_addr_of(j0, j1, t)


def test_emu_pool_states_vs_duckdb(ray_session):
    got = (emulated.emu_pool_states(SF).to_pandas()
           .sort_values("account").reset_index(drop=True))
    exp = _con().execute("""
        WITH w AS (
            SELECT c_custkey AS k FROM customer WHERE c_custkey % 11 <> 0
        ), r AS (
            SELECT k, k % 512 AS p,
                   row_number() OVER (PARTITION BY k % 512 ORDER BY k DESC) rn
            FROM w
        )
        SELECT '0:' || upper(md5('epool-'||p)||md5('epool-'||p)) AS account,
               k AS lt,
               k*1000 + 17 AS reserve0, k*377 + 29 AS reserve1,
               k % 97 + 3 AS fee_num, 10000 AS fee_den,
               CAST(CAST(k*1000 + 17 AS HUGEINT) * (k*377 + 29)
                    // 1000000000 AS BIGINT) AS liquidity
        FROM r WHERE rn = 1 ORDER BY account
    """).df()
    assert len(got) == len(exp) > 0
    assert got["account"].tolist() == exp["account"].tolist()
    for c in ("lt", "reserve0", "reserve1", "fee_num", "fee_den", "liquidity"):
        assert got[c].tolist() == exp[c].astype("int64").tolist(), c


def test_emu_core_prices_vs_duckdb(ray_session):
    got = (emulated.emu_core_prices(SF).to_pandas()
           .sort_values("account").reset_index(drop=True))
    exp = _con().execute("""
        WITH w AS (
            SELECT s_suppkey AS k,
                   CASE WHEN s_suppkey % 2 = 1 THEN 'vault' ELSE 'treasury' END AS kind
            FROM supplier WHERE s_suppkey % 9 <> 0
        ), r AS (
            SELECT k, kind, k % 256 AS p,
                   row_number() OVER (PARTITION BY kind, k % 256 ORDER BY k DESC) rn
            FROM w
        )
        SELECT CASE WHEN kind = 'vault'
                    THEN '0:' || upper(md5('evault-'||p)||md5('evault-'||p))
                    ELSE '0:' || upper(md5('etreas-'||p)||md5('etreas-'||p)) END AS account,
               k AS lt, kind,
               CASE WHEN kind = 'vault'
                    THEN CAST(CAST(k*991 + 7 AS HUGEINT) * 1000000000
                              // (k*500 + 3) AS BIGINT)
                    ELSE CAST(CAST(k*777 + 11 AS HUGEINT) * 1000000000
                              // (k*333 + 5) AS BIGINT) END AS price_nano
        FROM r WHERE rn = 1 ORDER BY account
    """).df()
    assert len(got) == len(exp) > 0
    assert got["account"].tolist() == exp["account"].tolist()
    assert got["kind"].tolist() == exp["kind"].tolist()
    for c in ("lt", "price_nano"):
        assert got[c].tolist() == exp[c].astype("int64").tolist(), c


def test_dedust_swaps_verified_vs_duckdb(ray_session):
    got = (emulated.dedust_swaps_verified(SF).to_pandas()
           .sort_values("amount_in").reset_index(drop=True))
    exp = _con().execute("""
        WITH w AS (
            SELECT p_partkey AS k, p_partkey % 8 AS j0, (p_partkey+3) % 8 AS j1
            FROM part WHERE p_partkey % 7 <> 0 AND p_partkey % 13 <> 0
        )
        SELECT md5('dv-'||k) AS tx_hash,
               '0:' || upper(printf('%064x', 3*j0 + 7*j1 + 11*(k%2) + 5)) AS pool,
               '0:' || upper(md5('du2-'||(k%2000))||md5('du2-'||(k%2000))) AS sender,
               '0:' || upper(printf('%064x', j0)) AS asset_in,
               '0:' || upper(printf('%064x', j1)) AS asset_out,
               k*40 + 11 AS amount_in, k*17 + 5 AS amount_out
        FROM w ORDER BY amount_in
    """).df()
    assert len(got) == len(exp) > 0
    for c in ("tx_hash", "pool", "sender", "asset_in", "asset_out"):
        assert got[c].tolist() == exp[c].tolist(), c
    for c in ("amount_in", "amount_out"):
        assert got[c].tolist() == exp[c].astype("int64").tolist(), c
    # the invalid-pool and zero-amount drop rules actually fired
    n_all = _con().execute("SELECT count(*) FROM part").fetchone()[0]
    assert len(got) < n_all


def test_coffee_swaps_vs_duckdb(ray_session):
    """P6-P8/P11 composed pipeline: claim -> decode -> parent join ->
    rank-1 pool state -> get_pool_data emulation + factory validation.
    Pool identity is k mod 30; keys ≡ 0,15 (mod 30) have no valid pool
    state and must be dropped (inner join in the oracle)."""
    got = (emulated.coffee_swaps(SF).to_pandas()
           .sort_values("query_id").reset_index(drop=True))
    con = _con()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    exp = con.execute("""
        WITH ev AS (
            SELECT o_orderkey AS k, o_orderkey % 6 AS a1,
                   6 + o_orderkey % 5 AS a2, o_orderkey % 3 AS amm,
                   (o_orderkey % 6) + 6*(6 + o_orderkey % 5)
                     + 30*(o_orderkey % 3) + 5 AS v
            FROM orders WHERE o_orderkey % 19 <> 0 AND o_orderkey % 23 <> 0
        ), st AS (
            SELECT o_orderkey AS k,
                   (o_orderkey % 6) + 6*(6 + o_orderkey % 5)
                     + 30*(o_orderkey % 3) + 5 AS v,
                   row_number() OVER (
                       PARTITION BY (o_orderkey % 6) + 6*(6 + o_orderkey % 5)
                         + 30*(o_orderkey % 3) + 5
                       ORDER BY o_orderkey DESC) AS rn
            FROM orders WHERE o_orderkey % 15 <> 0
        ), w AS (
            SELECT v, k*211 + 19 AS r1, k*97 + 31 AS r2, k % 100 + 1 AS fee
            FROM st WHERE rn = 1
        )
        SELECT ev.k AS query_id,
               '0:' || upper(printf('%064x', ev.v)) AS pool,
               ev.amm,
               '0:' || upper(printf('%064x',
                   CASE WHEN ev.k % 2 = 0 THEN ev.a1 ELSE ev.a2 END)) AS swap_src_token,
               '0:' || upper(printf('%064x',
                   CASE WHEN ev.k % 2 = 0 THEN ev.a2 ELSE ev.a1 END)) AS swap_dst_token,
               ev.k*31 + 7 AS swap_src_amount,
               ev.k*11 + 3 AS swap_dst_amount,
               w.r1 AS reserve1, w.r2 AS reserve2, w.fee AS lp_fee,
               ev.k*3 + 2 AS min_out,
               ev.k % 1000000 + 60 AS deadline,
               '0:' || upper(md5('cu-'||(ev.k%3000))||md5('cu-'||(ev.k%3000))) AS recipient,
               CASE WHEN ev.k % 4 = 0
                    THEN '0:' || upper(md5('cref-'||(ev.k%5))||md5('cref-'||(ev.k%5)))
                    ELSE NULL END AS referral
        FROM ev JOIN w USING (v)
        ORDER BY query_id
    """).df()
    assert len(got) == len(exp) > 0
    for c in ("pool", "swap_src_token", "swap_dst_token", "recipient"):
        assert got[c].tolist() == exp[c].tolist(), c
    assert (got["referral"].where(pd.notna(got["referral"]), None).tolist()
            == exp["referral"].where(pd.notna(exp["referral"]), None).tolist())
    for c in ("query_id", "amm", "swap_src_amount", "swap_dst_amount",
              "reserve1", "reserve2", "lp_fee", "min_out", "deadline"):
        assert got[c].tolist() == exp[c].astype("int64").tolist(), c
    # the no-state-pool drop path fired (pools 0/15 mod 30 have no state)
    assert got["query_id"].nunique() < con.execute(
        "SELECT count(*) FROM orders WHERE o_orderkey % 19 <> 0 AND o_orderkey % 23 <> 0"
    ).fetchone()[0]


def test_emulation_failure_skips_row_not_pipeline():
    """A winner row whose data BOC is corrupt (or whose get-method
    exits non-zero) must be SKIPPED — the reference's
    EmulatorException non-critical-skip path (emulator.py:134-155) —
    never abort the whole batch."""
    import pyarrow as pa

    from ton_etl_ray.ops.emulated import (
        _EmulateWinners, _POOL_SCHEMA, _code_entry, _pool_plan, amm_code,
        encode_amm_data,
    )

    amm_hash, amm_boc = _code_entry(amm_code())
    good = encode_amm_data(42)  # already serialized BOC bytes
    # truncated data BOC: TvmEmulator construction / get-method fails
    corrupt = good[:6]
    stage = _EmulateWinners(_pool_plan, _POOL_SCHEMA)
    t = pa.table({
        "account": pa.array(["0:AA", "0:BB"], pa.string()),
        "lt": pa.array([1, 2], pa.int64()),
        "code_hash": pa.array([amm_hash, amm_hash], pa.string()),
        "code_boc": pa.array([amm_boc, amm_boc], pa.binary()),
        "data_boc": pa.array([corrupt, good], pa.binary()),
    })
    out = stage(t)
    assert out.num_rows == 1                       # bad row dropped
    assert out["account"].to_pylist() == ["0:BB"]  # good row survived
