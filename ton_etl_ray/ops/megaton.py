"""Megaton-shaped DEX parser (SURVEY.md §2.3 P4): a parser whose INPUT
is another parser's OUTPUT — the reference consumes the
``jetton_transfers`` topic the jetton-transfer parser itself produced
(§2.2 S3 consume→convert→re-produce chaining) — and whose work is
in-trace chain reassembly (§2.5 J6), not body decode.

Reference: parsers/jetton_transfer/megaton.py:22-116 — predicate
``!tx_aborted ∧ router ∈ ROUTERS``, then the swap is reassembled from
the transfers in the SAME trace: the user's incoming transfer
(user → router) pairs with the router's outgoing transfer
(router → user) to form one ``dex_swap_parsed`` row. The reference
walks the trace per record with DB lookups; cluster-shaped, the two
legs are claimed by vectorized router-membership predicates and
reassembled with ONE hash join on ``trace_id``.

The input is a TYPED table (no BOC): exactly what distinguishes this
family — the decode already happened upstream. Synthetic
jetton_transfers, derived from orders. Per order key ``k`` (custkey
``c``, pool ``p = k % 16``, router ``R(k) = addr('mrouter', k % 2)``,
trace ``md5('mtr-k')``):

- IN leg  (tx ``md5('mi-k')``): ``user(c) → R(k)``, master ``m0(p)``,
  amount ``k*21+5``, lt ``2k``, aborted iff ``k % 9 == 0``.
- OUT leg (tx ``md5('mo-k')``): ``R(k) → user(c)``, master ``m1(p)``,
  amount ``k*13+2``, lt ``2k+1``, aborted iff ``k % 9 == 0``.
- NOISE  (``k % 4 == 0``, tx ``md5('mn-k')``): ``user(c) → other(c)``
  in the SAME trace — a non-router transfer the predicate must drop,
  proving reassembly keys on router membership, not on the trace alone.

Every output field is arithmetically recomputable in DuckDB, so the
``megaton_swaps`` query carries a full value-hash oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .._pickle import ensure_portable
from ._util import addr_str, cached_synth_table, md5_tag, read_synth_dir, read_table

N_POOLS = 16
ROUTERS = [addr_str("mrouter", 0), addr_str("mrouter", 1)]

_TRANSFER_SCHEMA = pa.schema(
    [
        ("tx_hash", pa.string()),
        ("trace_id", pa.string()),
        ("tx_aborted", pa.bool_()),
        ("source", pa.string()),
        ("destination", pa.string()),
        ("jetton_master", pa.string()),
        ("amount", pa.int64()),
        ("lt", pa.int64()),
    ]
)


def synth_megaton_transfers(sf_dir: str):
    """SF-scaled typed jetton_transfers table (module doc), generated as
    a distributed ``map_batches`` stage over orders."""
    ensure_portable()
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def gen(t: pa.Table) -> pa.Table:
        rows: list[tuple] = []
        for k, c in zip(t["o_orderkey"].to_pylist(), t["o_custkey"].to_pylist()):
            pool, rt = k % N_POOLS, ROUTERS[k % 2]
            trace, aborted = md5_tag("mtr", k), k % 9 == 0
            user = addr_str("user", c)
            rows.append(
                (md5_tag("mi", k), trace, aborted, user, rt,
                 addr_str("m0", pool), k * 21 + 5, 2 * k)
            )
            rows.append(
                (md5_tag("mo", k), trace, aborted, rt, user,
                 addr_str("m1", pool), k * 13 + 2, 2 * k + 1)
            )
            if k % 4 == 0:
                rows.append(
                    (md5_tag("mn", k), trace, False, user, addr_str("other", c),
                     addr_str("m0", pool), k * 5, 2 * k)
                )
        cols = list(zip(*rows)) if rows else [[] for _ in _TRANSFER_SCHEMA]
        return pa.table(
            {f.name: pa.array(list(col), f.type)
             for f, col in zip(_TRANSFER_SCHEMA, cols)},
            schema=_TRANSFER_SCHEMA,
        )

    return ds.map_batches(gen, batch_format="pyarrow")


def ensure_transfer_table(sf_dir: str) -> str:
    return cached_synth_table(sf_dir, "megaton", "orders", synth_megaton_transfers)


def transfer_dataset(sf_dir: str):
    return read_synth_dir(ensure_transfer_table(sf_dir), _TRANSFER_SCHEMA)


_SWAP_SCHEMA = pa.schema(
    [
        ("tx_hash", pa.string()),
        ("trace_id", pa.string()),
        ("swap_user", pa.string()),
        ("router", pa.string()),
        ("swap_src_token", pa.string()),
        ("swap_src_amount", pa.int64()),
        ("swap_dst_token", pa.string()),
        ("swap_dst_amount", pa.int64()),
    ]
)


def megaton_swaps(sf_dir: str):
    """P4 reassembly (module doc): ``!tx_aborted`` + router-membership
    predicates claim the two legs of each swap as plain vectorized
    task stages; the reference's per-record trace walk
    (megaton.py:30-95) becomes ONE hash join on ``trace_id``. A noise
    transfer sharing the trace never matches either predicate."""
    ensure_portable()
    from .relational import join_auto

    routers = pa.array(ROUTERS, pa.string())
    ds = transfer_dataset(sf_dir)

    def in_legs(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.invert(t["tx_aborted"]), pc.is_in(t["destination"], routers))
        )
        return pa.table(
            {
                "trace_id": t["trace_id"],
                "swap_user": t["source"],
                "router": t["destination"],
                "swap_src_token": t["jetton_master"],
                "swap_src_amount": t["amount"],
            }
        )

    def out_legs(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.invert(t["tx_aborted"]), pc.is_in(t["source"], routers))
        )
        return pa.table(
            {
                "trace_id": t["trace_id"],
                "tx_hash": t["tx_hash"],
                "swap_dst_token": t["jetton_master"],
                "swap_dst_amount": t["amount"],
            }
        )

    joined = join_auto(
        ds.map_batches(in_legs, batch_format="pyarrow"),
        ds.map_batches(out_legs, batch_format="pyarrow"),
        on="trace_id",
    )

    def assemble(t: pa.Table) -> pa.Table:
        return t.select([f.name for f in _SWAP_SCHEMA]).cast(_SWAP_SCHEMA)

    return joined.map_batches(assemble, batch_format="pyarrow")
