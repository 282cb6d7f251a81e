"""NFT-history classifier (SURVEY.md §2.3 P20): classify each NFT
transfer into {init_sale, sale, cancel_sale, burn, transfer} by probing
the old/new owner against the sale-contract universe.

Reference: parsers/nft_transfer/nft_history.py:14-95 — per transfer it
looks up whether the NEW owner is a sale contract (listing), whether the
OLD owner is a sale contract (the sale completed — or was cancelled if
the item went back to the seller recorded in the sale contract's state),
whether the new owner is null (burn), else an ordinary transfer. The
reference does per-record DB lookups on both owners; cluster-shaped,
the sale-contract universe (address → seller) is ONE broadcast dim
probed vectorized on both columns — no shuffle at all.

Synthetic nft_transfers table, derived from part. Per part key ``k``
(sale slot ``s = k % 32``, mode ``m = k % 5``; ``sale(s)`` =
addr('sale', s) with recorded seller addr('seller', s)):

- m=0 listing:   old addr('u', k)  → new ``sale(s)``      ⇒ init_sale
- m=1 purchase:  old ``sale(s)``   → new addr('u', k)     ⇒ sale
- m=2 cancel:    old ``sale(s)``   → new addr('seller', s) ⇒ cancel_sale
- m=3 burn:      old addr('u', k)  → new NULL              ⇒ burn
- m=4 ordinary:  old addr('u', k)  → new addr('v', k)      ⇒ transfer

The class is decided by MEMBERSHIP + seller equality on the Ray side
and recomputed arithmetically by the DuckDB oracle, so any probe or
precedence bug value-hash-mismatches.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .._pickle import ensure_portable
from ._util import addr_str, cached_synth_table, read_synth_dir, read_table

N_SALES = 32

_NT_SCHEMA = pa.schema(
    [
        ("tx_hash", pa.string()),
        ("nft_address", pa.string()),
        ("old_owner", pa.string()),
        ("new_owner", pa.string()),
        ("lt", pa.int64()),
    ]
)


def sale_contract_dim() -> pa.Table:
    """The getgems-style sale-contract universe (address → seller it
    was listed by) — the state the reference reads per record
    (nft_history.py:30-60), here a small broadcast dim."""
    return pa.table(
        {
            "sale": pa.array([addr_str("sale", s) for s in range(N_SALES)]),
            "seller": pa.array([addr_str("seller", s) for s in range(N_SALES)]),
        }
    )


def synth_nft_transfers(sf_dir: str):
    ensure_portable()
    ds = read_table(sf_dir, "part", columns=["p_partkey"])

    def gen(t: pa.Table) -> pa.Table:
        tx, nft, old, new, lt = [], [], [], [], []
        for k in t["p_partkey"].to_pylist():
            s, m = k % N_SALES, k % 5
            tx.append(hashlib.md5(f"nt-{k}".encode()).hexdigest())
            nft.append(addr_str("nft", k))
            old.append(addr_str("sale", s) if m in (1, 2) else addr_str("u", k))
            new.append(
                {
                    0: addr_str("sale", s),
                    1: addr_str("u", k),
                    2: addr_str("seller", s),
                    3: None,
                }.get(m, addr_str("v", k))
            )
            lt.append(k * 10)
        return pa.table(
            {
                "tx_hash": pa.array(tx, pa.string()),
                "nft_address": pa.array(nft, pa.string()),
                "old_owner": pa.array(old, pa.string()),
                "new_owner": pa.array(new, pa.string()),
                "lt": pa.array(lt, pa.int64()),
            },
            schema=_NT_SCHEMA,
        )

    return ds.map_batches(gen, batch_format="pyarrow")


def ensure_transfer_table(sf_dir: str) -> str:
    return cached_synth_table(sf_dir, "nfthist", "part", synth_nft_transfers)


def transfer_dataset(sf_dir: str):
    return read_synth_dir(ensure_transfer_table(sf_dir), _NT_SCHEMA)


_HIST_SCHEMA = pa.schema(
    [
        ("tx_hash", pa.string()),
        ("nft_address", pa.string()),
        ("event_type", pa.string()),
        ("old_owner", pa.string()),
        ("new_owner", pa.string()),
        ("lt", pa.int64()),
    ]
)


def nft_history(sf_dir: str):
    """Vectorized P20 classification (module doc): one broadcast dim,
    two searchsorted membership probes + a seller-equality check, class
    picked by ``np.select`` in reference precedence order (burn >
    init_sale > cancel_sale > sale > transfer). Zero shuffles."""
    ensure_portable()
    import ray

    from .swaps import _dim_arrays

    dim_ref = ray.put(sale_contract_dim().combine_chunks())

    def classify(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _HIST_SCHEMA.empty_table()
        sales, sellers = _dim_arrays(dim_ref, "sale", "seller")
        old = np.asarray(t["old_owner"].to_pylist())
        # null new_owner (burn) → "" so string compares stay vectorized
        new = np.asarray(pa.compute.fill_null(t["new_owner"], "").to_pylist())

        def probe(a: np.ndarray):
            idx = np.clip(np.searchsorted(sales, a), 0, len(sales) - 1)
            return sales[idx] == a, idx

        new_in, _ = probe(new)
        old_in, old_idx = probe(old)
        event = np.select(
            [
                new == "",
                new_in,
                old_in & (new == sellers[old_idx]),
                old_in,
            ],
            ["burn", "init_sale", "cancel_sale", "sale"],
            default="transfer",
        )
        return pa.table(
            {
                "tx_hash": t["tx_hash"],
                "nft_address": t["nft_address"],
                "event_type": pa.array(event, pa.string()),
                "old_owner": t["old_owner"],
                "new_owner": t["new_owner"],
                "lt": t["lt"],
            },
            schema=_HIST_SCHEMA,
        )

    return transfer_dataset(sf_dir).map_batches(classify, batch_format="pyarrow")
