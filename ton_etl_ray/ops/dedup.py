"""Deduplication family for training-data pipelines over ``documents``.

- exact: hash-partition on a content hash, first-writer-wins per group
- MinHash+LSH: shingle → minhash per batch → explode (band, bucket) rows
  → groupby bands → candidate pairs → verified Jaccard
- SimHash: 64-bit near-dup signature
- n-gram Jaccard: exact verified pair similarity

All per-batch kernels are vectorized or bounded-loop over the batch;
signatures are mergeable so the wide step only shuffles (band, bucket,
doc_id) triples — never the documents themselves.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .._pickle import ensure_portable
from ._util import read_table

_MERSENNE = (1 << 61) - 1


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


import hashlib


def _shingles(text: str, n: int = 3) -> set[int]:
    """Word n-gram shingles hashed to 61-bit ints (blake2b, C speed —
    never Python's randomized hash(): LSH buckets must agree across
    worker processes)."""
    words = text.split(" ")
    return {
        int.from_bytes(
            hashlib.blake2b("\x1f".join(words[i : i + n]).encode(), digest_size=8).digest(),
            "big",
        )
        % _MERSENNE
        for i in range(max(0, len(words) - n + 1))
    }


class _MinHasher:
    """num_perm universal-hash minhash; coefficients fixed by seed."""

    def __init__(self, num_perm: int = 64, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: set[int]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, np.uint64(_MERSENNE), dtype=np.uint64)
        x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
        with np.errstate(over="ignore"):
            hv = (np.outer(self.a, x) + self.b[:, None]) % np.uint64(_MERSENNE)
        return hv.min(axis=1)


class MinHashStage:
    """Actor-pool stage: text → (doc_id, band, bucket) rows, one per band."""

    def __init__(self, num_perm: int = 64, bands: int = 16):
        self.h = _MinHasher(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sigs = np.empty((n, self.h.num_perm), dtype=np.uint64)
        for i, text in enumerate(batch["text"]):
            sigs[i] = self.h.signature(_shingles(text))
        # one bucket key per (doc, band): mix the band's signature rows +
        # the band id into a single 63-bit key, vectorized
        mix = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            bkey = np.zeros((n, self.bands), dtype=np.uint64)
            for b in range(self.bands):
                acc = np.uint64(b + 1) * mix
                for r in range(b * self.rows_per_band, (b + 1) * self.rows_per_band):
                    acc = (acc ^ sigs[:, r]) * mix
                bkey[:, b] = acc
        bkey = (bkey >> np.uint64(1)).astype(np.int64)  # 63-bit, json/arrow safe
        doc_ids = np.repeat(batch["doc_id"].to_numpy(), self.bands)
        return pd.DataFrame({"doc_id": doc_ids, "bkey": bkey.reshape(-1)})


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5):
    """MinHash+LSH near-dup candidate pairs, verified by exact Jaccard.

    Shuffle only the (band, bucket, doc_id) triples; candidate pairs are
    verified against broadcast shingle sets (documents table is the small
    side at verification time — at 100 TB use a second pass joining text
    by doc_id instead)."""
    ensure_portable()
    import ray
    import pyarrow.parquet as pq

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bands = ds.map_batches(MinHashStage, batch_format="pandas", batch_size=2048, concurrency=2)

    # shuffle on a COARSE key (bkey % 256): per-bucket groups are mostly
    # size 1, and one map_groups call per tiny group is pure overhead —
    # inside each coarse group, pandas groups the exact buckets vectorized
    def shard_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        shard = _pc.bit_wise_and(t["bkey"], pa.scalar(255, pa.int64()))
        return t.append_column("shard", shard)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        dup = g[g.duplicated("bkey", keep=False)]
        for _, grp in dup.groupby("bkey"):
            ids = sorted(set(grp["doc_id"]))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"id_a": pd.array(out_a, dtype="int64"),
                             "id_b": pd.array(out_b, dtype="int64")})

    cand = (
        bands.map_batches(shard_key, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pairs, batch_format="pandas")
    )
    cand_pd = cand.to_pandas().drop_duplicates()

    docs = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    ref = ray.put(texts)

    if len(cand_pd) == 0:
        return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        tx = ray.get(ref)
        ja = []
        for a, b in zip(batch["id_a"], batch["id_b"]):
            sa, sb = _shingles(tx[a]), _shingles(tx[b])
            denom = len(sa | sb)
            ja.append(len(sa & sb) / denom if denom else 0.0)
        batch = batch.copy()
        batch["jaccard"] = np.round(ja, 6)
        return batch[batch["jaccard"] >= threshold]

    return rd.from_pandas(cand_pd).map_batches(verify, batch_format="pandas", batch_size=4096)


def exact_dedup_hash(sf_dir: str):
    """Exact dedup: content hash → hash-partitioned first-winner per group
    (K1/A4: idempotent-insert ON CONFLICT DO NOTHING, parser/db.py:279-282)."""
    ensure_portable()
    from ray.data.aggregate import Min

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def h(t: pa.Table) -> pa.Table:
        from ..core.partition import hash64

        hh = np.ascontiguousarray(hash64(t["text"])).view(np.int64)
        return pa.table({"content_hash": pa.array(hh, pa.int64()), "doc_id": t["doc_id"]})

    out = (
        ds.map_batches(h, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"))
    )
    # the hash itself is engine-internal; expose the winners (oracle:
    # one min(doc_id) per distinct text)
    return out.select_columns(["keep_doc_id"])


class SimHashStage:
    """64-bit SimHash over word features (near-dup signature)."""

    def __init__(self, seed: int = 99):
        rng = np.random.default_rng(seed)
        self.a = np.uint64(rng.integers(1, _MERSENNE))
        self.b = np.uint64(rng.integers(0, _MERSENNE))

    def _word_hashes(self, text: str) -> np.ndarray:
        import polars as pl

        hs = pl.Series(text.split(" ")).hash(seed=4242).to_numpy()
        with np.errstate(over="ignore"):
            return self.a * hs + self.b

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = []
        for text in batch["text"]:
            hs = self._word_hashes(text)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
            acc = np.where(bits > 0, 1, -1).sum(axis=0)
            sig = 0
            for k in np.nonzero(acc > 0)[0]:
                sig |= 1 << int(k)
            if sig >= 1 << 63:
                sig -= 1 << 64
            sigs.append(sig)
        return pd.DataFrame({"doc_id": batch["doc_id"], "simhash": pd.array(sigs, dtype="int64")})


def simhash_signatures(sf_dir: str):
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(SimHashStage, batch_format="pandas", batch_size=2048, concurrency=2)


def word_jaccard_pairs(sf_dir: str, threshold: float = 0.5):
    """EXACT word-set Jaccard similarity pairs (oracle-checkable dedup).

    Vectorized: build the doc×vocab binary incidence matrix (vocab from
    a distributed unique pass), broadcast it, and compute intersections
    per batch as one integer matmul — no per-pair Python. Exact, so the
    DuckDB list_intersect oracle must match row-for-row. At 100 TB the
    all-pairs matmul gives way to the MinHash-LSH path above."""
    ensure_portable()
    import ray
    import pyarrow.parquet as pq

    docs = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    word_sets = [set(t.split(" ")) for t in docs["text"].to_pylist()]
    vocab = {w: i for i, w in enumerate(sorted(set().union(*word_sets)))}
    inc = np.zeros((len(word_sets), len(vocab)), dtype=np.int32)
    for r, ws in enumerate(word_sets):
        for w in ws:
            inc[r, vocab[w]] = 1
    ids = docs["doc_id"].to_numpy()
    ref = ray.put((inc, ids, vocab))

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    class Pairs:
        def __init__(self):
            self.inc, self.ids, self.vocab = ray.get(ref)
            self.sizes = self.inc.sum(axis=1)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            rows = np.zeros((len(batch), len(self.vocab)), dtype=np.int32)
            for r, t in enumerate(batch["text"]):
                for w in set(t.split(" ")):
                    if w in self.vocab:
                        rows[r, self.vocab[w]] = 1
            inter = rows @ self.inc.T
            sizes_a = rows.sum(axis=1)
            union = sizes_a[:, None] + self.sizes[None, :] - inter
            with np.errstate(invalid="ignore", divide="ignore"):
                jac = np.where(union > 0, inter / union, 0.0)
            my_ids = batch["doc_id"].to_numpy()
            out_a, out_b, out_j = [], [], []
            for r in range(len(my_ids)):
                hits = np.nonzero((jac[r] >= threshold) & (self.ids > my_ids[r]))[0]
                out_a.extend([my_ids[r]] * len(hits))
                out_b.extend(self.ids[hits].tolist())
                out_j.extend(np.round(jac[r, hits], 6).tolist())
            return pd.DataFrame(
                {"id_a": pd.array(out_a, dtype="int64"),
                 "id_b": pd.array(out_b, dtype="int64"),
                 "jaccard": pd.array(out_j, dtype="float64")}
            )

    return ds.map_batches(Pairs, batch_format="pandas", batch_size=2048, concurrency=2)


def dedup_groups(sf_dir: str, threshold: float = 0.95):
    """Near-dup GROUPS: connected components over exact word-Jaccard
    edges; each doc labeled with its component's min doc_id.

    Edge discovery is the distributed matmul of word_jaccard_pairs; the
    component reduction is union-find over the (provably small,
    threshold-pruned) edge list on the driver — per the standard guide
    rule: label-propagate distributedly only when the candidate set
    can't be bounded. Oracle: the same components via a recursive CTE."""
    ensure_portable()
    import pyarrow.parquet as pq

    pairs_ds = word_jaccard_pairs(sf_dir, threshold=threshold)
    pairs = pairs_ds.to_pandas() if hasattr(pairs_ds, "to_pandas") else pairs_ds

    docs = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id"])
    parent: dict[int, int] = {int(d): int(d) for d in docs["doc_id"].to_pylist()}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    out = sorted((d, find(d)) for d in parent)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in out], pa.int64()),
            "group_id": pa.array([g for _, g in out], pa.int64()),
        }
    )


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.3, n: int = 3):
    """Exact n-gram Jaccard similarity for all LSH candidates at a lower
    threshold (recall-oriented near-dup audit)."""
    return minhash_lsh_pairs(sf_dir, threshold=threshold)
