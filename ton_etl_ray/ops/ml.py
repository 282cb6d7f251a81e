"""Distributed model fit + batch inference over the embeddings table —
the model-based scoring infrastructure of a curation pipeline (the
fastText-style quality classifier slot: fit a cheap linear model on
labeled vectors, then score the whole corpus with it).

``linear_probe`` fits a one-vs-rest least-squares (ridge) classifier
on (embedding → label) with EXACT distributed moments, then scores
every vector in a second streamed pass:

- stage 1: per-block partials (count, AᵀA, AᵀY) where A = [X | 1] is
  the intercept-augmented feature block and Y the one-hot labels —
  (d+1)² + (d+1)·k doubles per block, corpus-size-independent;
- stage 2: a coarse 64-shard ``map_groups`` tree-fold, so the driver
  sees ≤64 partial rows regardless of block count (the PCA/kmeans
  bounded-model shape);
- stage 3: the (d+1)×(d+1) ridge solve on the driver —
  W = (AᵀA + λI)⁻¹ AᵀY (λ also on the intercept row; documented,
  deterministic) — then one streamed scoring pass against the
  broadcast W emitting per-vector predictions.

Moments are exact sums, so the fitted W equals the single-machine
closed form up to float summation order (pinned allclose in pytest,
along with accuracy ≫ the 1/k chance baseline). Matrix solve →
rows-only for the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .._pickle import ensure_portable
from ._util import read_table
from .ann import _emb_matrix

_PART_SCHEMA = pa.schema(
    [("shard", pa.int64()), ("cnt", pa.int64()),
     ("ata", pa.list_(pa.float64())), ("aty", pa.list_(pa.float64()))]
)

_OUT_SCHEMA = pa.schema(
    [("vec_id", pa.int64()), ("label", pa.int64()),
     ("pred_label", pa.int64()), ("margin", pa.float64()),
     ("is_holdout", pa.bool_())]
)


def _augment(mm: np.ndarray) -> np.ndarray:
    return np.hstack([mm, np.ones((len(mm), 1))])


_KNUTH = np.uint64(2654435761)


def _is_train(ids: np.ndarray, holdout_mod: int) -> np.ndarray:
    """Deterministic train/holdout split on the multiplicative id hash
    (the same pure-arithmetic split ops/sampling.py uses) — every task
    decides membership locally, reproducible at any cluster size."""
    with np.errstate(over="ignore"):
        h = (ids.astype(np.uint64) * _KNUTH) % np.uint64(2**32)
    return (h % np.uint64(holdout_mod)) != 0


def linear_probe(sf_dir: str, l2: float = 1e-3, num_classes: int = 10,
                 holdout_mod: int = 5):
    """Fit + score the linear probe; returns a Dataset of
    (vec_id, label, pred_label, margin, is_holdout) where margin is the
    gap between the best and second-best class score (a per-row
    confidence the curation threshold consumes).

    The fit EXCLUDES the deterministic ~1/``holdout_mod`` holdout slice
    (id-hash split), so the flagged rows are genuine held-out
    evaluations — the accuracy a curation pipeline should trust is the
    one over ``is_holdout`` rows. (On THIS repo's synthetic labels the
    held-out accuracy is near chance — the labels are memorizable but
    carry little transferable signal; what the tests pin is the
    machinery: distributed fit ≡ single-machine closed form, split
    integrity, and train-side fit quality.)"""
    ensure_portable()
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def moment_partials(t: pa.Table) -> pa.Table:
        if not len(t):
            return _PART_SCHEMA.empty_table()
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(_is_train(ids, holdout_mod)))
        if not len(t):
            return _PART_SCHEMA.empty_table()
        A = _augment(_emb_matrix(t))
        y = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        Y = np.zeros((len(y), num_classes))
        Y[np.arange(len(y)), y] = 1.0
        return pa.table(
            {
                "shard": pa.array([int(t["vec_id"][0].as_py()) % 64], pa.int64()),
                "cnt": pa.array([len(A)], pa.int64()),
                "ata": pa.array([(A.T @ A).ravel().tolist()], pa.list_(pa.float64())),
                "aty": pa.array([(A.T @ Y).ravel().tolist()], pa.list_(pa.float64())),
            }
        )

    def fold(df: "pd.DataFrame") -> pa.Table:
        cnt = int(df["cnt"].sum())
        ata = np.sum(np.stack([np.asarray(x, dtype=np.float64) for x in df["ata"]]), axis=0)
        aty = np.sum(np.stack([np.asarray(x, dtype=np.float64) for x in df["aty"]]), axis=0)
        return pa.table(
            {
                "shard": pa.array([int(df["shard"].iloc[0])], pa.int64()),
                "cnt": pa.array([cnt], pa.int64()),
                "ata": pa.array([ata.tolist()], pa.list_(pa.float64())),
                "aty": pa.array([aty.tolist()], pa.list_(pa.float64())),
            }
        )

    parts = (
        ds.map_batches(moment_partials, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(fold, batch_format="pandas")
        .map_batches(
            lambda t: t.select(_PART_SCHEMA.names)
            if "ata" in t.column_names else _PART_SCHEMA.empty_table(),
            batch_format="pyarrow",
        )
        .take_all()
    )
    ata = np.sum([np.asarray(r["ata"], dtype=np.float64) for r in parts], axis=0)
    aty = np.sum([np.asarray(r["aty"], dtype=np.float64) for r in parts], axis=0)
    d1 = int(round(np.sqrt(len(ata))))
    ata = ata.reshape(d1, d1)
    aty = aty.reshape(d1, num_classes)
    W = np.linalg.solve(ata + l2 * np.eye(d1), aty)
    wref = ray.put(W)

    def score(t: pa.Table) -> pa.Table:
        if not len(t):
            return _OUT_SCHEMA.empty_table()
        W_l = ray.get(wref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        S = _augment(_emb_matrix(t)) @ W_l
        order = np.argsort(S, axis=1)
        pred = order[:, -1]
        margin = S[np.arange(len(S)), pred] - S[np.arange(len(S)), order[:, -2]]
        return pa.table(
            {
                "vec_id": t["vec_id"].cast(pa.int64()),
                "label": t["label"].cast(pa.int64()),
                "pred_label": pa.array(pred.astype(np.int64), pa.int64()),
                "margin": pa.array(margin.astype(np.float64), pa.float64()),
                "is_holdout": pa.array(~_is_train(ids, holdout_mod), pa.bool_()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
