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
from .sampling import _doc_hash
from .ann import _emb_matrix, fold_shard_partials

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


def _is_train(ids: np.ndarray, holdout_mod: int) -> np.ndarray:
    """Deterministic train/holdout split on the SAME multiplicative id
    hash ops/sampling.py uses (imported, not re-implemented, so the
    ANSI-SQL-reproducibility property documented there keeps describing
    this split too) — every task decides membership locally,
    reproducible at any cluster size."""
    return (_doc_hash(ids) % np.uint64(holdout_mod)) != 0


def linear_probe(sf_dir: str, l2: float = 1e-3, num_classes: int = 10,
                 holdout_mod: int = 5):
    """Fit + score the linear probe; returns a Dataset of
    (vec_id, label, pred_label, margin, is_holdout) where margin is the
    gap between the best and second-best class score (a per-row
    confidence the curation threshold consumes).

    The fit EXCLUDES the deterministic ~1/``holdout_mod`` holdout slice
    (id-hash split), so the flagged rows are genuine held-out
    evaluations — the accuracy a curation pipeline should trust is the
    one over ``is_holdout`` rows. Requires ``num_classes >= 2`` and
    ``holdout_mod >= 2`` (1 would put EVERY row in the holdout).
    (On THIS repo's synthetic labels the
    held-out accuracy is near chance — the labels are memorizable but
    carry little transferable signal; what the tests pin is the
    machinery: distributed fit ≡ single-machine closed form, split
    integrity, and train-side fit quality.)"""
    ensure_portable()
    if num_classes < 2:
        raise ValueError("linear_probe: num_classes must be >= 2")
    if holdout_mod < 2:
        raise ValueError("linear_probe: holdout_mod must be >= 2 "
                         "(1 marks every row as holdout)")
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
        if len(y) and (y.min() < 0 or y.max() >= num_classes):
            # validate up front: numpy negative indexing would silently
            # one-hot a -1 sentinel into the LAST class (corrupting the
            # fit with no error), and an overflow label should be a
            # clear message, not an IndexError deep in a worker
            raise ValueError(
                f"linear_probe: labels must be in [0, {num_classes}); "
                f"got range [{y.min()}, {y.max()}]"
            )
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

    parts = fold_shard_partials(ds, moment_partials, _PART_SCHEMA)
    if not parts or sum(r["cnt"] for r in parts) == 0:
        raise ValueError(
            "linear_probe: empty training set — every row fell in the "
            f"holdout slice (holdout_mod={holdout_mod}); use holdout_mod >= 2"
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
        # argmax (lowest index wins ties) — the same convention as the
        # single-machine reference the tests compare against; argsort's
        # tie order is unspecified
        pred = S.argmax(axis=1)
        second = np.partition(S, -2, axis=1)[:, -2]
        margin = S[np.arange(len(S)), pred] - second
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
