"""Distributed near-dup verification: recall/precision oracles.

VERDICT r1 #1-#3: the LSH candidate paths must verify through
distributed joins (no driver materialization / corpus broadcast), and
the approximate paths need recall assertions against their exact
counterparts.
"""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _pairs_set(res):
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    return set(zip(df["id_a"].tolist(), df["id_b"].tolist()))


def _pairs_map(res, col):
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    return {(a, b): v for a, b, v in zip(df["id_a"], df["id_b"], df[col])}


def test_minhash_recall_precision_vs_exact_ngram():
    """minhash_lsh_pairs ⊆ ngram_jaccard_pairs with IDENTICAL jaccard
    values (precision 1: verification is exact), and recall ≥ the LSH
    band bound in practice."""
    from ton_etl_ray.ops import dedup

    mh = _pairs_map(dedup.minhash_lsh_pairs(SF, threshold=0.5), "jaccard")
    ex = _pairs_map(dedup.ngram_jaccard_pairs(SF, threshold=0.5), "jaccard")
    assert set(mh) <= set(ex)                      # precision == 1
    for k, v in mh.items():
        assert v == ex[k]                          # exact same verified value
    if ex:
        recall = len(set(mh) & set(ex)) / len(ex)
        assert recall >= 0.6                       # 1-(1-j^4)^16 at j=0.5 ≈ 0.64

    # high-similarity pairs must essentially never be missed
    hi = {k for k, v in ex.items() if v >= 0.8}
    assert hi <= set(mh)


def test_dedup_groups_lsh_edges_match_exact_edges():
    """The word-level LSH edge path at 0.95 reproduces the exact
    word-Jaccard edge set (band recall ≈ 1-2e-12 at j≥0.95)."""
    from ton_etl_ray.ops import dedup

    lsh = _pairs_set(dedup.minhash_lsh_pairs(SF, threshold=0.95, ngram=1))
    exact = _pairs_set(dedup.word_jaccard_pairs(SF, threshold=0.95))
    assert lsh == exact


def test_lsh_embedding_pairs_subset_of_exact():
    """LSH embedding pairs ⊆ exact cosine pairs, with matching sims
    (distributed join verify is exact); recall is the plane-band recall."""
    from ton_etl_ray.ops import ann

    lsh = _pairs_map(ann.lsh_embedding_pairs(SF, threshold=0.4), "sim")
    ex = _pairs_map(ann.embedding_dedup_pairs(SF, threshold=0.4), "sim")
    assert set(lsh) <= set(ex)
    for k, v in lsh.items():
        assert abs(v - ex[k]) < 1e-9
    if len(ex) >= 5:
        assert len(lsh) / len(ex) >= 0.3           # approximate by design


def test_knn_ivf_subset_and_ordering():
    from ton_etl_ray.ops import ann

    ivf = ann.knn_ivf(SF)
    exact = ann.knn_cosine(SF)
    sims = ivf["sim"].to_pylist()
    assert sims == sorted(sims, reverse=True)
    assert len(sims) == 10
    # IVF sims can never exceed the exact best
    assert max(sims) <= max(exact["sim"].to_pylist()) + 1e-9
    # the probed clusters must cover at least part of the true top-k
    assert len(set(ivf["vec_id"].to_pylist()) & set(exact["vec_id"].to_pylist())) >= 1


def test_no_driver_corpus_broadcast_in_verify():
    """Regression guard: the near-dup verify paths must not call
    to_pandas on the candidate Dataset or read the full corpus on the
    driver (grep-level check on the source)."""
    import inspect

    from ton_etl_ray.ops import ann, dedup

    src = inspect.getsource(dedup.minhash_lsh_pairs) + inspect.getsource(dedup._verify_pairs)
    assert "to_pandas" not in src
    assert "pq.read_table" not in src
    src2 = inspect.getsource(ann.lsh_embedding_pairs) + inspect.getsource(ann._verify_cosine_pairs)
    assert "to_pandas" not in src2
    assert "pq.read_table" not in src2


def test_mass_duplication_bounded_candidates(tmp_path):
    """VERDICT r2 #1: a corpus with 10^4 copies of one doc must complete
    with BOUNDED candidate rows (star edges, O(n) per hot bucket), and
    grouping must still collapse the copies into one component."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ton_etl_ray.ops import dedup

    n_dup = 10_000
    texts = (["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * n_dup
             + ["one entirely different document about graph label propagation",
                "another unrelated text mentioning arrow record batches"])
    docs = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["web"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))

    res = dedup.minhash_lsh_pairs(str(d), threshold=0.9, hot_bucket_cap=64)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if isinstance(df, pa.Table):
        df = df.to_pandas()
    # star edges: n-1 verified pairs (all jaccard 1.0), not n(n-1)/2≈5e7
    assert len(df) == n_dup - 1
    assert set(df["id_a"]) == {0} and set(df["id_b"]) == set(range(1, n_dup))
    assert (df["jaccard"] == 1.0).all()

    groups = dedup.dedup_groups(str(d), threshold=0.9).to_pandas()
    g = dict(zip(groups["doc_id"], groups["group_id"]))
    assert all(g[i] == 0 for i in range(n_dup))          # one component
    assert g[n_dup] == n_dup and g[n_dup + 1] == n_dup + 1  # singletons

    kept = dedup.dedup_filter_corpus(str(d), threshold=0.9).to_pandas()
    assert sorted(kept["doc_id"]) == [0, n_dup, n_dup + 1]


def test_connected_components_chain_and_forest():
    """Min-label propagation must traverse multi-hop chains (diameter >
    1) and keep disjoint components separate."""
    import pyarrow as pa
    import ray.data as rd

    from ton_etl_ray.ops.graph import connected_components

    # chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
    edges = pa.table({
        "id_a": pa.array([1, 2, 3, 4, 10, 11, 10, 20], pa.int64()),
        "id_b": pa.array([2, 3, 4, 5, 11, 12, 12, 21], pa.int64()),
    })
    out = connected_components(rd.from_arrow(edges)).to_pandas()
    lab = dict(zip(out["node"], out["label"]))
    assert lab == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    # the distributed loop (forced by a zero driver threshold) must
    # produce the identical labeling
    out2 = connected_components(
        rd.from_arrow(edges), driver_threshold=0
    ).to_pandas()
    assert dict(zip(out2["node"], out2["label"])) == lab


def test_connected_components_paths_agree_random_graph():
    """Driver union-find fast path == distributed min-label loop on a
    random sparse graph (self-loops, duplicate and reversed edges)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ton_etl_ray.ops.graph import connected_components

    rng = np.random.default_rng(7)
    a = rng.integers(0, 400, size=600)
    b = rng.integers(0, 400, size=600)
    edges = pa.table({"id_a": pa.array(a, pa.int64()),
                      "id_b": pa.array(b, pa.int64())})
    fast = connected_components(rd.from_arrow(edges)).to_pandas()
    slow = connected_components(
        rd.from_arrow(edges), driver_threshold=0
    ).to_pandas()
    f = dict(zip(fast["node"], fast["label"]))
    s = dict(zip(slow["node"], slow["label"]))
    assert f == s and len(f) > 0


def test_simhash_pairs_exact_vs_bruteforce(tmp_path):
    """simhash_pairs has recall 1 GIVEN the signatures (pigeonhole over
    max_hamming+1 bands) and exact popcount verify — must equal a
    brute-force Hamming scan of the same signature set."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ton_etl_ray.ops import dedup

    rng = np.random.default_rng(9)
    base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    texts = []
    for i in range(120):
        words = base.split(" ")
        # light perturbations create a spectrum of Hamming distances
        for _ in range(rng.integers(0, 4)):
            words[rng.integers(0, len(words))] = f"w{rng.integers(0, 30)}"
        texts.append(" ".join(words))
    texts += [f"completely unrelated document number {i} about arrow batches {i*i}"
              for i in range(40)]
    docs = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))

    got = dedup.simhash_pairs(str(d), max_hamming=3)
    df = got.to_pandas() if hasattr(got, "to_pandas") else got
    if isinstance(df, pa.Table):
        df = df.to_pandas()
    got_pairs = {(a, b): h for a, b, h in
                 zip(df["id_a"], df["id_b"], df["hamming"])}

    sigs = dedup.simhash_signatures(str(d)).to_pandas().sort_values("doc_id")
    s = sigs["simhash"].to_numpy().astype(np.int64).view(np.uint64)
    ids = sigs["doc_id"].to_numpy()
    want = {}
    for i in range(len(ids)):
        x = np.ascontiguousarray(s[i] ^ s[i + 1:])
        ham = np.unpackbits(x.view(np.uint8)).reshape(-1, 64).sum(axis=1)
        for j in np.nonzero(ham <= 3)[0]:
            want[(int(ids[i]), int(ids[i + 1 + j]))] = int(ham[j])
    assert got_pairs == want and len(want) > 0


def test_kmeans_clusters_properties():
    """Iterative spherical k-means: full coverage, per-cluster inertia
    consistency, and convergence (inertia non-increasing over reruns
    with more iterations)."""
    import duckdb

    from ton_etl_ray.ops import ann

    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'"
    ).fetchone()[0]
    one = ann.kmeans_clusters(SF, k=4, iters=1)
    five = ann.kmeans_clusters(SF, k=4, iters=5)
    for out in (one, five):
        assert out["size"].to_pylist() and sum(out["size"].to_pylist()) == n_vecs
        assert all(v >= 0 for v in out["inertia"].to_pylist())
    # Lloyd iterations can only improve (allow float-noise slack)
    assert sum(five["inertia"].to_pylist()) <= sum(one["inertia"].to_pylist()) + 1e-6
    # determinism: same seed, same result
    again = ann.kmeans_clusters(SF, k=4, iters=5)
    assert again["size"].to_pylist() == five["size"].to_pylist()
    assert again["inertia"].to_pylist() == five["inertia"].to_pylist()


def test_pair_ops_return_dataset_on_empty(tmp_path):
    """simhash_pairs / minhash_lsh_pairs must return a Ray Dataset on the
    zero-candidate path too (ADVICE r3: a pa.Table on just the empty
    path crashes callers that chain Dataset ops like count/map_batches)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ton_etl_ray.ops import dedup

    docs = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array(
            [f"totally distinct document {i} " + " ".join(
                f"tok{i}x{j}" for j in range(12)) for i in range(8)],
            pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))

    for op in (lambda: dedup.simhash_pairs(str(d), max_hamming=0),
               lambda: dedup.minhash_lsh_pairs(str(d), threshold=0.99)):
        out = op()
        # Dataset contract: chaining Dataset ops must work
        assert hasattr(out, "map_batches") and hasattr(out, "count")
        assert out.count() == 0


def test_polars_hash_pin_guard(monkeypatch):
    """The pinned-vector guard passes on this polars build and fails
    loudly when the vectors diverge (simulating a version mismatch)."""
    import pytest

    from ton_etl_ray.core import partition as P

    monkeypatch.setattr(P, "_hash_checked", False)
    P.assert_polars_hash_stable()  # real vectors: must pass

    monkeypatch.setattr(P, "_hash_checked", False)
    monkeypatch.setattr(P, "_HASH_PIN", (("tonray-hash-probe", 7331, 1),))
    with pytest.raises(RuntimeError, match="not stable across polars"):
        P.assert_polars_hash_stable()
