"""Corpus-global statistics ops: oracle-matched semantics + scale-shape
properties (no broadcast of the vocabulary / eval set)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_tfidf_matches_duckdb():
    from ton_etl_ray.ops.corpus import tfidf_top_terms

    got = (
        tfidf_top_terms(SF, k=3).to_pandas()
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term
                     FROM '{SF}/documents.parquet'),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1,2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM '{SF}/documents.parquet'),
        scored AS (SELECT tf.doc_id, tf.term, round(tf.tf*ln(n.n/df.df),6) AS score
                   FROM tf JOIN df USING (term) CROSS JOIN n),
        ranked AS (SELECT doc_id, term, score,
                          row_number() OVER (PARTITION BY doc_id
                                             ORDER BY score DESC, term) AS rank
                   FROM scored)
        SELECT doc_id, term, rank, score FROM ranked WHERE rank <= 3
        """
    ).df().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["doc_id"] == want["doc_id"]).all()
    assert (got["term"] == want["term"]).all()
    assert (got["score"] == want["score"]).all()


def test_unigram_logppl_matches_duckdb():
    from ton_etl_ray.ops.corpus import unigram_logppl

    got = unigram_logppl(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        f"""
        WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term
                     FROM '{SF}/documents.parquet'),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1,2),
        cnt AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY 1),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM cnt)
        SELECT tf.doc_id,
               round(sum(tf.tf * -ln(cnt.cnt/tot.t))/sum(tf.tf), 4) AS logppl
        FROM tf JOIN cnt USING (term) CROSS JOIN tot GROUP BY tf.doc_id
        """
    ).df().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["logppl"] == want["logppl"]).all()
    # boilerplate (repeated common tokens) must score LOWER than rare noise
    assert (got["logppl"] > 0).all()


def test_contamination_known_overlap(tmp_path):
    from ton_etl_ray.ops.corpus import contamination_check

    # doc 0 (eval, %20==0) and doc 1 (train) share one 3-word window;
    # doc 2 shares nothing; doc 3 is an exact copy of doc 0 (train)
    texts = {
        0: "alpha beta gamma delta epsilon",
        1: "zeta alpha beta gamma eta",          # shares "alpha beta gamma"
        2: "one two three four five",
        3: "alpha beta gamma delta epsilon",     # 3 shared 3-grams
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = (
        contamination_check(str(d), n=3).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1, 3]
    assert got["n_overlap"].tolist() == [1, 3]


def test_tfidf_rank_shape():
    from ton_etl_ray.ops.corpus import tfidf_top_terms

    got = tfidf_top_terms(SF, k=5).to_pandas()
    per_doc = got.groupby("doc_id")
    assert (per_doc["rank"].max() <= 5).all()
    assert (per_doc["rank"].apply(lambda r: sorted(r.tolist()) == list(range(1, len(r) + 1)))).all()
    # scores non-increasing with rank inside each doc
    s = got.sort_values(["doc_id", "rank"])
    assert (s.groupby("doc_id")["score"].apply(lambda x: (np.diff(x.to_numpy()) <= 0).all())).all()


def test_corpus_curation_matches_duckdb():
    from ton_etl_ray.ops.corpus import corpus_curation

    got = (
        corpus_curation(SF).to_pandas()
        .sort_values("source").reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH w AS (SELECT doc_id, text, source, string_split(text,' ') AS ws
                   FROM '{SF}/documents.parquet' WHERE lang = 'en'),
        g2 AS (SELECT doc_id, unnest([array_to_string(ws[i:i+1],' ')
                                      FOR i IN generate_series(1, len(ws)-1)]) g FROM w),
        top AS (SELECT doc_id, max(c) AS maxc
                FROM (SELECT doc_id, g, count(*) c FROM g2 GROUP BY 1,2) GROUP BY 1),
        g5 AS (SELECT doc_id, unnest([array_to_string(ws[i:i+4],' ')
                                      FOR i IN generate_series(1, len(ws)-4)]) g FROM w),
        dup AS (SELECT doc_id, count(*) total, count(DISTINCT g) dist FROM g5 GROUP BY 1),
        gated AS (
            SELECT w.doc_id, w.source, len(w.ws) AS n_words,
                   CASE WHEN t.maxc IS NOT NULL AND len(w.ws) >= 2
                        THEN 2.0*t.maxc/len(w.ws) ELSE 0.0 END AS top2,
                   substr(w.text, 1, 40) AS prefix
            FROM w LEFT JOIN top t USING (doc_id) LEFT JOIN dup d USING (doc_id)
            WHERE len(w.ws) >= 20
              AND (CASE WHEN d.total IS NOT NULL
                        THEN 1.0 - CAST(d.dist AS DOUBLE)/d.total ELSE 0.0 END) <= 0.2
        ),
        kept AS (SELECT prefix, min(doc_id) AS keep_id FROM gated GROUP BY 1)
        SELECT g.source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(g.n_words) AS BIGINT) AS total_words,
               round(sum(g.top2)/count(*), 6) AS avg_top2
        FROM gated g JOIN kept k ON g.doc_id = k.keep_id GROUP BY 1
        """
    ).df().sort_values("source").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["source"] == want["source"]).all()
    for c in ("n_docs", "total_words", "avg_top2"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_corpus_curation_gates_and_dedup(tmp_path):
    """Every gate and the keep-min dedup demonstrably fire."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ton_etl_ray.ops.corpus import corpus_curation

    long_uniq = " ".join(f"w{i}" for i in range(30))
    rows = [
        # kept: en, 30 unique words
        (0, long_uniq, "en", "a"),
        # duplicate prefix of doc 0 (same first 40 chars) -> deduped away
        (1, long_uniq + " tail extra words here padding out fine", "en", "a"),
        # wrong lang -> dropped
        (2, long_uniq, "fr", "a"),
        # too short -> dropped
        (3, "tiny doc of nineteen words " + " ".join("x%d" % i for i in range(10)), "en", "a"),
        # massive repetition -> dup5 gate drops it
        (4, "spam ham " * 20, "en", "b"),
        # kept, different source
        (5, " ".join(f"q{i}" for i in range(25)), "en", "b"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1].strip() for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    d = tmp_path / "cur"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = corpus_curation(str(d)).to_pandas().set_index("source").sort_index()
    assert out.loc["a", "n_docs"] == 1        # docs 1,2,3 all excluded
    assert out.loc["a", "total_words"] == 30
    assert out.loc["b", "n_docs"] == 1        # doc 4 gated, doc 5 kept
    assert out.loc["b", "total_words"] == 25


def test_bpe_train_hand_computed(tmp_path):
    """BPE merge loop against a hand-computed tiny corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ton_etl_ray.ops.corpus import bpe_train

    # corpus: "low" x5, "lower" x2  (the classic Sennrich example shape)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["low low low low low", "lower lower"], pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = bpe_train(str(d), num_merges=4).to_pandas()
    # pair counts over {low:5, lower:2}: (l,o)=7, (o,w)=7 → tie broken
    # lexicographically: (l,o) first, then (lo,w)=7, then (low,</w>)=5
    assert list(out.loc[0, ["left", "right"]]) == ["l", "o"] and out.loc[0, "pair_count"] == 7
    assert list(out.loc[1, ["left", "right"]]) == ["lo", "w"] and out.loc[1, "pair_count"] == 7
    assert list(out.loc[2, ["left", "right"]]) == ["low", "</w>"] and out.loc[2, "pair_count"] == 5
    assert list(out.loc[3, ["left", "right"]]) == ["e", "r"] and out.loc[3, "pair_count"] == 2


def test_bpe_train_deterministic_and_monotone():
    """Merge counts never increase with rank (greedy), and two runs
    learn the identical sequence."""
    from ton_etl_ray.ops.corpus import bpe_train

    sf = "/root/testdata/sf0.001"
    a = bpe_train(sf, num_merges=12).to_pandas()
    b = bpe_train(sf, num_merges=12).to_pandas()
    assert a.equals(b)
    assert (a["pair_count"].to_numpy()[:-1] >= a["pair_count"].to_numpy()[1:]).all()
    assert (a["pair_count"] >= 2).all()


def test_dup_span_flags_planted_boilerplate(tmp_path):
    """A planted boilerplate footer shared by two docs is flagged at
    every position it occupies; a unique doc scores zero."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ton_etl_ray.ops.corpus import dup_span_flags

    boiler = "all rights reserved contact us today"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    f"alpha beta gamma delta {boiler}",
                    f"epsilon zeta eta theta {boiler}",
                    "iota kappa lam mu nu xi omicron pi",
                ],
                pa.string(),
            ),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = (
        dup_span_flags(str(d), n=5, min_count=2)
        .to_pandas().set_index("doc_id").sort_index()
    )
    # docs 1/2: 10 words → 6 5-gram positions; the boiler's 2 internal
    # 5-grams ("all..us", "rights..today") repeat across both docs
    assert out.loc[1, "n_grams"] == 6 and out.loc[1, "dup_grams"] == 2
    assert out.loc[2, "dup_grams"] == 2
    assert out.loc[3, "dup_grams"] == 0 and out.loc[3, "dup_frac"] == 0.0
    assert round(out.loc[1, "dup_frac"], 6) == round(2 / 6, 6)


def test_bpe_encode_hand_computed(tmp_path):
    """Token ids over the classic Sennrich corpus, hand-derived: the
    alphabet {e,l,o,r,w} takes ids 0-4, </w> id 5, then one id per
    merge in rank order (lo=6, low=7, low</w>=8, er=9)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ton_etl_ray.ops.corpus import bpe_encode

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["low low low low low", "lower lower"], pa.string()),
            "source": pa.array(["web", "web"], pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = bpe_encode(str(d), num_merges=4).to_pandas().sort_values("doc_id")
    # "low" → low</w> = [8]; "lower" → low, er, </w> = [7, 9, 5]
    assert list(out["tokens"].iloc[0]) == [8] * 5
    assert list(out["tokens"].iloc[1]) == [7, 9, 5, 7, 9, 5]
    assert list(out["n_tok"]) == [5, 6]
    assert list(out["source"]) == ["web", "web"]


def test_bpe_encode_roundtrip_and_invariants(tmp_path):
    """decode(encode(text)) reconstructs the space-normalized text, and
    n_tok == len(tokens) holds for every row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ton_etl_ray.ops.corpus import bpe_decode_ids, bpe_encode, bpe_train

    texts = ["the quick brown fox jumps", "the lazy dog sleeps",
             "quick quick brown dog", "fox and dog and fox"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["web"] * len(texts), pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    merges = bpe_train(str(d), num_merges=10)
    out = bpe_encode(str(d), merges=merges).to_pandas().sort_values("doc_id")
    assert (out["n_tok"] == out["tokens"].map(len)).all()

    # rebuild the deterministic vocab exactly as bpe_encode defines it
    alphabet = sorted({c for s in texts for c in s if c != " "})
    vocab = {c: i for i, c in enumerate(alphabet)}
    vocab["</w>"] = len(vocab)
    md = merges.to_pandas()
    for k, (l, r) in enumerate(zip(md["left"], md["right"])):
        vocab[l + r] = len(alphabet) + 1 + k
    for txt, ids in zip(texts, out["tokens"]):
        assert bpe_decode_ids(ids, vocab) == " ".join(txt.split())


def test_bpe_encode_deterministic_at_sf():
    """Two full runs over the real documents table agree exactly."""
    from ton_etl_ray.ops.corpus import bpe_encode, bpe_train

    merges = bpe_train(SF, num_merges=20)
    a = bpe_encode(SF, merges=merges).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = bpe_encode(SF, merges=merges).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a["tokens"].map(list).equals(b["tokens"].map(list))
    assert (a["n_tok"] > 0).all()
