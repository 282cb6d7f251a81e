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
