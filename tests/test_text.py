"""Text-analysis operator tests: determinism + oracle-matched semantics."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_doc_token_stats_matches_duckdb():
    from ton_etl_ray.ops.text import doc_token_stats

    got = doc_token_stats(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        f"""
        SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
               n_chars,
               CAST(length(text) - length(regexp_replace(text,'[.!?,;:]','','g')) AS BIGINT) AS punct_count
        FROM '{SF}/documents.parquet'
        """
    ).df().sort_values("doc_id").reset_index(drop=True)
    for c in ("n_words", "n_chars", "punct_count"):
        assert (got[c] == want[c]).all(), c


def test_lang_id_deterministic():
    import pyarrow as pa

    from ton_etl_ray.ops.text import _lang_id_frame

    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "the cat and the dog",
                "der hund ist gut und",
                "你好世界",
                # tie between de and fr stopword hits → alphabetically
                # first maximal language wins (matches the SQL oracle)
                "der die le la",
                "zzz qqq",  # zero hits → en fallback
            ],
        }
    )
    a = _lang_id_frame(docs)["lang_pred"].to_pylist()
    b = _lang_id_frame(docs)["lang_pred"].to_pylist()
    assert a == b == ["en", "de", "zh", "de", "en"]


def test_quality_score_bounds():
    from ton_etl_ray.ops.text import quality_score

    out = quality_score(SF).to_pandas()
    assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()


def test_fingerprint_order_sensitive():
    from ton_etl_ray.ops.text import _word_fingerprint

    a = _word_fingerprint(["alpha", "beta", "gamma"])
    b = _word_fingerprint(["beta", "alpha", "gamma"])
    c = _word_fingerprint(["alpha", "beta", "gamma"])
    assert a == c != b


def test_shingles_stable_across_processes():
    import subprocess
    import sys

    from ton_etl_ray.ops.dedup import _shingles

    local = sorted(_shingles("a b c d e f g"))[:3]
    code = (
        "from ton_etl_ray.ops.dedup import _shingles; "
        "print(sorted(_shingles('a b c d e f g'))[:3])"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True, cwd="/root/repo")
    assert eval(out.stdout.strip()) == local


def test_repetition_signals_matches_duckdb():
    from ton_etl_ray.ops.text import repetition_signals

    got = (
        repetition_signals(SF).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH w AS (SELECT doc_id, string_split(text,' ') AS ws
                   FROM '{SF}/documents.parquet'),
        g2 AS (SELECT doc_id, unnest([array_to_string(ws[i:i+1],' ')
                                      FOR i IN generate_series(1, len(ws)-1)]) AS g FROM w),
        top AS (SELECT doc_id, max(c) AS maxc
                FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1,2) GROUP BY 1),
        g5 AS (SELECT doc_id, unnest([array_to_string(ws[i:i+4],' ')
                                      FOR i IN generate_series(1, len(ws)-4)]) AS g FROM w),
        dup AS (SELECT doc_id, count(*) AS total, count(DISTINCT g) AS dist FROM g5 GROUP BY 1)
        SELECT w.doc_id, len(w.ws) AS n_words,
               round(CASE WHEN t.maxc IS NOT NULL AND len(w.ws) >= 2
                          THEN 2.0*t.maxc/len(w.ws) ELSE 0.0 END, 6) AS top2_frac,
               round(CASE WHEN d.total IS NOT NULL
                          THEN 1.0 - CAST(d.dist AS DOUBLE)/d.total ELSE 0.0 END, 6) AS dup5_frac
        FROM w LEFT JOIN top t USING (doc_id) LEFT JOIN dup d USING (doc_id)
        """
    ).df().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want)
    for c in ("n_words", "top2_frac", "dup5_frac"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_repetition_signals_edge_docs(tmp_path):
    """Pathological docs: pure repetition scores ~1; short docs 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ton_etl_ray.ops.text import repetition_signals

    texts = {
        0: "spam ham " * 50,          # one dominant 2-gram, all dup 5-grams
        1: "one",                     # < 2 words -> both 0
        2: "a b c d",                 # < 5 words -> dup5 0
        3: "w x y z q r s t u v",     # all unique -> dup5 0, top2 2/n
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array([s.strip() for s in texts.values()], pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = (
        repetition_signals(str(d)).to_pandas()
        .set_index("doc_id").sort_index()
    )
    # doc 0: 100 words, "spam ham" occurs 50x -> top2 = 100/100 = 1.0;
    # 96 5-gram positions, only 2 distinct
    assert out.loc[0, "top2_frac"] == 1.0
    assert out.loc[0, "dup5_frac"] == round(1 - 2 / 96, 6)
    assert out.loc[1, "top2_frac"] == 0.0 and out.loc[1, "dup5_frac"] == 0.0
    assert out.loc[2, "dup5_frac"] == 0.0
    assert out.loc[3, "dup5_frac"] == 0.0
    assert abs(out.loc[3, "top2_frac"] - 0.2) < 1e-9


def test_dedup_prefer_source_composite_key_order():
    """The composite argmin key must order exactly like the
    (source, doc_id) tuple — including the prefix-name trap
    (src1 vs src10: 0x1f separator sorts below '0')."""
    assert ("src1" + "\x1f" + "50".zfill(20)) < ("src10" + "\x1f" + "2".zfill(20))
    assert ("src1", 50) < ("src10", 2)
    # zfill(20) covers all of non-negative int64 — 10^12 and int64-max
    # doc_ids still order like the integers (the 12-wide pad inverted)
    assert ("s" + "\x1f" + str(999999999999).zfill(20)) < (
        "s" + "\x1f" + str(10**12).zfill(20)
    )
    assert ("s" + "\x1f" + str(10**12).zfill(20)) < (
        "s" + "\x1f" + str(2**63 - 1).zfill(20)
    )
    # same content key, three copies: src1 wins over src10 and src2
    import pyarrow as pa

    import duckdb

    from ton_etl_ray.ops.text import dedup_prefer_source

    sf = "/root/testdata/sf0.001"
    got = dedup_prefer_source(sf).to_pandas().sort_values("prefix").reset_index(drop=True)
    want = duckdb.sql(
        f"""
        WITH k AS (SELECT doc_id, source, substr(text,1,40) AS prefix
                   FROM '{sf}/documents.parquet'),
        r AS (SELECT prefix, doc_id, source,
                row_number() OVER (PARTITION BY prefix ORDER BY source, doc_id) rk
              FROM k)
        SELECT prefix, doc_id, source FROM r WHERE rk = 1 ORDER BY prefix
        """
    ).df()
    assert len(got) == len(want)
    for c in ("prefix", "doc_id", "source"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # the preference is exercised: at least one content key appears
    # under multiple sources in the corpus
    n_cross = duckdb.sql(
        f"""SELECT count(*) FROM (
              SELECT substr(text,1,40) FROM '{sf}/documents.parquet'
              GROUP BY 1 HAVING count(DISTINCT source) > 1)"""
    ).fetchone()[0]
    assert n_cross > 0
