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
    from ton_etl_ray.ops.text import LangId

    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["the cat and the dog", "der hund ist gut und", "你好世界"]})
    a, b = LangId()(docs), LangId()(docs)
    assert a["lang_pred"].tolist() == b["lang_pred"].tolist()
    assert a["lang_pred"].tolist()[0] == "en"
    assert a["lang_pred"].tolist()[1] == "de"
    assert a["lang_pred"].tolist()[2] == "zh"


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
