"""Scrub-family tests: PII redaction cascade, normalization, chunking —
all checked against DuckDB recomputation (the same expressions as the
driver oracles) plus targeted edge cases."""

import duckdb
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_redact_batch_cascade_counts_and_text():
    from ton_etl_ray.ops.scrub import redact_batch

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "mail a@b.io and c.d+x@e-f.org then call 555-123-4567",
                "host 192.168.0.1 acct 123456789012 end",
                "no pii here",
            ],
        }
    )
    out = redact_batch(t).to_pydict()
    assert out["n_email"] == [2, 0, 0]
    assert out["n_phone"] == [1, 0, 0]
    assert out["n_ip"] == [0, 1, 0]
    assert out["n_num"] == [0, 1, 0]
    assert out["clean_text"][0] == "mail <EMAIL> and <EMAIL> then call <PHONE>"
    assert out["clean_text"][1] == "host <IP> acct <NUM> end"
    assert out["clean_text"][2] == "no pii here"


def test_pii_redact_matches_duckdb(ray_session):
    from ton_etl_ray.ops.scrub import pii_redact

    got = pii_redact(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        rf"""
        WITH dirty AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@mail.example.com call 555-010-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST(doc_id % 100 AS VARCHAR)
                      || ' acct ' || CAST(9000000000 + doc_id AS VARCHAR) AS text
          FROM '{SF}/documents.parquet'
        ), s1 AS (
          SELECT doc_id,
                 len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS n_email,
                 regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g') AS t
          FROM dirty
        ), s2 AS (
          SELECT doc_id, n_email,
                 len(regexp_extract_all(t, '\b\d{{3}}[-.]\d{{3}}[-.]\d{{4}}\b')) AS n_phone,
                 regexp_replace(t, '\b\d{{3}}[-.]\d{{3}}[-.]\d{{4}}\b', '<PHONE>', 'g') AS t
          FROM s1
        ), s3 AS (
          SELECT doc_id, n_email, n_phone,
                 len(regexp_extract_all(t, '\b(?:\d{{1,3}}\.){{3}}\d{{1,3}}\b')) AS n_ip,
                 regexp_replace(t, '\b(?:\d{{1,3}}\.){{3}}\d{{1,3}}\b', '<IP>', 'g') AS t
          FROM s2
        )
        SELECT doc_id, n_email, n_phone, n_ip,
               len(regexp_extract_all(t, '\b\d{{9,}}\b')) AS n_num,
               regexp_replace(t, '\b\d{{9,}}\b', '<NUM>', 'g') AS clean_text
        FROM s3 ORDER BY doc_id
        """
    ).df()
    assert len(got) == len(want)
    for c in ("n_email", "n_phone", "n_ip", "n_num", "clean_text"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # every row actually got redacted (footer guarantees work to do)
    assert (got["n_email"] >= 1).all() and (got["n_phone"] >= 1).all()


def test_normalize_text_matches_duckdb(ray_session):
    from ton_etl_ray.ops.scrub import normalize_text

    got = normalize_text(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        rf"""
        SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text
        FROM '{SF}/documents.parquet' ORDER BY doc_id
        """
    ).df()
    assert (got["norm_text"].to_numpy() == want["norm_text"].to_numpy()).all()
    assert (got["n_chars_norm"] == got["norm_text"].str.len()).all()


def test_normalize_edge_whitespace():
    import pyarrow.compute as pc

    from ton_etl_ray.ops.scrub import normalize_text  # noqa: F401 — kernel below

    s = pa.array(["  A \t B\n\nC  ", "\t\n ", "x"])
    out = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(s), pattern=r"\s+", replacement=" ")
    )
    assert out.to_pylist() == ["a b c", "", "x"]


def test_chunk_documents_matches_duckdb(ray_session):
    from ton_etl_ray.ops.scrub import chunk_documents

    got = (
        chunk_documents(SF, words_per_chunk=10)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        rf"""
        WITH d AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
                   FROM '{SF}/documents.parquet'),
        e AS (SELECT doc_id, unnest(ws) AS w, unnest(range(len(ws))) AS pos FROM d)
        SELECT doc_id, pos // 10 AS chunk_id,
               string_agg(w, ' ' ORDER BY pos) AS chunk_text, count(*) AS n_words
        FROM e GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id
        """
    ).df()
    assert len(got) == len(want)
    for c in ("doc_id", "chunk_id", "chunk_text", "n_words"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # reassembling the chunks reproduces every document's word stream
    rejoined = got.groupby("doc_id")["chunk_text"].apply(" ".join)
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    assert (rejoined.loc[docs["doc_id"]].to_numpy() == docs["text"].to_numpy()).all()


def test_quality_and_langid_match_oracle_sql(ray_session):
    """The vectorized heuristics reproduce their driver oracles
    bit-for-bit (float columns compared EXACTLY, not approximately)."""
    import numpy as np

    import __ray_entry__ as entrymod
    from ton_etl_ray.ops.text import lang_id, quality_score

    sql = entrymod.oracle_sql()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    q = quality_score(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    oq = con.execute(sql["quality_score"] + " ORDER BY doc_id").df()
    for c in ("quality", "stop_ratio", "mean_word_len"):
        assert np.array_equal(q[c].to_numpy(), oq[c].to_numpy()), c
    l = lang_id(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ol = con.execute(sql["lang_id"] + " ORDER BY doc_id").df()
    assert (l["lang_pred"].to_numpy() == ol["lang_pred"].to_numpy()).all()


def test_pack_sequences_matches_duckdb(ray_session):
    """Cross-document packing reproduces the SQL window formulation:
    same sequences, same boundaries, sequences crossing doc boundaries
    within each (source, shard) group."""
    from ton_etl_ray.ops.scrub import pack_sequences

    got = (
        pack_sequences(SF, words_per_seq=32, docs_per_shard=100)
        .to_pandas()
        .sort_values(["source", "shard", "seq_id"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        rf"""
        WITH d AS (SELECT doc_id, source, doc_id // 100 AS shard,
                          regexp_extract_all(text, '\S+') AS ws
                   FROM '{SF}/documents.parquet'),
        e AS (SELECT doc_id, source, shard, unnest(ws) AS w,
                     unnest(range(len(ws))) AS pos FROM d),
        p AS (SELECT source, shard, w,
                row_number() OVER (PARTITION BY source, shard
                                   ORDER BY doc_id, pos) - 1 AS gpos
              FROM e)
        SELECT source, shard, gpos // 32 AS seq_id,
               string_agg(w, ' ' ORDER BY gpos) AS seq_text, count(*) AS n_words
        FROM p GROUP BY source, shard, seq_id
        ORDER BY source, shard, seq_id
        """
    ).df()
    assert len(got) == len(want) > 0
    for c in ("source", "shard", "seq_id", "seq_text", "n_words"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # every (source, shard) group: all sequences full except possibly
    # the last, and word mass is conserved vs the raw corpus
    last = got.groupby(["source", "shard"])["seq_id"].transform("max")
    assert (got.loc[got["seq_id"] < last, "n_words"] == 32).all()
    total_words = duckdb.sql(
        rf"SELECT sum(len(regexp_extract_all(text,'\S+'))) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert got["n_words"].sum() == total_words
