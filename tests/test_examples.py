"""Examples must track the library API — each runs end-to-end in a
fresh process (its own ray.init, like a user invocation) at sf0.001."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_training_corpus_example_runs():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "training_corpus.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "packed corpus:" in out.stdout
    assert "near-dup components" in out.stdout


def test_pack_sequences_over_custom_dataset(ray_session):
    """The ds= hook packs a filtered stream identically to packing the
    same rows from disk."""
    from ton_etl_ray.ops._util import read_table
    from ton_etl_ray.ops.scrub import pack_sequences

    sf = "/root/testdata/sf0.001"
    full = read_table(sf, "documents", columns=["doc_id", "source", "text"])
    sub = full.filter(lambda r: r["doc_id"] % 2 == 0)
    packed = pack_sequences(ds=sub, words_per_seq=16, docs_per_shard=50).to_pandas()
    assert len(packed) > 0
    import duckdb

    want_words = duckdb.sql(
        rf"""SELECT sum(len(regexp_extract_all(text,'\S+')))
             FROM '{sf}/documents.parquet' WHERE doc_id % 2 = 0"""
    ).fetchone()[0]
    assert packed["n_words"].sum() == want_words


def test_quickstart_example_runs():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "quickstart.py")],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]


def test_streaming_watch_example_runs():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "streaming_watch.py")],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "final state matches one-shot replay" in out.stdout


def test_message_parsers_example_runs():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "message_parsers.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "transfers:" in out.stdout
    assert "forward comments" in out.stdout
    assert "1-to-many" in out.stdout


def test_account_state_parsers_example_runs():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "account_state_parsers.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "core_prices:" in out.stdout
    assert "staking_nominators:" in out.stdout
    assert "jetton-priced listings" in out.stdout


def test_tokenize_ingest_example_runs():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "tokenize_ingest.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "lake tokens == encoder tokens" in out.stdout


def test_incremental_views_example_runs():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "incremental_views.py")],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "equal their full recomputes" in out.stdout
