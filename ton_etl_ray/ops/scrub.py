"""Text scrubbing / normalization / chunking — the per-document rewrite
stages of a web-scale training-data pipeline (PII redaction, whitespace
and case normalization, fixed-window sequence chunking).

The per-document operators (redact / normalize / chunk) are
ZERO-SHUFFLE: each document is one input row and every output row
derives from exactly one input row, so they run as embarrassingly-
parallel ``map_batches`` / flat-map stages — at 100 TB they scale
linearly with no exchange, the same streaming shape as the reference's
per-message parser fan-out (parser/main.py:85-143), re-expressed over
Arrow batches. ``pack_sequences`` is the one cross-document member:
exactly ONE coarse groupby shuffle on a bounded (source, doc-shard)
key.

Every kernel is ASCII-exact against its DuckDB oracle: Arrow RE2
(`replace_substring_regex` / `count_substring_regex`) and DuckDB RE2
(`regexp_replace` / `regexp_extract_all`) share regex semantics, so
clean text, counts and chunk contents hash-match bit-for-bit.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .._pickle import ensure_portable
from ._util import read_table

#: redaction patterns, applied IN ORDER (the oracle nests its
#: regexp_replace calls in the same order); RE2-safe (no backrefs)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("n_email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("n_ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("n_num", r"\b\d{9,}\b", "<NUM>"),
]


def redact_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Apply the PII pattern cascade to one Arrow batch: per-category
    match counts (taken on the intermediate string the pattern actually
    ran against, exactly like the nested-oracle's
    ``len(regexp_extract_all(...))``) and the fully redacted text."""
    cur = t[col]
    cols: dict[str, pa.Array | pa.ChunkedArray] = {"doc_id": t["doc_id"]}
    for name, pat, token in PII_PATTERNS:
        cols[name] = pc.count_substring_regex(cur, pattern=pat).cast(pa.int64())
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=token)
    cols["clean_text"] = cur
    return pa.table(cols)


def pii_redact(sf_dir: str, *, with_synthetic_footer: bool = True):
    """Regex PII scrubbing over ``documents``: emails, phone numbers,
    IPv4 addresses and long account-style numbers are replaced by typed
    tokens, with per-category redaction counts.

    The synthetic corpus is digit-free word salad, so by default a
    deterministic doc_id-derived "contact footer" is appended first
    (same expression in the SQL oracle) — the redactor then has real
    work to do on every row and the oracle checks actual replacements,
    not a no-op pass-through.
    """
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        if with_synthetic_footer:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            footer = [
                f" contact user{i}@mail.example.com call 555-010-{i % 10000:04d}"
                f" from 10.0.{i % 256}.{i % 100} acct {9000000000 + i}"
                for i in ids
            ]
            dirty = pc.binary_join_element_wise(t["text"], pa.array(footer, pa.string()), "")
            t = pa.table({"doc_id": t["doc_id"], "text": dirty})
        return redact_batch(t)

    return ds.map_batches(fn, batch_format="pyarrow")


def normalize_text(sf_dir: str):
    """Canonical text normalization: lowercase, collapse all whitespace
    runs to single spaces, trim. The first stage of every exact-dedup /
    fingerprint path (a normalized corpus is what hash-based dedup
    should key on)."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t["text"])
        s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_text": s,
                "n_chars_norm": pc.utf8_length(s).cast(pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_documents(sf_dir: str, words_per_chunk: int = 64):
    """Fixed-window training-sequence chunking: split every document on
    whitespace and emit one row per consecutive ``words_per_chunk``-word
    window — the document → training-sample explosion step (flat-map
    shape: 1 input row → ceil(n_words/W) output rows).

    Chunking is per-document, so this is ONE ``map_batches`` stage with
    no shuffle; the explode/regroup runs vectorized inside polars per
    batch. At 100 TB the output is written partitioned straight from the
    map tasks — no stage ever sees more than a batch of documents.
    """
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(t)
            .with_columns(pl.col("text").str.extract_all(r"\S+").alias("_w"))
            .drop("text")
            .explode("_w")
            .filter(pl.col("_w").is_not_null())
            .with_columns(
                (pl.int_range(pl.len()).over("doc_id") // words_per_chunk).alias(
                    "chunk_id"
                )
            )
        )
        out = (
            df.group_by("doc_id", "chunk_id", maintain_order=True)
            .agg(
                pl.col("_w").str.join(" ").alias("chunk_text"),
                pl.len().cast(pl.Int64).alias("n_words"),
            )
        )
        return out.to_arrow().replace_schema_metadata(None)

    return ds.map_batches(fn, batch_format="pyarrow")


def pack_sequences(sf_dir: str | None = None, words_per_seq: int = 64,
                   docs_per_shard: int = 200, *, ds=None):
    """Cross-document sequence packing: per (source, doc_id shard),
    concatenate the documents' word streams in doc_id order and emit
    consecutive fixed-``words_per_seq``-word training sequences
    (sequences DO cross document boundaries — the production packing
    step that `chunk_documents`' per-doc windows approximate).

    The pack group is (source, doc_id // docs_per_shard), NOT the whole
    source: a source can be an unbounded fraction of a 100 TB corpus,
    but a shard is a fixed doc-count slice, so every ``map_groups``
    group is bounded and the one groupby shuffle stays balanced
    regardless of source skew. Sequence boundaries depend only on the
    shard's own content — deterministic at any cluster size and exactly
    reproducible in SQL (window position // W).

    Output: (source, shard, seq_id, seq_text, n_words); the final
    partial sequence of each shard is kept.

    Pass ``ds`` (any Dataset with doc_id/source/text columns — e.g. the
    survivors of a curation gate) to pack something other than the raw
    documents table.
    """
    ensure_portable()
    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])
    else:
        ds = ds.select_columns(["doc_id", "source", "text"])

    def tag(t: pa.Table) -> pa.Table:
        shard = pc.divide(t["doc_id"], docs_per_shard)
        # one composite group key → a single coarse groupby shuffle
        key = pc.binary_join_element_wise(
            t["source"], pc.cast(shard, pa.string()), "#"
        )
        return t.append_column("shard", shard.cast(pa.int64())).append_column(
            "_gkey", key
        )

    out_schema = pa.schema(
        [
            ("source", pa.string()),
            ("shard", pa.int64()),
            ("seq_id", pa.int64()),
            ("seq_text", pa.string()),
            ("n_words", pa.int64()),
        ]
    )

    def pack(df: "pd.DataFrame") -> pa.Table:
        import polars as pl

        if not len(df):
            return out_schema.empty_table()
        g = (
            pl.from_pandas(df[["doc_id", "source", "shard", "text"]])
            .sort("doc_id")
            .with_columns(pl.col("text").str.extract_all(r"\S+").alias("_w"))
            .drop("text")
            .explode("_w")
            .filter(pl.col("_w").is_not_null())
        )
        if not len(g):
            return out_schema.empty_table()
        g = g.with_columns(
            (pl.int_range(pl.len()) // words_per_seq).alias("seq_id")
        )
        out = (
            g.group_by("seq_id", maintain_order=True)
            .agg(
                pl.col("source").first(),
                pl.col("shard").first().cast(pl.Int64),
                pl.col("_w").str.join(" ").alias("seq_text"),
                pl.len().cast(pl.Int64).alias("n_words"),
            )
            .select("source", "shard", "seq_id", "seq_text", "n_words")
        )
        return out.to_arrow().replace_schema_metadata(None).cast(out_schema)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_gkey")
        .map_groups(pack, batch_format="pandas")
        .map_batches(
            lambda t: t.select(out_schema.names)
            if "seq_id" in t.column_names
            else out_schema.empty_table(),
            batch_format="pyarrow",
        )
    )
