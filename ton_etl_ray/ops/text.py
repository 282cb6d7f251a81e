"""Text-analysis operators for training-data pipelines over ``documents``.

Stateful stages (compiled regexes, stopword tables) are actor pools:
setup in ``__init__`` once per actor, vectorized work per batch —
the reference's parser-prepare() pattern (parser/model/parser.py:52-80)
re-expressed as ``map_batches(Cls, concurrency=N)``.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .._pickle import ensure_portable
from ._util import _t, read_table


def doc_token_stats(sf_dir: str):
    """Token counting + simple quality counters, oracle-matched semantics:
    n_words = number of single-space-separated pieces (== DuckDB
    len(string_split(text,' '))), punct_count via the same regex class."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        pieces = pc.split_pattern(t["text"], pattern=" ")
        n_words = pc.list_value_length(pieces).cast(pa.int64())
        punct = pc.count_substring_regex(t["text"], pattern=r"[.!?,;:]").cast(pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": n_words,
                "n_chars": t["n_chars"],
                "punct_count": punct,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


class BpeTokenCount:
    """BPE-ish regex tokenizer count (GPT-2-style contraction/word/number/
    punct split, ASCII-simplified so Python re and DuckDB RE2 agree).
    Pattern compiled once per actor."""

    def __init__(self):
        self.pat = re.compile(BPE_PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        counts = [len(self.pat.findall(t)) for t in batch["text"]]
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "bpe_tokens": pd.array(counts, dtype="int64")}
        )


def bpe_token_count(sf_dir: str):
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(BpeTokenCount, batch_format="pandas", batch_size=4096, concurrency=2)


# tiny per-language stopword tables for the n-gram/stopword heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "that", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"},
    "es": {"el", "la", "y", "los", "de", "un", "una", "es", "por", "que"},
    "zh": set(),
}


class LangId:
    """Language-ID heuristic: stopword hit-rate + CJK codepoint share.

    Deterministic; heuristic (no oracle SQL) — the driver records the
    rows-only check for this one."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z]+")
        self.cjk = re.compile(r"[一-鿿]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for text in batch["text"]:
            if self.cjk.search(text):
                preds.append("zh")
                continue
            words = set(w.lower() for w in self.word.findall(text))
            scores = {
                lang: len(words & sw) for lang, sw in _STOPWORDS.items() if sw
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            preds.append(best if scores[best] > 0 else "en")
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": preds})


def lang_id(sf_dir: str):
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pandas", batch_size=4096, concurrency=2)


class QualityScore:
    """Quality scoring: length, punctuation ratio, stopword ratio,
    mean word length — the usual pre-training text-quality gates."""

    def __init__(self):
        self.word = re.compile(r"\w+")
        self.stop = _STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": batch["doc_id"], "len_score": [], "punct_ratio": [], "stop_ratio": [], "mean_word_len": []}
        for text in batch["text"]:
            words = self.word.findall(text)
            n = max(1, len(words))
            rows["len_score"].append(min(1.0, len(text) / 1000.0))
            rows["punct_ratio"].append(sum(c in ".!?,;:" for c in text) / max(1, len(text)))
            rows["stop_ratio"].append(sum(w.lower() in self.stop for w in words) / n)
            rows["mean_word_len"].append(sum(len(w) for w in words) / n)
        df = pd.DataFrame(rows)
        df["quality"] = (
            0.4 * df["len_score"]
            + 0.3 * (1.0 - (df["punct_ratio"] - 0.05).abs().clip(0, 1))
            + 0.3 * df["stop_ratio"].clip(0, 0.6) / 0.6
        ).round(6)
        return df[["doc_id", "quality", "stop_ratio", "mean_word_len"]]


def quality_score(sf_dir: str):
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(QualityScore, batch_format="pandas", batch_size=4096, concurrency=2)


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def _word_fingerprint(words: list[str]) -> int:
    """Polynomial rolling hash over per-word blake2b hashes (document
    fingerprinting; order-sensitive, deterministic across processes)."""
    import hashlib

    h = 0
    for w in words:
        wh = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big") % _FP_MOD
        h = (h * _FP_BASE + wh) % _FP_MOD
    return h


def doc_fingerprint(sf_dir: str):
    """Deterministic rolling-hash document fingerprint (sha256-file-naming
    analogue, reference datalake/main.py:161-164)."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        fps = [_word_fingerprint(t.split(" ")) for t in batch["text"]]
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": pd.array(fps, dtype="int64")})

    return ds.map_batches(fn, batch_format="pandas", batch_size=4096)


def dedup_docs_prefix(sf_dir: str, prefix_len: int = 40):
    """Exact dedup by content key (A1 DISTINCT-merge analogue): one winner
    (min doc_id) per 40-char text prefix. Shuffle on the content key with
    per-batch partial min as the combiner."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def key(t: pa.Table) -> pa.Table:
        prefix = pc.utf8_slice_codeunits(t["text"], 0, prefix_len)
        # per-batch partial min combiner: bounds the shuffle to ≤1 row
        # per prefix per block (skew-proof for duplicate-heavy corpora)
        import polars as pl

        part = (
            pl.DataFrame({"prefix": prefix.to_pylist(),
                          "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)})
            .group_by("prefix")
            .agg(pl.col("doc_id").min())
        )
        return pa.table({"prefix": pa.array(part["prefix"].to_list(), pa.string()),
                         "doc_id": pa.array(part["doc_id"].to_numpy(), pa.int64())})

    from ray.data.aggregate import Min

    return (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("prefix")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )


def top_tokens(sf_dir: str, k: int = 20):
    """Corpus token-frequency top-k — the canonical map-reduce over a
    text corpus (vocabulary building / stopword discovery). Per-batch
    PARTIAL counts (split → explode → value_counts inside the map task)
    bound the shuffle to (distinct-words-per-batch) rows, then one
    grouped sum + sort-limit. Ties broken by token text so the result
    is deterministic and oracle-checkable."""
    ensure_portable()
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t["text"], pattern=" "))
        vc = words.value_counts()
        return pa.table(
            {"token": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    agg = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n_occurrences"))
    )
    top = agg.sort(["n_occurrences", "token"], descending=[True, False]).limit(k)
    return top
