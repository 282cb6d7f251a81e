"""Flagship pipeline wiring: testdata documents → CDC change log → lake.

``flagship`` derives a deterministic change log from a scale-factor
directory's ``documents`` table (tokens are seeded-hash-derived from the
doc ids), replays it through the full CDC engine, and returns the
committed lake as a Ray Dataset — the miniature of the 10^10-event
production replay (SURVEY.md §7.1).
"""

from __future__ import annotations

import contextlib
import glob
import hashlib
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .cdc.replay import read_lake, replay
from .gen import TS_BASE_MS, TS_STEP_MS, VOCAB


def docs_to_change_log(sf_dir: str, out_dir: str, *, versions: int = 3, seed: int = 13,
                       num_shards: int = 4) -> list[str]:
    """Deterministic change log over the documents table's doc ids.

    Per doc: versions 0..k-1 as create/update at increasing lsn; every
    10th doc gets a final tombstone (delete) — so the replayed lake must
    drop exactly those keys."""
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"])
    n = docs.num_rows
    doc_ids = np.array([f"doc-{int(d):09d}" for d in docs["doc_id"].to_numpy()])
    sources = docs["source"].to_pylist()

    events = []
    for v in range(versions):
        # n_tok is md5-derived from (doc_id, version) so the FINAL state
        # is SQL-expressible: DuckDB recomputes the same value with
        # 8 + CAST('0x' || substr(md5(did || ':' || v), 1, 8) AS BIGINT) % 56
        # — this is what gives cdc_replay a full value-hash oracle
        lengths = np.array(
            [8 + int(hashlib.md5(f"{d}:{v}".encode()).hexdigest()[:8], 16) % 56
             for d in doc_ids],
            dtype=np.int64,
        )
        # token VALUES are md5-seeded LCG per (doc, version): token_i =
        # (seed + i*2654435761) mod 2^32 mod VOCAB — exact 64-bit integer
        # arithmetic DuckDB reproduces with unnest(range(0, n_tok)), so
        # token-level views (lake_token_histogram, incremental_histogram)
        # get full value-hash oracles too, not just n_tok-level ones
        seeds = np.array(
            [int(hashlib.md5(f"{d}:{v}:tok".encode()).hexdigest()[:8], 16)
             for d in doc_ids],
            dtype=np.uint64,
        )
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        doc_idx = np.repeat(np.arange(n), lengths)
        i_local = (np.arange(int(offsets[-1])) - offsets[doc_idx]).astype(np.uint64)
        flat = (
            (seeds[doc_idx] + i_local * np.uint64(2654435761))
            % np.uint64(2**32) % np.uint64(VOCAB)
        ).astype(np.int32)
        tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int64()).cast(pa.int32()), pa.array(flat))
        lsn = np.arange(v * n, (v + 1) * n, dtype=np.int64)
        events.append(
            pa.table(
                {
                    "lsn": pa.array(lsn),
                    "op": pa.array(["c" if v == 0 else "u"] * n, pa.string()),
                    "doc_id": pa.array(doc_ids, pa.string()),
                    "tokens": tokens,
                    "n_tok": pa.array(lengths, pa.int32()),
                    "source": pa.array(sources, pa.string()),
                    "ts_ms": pa.array(TS_BASE_MS + lsn * TS_STEP_MS, pa.int64()),
                }
            )
        )
    # tombstones for every 10th doc at the highest lsns
    dead = doc_ids[::10]
    lsn = np.arange(versions * n, versions * n + len(dead), dtype=np.int64)
    events.append(
        pa.table(
            {
                "lsn": pa.array(lsn),
                "op": pa.array(["d"] * len(dead), pa.string()),
                "doc_id": pa.array(dead, pa.string()),
                "tokens": pa.nulls(len(dead), pa.list_(pa.int32())),
                "n_tok": pa.nulls(len(dead), pa.int32()),
                "source": pa.nulls(len(dead), pa.string()),
                "ts_ms": pa.array(TS_BASE_MS + lsn * TS_STEP_MS, pa.int64()),
            }
        )
    )
    log = pa.concat_tables(events)
    os.makedirs(out_dir, exist_ok=True)
    per = log.num_rows // num_shards + 1
    paths = []
    for k in range(num_shards):
        shard = log.slice(k * per, per)
        if shard.num_rows == 0:
            break
        p = os.path.join(out_dir, f"shard-{k:05d}.parquet")
        pq.write_table(shard, p)
        paths.append(p)
    return paths


# bump when a cached artifact's FORMAT changes (change-log schema, lake
# layout) so stale /tmp caches rebuild instead of feeding old bytes
_CACHE_VER = "r5"


def _tag(sf_dir: str) -> str:
    """Cache DIRECTORY key: the source path only — one cache dir per
    sf_dir forever, rebuilt IN PLACE when the content fingerprint in the
    marker goes stale (``_fingerprint``). Keying the directory itself on
    content would orphan a multi-GB tree on every testdata regeneration."""
    return hashlib.sha256(sf_dir.encode()).hexdigest()[:12]


def _fingerprint(sf_dir: str, table: str = "documents") -> str:
    """Marker content: format version + CONTENT fingerprint of the
    SOURCE table the artifact is derived from — regenerating the
    testdata (new mtime/size) must invalidate every artifact derived
    from it, or the cached change log silently serves rows that no
    longer match the oracle's parquet. Callers must name the table they
    actually read (change log/lakes: documents; message table: events)."""
    try:
        st = os.stat(os.path.join(sf_dir, f"{table}.parquet"))
        sig = f"{table}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        sig = f"{table}:nosrc"
    return f"{_CACHE_VER}:{sig}"


def _cache_valid(marker: str, sf_dir: str, table: str = "documents") -> bool:
    try:
        with open(marker) as f:
            return f.read() == _fingerprint(sf_dir, table)
    except OSError:
        return False


def _swap_in(build: str, base: str) -> None:
    """Promote a finished build dir over the cache path via two renames
    (never an in-place rmtree of a tree another process may be reading:
    a reader holding open files on the OLD tree keeps them; only the
    window between a lazy Dataset capturing old paths and executing its
    read remains, vs. the whole build duration before)."""
    old = f"{base}.old.{os.getpid()}.{time.monotonic_ns()}"
    if os.path.exists(base):
        os.rename(base, old)
    os.rename(build, base)
    shutil.rmtree(old, ignore_errors=True)


@contextlib.contextmanager
def _build_lock(base: str, timeout: float = 3600.0, stale_sec: float = 7200.0):
    """Single-builder guard for a /tmp cache dir: two processes that both
    see a missing marker (e.g. pytest + bench) must not race rmtree
    against each other's half-built artifact. mkdir is the atomic
    acquire. Reclaim targets only locks whose holder is provably DEAD,
    or whose pid was never readable AND the lock has aged past
    ``stale_sec`` (a holder that crashed between mkdir and the pid
    write) — a live builder is NEVER seized, however long it runs
    (seizing a live holder would put two builders in the critical
    section, the exact race this lock exists to prevent). Reclaim is
    itself atomic — ``os.rename`` to a waiter-unique name, then delete —
    so two waiters can never both reclaim. Release removes the lock only
    if this process still owns it (per the recorded pid)."""
    lock = base + ".lock"
    me = str(os.getpid())
    deadline = time.monotonic() + timeout
    while True:
        try:
            os.mkdir(lock)
            with open(os.path.join(lock, "pid"), "w") as f:
                f.write(me)
            break
        except FileExistsError:
            pid = None
            try:
                pid = int(open(os.path.join(lock, "pid")).read())
                os.kill(pid, 0)
                alive = True
            except ProcessLookupError:
                alive = False
            except (OSError, ValueError):
                alive = True  # holder mid-write or unreadable: assume live
            try:
                age = time.time() - os.path.getmtime(lock)
            except OSError:
                continue  # lock vanished between checks — retry acquire
            if not alive or (pid is None and age > stale_sec):
                grave = f"{lock}.stale.{os.getpid()}.{time.monotonic_ns()}"
                try:
                    os.rename(lock, grave)  # atomic: one waiter wins
                except OSError:
                    continue  # another waiter reclaimed first — re-loop
                shutil.rmtree(grave, ignore_errors=True)
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"cache build lock {lock} held by "
                    f"{'pid ' + str(pid) if pid is not None else 'an unreadable holder'} "
                    f"for {age:.0f}s (> timeout {timeout:.0f}s)"
                )
            time.sleep(0.2)
    try:
        yield
    finally:
        # release ONLY if still the owner: a (hypothetical) reclaimer must
        # not have its fresh lock deleted by the previous holder's exit
        try:
            if open(os.path.join(lock, "pid")).read() == me:
                shutil.rmtree(lock, ignore_errors=True)
        except OSError:
            pass


def ensure_flagship_log(sf_dir: str) -> str:
    """Cached deterministic change log for ``sf_dir`` (a pure function
    of the documents table, so one build serves every pipeline/query in
    a run). bench.py calls this UNTIMED so the timed region measures the
    engine, not the synthetic log generation (VERDICT r3 Wrong #5)."""
    chg = f"/tmp/tonray_chg_{_tag(sf_dir)}"
    marker = os.path.join(chg, "_DONE")
    if not _cache_valid(marker, sf_dir):
        with _build_lock(chg):
            if not _cache_valid(marker, sf_dir):  # built while waiting?
                build = f"{chg}.build.{os.getpid()}"
                shutil.rmtree(build, ignore_errors=True)
                docs_to_change_log(sf_dir, build)
                with open(os.path.join(build, "_DONE"), "w") as f:
                    f.write(_fingerprint(sf_dir))
                _swap_in(build, chg)
    return chg


def ensure_flagship_lake(sf_dir: str, *, num_partitions: int = 16) -> str:
    """Cached COMMITTED flagship lake: lake-reading analytics
    (ops/tokens.py) and bench setup share one replay instead of
    rebuilding the lake inside every timed query."""
    base = f"/tmp/tonray_flagshiplake_{_tag(sf_dir)}_p{num_partitions}"
    lake = os.path.join(base, "lake")
    marker = os.path.join(base, "_DONE")
    if not _cache_valid(marker, sf_dir):
        with _build_lock(base):
            if not _cache_valid(marker, sf_dir):
                build = f"{base}.build.{os.getpid()}"
                shutil.rmtree(build, ignore_errors=True)
                os.makedirs(build, exist_ok=True)
                replay(ensure_flagship_log(sf_dir), os.path.join(build, "lake"),
                       num_partitions=num_partitions, hot_share_threshold=1.0)
                with open(os.path.join(build, "_DONE"), "w") as f:
                    f.write(_fingerprint(sf_dir))
                _swap_in(build, base)
    return lake


def flagship(sf_dir: str, work_dir: str | None = None, *, num_partitions: int = 16):
    """documents → change log → CDC replay → committed lake Dataset.

    The change log is cached per ``sf_dir`` (deterministic); the replay
    itself — the measured pipeline — always runs fresh."""
    if work_dir is not None:
        # explicit work_dir: self-contained build (tests)
        shutil.rmtree(work_dir, ignore_errors=True)
        chg = os.path.join(work_dir, "changes")
        lake = os.path.join(work_dir, "lake")
        docs_to_change_log(sf_dir, chg)
    else:
        chg = ensure_flagship_log(sf_dir)
        lake = f"/tmp/tonray_flagship_{_tag(sf_dir)}/lake"
        shutil.rmtree(lake, ignore_errors=True)
    replay(chg, lake, num_partitions=num_partitions, hot_share_threshold=1.0)
    return read_lake(lake)


def flagship_watch_derived(sf_dir: str, work_dir: str | None = None, *,
                           num_partitions: int = 8):
    """documents → change log → CONTINUOUS micro-batch watcher ingest
    with derive-and-publish (S3's full form): each flushed epoch also
    runs the ``UpdateFeed`` registry transform over its micro-batch and
    commits the ``updated_docs`` side table under the same
    seal-then-publish barrier. Returns the committed derived table — at
    every point in time it reflects exactly the committed epochs, the
    continuous analogue of the reference's streaming exporter
    (datalake/streaming.py:65-191)."""
    from . import transforms  # noqa: F401 — populates REGISTRY
    from .cdc.streaming import DirectoryWatcher, derived_table
    from .registry import REGISTRY

    if work_dir is None:
        work_dir = f"/tmp/tonray_watchderive_{_tag(sf_dir)}"
    shutil.rmtree(work_dir, ignore_errors=True)
    watch = os.path.join(work_dir, "incoming")
    lake = os.path.join(work_dir, "lake")
    os.makedirs(watch)
    # change log is the cached deterministic one — the TIMED work here is
    # the continuous ingest + derive-and-publish, not the log synthesis
    shards = sorted(glob.glob(os.path.join(ensure_flagship_log(sf_dir), "*.parquet")))
    w = DirectoryWatcher(
        watch, lake, num_partitions=num_partitions, num_actors=2,
        max_batch_shards=2, stable_polls=0,
        derive=REGISTRY.select({"UpdateFeed"}),
    )
    try:
        for p in shards:  # shards arrive in waves, micro-batched
            shutil.copy(p, watch)
            w.step()
        w.poll()
        while w.pending:
            w.flush()
    finally:
        w.close()
    return derived_table(lake, "updated_docs")


def ensure_epoch_diff_lake(sf_dir: str, *, num_partitions: int = 16) -> str:
    """Cached two-epoch lake for ``flagship_epoch_diff``: change log
    split by lsn (epoch 0 = versions 0-1, epoch 1 = version 2 +
    tombstones), both replayed and committed. bench.py calls this
    UNTIMED so the ``epoch_diff`` timing measures the diff, not the two
    setup replays (VERDICT r3 Wrong #5)."""
    base = f"/tmp/tonray_ediff_{_tag(sf_dir)}_p{num_partitions}"
    lake = os.path.join(base, "lake")
    marker = os.path.join(base, "_DONE")
    if _cache_valid(marker, sf_dir):
        return lake
    with _build_lock(base):
        if _cache_valid(marker, sf_dir):
            return lake
        build = f"{base}.build.{os.getpid()}"
        shutil.rmtree(build, ignore_errors=True)
        e0, e1 = os.path.join(build, "epoch0"), os.path.join(build, "epoch1")
        os.makedirs(e0), os.makedirs(e1)
        chg = ensure_flagship_log(sf_dir)
        n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
        cut = 2 * n  # versions 0-1 below, version 2 + tombstones above
        for p in sorted(glob.glob(os.path.join(chg, "*.parquet"))):
            t = pq.read_table(p)
            lsn = t["lsn"].to_numpy()
            lo, hi = t.filter(pa.array(lsn < cut)), t.filter(pa.array(lsn >= cut))
            fname = os.path.basename(p)
            if lo.num_rows:
                pq.write_table(lo, os.path.join(e0, fname))
            if hi.num_rows:
                pq.write_table(hi, os.path.join(e1, fname))
        blake = os.path.join(build, "lake")
        replay(e0, blake, num_partitions=num_partitions, hot_share_threshold=1.0)
        replay(e1, blake)
        with open(os.path.join(build, "_DONE"), "w") as f:
            f.write(_fingerprint(sf_dir))
        _swap_in(build, base)
    return lake


def flagship_epoch_diff(sf_dir: str, *, num_partitions: int = 16):
    """documents → change log split into TWO epochs by lsn → replay both
    → ``epoch_diff(lake, 0)``. The deterministic construction makes the
    diff SQL-derivable: with n docs, epoch 0's winner is version 1
    (lsn = n + rn in doc order), the final winner is version 2
    (lsn = 2n + rn) except every 10th doc which is tombstoned — so the
    diff is exactly 'deleted' for rn % 10 == 0 (lsn_to NULL) and
    'updated' for everything else. The two-epoch lake build is cached
    (``ensure_epoch_diff_lake``); the diff runs fresh."""
    from .cdc.replay import epoch_diff

    return epoch_diff(ensure_epoch_diff_lake(sf_dir, num_partitions=num_partitions), 0)


def ensure_ivm_views(sf_dir: str, *, num_partitions: int = 16) -> tuple[str, str, str]:
    """Persisted epoch-0 base views for the IVM queries — the view a
    deployment would already HOLD when the next epoch commits (bench
    builds these untimed so the timed region is the maintenance step:
    diff + signed delta passes + merge). Returns
    (lake, budget_view.parquet, histogram_view.parquet)."""
    import pyarrow.parquet as _pq

    from .ops.tokens import source_budget_at, token_histogram_at

    lake = ensure_epoch_diff_lake(sf_dir, num_partitions=num_partitions)
    vdir = os.path.join(os.path.dirname(lake), "views")
    budget_p = os.path.join(vdir, "budget_e0.parquet")
    hist_p = os.path.join(vdir, "hist_e0.parquet")
    if not (os.path.exists(budget_p) and os.path.exists(hist_p)):
        os.makedirs(vdir, exist_ok=True)
        tmpb, tmph = budget_p + f".tmp{os.getpid()}", hist_p + f".tmp{os.getpid()}"
        _pq.write_table(source_budget_at(lake, 0), tmpb)
        _pq.write_table(token_histogram_at(lake, 0), tmph)
        os.replace(tmpb, budget_p)
        os.replace(tmph, hist_p)
    return lake, budget_p, hist_p
