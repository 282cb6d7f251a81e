"""Incremental view maintenance: keep aggregates current across lake
commits without recomputing over the whole lake.

Builds a lake, commits a second epoch of changes on top, then updates
the per-source budget view and the full token histogram from the epoch
diff alone — and checks both against full recomputes.

Run:  python examples/incremental_views.py
(Any cwd works; owns its Ray session like all CLI entry points.)
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from ton_etl_ray.cdc.replay import replay
from ton_etl_ray.gen import write_change_log
from ton_etl_ray.ops.tokens import (
    incremental_source_budget,
    incremental_token_histogram,
    source_budget_at,
    token_histogram_at,
)

work = "/tmp/tonray_ivm_example"
shutil.rmtree(work, ignore_errors=True)
lake = f"{work}/lake"

# epoch 0: the initial state; the views a deployment would persist
write_change_log(f"{work}/chg0", num_events=80_000, num_keys=6_000, seed=11,
                 num_shards=8, max_tok=32)
replay(f"{work}/chg0", lake, num_partitions=32)
budget = source_budget_at(lake, 0)
hist = token_histogram_at(lake, 0)
print(f"epoch 0: budget view {budget.num_rows} sources, "
      f"histogram {hist.num_rows} distinct tokens")

# epoch 1: a day's worth of changes lands. Shift its lsns ABOVE epoch
# 0's (write_change_log always starts at 0 — unshifted, nearly every
# epoch-1 event would LOSE last-writer-wins to the stored state and the
# "incremental maintenance" would maintain an almost-empty diff; same
# shift quickstart.py applies)
write_change_log(f"{work}/chg1", num_events=20_000, num_keys=6_000, seed=12,
                 num_shards=4, max_tok=32)
import glob as _glob

import pyarrow as _pa
import pyarrow.parquet as _pq

for f in _glob.glob(f"{work}/chg1/*.parquet"):
    t = _pq.read_table(f)
    t = t.set_column(t.column_names.index("lsn"), "lsn",
                     _pa.compute.add(t["lsn"], _pa.scalar(1_000_000, _pa.int64())))
    _pq.write_table(t, f)
replay(f"{work}/chg1", lake)

# maintain both views from the diff — O(changed keys), not O(lake)
budget2 = incremental_source_budget(lake, budget, 0, 1)
hist2 = incremental_token_histogram(lake, hist, 0, 1)

# verify against full recomputes
assert budget2.to_pydict() == source_budget_at(lake, 1).to_pydict()
assert hist2.to_pydict() == token_histogram_at(lake, 1).to_pydict()
tot0 = sum(budget.column("total_tokens").to_pylist())
tot1 = sum(budget2.column("total_tokens").to_pylist())
print(f"epoch 1 maintained: total tokens {tot0} -> {tot1}; "
      "both views equal their full recomputes")

ray.shutdown()
