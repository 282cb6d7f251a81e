"""Shared driver bootstrap for the CLI entry points (run_replay,
run_maintain). bench.py keeps its own copy on purpose — it measures the
session it creates and pins its own context knobs.

Only entry points call this; library code never owns a Ray session
(driver contract)."""

from __future__ import annotations

import os
import sys


def init_driver(num_cpus: int) -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    )
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
