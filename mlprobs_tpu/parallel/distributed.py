"""Multi-host initialisation and family scheduling.

The reference is single-process (SURVEY §5.8); multi-host here means:
(a) `jax.distributed` process groups so one mesh spans hosts, with the
pairs axis sharded over every chip; (b) an embarrassingly-parallel
per-family scheduler for suite runs (the script.py role), striping
families across hosts.
"""
from __future__ import annotations

import os

import jax


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Initialise jax.distributed from args or environment.

    Returns (process_id, num_processes).  Single-process when no
    coordinator is configured.
    """
    coordinator = coordinator or os.environ.get("MLPROBS_COORDINATOR")
    if not coordinator:
        return 0, 1
    num_processes = int(
        num_processes or os.environ.get("MLPROBS_NUM_PROCESSES", "1")
    )
    process_id = int(
        process_id if process_id is not None
        else os.environ.get("MLPROBS_PROCESS_ID", "0")
    )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return process_id, num_processes


def my_families(files: list, process_id: int, num_processes: int) -> list:
    """Stripe families across hosts (round-robin by sorted order)."""
    return [f for k, f in enumerate(sorted(files))
            if k % num_processes == process_id]
