"""Multi-host orchestration (DCN tier).

The reference is strictly single-machine (SURVEY.md §2.2: processes +
queues + file IPC). The TPU-native scale-out story has two tiers:

- **ICI (intra-slice)**: frame batches shard over the mesh `data` axis —
  handled by `vse_tpu.parallel.sharding` + `OcrEngine(mesh=...)`; zero
  hot-path collectives (each chip OCRs its own frames).
- **DCN (multi-host)**: subtitle extraction is embarrassingly parallel at
  the VIDEO level — hosts never need to exchange frames, so the DCN carries
  only work assignment. This module provides the `jax.distributed`
  bootstrap and a deterministic video->host assignment that balances
  estimated decode+OCR cost (frame_count x resolution) rather than video
  count.

Run on each host of a multi-host deployment:

    import vse_tpu.parallel.multihost as mh
    mh.initialize()                       # jax.distributed handshake
    mine = mh.assign_videos(paths)        # this host's share
    extract_many(mine, ...)               # local ICI mesh does the rest
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or the TPU-pod
    auto-detection when no args are given)."""
    import jax

    kwargs = {}
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
        # `is not None`, not truthiness: process_id=0 is the coordinator and
        # must not fall through to the env var
        kwargs["num_processes"] = (
            num_processes
            if num_processes is not None
            else int(os.environ["NUM_PROCESSES"])
        )
        kwargs["process_id"] = (
            process_id
            if process_id is not None
            else int(os.environ["PROCESS_ID"])
        )
    jax.distributed.initialize(**kwargs)


def video_cost(frame_count: int, height: int, width: int) -> float:
    """Relative decode+OCR cost estimate: frames x pixels."""
    return float(frame_count) * float(height * width)


def balanced_assignment(
    costs: Sequence[float], n_hosts: int
) -> List[List[int]]:
    """Greedy longest-processing-time assignment of indexed costs to hosts.

    Deterministic (ties break by index) so every host computes the SAME
    assignment without communicating — the only DCN traffic is the
    jax.distributed handshake itself."""
    order = sorted(range(len(costs)), key=lambda i: (-costs[i], i))
    loads = [0.0] * n_hosts
    buckets: List[List[int]] = [[] for _ in range(n_hosts)]
    for i in order:
        h = min(range(n_hosts), key=lambda j: (loads[j], j))
        buckets[h].append(i)
        loads[h] += costs[i]
    for b in buckets:
        b.sort()
    return buckets


def assign_videos(
    video_paths: Sequence[str],
    process_id: Optional[int] = None,
    num_processes: Optional[int] = None,
) -> List[str]:
    """This host's video share (cost-balanced, deterministic across hosts)."""
    import jax

    from vse_tpu.video.decode import probe

    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    if n <= 1:
        return list(video_paths)
    costs = []
    for p in video_paths:
        m = probe(p)
        costs.append(video_cost(m.frame_count, m.height, m.width))
    buckets = balanced_assignment(costs, n)
    return [video_paths[i] for i in buckets[pid]]
