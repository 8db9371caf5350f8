"""Multi-host runtime initialization.

The reference is single-process (SURVEY.md §2.6). For multi-host TPU pods:
``init_distributed()`` wires jax.distributed (DCN rendezvous), and
``host_shard_info()`` gives each host its disjoint data shard for the
loader (data/loader.py ``host_id``/``num_hosts``). Collectives themselves
are XLA-compiled over ICI/DCN — there is no user-level transport here.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import jax

log = logging.getLogger(__name__)


@dataclass(frozen=True)
class HostInfo:
    host_id: int
    num_hosts: int
    local_devices: int
    global_devices: int


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> HostInfo:
    """Initialize multi-host JAX when launched across processes.

    No-ops on a single host (the common case on one chip / one VM). With
    explicit args or cluster-provided env (TPU metadata), brings up the
    jax.distributed service so jax.devices() spans the pod.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    info = HostInfo(host_id=jax.process_index(),
                    num_hosts=jax.process_count(),
                    local_devices=jax.local_device_count(),
                    global_devices=jax.device_count())
    log.info("runtime: host %d/%d, %d local / %d global devices",
             info.host_id, info.num_hosts, info.local_devices,
             info.global_devices)
    return info


def host_shard_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()
