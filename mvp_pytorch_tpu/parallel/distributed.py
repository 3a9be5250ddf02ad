"""Multi-host runtime initialization.

Parity target: the reference's NCCL rendezvous
(`init_process_group(backend='nccl', init_method='env://')`,
run_pretrain_ml.py:229-231 / deepspeed.init_distributed) — TPU-natively this
is `jax.distributed.initialize()` + a mesh spanning all hosts' devices;
gradient/optimizer-state collectives ride ICI intra-slice and DCN across
slices via the sharding annotations (no explicit collectives in user code).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """Initialize the multi-host runtime when running under a multi-process
    launcher; no-op in single-process mode. Returns topology info.

    Env contract mirrors the reference's WORLD_SIZE/RANK rendezvous:
    COORDINATOR_ADDRESS / WORLD_SIZE / RANK (or explicit args; on Cloud TPU
    jax.distributed.initialize() autodetects everything).
    """
    import jax
    world = int(os.environ.get("WORLD_SIZE", num_processes or 1))
    if world > 1:
        # Defaults match JAX's (heartbeat 100 s, shutdown barrier 300 s)
        # so production failure detection stays prompt. They assume every
        # process makes steady progress, which breaks on contended hosts —
        # a 1-core CI box running two ranks that each compile the full
        # train graph can trail by minutes and the shutdown barrier then
        # kills an otherwise healthy run ("Shutdown barrier has failed").
        # That is a TEST-environment property, so the 2-process tests set
        # DIST_HEARTBEAT_TIMEOUT_S/DIST_SHUTDOWN_TIMEOUT_S in their env
        # instead of this library widening everyone's defaults.
        if process_id is None:
            # RANK unset must stay None: JAX autodetects only params that
            # are None (auto_detect_unset_distributed_params), so a
            # defaulted 0 would make EVERY Cloud-TPU-pod host claim
            # process 0 and hang the rendezvous
            rank_env = os.environ.get("RANK")
            process_id = int(rank_env) if rank_env is not None else None
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("COORDINATOR_ADDRESS"),
            num_processes=num_processes or world,
            process_id=process_id,
            initialization_timeout=int(
                os.environ.get("DIST_INIT_TIMEOUT_S", 300)),
            heartbeat_timeout_seconds=int(
                os.environ.get("DIST_HEARTBEAT_TIMEOUT_S", 100)),
            shutdown_timeout_seconds=int(
                os.environ.get("DIST_SHUTDOWN_TIMEOUT_S", 300)))
    return dict(process_index=jax.process_index(),
                process_count=jax.process_count(),
                local_devices=len(jax.local_devices()),
                global_devices=len(jax.devices()))


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0
