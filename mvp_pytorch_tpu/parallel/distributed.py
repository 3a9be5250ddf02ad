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
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("COORDINATOR_ADDRESS"),
            num_processes=num_processes or world,
            process_id=process_id
            if process_id is not None else int(os.environ.get("RANK", 0)))
    return dict(process_index=jax.process_index(),
                process_count=jax.process_count(),
                local_devices=len(jax.local_devices()),
                global_devices=len(jax.devices()))


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0
