"""Multi-process launcher: the reference's `torch.distributed.launch` /
`deepspeed` role (reference COMMANDS recipes launch run_pretrain_ml.py
through both).

Spawns N local worker processes with the WORLD_SIZE / RANK /
COORDINATOR_ADDRESS env contract that `tasks/common.init_runtime` (and
`parallel/distributed.initialize`) rendezvous on, streams rank 0's output
through, prefixes other ranks, and propagates the first failure.

    python -m mvp_pytorch_tpu.tools.launch --nproc 2 -- \
        -m mvp_pytorch_tpu.tasks.pretrain --synthetic --tiny \
        --output_dir /tmp/run --do_train --platform cpu --num_cpu_devices 4

Multi-HOST launches don't need this tool: start one process per host
with the same env contract (RANK = host index, COORDINATOR_ADDRESS =
host0:port); on Cloud TPU pods, `jax.distributed.initialize()`
autodetects everything and WORLD_SIZE>1 is the only requirement.
"""

from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys
import threading
import time


class _PortHold:
    """Pick a free port and HOLD it (SO_REUSEADDR) until just before the
    workers spawn — probing-then-closing immediately is a TOCTOU race:
    a concurrent launcher (parallel CI jobs) can be handed the same port
    and the two jobs rendezvous with the wrong coordinator."""

    def __init__(self):
        self._sock = socket.socket()
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("localhost", 0))
        self.port = self._sock.getsockname()[1]

    def release(self):
        self._sock.close()


def main(argv=None):
    p = argparse.ArgumentParser(
        description="local multi-process launcher (env:// rendezvous)")
    p.add_argument("--nproc", type=int, required=True,
                   help="number of worker processes")
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port (default localhost:<free port>)")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- followed by the python args of the worker "
                        "(e.g. -- -m mvp_pytorch_tpu.tasks.pretrain ...)")
    args = p.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no worker command given (append: -- -m <module> ...)")

    hold = None
    if args.coordinator:
        coord = args.coordinator
    else:
        hold = _PortHold()
        coord = f"localhost:{hold.port}"
    procs = []
    if hold is not None:
        # released at the last moment: rank 0's coordinator binds with
        # SO_REUSEADDR-compatible semantics right after
        hold.release()
    for rank in range(args.nproc):
        env = dict(os.environ,
                   WORLD_SIZE=str(args.nproc), RANK=str(rank),
                   COORDINATOR_ADDRESS=coord)
        procs.append(subprocess.Popen(
            [sys.executable] + cmd, env=env,
            stdout=None if rank == 0 else subprocess.PIPE,
            stderr=None if rank == 0 else subprocess.STDOUT,
            text=rank != 0))

    def pump(rank, proc):
        for line in proc.stdout:
            sys.stderr.write(f"[rank {rank}] {line}")

    threads = []
    for rank, proc in enumerate(procs):
        if rank == 0:
            continue
        t = threading.Thread(target=pump, args=(rank, proc), daemon=True)
        t.start()
        threads.append(t)

    # preemption: when the scheduler SIGTERMs the LAUNCHER (not the
    # process group), forward it to every rank so their preemption-save
    # path runs (jax's coordination client catches SIGTERM and agrees on
    # one checkpoint step across ranks; see tasks/common.TrainLoop) —
    # then keep waiting for them to checkpoint and exit rc=0
    def _forward_term(signum, frame):
        print("launch: SIGTERM — forwarding to all ranks "
              "(preemption checkpoint)", file=sys.stderr)
        for proc in procs:
            if proc.poll() is None:
                proc.send_signal(signal.SIGTERM)

    try:
        signal.signal(signal.SIGTERM, _forward_term)
    except ValueError:          # not the main thread (embedded use)
        pass

    # poll instead of sequential wait(): a rank that dies mid-run leaves
    # the survivors blocked in their next collective forever — tear the
    # job down as soon as ANY rank exits nonzero (torch.distributed.launch
    # semantics)
    rcs = [None] * len(procs)
    induced: set = set()    # ranks WE terminated after another rank failed
    while any(rc is None for rc in rcs):
        for r, proc in enumerate(procs):
            if rcs[r] is None:
                rcs[r] = proc.poll()
        failed = [(r, rc) for r, rc in enumerate(rcs) if rc not in (None, 0)]
        if failed and any(rc is None for rc in rcs):
            print(f"launch: rank {failed[0][0]} exited rc={failed[0][1]}; "
                  f"terminating surviving ranks", file=sys.stderr)
            for r, proc in enumerate(procs):
                if rcs[r] is None:
                    induced.add(r)
                    # NOTE: ranks running under jax.distributed catch
                    # SIGTERM (preemption notifier) and will NOT die here
                    # — and with a rank already dead their preemption sync
                    # can never complete — so the kill() below after the
                    # 10 s grace is the real teardown for them
                    proc.terminate()
            for r, proc in enumerate(procs):
                if rcs[r] is None:
                    try:
                        rcs[r] = proc.wait(timeout=10)
                    except subprocess.TimeoutExpired:
                        proc.kill()
                        rcs[r] = proc.wait()
            break
        time.sleep(0.2)
    for t in threads:
        t.join(timeout=5)
    bad = [(r, rc) for r, rc in enumerate(rcs) if rc != 0]
    if bad:
        print(f"launch: ranks failed: {bad}", file=sys.stderr)
        # exit with the ORIGINAL failure, not the -SIGTERM of a rank we
        # tore down ourselves
        original = [b for b in bad if b[0] not in induced] or bad
        sys.exit(original[0][1] or 1)


if __name__ == "__main__":
    main()
