#!/usr/bin/env python
"""Two-process multihost smoke (VERDICT round-1 weak #8: the multihost
helpers had only ever run with process_count == 1).

Launches itself twice with jax.distributed (CPU backend, loopback
coordinator) and exercises the REAL >1-process branches of
nerf_tpu/parallel/multihost.py: process gating, barrier,
broadcast_from_main, gather_to_main — plus a cross-process psum through a
2-device global mesh (the collective path the trainer's gradient psum rides
on a pod slice).

Run (no TPU job may be running):
    PALLAS_AXON_POOL_IPS= python scripts/multihost_smoke.py
"""
from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PORT = int(os.environ.get("SMOKE_PORT", "19997"))


def worker(rank: int):
    # force CPU before jax initializes (the axon plugin would grab the TPU)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=2,
        process_id=rank,
    )
    import jax.numpy as jnp
    import numpy as np

    from nerf_tpu.parallel import multihost as mh

    assert mh.process_count() == 2, mh.process_count()
    assert mh.process_index() == rank
    assert mh.is_main_process() == (rank == 0)

    mh.barrier("smoke-start")

    # broadcast: host 0's pytree reaches host 1
    tree = {"w": jnp.full((4,), 7.0 if rank == 0 else -1.0),
            "step": jnp.asarray(3 if rank == 0 else 0)}
    got = mh.broadcast_from_main(tree)
    np.testing.assert_allclose(np.asarray(got["w"]), 7.0)
    assert int(got["step"]) == 3

    # allgather: both hosts see both contributions, rank-ordered
    gathered = mh.gather_to_main(jnp.full((2,), float(rank + 1)))
    np.testing.assert_allclose(np.asarray(gathered).reshape(2, 2),
                               [[1.0, 1.0], [2.0, 2.0]])

    # cross-process collective through a global 2-device mesh (the
    # trainer's gradient-psum path on a real pod slice)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    local = jnp.full((1, 4), float(rank + 1))
    global_x = jax.make_array_from_process_local_data(sharding, local, (2, 4))

    @jax.jit
    def total(x):
        return jnp.sum(x)

    s = float(total(global_x))
    assert s == 12.0, s  # 4*1 + 4*2

    mh.barrier("smoke-end")
    print(f"rank {rank}: multihost smoke ok (2 processes)")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--rank":
        worker(int(sys.argv[2]))
        return
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="")
    procs = [
        subprocess.Popen([sys.executable, "-u", __file__, "--rank", str(r)],
                         env=env)
        for r in range(2)
    ]
    rcs = [p.wait(timeout=300) for p in procs]
    assert rcs == [0, 0], rcs
    print("multihost smoke: PASS (both processes)")


if __name__ == "__main__":
    main()
