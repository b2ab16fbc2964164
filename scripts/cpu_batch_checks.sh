#!/bin/bash
# CPU-side validation batch. Run ONLY while no TPU process is running
# (jax-importing processes wedge a concurrent TPU job — CLAUDE.md).
set -x
mkdir -p /tmp/cpu_checks

PALLAS_AXON_POOL_IPS= timeout 1200 python -m pytest tests/ -q \
  > /tmp/cpu_checks/pytest.log 2>&1

PALLAS_AXON_POOL_IPS= timeout 900 python -u bench_scaling.py --devices 8 \
  --rays-per-device 1024 --steps 5 > /tmp/cpu_checks/scaling.log 2>&1

PALLAS_AXON_POOL_IPS= XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 600 python -u -c "
import jax; jax.config.update('jax_platforms','cpu')
import __graft_entry__ as g
fn, args = g.entry()
jax.jit(fn)(*args)
print('entry ok')
g.dryrun_multichip(8)
print('dryrun ok')
" > /tmp/cpu_checks/graft.log 2>&1

echo DONE > /tmp/cpu_checks/DONE
tail -2 /tmp/cpu_checks/pytest.log
