"""nerf_tpu — a TPU-native NeRF framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of the reference
"Nerf-Replication" codebase (PyTorch + CUDA) for TPU hardware:

- compute path: pure-functional JAX pipelines compiled with jit/pjit,
  hot ops as Pallas TPU kernels (fused MLP eval, compositing scan),
- scaling: rays sharded over a `jax.sharding.Mesh`, gradient psum over ICI,
- data: on-device ray sampling from device-resident image/pose tensors
  (no host dataloader in the hot path).

Package layout:
    config/    yaml config tree w/ parent-chain merge + dotted CLI overrides
    data/      Blender synthetic loader, on-device ray batching, img_fit data
    models/    encoders (frequency, hashgrid), NeRF MLP, img_fit MLP
    render/    ray gen, stratified/importance sampling, compositing (ESS/ERT),
               whole-image renderer, spiral paths
    ops/       Pallas TPU kernels (fused MLP, integration) + custom VJPs
    parallel/  mesh/sharding setup, sharded train/render steps
    train/     train loop, optimizer/schedule, checkpointing, recorder
    eval/      PSNR/SSIM/MSE metrics, evaluator, video writer
    utils/     misc helpers
"""

__version__ = "0.1.0"
