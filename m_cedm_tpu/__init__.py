"""m-cedm-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for recovering
unobserved states of dynamical systems with mixed-conditional diffusion models.

Re-designed from scratch for TPU hardware with the capabilities of the
PyTorch-Lightning reference (katehai/m-cedm):

- EDM-preconditioned mixed-conditional diffusion (the paper's "m-cedm" method)
- Unconditional joint DDPM with DDIM / RePaint / Heun-EDM samplers
- Single-task conditional DDPM and EDM baselines
- FNO-2D and OFormer supervised baselines
- SWE / Darcy physics residual losses with jax.grad guidance
- HDF5 data layer with on-device observation-mask sampling
- Hydra-style config surface, orbax checkpointing, mesh data-parallelism

Layout:
    ops/       pure-jnp math primitives (schedules, losses, normalizer)
    models/    neural network architectures (flax.linen, NHWC)
    tasks/     training/eval/sampling logic per model family
    samplers/  lax.scan denoising loops (Heun EDM, DDIM, RePaint)
    physics/   differentiable PDE residuals (SWE FV, Darcy FD)
    data/      HDF5 reading, mask samplers, datamodules
    train/     host-side loop, checkpointing, metrics, callbacks
    parallel/  device mesh + sharding helpers
    pallas/    fused TPU kernels for the hot ops
"""

__version__ = "0.1.0"
