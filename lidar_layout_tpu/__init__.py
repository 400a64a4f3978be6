"""lidar-layout-tpu: a TPU-native (JAX/XLA/Pallas) LiDAR scene-generation framework.

A from-scratch rebuild of the capabilities of AlanLiangC/LiDAR-Layout
(LiDAR-Diffusion CVPR'24 + layout/scene-graph conditioning), designed TPU-first:

- range-image VQ autoencoders with curve-wise (circular) convolutions,
- latent diffusion (DDPM/DDIM/PLMS) where the whole sampling loop is one
  compiled ``lax.scan``,
- conditioning stacks (semantic map / camera / text / layout / scene graph),
- a device-side evaluation toolbox (FRID/FSVD/FPVD, JSD/MMD, CD/EMD),
- SPMD scaling via ``jax.sharding`` meshes instead of DDP/NCCL.

Layout:
    ops/       jit-able geometry + metric kernels (projection, chamfer, EMD, ...)
    nn/        neural building blocks (circular convs, attention, VQ, EMA)
    models/    autoencoders, U-Nets, diffusion wrappers, samplers
    losses/    geometric / adversarial / perceptual losses
    encoders/  conditioning encoders (class, spatial, CLIP, layout, scene graph)
    data/      dataset readers + synthetic data
    parallel/  mesh + sharding helpers
    train/     train states, train steps, trainer loop, checkpointing
    eval/      generation metrics (Frechet, JSD, MMD, CD, EMD)
"""

__version__ = "0.1.0"
