"""supervised_gan_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of phymhan/supervised-gan.

The reference (/root/reference) is a PyTorch 0.3-era research stack for joint
synthesis of electron-microscopy images and segmentation labels via a family of
GAN recipes (SGAN / JointGAN / UnsupervisedGAN / DSGAN) plus downstream
segmentation evaluation.  This package re-implements the full capability
surface TPU-first:

  * pure-functional networks (init/apply) with parameter trees whose structure
    mirrors torch ``state_dict`` names, enabling lossless ``.pth`` interop
    (reference: models/base_model.py:44-61),
  * a single jit-compiled train step per recipe — forward, the alternating
    n_update_D / n_update_G schedule, Adam updates and the ImagePool replay
    buffer all run on-device inside one XLA program
    (reference hot loop: models/fcgan_model.py:178-193),
  * NHWC layouts and lax convolutions that map onto the MXU; Pallas kernels
    for fused normalization / resampling hot spots,
  * data parallelism over a ``jax.sharding.Mesh`` (the reference's only
    parallelism is single-process multi-GPU data_parallel;
    reference: models/networks.py:263-266).

Layout:
  options/   argparse CLI replicating the reference flag surface (options/*)
  ops/       TPU tensor ops (conv, norm, resample, pad) + Pallas kernels
  nn/        functional module system + network zoo (models/networks.py)
  models/    GAN recipes (models/*_model.py) as data-driven train graphs
  data/      datasets + host-side async prefetch pipeline (data/*)
  parallel/  device mesh / sharding helpers
  utils/     visualizer, HTML report, metrics, .pth interop, image utils
"""

__version__ = "0.1.0"
