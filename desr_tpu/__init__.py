"""desr_tpu — TPU-native unpaired Depth Enhancement and Super-Resolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
neeek2303/Depth-Enhancement-and-Super-Resolution (the official implementation of
"Towards Unpaired Depth Enhancement and Super-Resolution in the Wild",
arXiv:2105.12038). The reference is a single-process PyTorch/CUDA CycleGAN-style
codebase; this framework re-implements every capability TPU-first:

- ``desr_tpu.ops``      — pure functional compute ops (masks, normals, losses,
                          SSIM, bicubic resize, Adam) designed for XLA fusion.
- ``desr_tpu.models``   — a native NN layer system whose parameter trees are
                          flat dicts keyed by PyTorch ``state_dict`` names, so
                          reference ``.pth`` checkpoints import/export 1:1;
                          network zoo (ResNet/U-Net generators incl. the SR
                          head, dual-branch translators, PatchGAN/pixel/Gu
                          discriminators) and the four training models
                          (I2D, translation, main, main_sr).
- ``desr_tpu.parallel`` — ``jax.sharding.Mesh`` data-parallel training over ICI
                          (the TPU-native replacement for torch DataParallel).
- ``desr_tpu.data``     — unpaired RGB-D datasets with albumentations-equivalent
                          augmentations and device prefetch.
- ``desr_tpu.options``  — argparse CLI compatible with the reference's
                          ``main.py`` flag surface (reference: options/*.py).
- ``desr_tpu.metrics``  — the 9-metric offline evaluation oracle
                          (reference: new_metrics.py).
"""

__version__ = "0.1.0"
