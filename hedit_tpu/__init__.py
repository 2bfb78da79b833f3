"""h-edit-tpu: TPU-native JAX framework for training-free diffusion image editing.

A ground-up re-design of the capabilities of nktoan/h-edit (CVPR'25) for TPU:
Flax diffusion backbones, inversion + h-Edit sampling compiled as lax.scan,
functional attention control (P2P / MasaCtrl / PnP) inside jit, Pallas kernels
for the hot attention/normalization paths, and reward-model guidance as
on-device VJPs.  See SURVEY.md at the repo root for the reference map.
"""

__version__ = "0.1.0"
