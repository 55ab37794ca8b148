"""obman_train_tpu — TPU-native rebuild of the obman_train framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
hassony2/obman_train ("Learning Joint Reconstruction of Hands and Manipulated
Objects", Hasson et al., CVPR 2019): single-RGB-frame hand+object mesh
reconstruction with a differentiable MANO layer, an AtlasNet-style sphere
decoder, multi-task geometric losses (Chamfer / contact / collision /
edge / Laplacian), dataset adapters, a pjit data-parallel training loop,
and host-side evaluation tooling.

The architecture is TPU-first: pure functional model application under a
single jit, static shapes everywhere, left/right hand handling via masked
selection instead of batch splitting, fused device-side image preprocessing,
and Pallas kernels for the memory-bound pairwise geometry ops.
"""

__version__ = "0.1.0"
