"""mesh-vae-tpu: a TPU-native (JAX/XLA/Pallas) framework for disentangled
conditional VAEs over fixed-topology triangle meshes.

Re-designed from scratch with the capabilities of ZOUKaifeng/Mesh-VAE
(reference layer map in SURVEY.md). The compute path is JAX/XLA with fused
Pallas kernels for the Chebyshev spectral graph convolution; the mesh
hierarchy construction is a host-side preprocessing stage (numpy, with an
optional C++ fast path); distribution is jax.sharding over a device Mesh.
"""

__version__ = "0.1.0"
