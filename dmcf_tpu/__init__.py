"""dmcf_tpu: a TPU-native (JAX/XLA/Pallas) framework for learning
particle-based fluid dynamics with guaranteed momentum conservation.

Ground-up rebuild of the capabilities of tum-pbs/DMCF (Prantl et al.,
NeurIPS 2022) designed for TPU: fixed-shape padded particle sets, fused
continuous convolutions formulated as dense MXU matmuls, whole-rollout
``lax.scan`` on device, and data-parallel training over a ``jax.sharding``
mesh.
"""

__version__ = "0.1.0"
