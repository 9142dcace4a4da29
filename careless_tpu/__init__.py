"""careless-tpu: TPU-native scaling & merging of crystallographic reflection
data by variational inference.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
rs-station/careless (reference mounted at /root/reference): truncated-normal
surrogate posteriors over structure factors, Wilson priors, MLP scaling
models, ELBO training — redesigned for TPU (pjit/shard_map over device
meshes, scan-based training loops, fused Pallas ELBO kernels).
"""

__version__ = "0.1.0"
