"""ffs_tpu — TPU-native fast-feedback X-ray crystallography framework.

A ground-up JAX/XLA/Pallas rebuild of the DIALS fast-feedback service
(DiamondLightSource/fast-feedback-service): spotfinding (dispersion
thresholding + connected components), indexing (FFT rotation indexer and
serial-crystallography indexer), spot prediction (Reeke), and summation
integration (Kabsch), wrapped in a message-queue-compatible service layer.

The compute path is TPU-first: batched frames, fused Pallas kernels for the
hot per-pixel ops, on-device connected components via label propagation, and
`jax.sharding` data parallelism over frame batches for multi-chip scale-out.
"""

__version__ = "0.1.0"
