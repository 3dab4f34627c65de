"""monkeynet_tpu — a TPU-native re-design of Monkey-Net (CVPR'19).

A self-supervised video-animation framework: unsupervised keypoint detection,
sparse-keypoint-to-dense-flow prediction, and warping-based frame generation,
built from scratch for TPU (JAX / XLA / Pallas / pjit).

Reference capability target: AliaksandrSiarohin/monkey-net (studied, not ported).
Layouts are channels-last (NDHWC); collectives ride `jax.lax.psum` over a device
mesh instead of the reference's thread-rendezvous sync-BN; eval loops are frame-
batched XLA programs instead of Python per-frame loops.
"""

__version__ = "0.1.0"
