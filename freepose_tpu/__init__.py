"""freepose_tpu — TPU-native zero-shot 6D object pose estimation and tracking.

A ground-up JAX/XLA/Pallas re-design of the capabilities of ponimatkin/freepose
(ICLR 2025): open-vocabulary proposal generation, CAD mesh retrieval over a
~46k-object feature bank, metric scale estimation, render-and-compare 6D pose,
and point-tracking refinement — engineered TPU-first (static shapes, batched
rasterization, sharded HBM-resident banks, pjit/shard_map over device meshes).
"""

__version__ = "0.1.0"
