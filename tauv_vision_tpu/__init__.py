"""TAUV-Vision-TPU: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
Tartan-AUV TAUV-Vision perception stack.

The reference (github.com/Tartan-AUV/TAUV-Vision) is a single-GPU PyTorch
ROS package containing three detector families (CenterNet, YOLACT,
YOLO-Pose), dataset tooling, and serving nodes.  This package provides the
same capabilities designed TPU-first:

- ``ops``      pure-jnp functional core: box math, anchors, heatmap target
               rendering, angle/depth codecs, losses, NMS, mask assembly,
               peak decoding, PnP.  Everything static-shape and jit-safe.
- ``ops.pallas``  hand-written TPU kernels for the decode hot paths.
- ``models``   flax.linen model definitions (NHWC, bf16-friendly).
- ``parallel`` device-mesh / sharding utilities and pjit step factories.
- ``train``    target generation, per-family losses, the unified trainer.
- ``data``     dataset-dir readers, synthetic data, converters.
- ``serving``  fused preprocess+forward+decode inference pipelines.
"""

__version__ = "0.1.0"
