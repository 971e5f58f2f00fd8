"""SDPL-SLAM-TPU: a TPU-native dynamic point-line RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of SDPL-SLAM
(semantic dynamic point-line SLAM): per-frame camera pose estimation, SE(3)
rigid-motion estimation of every moving object, and a map of 3D points and
3D (Pluecker) lines -- all expressed as batched, statically-shaped tensor
programs that XLA can tile onto the MXU/VPU, instead of the reference's
scalar per-feature C++ loops.

Layout
------
- ``ops``       : geometry / Lie-group math, feature kernels (FAST, lines),
                  flow gathers, RANSAC -- the device compute vocabulary.
- ``solvers``   : batched Levenberg-Marquardt per-frame solvers (joint
                  flow+pose, joint flow+object-motion) and the batch
                  bundle-adjustment back-end (windowed + full sequence).
- ``models``    : the SLAM pipeline state machines (Frame, Map, Tracking,
                  System facade) mirroring the reference public API.
- ``parallel``  : jax.sharding Mesh utilities and the ICI-sharded global BA.
- ``io``        : dataset loaders (KITTI/OMD formats), output writers,
                  host->device prefetch.
- ``utils``     : config (yaml, same keys as the reference), timing, metrics.
"""

__version__ = "0.1.0"

import jax as _jax

# Metric SLAM geometry cannot tolerate the TPU MXU's bf16 default-precision
# matmuls (~5e-3 relative error on pose compositions -- verified to corrupt
# trajectories).  All library matmuls run in full f32; compute-bound kernels
# that genuinely want bf16 must request it explicitly.
_jax.config.update("jax_default_matmul_precision", "float32")

# Optional persistent compilation cache (opt-in via SDPL_JAX_CACHE=<dir>).
# Not enabled by default: the axon remote TPU compiler does not persist its
# executables, and CPU AOT artifacts written by one machine can be loaded
# by another with mismatched ISA features (observed SIGILL-risk warnings).
import os as _os

_cache_dir = _os.environ.get("SDPL_JAX_CACHE")
if _cache_dir:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
