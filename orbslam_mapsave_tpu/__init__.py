"""orbslam_mapsave_tpu — TPU-native visual SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
ORB-SLAM2 fork skaegy/ORBSLAM_MapSave (see SURVEY.md at the repo root for
the blueprint and file:line parity citations).
"""

import jax as _jax

# Geometry and optimization need true float32 matmuls: the default matmul
# precision truncates f32 operands to bf16 on TPU (and mirrors that on CPU),
# which breaks pose/BA convergence (pixel-level errors) and descriptor
# parity. Integer MXU paths (Hamming popcount matmuls) are unaffected by
# this setting. Kernels that genuinely want bf16 opt in explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
