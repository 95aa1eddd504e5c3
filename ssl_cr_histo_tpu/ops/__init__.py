"""On-device image ops: color math, geometric warps, photometric transforms,
stain augmentation, and the RandAugment policies — all jit/vmap-able JAX.

Every op in this package operates on float32 RGB images with values in
[0, 1], shape (..., H, W, 3) channels-last (the natural layout for both XLA
convolutions on TPU and the VPU's (8, 128) lanes).  Entry points that accept
uint8 batches convert once on device.
"""

from ssl_cr_histo_tpu.ops import color  # noqa: F401
from ssl_cr_histo_tpu.ops import geometry  # noqa: F401
from ssl_cr_histo_tpu.ops import photometric  # noqa: F401
from ssl_cr_histo_tpu.ops import stain  # noqa: F401
from ssl_cr_histo_tpu.ops import randaugment  # noqa: F401
from ssl_cr_histo_tpu.ops import batch  # noqa: F401
