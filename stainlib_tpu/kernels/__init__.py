from stainlib_tpu.kernels.fused_stain import (
    from_planar,
    fused_normalize,
    fused_normalize_planar,
    to_planar,
)
from stainlib_tpu.kernels.macenko_fused import (
    augment_with_matrix_planar,
    macenko_augment,
    macenko_augment_planar,
    macenko_normalize,
    macenko_normalize_planar,
)
from stainlib_tpu.kernels.reinhard_fused import (
    reinhard_normalize,
    reinhard_normalize_planar,
)
from stainlib_tpu.kernels.vahadane_fused import (
    vahadane_augment,
    vahadane_augment_planar,
    vahadane_normalize,
    vahadane_normalize_planar,
    vahadane_stain_matrix_planar,
)

__all__ = [
    "to_planar",
    "from_planar",
    "fused_normalize",
    "fused_normalize_planar",
    "macenko_normalize",
    "macenko_normalize_planar",
    "macenko_augment",
    "macenko_augment_planar",
    "augment_with_matrix_planar",
    "reinhard_normalize",
    "reinhard_normalize_planar",
    "vahadane_normalize",
    "vahadane_normalize_planar",
    "vahadane_stain_matrix_planar",
    "vahadane_augment",
    "vahadane_augment_planar",
]
