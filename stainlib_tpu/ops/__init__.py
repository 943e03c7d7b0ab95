from stainlib_tpu.ops.colorspace import (
    hed_to_rgb,
    hsd_to_rgb,
    lab_to_rgb,
    od_to_rgb,
    rgb_to_gray,
    rgb_to_hed,
    rgb_to_hsd,
    rgb_to_lab,
    rgb_to_od,
    to_uint8,
)
from stainlib_tpu.ops.delta_e import delta_e76, delta_e_report, mean_delta_e
from stainlib_tpu.ops.lasso import (
    get_concentrations,
    nonneg_lasso_fista,
    nonneg_lasso_k2,
)
from stainlib_tpu.ops.linalg3 import eigh3x3
from stainlib_tpu.ops.percentile import (
    masked_mean,
    masked_percentile,
    mean_std,
    percentile,
)
from stainlib_tpu.ops.tissue import (
    luminosity_standardize,
    standardize_brightness,
    tissue_mask,
)
