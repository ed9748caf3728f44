from dwcgan_tpu.ops.pallas.norm_kernels import (  # noqa: F401
    instance_norm_pallas, adain_pallas, adain_residual_pallas,
)
