"""dwcgan_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of DWC-GAN.

DWC-GAN ("Describe What to Change", ACM MM 2020) edits face images according to a
free-form natural-language command.  This package is a ground-up re-design for TPU:

- NHWC layouts, bfloat16 compute, static shapes, everything under one jitted step
- functional AdaIN (style -> (scale, bias) threaded through the decoder call)
- masked `lax.scan` bi-LSTM text encoder (replaces pack_padded_sequence)
- a single XLA program per training iteration fusing the D and G updates
- data parallelism over a `jax.sharding.Mesh` (reference is single-GPU only)
- Pallas kernels for the instance-norm-heavy decoder hot path

Reference behavior citations point into yhlleo/DWC-GAN (mounted at /root/reference).
"""

__version__ = "0.1.0"

from dwcgan_tpu.config import Config, GenConfig, DisConfig, load_config  # noqa: F401
