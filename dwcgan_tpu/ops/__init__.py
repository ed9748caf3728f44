from dwcgan_tpu.ops.norms import adain, instance_norm, layer_norm_ref  # noqa: F401
from dwcgan_tpu.ops.blocks import (  # noqa: F401
    Conv2dBlock, LinearBlock, MLP, ResBlock, ResBlocks, AdaINResBlocks,
    make_initializer, activation,
)
from dwcgan_tpu.ops.lstm import MaskedBiLSTM, reverse_padded  # noqa: F401
from dwcgan_tpu.ops.resize import upsample2x, downsample2x  # noqa: F401
