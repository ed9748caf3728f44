from dwcgan_tpu.interop.torch_import import (  # noqa: F401
    convert_reference_generator, convert_reference_discriminator,
)
