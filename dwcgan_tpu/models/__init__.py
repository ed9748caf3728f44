from dwcgan_tpu.models.generator import (  # noqa: F401
    Generator, ContentEncoder, StyleEncoder, TxtEncoder, Decoder,
    build_embedding_matrix,
)
from dwcgan_tpu.models.discriminator import MsImageDis  # noqa: F401
