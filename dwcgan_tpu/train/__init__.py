from dwcgan_tpu.train.sampling import sample_style, style_replace  # noqa: F401
