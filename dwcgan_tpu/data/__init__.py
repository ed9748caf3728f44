from dwcgan_tpu.data.labels import (  # noqa: F401
    label2onehot, assign_label, create_labels, all_domains,
)
from dwcgan_tpu.data.celeba import CelebADataset  # noqa: F401
from dwcgan_tpu.data.pipeline import DataPipeline, Batch, synthetic_batch  # noqa: F401
