from dwcgan_tpu.eval.metrics import fid_from_stats, feature_stats, inception_score  # noqa: F401
