from dwcgan_tpu.utils.logging import MetricWriter  # noqa: F401
from dwcgan_tpu.utils.images import make_grid, save_image_grid  # noqa: F401
from dwcgan_tpu.utils.html import write_html_gallery  # noqa: F401
from dwcgan_tpu.utils.timer import Timer, StepTimer  # noqa: F401
