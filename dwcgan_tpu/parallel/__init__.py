from dwcgan_tpu.parallel.mesh import (  # noqa: F401
    create_mesh, replicate, shard_spec, param_shardings,
)
