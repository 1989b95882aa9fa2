from lcasr_tpu.parallel.mesh import make_mesh  # noqa: F401
from lcasr_tpu.parallel.partition import (  # noqa: F401
    batch_sharding,
    param_shardings,
    sequence_sharding,
)
