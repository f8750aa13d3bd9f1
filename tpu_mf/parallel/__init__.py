from tpu_mf.parallel.mesh import make_mesh  # noqa: F401
from tpu_mf.parallel.dsgd import (  # noqa: F401
    ShardedMF,
    init_sharded_mf,
    dsgd_epoch,
    gather_params,
)
