from pygat_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh  # noqa: F401
from pygat_tpu.parallel.sharding import (  # noqa: F401
    graph_pspecs,
    param_pspecs,
    place,
    shard_transductive_data,
)
from pygat_tpu.parallel.distributed import (  # noqa: F401
    shard_train_state,
    sharded_fit_inputs,
)
