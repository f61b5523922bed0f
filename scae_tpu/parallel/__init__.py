from scae_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    maybe_initialize_distributed,
    param_shardings,
    replicate_sharding,
)
from scae_tpu.parallel.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
