"""Parallelism: device mesh, shardings, and the distributed train/infer
drivers.

The reference is single-process single-device; its (absent) distributed
story maps to JAX collectives over ICI (SURVEY.md §3 parallelism +
communication-backend rows): a ``('data', 'model')`` mesh where the
batch axis shards over ``data`` (pure DP — the v5e-8 offline-inference
config) and wide parameter axes may shard over ``model`` (size 1 in all
reference-scale configs, but the mesh API carries the axis so larger
models scale without code changes). XLA GSPMD inserts the psum /
all-gather collectives; nothing here issues explicit communication.
"""

from phones_las_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_params,
    replicate,
    param_sharding_rules,
)
from phones_las_tpu.parallel.multihost import (  # noqa: F401
    initialize_distributed,
    shard_batch_global,
)
