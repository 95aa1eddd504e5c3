"""Device-mesh parallelism: mesh construction, sharding helpers, and the
pjit train/eval steps."""

from ssl_cr_histo_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    mesh_for_batch,
    batch_sharding,
    chunk_sharding,
    replicated_sharding,
    shard_batch,
)
from ssl_cr_histo_tpu.parallel.distributed import (  # noqa: F401
    fetch_global,
    put_sharded,
)
