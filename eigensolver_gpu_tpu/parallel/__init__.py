"""Multi-chip execution: device meshes and sharded solver pipelines.

The reference is single-GPU (SURVEY.md §2 parallelism table: no NCCL/MPI
anywhere); its only concurrency is 3 CUDA streams + events for intra-GPU
task overlap (eigsolve_vars.F90:32-33). The TPU framework goes further:

* ``parallel.mesh``    -- jax.sharding.Mesh construction ('dp' x 'tp')
* ``parallel.sharded`` -- tensor-parallel large-N generalized solve
                          (BASELINE.md config 5) and data-parallel
                          batched solves (config 4, QE k-points), both
                          via NamedSharding/shard_map over ICI with XLA
                          collectives -- no NCCL translation.
"""

from eigensolver_gpu_tpu.parallel.mesh import make_mesh
from eigensolver_gpu_tpu.parallel.sharded import (
    sygvdx_sharded,
    sygvdx_batched,
    sygvdx_batched_sharded,
    zhegvdx_planar_batched_sharded,
)

__all__ = [
    "make_mesh",
    "sygvdx_sharded",
    "sygvdx_batched",
    "sygvdx_batched_sharded",
    "zhegvdx_planar_batched_sharded",
]
