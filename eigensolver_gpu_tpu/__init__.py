"""tpu-eigsolve: a TPU-native generalized symmetric/Hermitian-definite eigensolver.

A brand-new JAX/XLA/Pallas framework with the capabilities of
NVIDIA/Eigensolver_gpu (reference: /root/reference): it solves
``A @ x = lambda * B @ x`` for a selected index range of eigenpairs
(LAPACK DSYGVX/ZHEGVX configuration ``ITYPE=1, JOBZ='V', RANGE='I',
UPLO='U'``), in real and complex fp64 (with an fp32+refinement fast path),
entirely on TPU.

Public API (mirrors the reference's two entry points,
dsygvdx_gpu.F90:71 and zhegvdx_gpu.F90:75, redesigned as functional JAX):

    >>> from eigensolver_gpu_tpu import dsygvdx, zhegvdx
    >>> w, Z, info = dsygvdx(A, B, il=1, iu=64)

Unlike the reference there are no caller-provided workspaces -- XLA owns all
buffers -- and the whole pipeline is a single jittable function.
"""

from eigensolver_gpu_tpu.models.sygvdx import (
    dsygvdx,
    zhegvdx,
    sygvdx,
    SygvdxResult,
)
from eigensolver_gpu_tpu.models.syevdx import syevdx
from eigensolver_gpu_tpu.models.zhegvdx_planar import (
    zhegvdx_planar,
    zhegvdx_planar_host,
)
from eigensolver_gpu_tpu.utils.config import SolverConfig

__version__ = "0.1.0"

__all__ = [
    "dsygvdx",
    "zhegvdx",
    "sygvdx",
    "syevdx",
    "zhegvdx_planar",
    "zhegvdx_planar_host",
    "SygvdxResult",
    "SolverConfig",
]
