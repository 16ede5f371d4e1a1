"""Stage kernels: potrf, sygst/hegst, sytrd/hetrd, stedc, unmtr, trsm.

Each module is the TPU-native re-design of one solver-layer component of the
reference (SURVEY.md §2 rows 3-13): functional JAX with XLA/MXU-lowered
matmuls and Pallas kernels on the hot paths, instead of CUDA Fortran kernels
and cuBLAS/cuSOLVER calls.
"""

from eigensolver_gpu_tpu.ops.cholesky import cholesky_upper
from eigensolver_gpu_tpu.ops.jacobi import jacobi_eigh
from eigensolver_gpu_tpu.ops.refine import refine_eigh
from eigensolver_gpu_tpu.ops.refine_planar import refine_gevp_planar
from eigensolver_gpu_tpu.ops.sbrd import sbrd
from eigensolver_gpu_tpu.ops.stedc import stedc
from eigensolver_gpu_tpu.ops.sygst import sygst, sygst_full, sygst_blocked
from eigensolver_gpu_tpu.ops.sytrd import sytrd, sytrd_blocked
from eigensolver_gpu_tpu.ops.sytrd_planar import hetrd_planar
from eigensolver_gpu_tpu.ops.unmtr import unmtr, ungtr
from eigensolver_gpu_tpu.ops.unmtr_planar import unmtr_planar

__all__ = [
    "cholesky_upper",
    "jacobi_eigh",
    "refine_eigh",
    "refine_gevp_planar",
    "sbrd",
    "stedc",
    "sygst",
    "sygst_full",
    "sygst_blocked",
    "sytrd",
    "sytrd_blocked",
    "hetrd_planar",
    "unmtr",
    "ungtr",
    "unmtr_planar",
]
