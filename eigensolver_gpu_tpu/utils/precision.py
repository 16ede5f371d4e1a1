"""Matmul precision policy.

On TPU, fp32 matmuls default to bfloat16 MXU passes (7-bit mantissa) --
fine for neural nets, fatal for factorizations: the fp32 pipeline loses
~16 bits and Ogita-Aishima refinement cannot recover from bf16-quality
starting vectors. Every public op traces under
``jax.default_matmul_precision('highest')`` (3-pass bf16 for fp32 --
true fp32 fidelity; no effect on the fp64 path, which is already exact).
"""

from __future__ import annotations

import functools

import jax


def highest_precision(fn):
    """Decorator: trace ``fn`` with matmul precision 'highest'."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
