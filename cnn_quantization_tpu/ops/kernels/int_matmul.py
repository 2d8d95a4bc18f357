"""Pallas TPU kernel: int8 x int8 -> int32 matmul with fused dequant epilogue.

The "north star" kernel (SURVEY.md §2 native-code inventory): the reference
*simulates* quantized arithmetic — every "quantized" conv still runs fp32
cuDNN (inference_quantization_manager.py:170) — whereas the MXU natively
multiplies int8 at twice bf16 peak.  This kernel executes the real integer
GEMM:

    C[m, n] = sum_k A_q[m, k] * B_q[k, n]            (int32 accumulate, MXU)
    out[m, n] = C[m, n] * alpha[n] + beta[n]          (fused epilogue, VPU)
    optionally out = max(out, 0)                      (fused ReLU)

alpha/beta fold activation scale, per-output-channel weight scales,
zero-point corrections, and bias — the gemmlowp dequantization contract
(https://github.com/google/gemmlowp/blob/master/doc/quantization.md) done
once per tile in VMEM instead of extra HBM passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_kernel(a_ref, b_ref, alpha_ref, beta_ref, o_ref, acc_ref, *,
                   fuse_relu: bool):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out = acc_ref[:].astype(jnp.float32) * alpha_ref[:] + beta_ref[:]
        if fuse_relu:
            out = jnp.maximum(out, 0.0)
        o_ref[:] = out.astype(o_ref.dtype)


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=('fuse_relu', 'out_dtype', 'interpret'))
def int8_matmul_dequant(a_q, b_q, alpha, beta, *, fuse_relu: bool = False,
                        out_dtype=jnp.float32, interpret: bool | None = None):
    """a_q [M, K] int8, b_q [K, N] int8, alpha/beta [N] f32 -> [M, N].

    out = (a_q @ b_q) * alpha + beta  (int32 accumulation on the MXU).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    M, K = a_q.shape
    K2, N = b_q.shape
    assert K == K2

    TM, TK, TN = 256, 256, 256
    a_p = _pad_to(_pad_to(a_q, TM, 0), TK, 1)
    b_p = _pad_to(_pad_to(b_q, TK, 0), TN, 1)
    alpha_p = _pad_to(alpha.reshape(1, -1).astype(jnp.float32), TN, 1)
    beta_p = _pad_to(beta.reshape(1, -1).astype(jnp.float32), TN, 1)
    Mp, Kp = a_p.shape
    _, Np = b_p.shape

    grid = (Mp // TM, Np // TN, Kp // TK)
    out = pl.pallas_call(
        functools.partial(_matmul_kernel, fuse_relu=fuse_relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp + Kp * Np + Mp * Np * 4,
            transcendentals=0),
        interpret=interpret,
    )(a_p, b_p, alpha_p, beta_p)
    return out[:M, :N]


def quantize_sym_int8(x, axis=None, *, bits: int = 8):
    """Symmetric signed quantization: codes in [-(2^(b-1)-1), 2^(b-1)-1].

    Returns (codes int8, scale f32).  ``axis``: per-channel axis kept.
    """
    xf = jnp.asarray(x, jnp.float32)
    qmax = 2.0 ** (bits - 1) - 1.0
    if axis is None:
        amax = jnp.max(jnp.abs(xf))
        scale = jnp.maximum(amax / qmax, 1e-8)
        codes = jnp.clip(jnp.round(xf / scale), -qmax, qmax).astype(jnp.int8)
        return codes, scale
    axes = tuple(i for i in range(xf.ndim) if i != axis % xf.ndim)
    amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax / qmax, 1e-8)
    codes = jnp.clip(jnp.round(xf / scale), -qmax, qmax).astype(jnp.int8)
    return codes, scale.reshape(-1)
