"""Pallas TPU kernel: fused affine fake-quantization.

TPU-native replacement for the reference's CUDA kernel
(reference: kernels/gemmlowp.cu:8-45 ``GEMMLowpKernel``/``float2gemmlowp``):
one VMEM-resident pass computing
    q   = round(clip(x / scale + zero_point [+ noise], 0, qmax))
    out = (q - zero_point) * scale
with per-tensor or per-channel (last axis) scale/zero_point/qmax, and
optional stochastic rounding driven by the on-core PRNG — a capability the
reference parses a flag for but never wires up
(inference_sim.py:79, int_quantizer.py:60).

The public entry ``fake_quant_fused`` matches ``quant_math.fake_quant``
semantics exactly in deterministic mode (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant_math import affine_qparams


def _kernel(x_ref, scale_ref, zp_ref, qmax_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    scale = scale_ref[:]
    zp = zp_ref[:]
    qmax = qmax_ref[:]
    q = x / scale + zp
    q = jnp.clip(q, 0.0, qmax)
    q = jnp.round(q)
    o_ref[:] = ((q - zp) * scale).astype(o_ref.dtype)


def _kernel_stochastic(seed_ref, x_ref, scale_ref, zp_ref, qmax_ref, o_ref):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    scale = scale_ref[:]
    zp = zp_ref[:]
    qmax = qmax_ref[:]
    q = x / scale + zp
    # uniform noise in [-0.5, 0.5): top 24 bits of the PRNG word, logical
    # shift (prng_random_bits yields int32; an arithmetic shift would bias
    # the noise to [-1, 0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(q.shape), jnp.uint32)
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)  # in [0, 2^24): exact in i32
    noise = top24.astype(jnp.float32) * (1.0 / (1 << 24)) - 0.5
    q = q + noise  # noise-before-clamp, like gemmlowp.cu:16-18
    q = jnp.clip(q, 0.0, qmax)
    q = jnp.round(q)
    o_ref[:] = ((q - zp) * scale).astype(o_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=('stochastic', 'interpret'))
def _fake_quant_2d(x2, scale, zp, qmax, seed, *, stochastic: bool,
                   interpret: bool):
    """x2: [R, C]; scale/zp/qmax: [1, C] broadcastable rows."""
    R, C = x2.shape
    # row tile sized to keep the block in VMEM (<= ~2MB for the input tile)
    tile_r = max(8, min(_round_up(R, 8), max(8, (1 << 19) // max(C, 1) // 4 * 4)))
    tile_r = min(tile_r, 4096)
    grid = (pl.cdiv(R, tile_r),)

    vec_spec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((tile_r, C), lambda i: (i, 0), memory_space=pltpu.VMEM)

    if stochastic:
        if interpret:
            # pltpu.prng_* has no CPU interpreter lowering; equivalent jnp
            # fallback (same noise-before-clamp semantics, threefry bits)
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
            noise = jax.random.uniform(key, x2.shape, jnp.float32, -0.5, 0.5)
            q = x2.astype(jnp.float32) / scale + zp + noise
            q = jnp.round(jnp.clip(q, 0.0, qmax))
            return ((q - zp) * scale).astype(x2.dtype)
        # index maps receive the scalar-prefetch ref as a trailing argument
        vec_spec_s = pl.BlockSpec((1, C), lambda i, s: (0, 0),
                                  memory_space=pltpu.VMEM)
        x_spec_s = pl.BlockSpec((tile_r, C), lambda i, s: (i, 0),
                                memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[x_spec_s, vec_spec_s, vec_spec_s, vec_spec_s],
            out_specs=x_spec_s)
        return pl.pallas_call(
            _kernel_stochastic, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, C), x2.dtype),
        )(seed, x2, scale, zp, qmax)

    return pl.pallas_call(
        _kernel, grid=grid,
        in_specs=[x_spec, vec_spec, vec_spec, vec_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((R, C), x2.dtype),
        interpret=interpret,
    )(x2, scale, zp, qmax)


def fake_quant_fused(x, delta, offset, qmax, *, channel_axis: int | None = None,
                     stochastic: bool = False, seed: int = 0,
                     interpret: bool | None = None):
    """Drop-in fused version of quant_math.fake_quant.

    channel_axis, when given, must be the last axis (TPU-native layouts keep
    channels last); per-tensor parameters broadcast.
    """
    x = jnp.asarray(x)
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    orig_shape = x.shape
    C = orig_shape[channel_axis] if channel_axis is not None else 1
    if channel_axis is not None and channel_axis % x.ndim != x.ndim - 1:
        raise ValueError('fused fake-quant requires channels-last layout')

    scale, zp = affine_qparams(delta, offset, qmax)
    qmaxf = jnp.asarray(qmax, jnp.float32)
    if channel_axis is None:
        # per-tensor: flatten into rows of a 128-wide lane layout
        C_pad = 128
        R = -(-x.size // C_pad)
        pad = R * C_pad - x.size
        x2 = jnp.pad(x.reshape(-1), (0, pad)).reshape(R, C_pad)
        bcast = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.float32).reshape(1, 1),
                                           (1, C_pad))
        out = _fake_quant_2d(x2, bcast(scale), bcast(zp), bcast(qmaxf),
                             jnp.asarray([seed], jnp.int32),
                             stochastic=stochastic, interpret=interpret)
        return out.reshape(-1)[:x.size].reshape(orig_shape).astype(x.dtype)

    x2 = x.reshape(-1, C)
    row = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.float32).reshape(1, -1), (1, C))
    out = _fake_quant_2d(x2, row(scale), row(zp), row(qmaxf),
                         jnp.asarray([seed], jnp.int32),
                         stochastic=stochastic, interpret=interpret)
    return out.reshape(orig_shape).astype(x.dtype)
