"""Pallas TPU kernel: int4-PACKED GEMM for W4A4 serving blocks.

VERDICT r3 task 1: the W8A8 serving path moves one byte per activation; at
W4A4 the codes only need 4 bits, but XLA's conv path cannot consume packed
nibbles (and this platform rejects s4 storage — measured round 4).  This
kernel owns the packing end-to-end, so packed tensors only ever exist
BETWEEN Pallas calls and no XLA-side pack/unpack fusion is needed:

  * A (activations) may arrive packed two-codes-per-byte; the unpack is two
    VPU shifts in VMEM (prologue), never an HBM round-trip.
  * The residual identity arrives packed and is unpacked inside the
    epilogue (dequant + add + ReLU + requant fused in VMEM).
  * The output can be written packed (two codes per byte) — halving the
    block-boundary HBM writes.  Round-4 outcome, measured on-chip: the
    packed kernels beat the XLA convs they replace in isolation (stage-1
    expansion 219us vs 446us in-model) and cut the modeled byte footprint
    ~38%, but the stitched MODEL loses 2.4x to XLA<->Pallas graph friction
    (unfused requant epilogues, layout copies, a pessimized maxpool) — see
    README "Int4-packed serving"; the path is kept correct, tested and
    opt-in (--serving_packed).

Packing convention — "group-local split-half", chosen so neither producer
nor consumer ever permutes lanes: channels are processed in groups of
G=256; within group g, byte column ``g*128 + j`` holds code ``g*256 + j``
in its low nibble and code ``g*256 + 128 + j`` in its high nibble.  A
K-tile of 256 channels (= 128 bytes = exactly one group) unpacks into two
CONTIGUOUS half-tiles, so the matmul is two MXU dots against adjacent
128-row slabs of B — no interleave, no shuffle:

    lo = (blk << 4) >> 4   # arithmetic shifts: low nibble, sign-extended
    hi =  blk >> 4
    acc += lo @ B[k : k+128] + hi @ B[k+128 : k+256]

Epilogue (all in VMEM): out = acc * alpha[n] + beta[n]
  (+ residual: out += unpack(res_packed) * res_scale)
  (+ ReLU)    (+ requant: clip(round(out / out_scale)) -> int8 or packed)

The reference only ever *simulates* 4-bit arithmetic in fp32 CUDA
(pytorch_quantizer/.../int_quantizer.py:557-614); this is the deployment
kernel that actually moves 4-bit data.  Numerics are exact vs an int32
reference modulo f32 epilogue rounding (tests/test_int4_packed.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 256          # channels per packing group
HALF = GROUP // 2    # bytes per group / half-tile width


def pack_int4(codes):
    """[..., C] int8 codes (int4 values) -> [..., C/2] packed bytes.

    Group-local split-half layout (see module docstring).  XLA-side helper
    for tests and for staging params; the hot path packs inside the kernel.
    """
    c = codes.shape[-1]
    assert c % GROUP == 0, f'channels {c} not a multiple of {GROUP}'
    g = codes.reshape(*codes.shape[:-1], c // GROUP, 2, HALF)
    lo = g[..., 0, :].astype(jnp.int8)
    hi = g[..., 1, :].astype(jnp.int8)
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF), jnp.left_shift(hi, 4))
    return packed.reshape(*codes.shape[:-1], c // 2)


def unpack_int4(packed):
    """Inverse of :func:`pack_int4` (sign-extending)."""
    c2 = packed.shape[-1]
    g = packed.reshape(*packed.shape[:-1], c2 // HALF, HALF)
    lo = jnp.right_shift(jnp.left_shift(g, 4), 4)
    hi = jnp.right_shift(g, 4)
    out = jnp.stack([lo, hi], axis=-2)  # [..., n_groups, 2, HALF]
    return out.reshape(*packed.shape[:-1], c2 * 2)


def _unpack_halves(blk):
    """int8 byte block -> (low-nibble codes, high-nibble codes), both int8.

    Mosaic has no int8 vector shifts (``arith.shli`` on i8 fails to
    legalize — measured round 4), so sign-extend via int32 shifts on the
    VPU and narrow back to int8 for the MXU dots.
    """
    b32 = blk.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(b32, 28), 28).astype(jnp.int8)
    hi = jnp.right_shift(b32, 4).astype(jnp.int8)
    return lo, hi


def _pack_bytes(cl, cr):
    """Two int8 code tiles (int4 values) -> packed bytes, via int32 ops
    (Mosaic legalizes neither shifts nor multiplies on i8 vectors)."""
    l32 = jnp.bitwise_and(cl.astype(jnp.int32), 0xF)
    r32 = jnp.left_shift(cr.astype(jnp.int32), 4)
    return jnp.bitwise_or(l32, r32).astype(jnp.int8)


def _epilogue(out, res_ref, scal_ref, o_ref, *, has_res: bool,
              fuse_relu: bool, out_mode: str, out_qmax: float):
    """Shared epilogue: (+residual) (+ReLU) (+requant) and the output
    stores.  ``out`` is the f32 [TM, TN] dequantized accumulator.

    NB: requant uses true division by the scale — bit-identical to the
    plain serving path's jnp.round(x / scale), keeping the two paths
    exactly equal eagerly (tests/test_packed_serving.py); multiply-by-
    reciprocal flips round() boundary codes.

    Group-structured modes (residual / packed output) iterate over the
    TN // GROUP packing groups in the tile, so row-paired calls (TN = 512 =
    two groups, see ``int4_matmul``) and plain TN == GROUP calls share one
    code path.
    """
    os_ = scal_ref[0, 1]
    if has_res or out_mode == 'packed':
        ngroups = out.shape[1] // GROUP
        if has_res:
            r_lo, r_hi = _unpack_halves(res_ref[:])  # [TM, ngroups*HALF]
            rs = scal_ref[0, 0]
        for g in range(ngroups):
            out_l = out[:, g * GROUP:g * GROUP + HALF]
            out_r = out[:, g * GROUP + HALF:(g + 1) * GROUP]
            if has_res:
                out_l = out_l + r_lo[:, g * HALF:(g + 1) * HALF].astype(
                    jnp.float32) * rs
                out_r = out_r + r_hi[:, g * HALF:(g + 1) * HALF].astype(
                    jnp.float32) * rs
            if fuse_relu:
                out_l = jnp.maximum(out_l, 0.0)
                out_r = jnp.maximum(out_r, 0.0)
            if out_mode == 'packed':
                cl = jnp.clip(jnp.round(out_l / os_), -7, 7).astype(jnp.int8)
                cr = jnp.clip(jnp.round(out_r / os_), -7, 7).astype(jnp.int8)
                o_ref[:, g * HALF:(g + 1) * HALF] = _pack_bytes(cl, cr)
            elif out_mode == 'int8':
                o_ref[:, g * GROUP:g * GROUP + HALF] = jnp.clip(
                    jnp.round(out_l / os_), -out_qmax, out_qmax
                ).astype(jnp.int8)
                o_ref[:, g * GROUP + HALF:(g + 1) * GROUP] = jnp.clip(
                    jnp.round(out_r / os_), -out_qmax, out_qmax
                ).astype(jnp.int8)
            else:
                o_ref[:, g * GROUP:g * GROUP + HALF] = out_l.astype(
                    o_ref.dtype)
                o_ref[:, g * GROUP + HALF:(g + 1) * GROUP] = out_r.astype(
                    o_ref.dtype)
        return
    if fuse_relu:
        out = jnp.maximum(out, 0.0)
    if out_mode == 'int8':
        o_ref[:] = jnp.clip(jnp.round(out / os_),
                            -out_qmax, out_qmax).astype(jnp.int8)
    else:
        o_ref[:] = out.astype(o_ref.dtype)


def _kernel(a_ref, b_ref, alpha_ref, beta_ref, res_ref, scal_ref, o_ref,
            acc_ref, *, a_packed: bool, has_res: bool, fuse_relu: bool,
            out_mode: str, out_qmax: float):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if a_packed:
        lo, hi = _unpack_halves(a_ref[:])
        bb = b_ref[:]
        half = bb.shape[0] // 2
        acc_ref[:] += jax.lax.dot_general(
            lo, bb[:half], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[:] += jax.lax.dot_general(
            hi, bb[half:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:
        acc_ref[:] += jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out = acc_ref[:].astype(jnp.float32) * alpha_ref[:] + beta_ref[:]
        _epilogue(out, res_ref, scal_ref, o_ref, has_res=has_res,
                  fuse_relu=fuse_relu, out_mode=out_mode, out_qmax=out_qmax)


def _kernel_1step(a_ref, b_ref, alpha_ref, beta_ref, res_ref, scal_ref,
                  o_ref, *, a_packed: bool, has_res: bool, fuse_relu: bool,
                  out_mode: str, out_qmax: float):
    """Single-K-step variant: the whole contraction fits one tile, so skip
    the int32 VMEM scratch accumulator and its read-modify-write — measured
    ~25% faster on the shallow-K ResNet-50 stage-1 shapes (round 5)."""
    if a_packed:
        lo, hi = _unpack_halves(a_ref[:])
        bb = b_ref[:]
        half = bb.shape[0] // 2
        acc = jax.lax.dot_general(
            lo, bb[:half], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + jax.lax.dot_general(
            hi, bb[half:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:
        acc = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * alpha_ref[:] + beta_ref[:]
    _epilogue(out, res_ref, scal_ref, o_ref, has_res=has_res,
              fuse_relu=fuse_relu, out_mode=out_mode, out_qmax=out_qmax)


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=(
    'a_packed', 'fuse_relu', 'out_mode', 'out_qmax', 'out_dtype',
    'interpret', 'tm'))
def int4_matmul(a, b, alpha, beta, *, residual=None, res_scale=None,
                out_scale=None, a_packed: bool = False,
                fuse_relu: bool = False, out_mode: str = 'f32',
                out_qmax: float = 127.0, out_dtype=jnp.float32,
                interpret: bool | None = None, tm: int | None = None):
    """Packed-int4 GEMM with fused dequant / residual / requant epilogue.

    a        [M, K/2] packed bytes if ``a_packed`` else [M, K] int8 codes.
    b        [K, N] int8 codes (int4 values for W4).
    alpha    [N] f32 — act_scale * per-channel weight scale.
    beta     [N] f32 — bias (zeros if none).
    residual [M, N/2] packed bytes (optional), added as
             ``unpack(residual) * res_scale`` before ReLU.
    out_mode 'f32'/'bf16' (float out), 'int8' (codes at ``out_scale``),
             'packed' ([M, N/2] packed int4 codes at ``out_scale``).

    K must be a multiple of 256 when ``a_packed``; N a multiple of 256 when
    ``residual`` is given or ``out_mode='packed'`` (group alignment).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    has_res = residual is not None
    K = b.shape[0]
    N = b.shape[1]
    M = a.shape[0]
    if a_packed:
        assert K % GROUP == 0 and a.shape[1] == K // 2
    else:
        assert a.shape[1] == K
    if has_res or out_mode == 'packed':
        assert N % GROUP == 0, f'N={N} needs group alignment'

    # Row pairing for lane-underfilled K (the stage-1 K=64 shapes): view
    # A [M, K] as [M/2, 2K] (a row-major BITCAST — two spatial positions
    # per vector row, zero data movement) and B as blockdiag(B, B), so the
    # MXU contracts over 2K >= 128 full lanes.  Half the MACs hit
    # structural zeros, but the lane fill doubles the useful rate — the
    # paired conv3-s1 shape measured 344us vs 618us unpaired (round 5).
    # All epilogue operands tile the same way ([M, N/2] residual bytes ->
    # [M/2, N], also a bitcast), outputs reshape back identically, and
    # every per-element epilogue op is unchanged -> bit-exact vs unpaired.
    pair = 1
    if not a_packed and K <= 64 and M % 2 == 0:
        # group-structured epilogues stay consistent under pairing only
        # when each original position's N spans whole groups (paired group
        # g then holds exactly one position's channels and its residual
        # bytes land at res2[:, g*HALF:(g+1)*HALF])
        if not (has_res or out_mode == 'packed') or N % GROUP == 0:
            pair = 2
    orig_M, orig_N = M, N
    if pair == 2:
        a = a.reshape(M // 2, 2 * K)
        b2 = jnp.zeros((2 * K, 2 * N), b.dtype)
        b = b2.at[:K, :N].set(b).at[K:, N:].set(b)
        alpha = jnp.concatenate([alpha.reshape(-1)] * 2)
        beta = jnp.concatenate([beta.reshape(-1)] * 2)
        if has_res:
            residual = residual.reshape(M // 2, N)
        M, K, N = M // 2, 2 * K, 2 * N

    # Tile sizes.  K is never padded beyond 128-alignment when unpacked —
    # an XLA-level pad MATERIALIZES a full copy of A in HBM (measured 2-4x
    # slowdown at the shallow stage-1 shapes).
    if a_packed:
        TK = GROUP                       # one packing group per K step
    else:
        TK = K if K <= GROUP else GROUP  # shallow K: single unpadded step
    if has_res or out_mode == 'packed':
        TN = GROUP * (2 if pair == 2 else 1)
    elif N % GROUP == 0:
        TN = GROUP
    else:
        TN = max(128, min(512, N))
    single_step = (TK >= K) if not a_packed else (K == GROUP)
    # TM: 512 measured best for the multi-K-step path (round-4 sweep);
    # 1024 best for the scratch-free single-step path (round-5 sweep:
    # paired conv3 344us@1024 vs 381@512)
    TM = tm if tm is not None else (1024 if single_step else 512)
    TKa = TK // 2 if a_packed else TK
    a_p = _pad_to(_pad_to(a, TM, 0), TKa, 1)
    b_p = _pad_to(_pad_to(b, TK, 0), TN, 1)
    alpha_p = _pad_to(alpha.reshape(1, -1).astype(jnp.float32), TN, 1)
    beta_p = _pad_to(beta.reshape(1, -1).astype(jnp.float32), TN, 1)
    Mp = a_p.shape[0]
    Kp = b_p.shape[0]
    Np = b_p.shape[1]

    if has_res:
        res_p = _pad_to(residual, TM, 0)
    else:  # dummy 1-tile operand so the kernel signature is static
        res_p = jnp.zeros((TM, TN // 2), jnp.int8)
    scal = jnp.array([[0.0 if res_scale is None else res_scale,
                       1.0 if out_scale is None else out_scale]],
                     jnp.float32)

    out_packed = out_mode == 'packed'
    TNo = TN // 2 if out_packed else TN
    Npo = Np // 2 if out_packed else Np
    odt = jnp.int8 if out_mode in ('int8', 'packed') else out_dtype
    kw = dict(a_packed=a_packed, has_res=has_res, fuse_relu=fuse_relu,
              out_mode=out_mode, out_qmax=float(out_qmax))

    # single- vs multi-K-step differ only in grid arity, index maps, the
    # kernel body, and the scratch accumulator; everything else is shared
    if single_step and Kp // TK == 1:
        grid = (Mp // TM, Np // TN)
        im_a = lambda i, j: (i, 0)           # noqa: E731
        im_b = lambda i, j: (0, j)           # noqa: E731
        im_n = lambda i, j: (0, j)           # noqa: E731
        im_o = lambda i, j: (i, j)           # noqa: E731
        im_res = im_o if has_res else (lambda i, j: (0, 0))
        kernel_fn = functools.partial(_kernel_1step, **kw)
        scratch = []
        dims = ('parallel', 'parallel')
    else:
        grid = (Mp // TM, Np // TN, Kp // TK)
        im_a = lambda i, j, k: (i, k)        # noqa: E731
        im_b = lambda i, j, k: (k, j)        # noqa: E731
        im_n = lambda i, j, k: (0, j)        # noqa: E731
        im_o = lambda i, j, k: (i, j)        # noqa: E731
        im_res = im_o if has_res else (lambda i, j, k: (0, 0))
        kernel_fn = functools.partial(_kernel, **kw)
        scratch = [pltpu.VMEM((TM, TN), jnp.int32)]
        dims = ('parallel', 'parallel', 'arbitrary')
    out = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TKa), im_a, memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), im_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), im_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), im_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TN // 2), im_res, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TM, TNo), im_o, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Npo), odt),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(dimension_semantics=dims),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=int(Mp * Kp * (0.5 if a_packed else 1)
                               + Kp * Np + Mp * Npo
                               + (Mp * Np // 2 if has_res else 0)),
            transcendentals=0),
        interpret=interpret,
    )(a_p, b_p, alpha_p, beta_p, res_p, scal)
    out = out[:M, :N // 2 if out_packed else N]
    if pair == 2:
        out = out.reshape(orig_M,
                          orig_N // 2 if out_packed else orig_N)
    return out
