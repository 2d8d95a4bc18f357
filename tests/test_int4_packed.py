"""Int4-packed Pallas GEMM: numerics vs an int32 reference.

The packed kernel (ops/kernels/int4_matmul.py) is the W4A4 deployment
datapath: packed activations, packed residual, packed requantized output.
The reference never executes 4-bit data movement (its CUDA kernel is an
fp32 fake-quant elementwise pass, kernels/gemmlowp.cu:8-45) — correctness
here is defined against exact integer arithmetic.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cnn_quantization_tpu.ops.kernels.int4_matmul import (
    GROUP, int4_matmul, pack_int4, unpack_int4)


def _codes(rs, shape, lo=-7, hi=7):
    return rs.randint(lo, hi + 1, shape).astype(np.int8)


def test_pack_unpack_roundtrip():
    rs = np.random.RandomState(0)
    c = _codes(rs, (3, 5, 512))
    packed = pack_int4(jnp.asarray(c))
    assert packed.shape == (3, 5, 256)
    out = np.asarray(unpack_int4(packed))
    np.testing.assert_array_equal(out, c)


def test_pack_layout_group_local():
    """Byte g*128+j holds code g*256+j (low) and g*256+128+j (high)."""
    rs = np.random.RandomState(1)
    c = _codes(rs, (2, 512))
    p = np.asarray(pack_int4(jnp.asarray(c)))
    for g in range(2):
        for j in (0, 17, 127):
            byte = p[:, g * 128 + j].astype(np.int8)
            lo = np.left_shift(byte, 4).astype(np.int8) >> 4
            hi = byte >> 4
            np.testing.assert_array_equal(lo, c[:, g * 256 + j])
            np.testing.assert_array_equal(hi, c[:, g * 256 + 128 + j])


@pytest.mark.parametrize('a_packed', [False, True])
def test_matmul_f32(a_packed):
    rs = np.random.RandomState(2)
    M, K, N = 70, 512, 384
    a = _codes(rs, (M, K))
    b = _codes(rs, (K, N))
    alpha = rs.rand(N).astype(np.float32) * 1e-2
    beta = rs.randn(N).astype(np.float32) * 0.1
    want = (a.astype(np.int64) @ b.astype(np.int64)).astype(np.float32) \
        * alpha + beta
    a_in = pack_int4(jnp.asarray(a)) if a_packed else jnp.asarray(a)
    got = np.asarray(int4_matmul(a_in, jnp.asarray(b), jnp.asarray(alpha),
                                 jnp.asarray(beta), a_packed=a_packed))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_matmul_residual_relu_packed_out():
    """Full serving-epilogue path: packed A, packed residual add, ReLU,
    requantize, packed output — exact vs integer reference."""
    rs = np.random.RandomState(3)
    M, K, N = 64, 256, 256
    a = _codes(rs, (M, K))
    b = _codes(rs, (K, N))
    alpha = rs.rand(N).astype(np.float32) * 1e-2
    beta = rs.randn(N).astype(np.float32) * 0.05
    res = _codes(rs, (M, N))
    res_scale = 0.11
    out_scale = 0.07

    f = (a.astype(np.int64) @ b.astype(np.int64)).astype(np.float32) \
        * alpha + beta + res.astype(np.float32) * res_scale
    f = np.maximum(f, 0.0)
    want_codes = np.clip(np.round(f / out_scale), -7, 7).astype(np.int8)

    got_packed = int4_matmul(
        pack_int4(jnp.asarray(a)), jnp.asarray(b), jnp.asarray(alpha),
        jnp.asarray(beta), residual=pack_int4(jnp.asarray(res)),
        res_scale=res_scale, out_scale=out_scale, a_packed=True,
        fuse_relu=True, out_mode='packed')
    assert got_packed.shape == (M, N // 2)
    got = np.asarray(unpack_int4(got_packed))
    # round() half-way points may differ by one code between f32 paths
    diff = np.abs(got.astype(np.int32) - want_codes.astype(np.int32))
    assert (diff <= 1).all()
    assert (diff > 0).mean() < 1e-3


def test_matmul_int8_out_mode():
    rs = np.random.RandomState(4)
    M, K, N = 32, 256, 128
    a = _codes(rs, (M, K))
    b = _codes(rs, (K, N))
    alpha = np.full(N, 3e-3, np.float32)
    beta = np.zeros(N, np.float32)
    out_scale = 0.01
    want = np.clip(np.round(
        ((a.astype(np.int64) @ b.astype(np.int64)).astype(np.float32)
         * alpha) / out_scale), -127, 127).astype(np.int8)
    got = np.asarray(int4_matmul(
        pack_int4(jnp.asarray(a)), jnp.asarray(b), jnp.asarray(alpha),
        jnp.asarray(beta), out_scale=out_scale, a_packed=True,
        out_mode='int8'))
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert (diff <= 1).all()
    assert (diff > 0).mean() < 1e-3


def test_matmul_padding_edges():
    """M not a tile multiple, K/N padded."""
    rs = np.random.RandomState(5)
    M, K, N = 13, 256, 64
    a = _codes(rs, (M, K))
    b = _codes(rs, (K, N))
    alpha = np.ones(N, np.float32)
    beta = np.zeros(N, np.float32)
    want = (a.astype(np.int64) @ b.astype(np.int64)).astype(np.float32)
    got = np.asarray(int4_matmul(pack_int4(jnp.asarray(a)), jnp.asarray(b),
                                 jnp.asarray(alpha), jnp.asarray(beta),
                                 a_packed=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_row_pairing_matches_unpaired():
    """The K<=64 row-pairing fast path ([M,K] viewed as [M/2,2K] against
    blockdiag(B,B), round 5) is an implementation detail: results must be
    BIT-identical to the unpaired kernel (same per-element epilogue ops),
    for every out_mode, with and without residual."""
    import numpy as np
    import jax.numpy as jnp
    from cnn_quantization_tpu.ops.kernels.int4_matmul import int4_matmul

    rs = np.random.RandomState(11)
    M, K, N = 64, 64, 256
    a = jnp.asarray(rs.randint(-7, 8, (M, K)).astype(np.int8))
    b = jnp.asarray(rs.randint(-7, 8, (K, N)).astype(np.int8))
    alpha = jnp.asarray(rs.rand(N).astype(np.float32) * 1e-2)
    beta = jnp.asarray(rs.randn(N).astype(np.float32))
    res = jnp.asarray(rs.randint(-128, 128, (M, N // 2)).astype(np.int8))

    for out_mode, with_res in [('f32', False), ('int8', False),
                               ('packed', True), ('packed', False),
                               ('int8', True)]:
        kw = dict(out_scale=0.02, fuse_relu=True, out_mode=out_mode,
                  out_qmax=7.0, interpret=True)
        if with_res:
            kw.update(residual=res, res_scale=0.013)
        paired = int4_matmul(a, b, alpha, beta, **kw)
        # odd M disables pairing -> compare against the unpaired kernel on
        # the same even-M data by stacking an extra row then slicing
        a3 = jnp.concatenate([a, a[:1]], axis=0)
        kw3 = dict(kw)
        if with_res:
            kw3['residual'] = jnp.concatenate([res, res[:1]], axis=0)
        unpaired = int4_matmul(a3, b, alpha, beta, **kw3)[:M]
        np.testing.assert_array_equal(np.asarray(paired),
                                      np.asarray(unpaired),
                                      err_msg=f'{out_mode} res={with_res}')
