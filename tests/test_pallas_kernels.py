"""Pallas kernels (interpret mode on CPU) vs the jnp reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cnn_quantization_tpu.ops import quant_math as qm
from cnn_quantization_tpu.ops.kernels import fake_quant_fused


def test_per_tensor_matches_reference():
    rng = np.random.RandomState(0)
    x = rng.randn(37, 150).astype(np.float32)  # deliberately unaligned
    delta, offset = float(x.max() - x.min()), float(x.min())
    want = np.asarray(qm.fake_quant(x, delta, offset, 15.0))
    got = np.asarray(fake_quant_fused(x, delta, offset, 15.0, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_per_channel_matches_reference():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 7, 7, 64).astype(np.float32) * rng.rand(64).astype(np.float32)
    min_c = x.min(axis=(0, 1, 2)); max_c = x.max(axis=(0, 1, 2))
    bits = rng.randint(1, 9, 64)
    qmax = (2.0 ** bits - 1).astype(np.float32)
    want = np.asarray(qm.fake_quant(x, max_c - min_c, min_c, qmax, channel_axis=-1))
    got = np.asarray(fake_quant_fused(x, max_c - min_c, min_c, qmax,
                                      channel_axis=-1, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_per_channel_scalar_qmax():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 5, 32).astype(np.float32)
    min_c = x.min(axis=(0, 1, 2)); max_c = x.max(axis=(0, 1, 2))
    want = np.asarray(qm.fake_quant(x, max_c - min_c, min_c, 255.0, channel_axis=-1))
    got = np.asarray(fake_quant_fused(x, max_c - min_c, min_c, 255.0,
                                      channel_axis=-1, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bf16_roundtrip():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(16, 128), jnp.bfloat16)
    got = fake_quant_fused(x, 4.0, -2.0, 255.0, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = qm.fake_quant(x, 4.0, -2.0, 255.0)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=0.05)


def test_stochastic_rounding_statistics():
    # E[stochastic round] should be unbiased: mean of many rounds ~= value
    x = np.full((8, 128), 0.3, np.float32)  # 0.3 between grid points 0 and 1
    outs = []
    for seed in range(20):
        out = fake_quant_fused(x, 1.0, 0.0, 1.0, stochastic=True, seed=seed,
                               interpret=True)
        outs.append(np.asarray(out))
    mean = np.mean(outs)
    # deterministic rounding would give exactly 0.0 everywhere
    assert 0.15 < mean < 0.45, mean
    # individual draws are on the grid
    assert set(np.unique(outs)) <= {0.0, 1.0}
