import numpy as np
import jax.numpy as jnp

from cnn_quantization_tpu.ops import bit_alloc as ba


def np_bits_alloc(alpha, num_bits, round_mode):
    B = len(alpha) * 2.0 ** num_bits
    p = alpha ** (2.0 / 3.0)
    bins = B * p / p.sum()
    with np.errstate(divide='ignore'):
        bits = np.round(np.log2(bins)) if round_mode else np.ceil(np.log2(bins))
    bits[~np.isfinite(bits)] = 0
    return np.clip(bits, 0, 8)


def test_omega_sums_to_budget():
    sigma = np.abs(np.random.RandomState(0).randn(32)).astype(np.float32)
    omega = np.asarray(ba.get_omega(sigma, 16.0))
    assert abs(omega.sum() - 32 * 16.0) < 1e-2


def test_uniform_sigma_gets_target_bits():
    sigma = np.ones(16, np.float32)
    bits = np.asarray(ba.get_bits_alloc(sigma, 4, round_mode=True))
    np.testing.assert_array_equal(bits, np.full(16, 4.0))


def test_matches_numpy_rule():
    rng = np.random.RandomState(1)
    for round_mode in (True, False):
        alpha = np.abs(rng.randn(64)).astype(np.float32) * 3
        got = np.asarray(ba.get_bits_alloc(alpha, 4, round_mode))
        want = np_bits_alloc(alpha.astype(np.float64), 4, round_mode)
        np.testing.assert_array_equal(got, want)


def test_clamping():
    alpha = np.array([1e-6, 1e6, 1.0], np.float32)
    bits = np.asarray(ba.get_bits_alloc(alpha, 4, round_mode=True))
    assert bits.min() >= 0 and bits.max() <= 8


def test_fixed_target_hits_mean():
    rng = np.random.RandomState(2)
    alpha = np.abs(rng.randn(128)).astype(np.float32)
    bits = np.asarray(ba.get_bits_alloc_fixed_target(alpha, 4.0, round_mode=True))
    assert abs(bits.mean() - 4.0) < 0.25
    assert bits.min() >= 0 and bits.max() <= 8


def test_fixed_target_jittable():
    import jax
    alpha = jnp.abs(jnp.sin(jnp.arange(32, dtype=jnp.float32))) + 0.1
    f = jax.jit(lambda a: ba.get_bits_alloc_fixed_target(a, 4.0, True))
    bits = np.asarray(f(alpha))
    assert bits.shape == (32,)
    assert abs(bits.mean() - 4.0) < 0.5
