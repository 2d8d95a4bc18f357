import numpy as np
import pytest

from cnn_quantization_tpu.ops import aciq


@pytest.mark.parametrize('bits,expected', [(2, 2.83), (3, 3.89), (4, 5.03), (8, 9.89)])
def test_laplace_table_matches_solver(bits, expected):
    assert abs(aciq.solve_alpha_laplace(bits) - expected) < 0.02


@pytest.mark.parametrize('bits', [2, 3, 4])
def test_positive_table_is_one_bit_shift(bits):
    # half-range table at M bits == symmetric table at M+1 bits
    assert abs(aciq.ALPHA_LAPLACE_POSITIVE[bits] - aciq.ALPHA_LAPLACE[bits + 1]) < 0.02
    assert abs(aciq.solve_alpha_laplace(bits, positive=True) - aciq.ALPHA_LAPLACE_POSITIVE[bits]) < 0.02


def test_alpha_mult_consistent_with_integer_bits():
    # omega = 2**M bins should reproduce the per-bit laplace coefficients
    for bits in (2, 3, 4, 5, 6):
        got = float(aciq.alpha_mult_for_omega(np.float32(2.0 ** bits)))
        assert abs(got - aciq.ALPHA_LAPLACE[bits]) < 0.05, (bits, got)


def test_alpha_mult_asym_doubles_omega():
    sym = float(aciq.alpha_mult_for_omega(np.float32(8.0), sym=False))
    # asym at omega=8 == sym at omega=16
    want = float(aciq.alpha_mult_for_omega(np.float32(16.0), sym=True))
    assert abs(sym - want) < 1e-5


def test_alpha_mult_monotone():
    omegas = np.array([0.5, 1, 2, 4, 8, 16, 64, 256, 900], np.float32)
    vals = np.asarray(aciq.alpha_mult_for_omega(omegas))
    assert np.all(np.diff(vals) > 0)


def test_alpha_laplace_vectorized_lookup():
    b = np.array([1.0, 2.0, 0.5], np.float32)
    bits = np.array([2, 4, 8])
    got = np.asarray(aciq.alpha_laplace(b, bits, half_range=False))
    want = b * np.array([2.83, 5.03, 9.89], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got_pos = np.asarray(aciq.alpha_laplace(b, bits, half_range=True))
    want_pos = b * np.array([3.89, 6.2, 11.16], np.float32)
    np.testing.assert_allclose(got_pos, want_pos, rtol=1e-6)


def test_alpha_gaus():
    assert abs(float(aciq.alpha_gaus(2.0, 4, half_range=False)) - 2 * 2.55) < 1e-6
    assert abs(float(aciq.alpha_gaus(2.0, 4, half_range=True)) - 2 * 2.93) < 1e-6


def test_gaussian_table_against_closed_form():
    # the tabulated gaussian coefficients should minimize the closed-form MSE
    from scipy.optimize import minimize_scalar
    for bits in (2, 4, 8):
        res = minimize_scalar(lambda a: aciq.gaussian_clipping_mse(1.0, a, bits),
                              bounds=(0.1, 10.0), method='bounded')
        assert abs(res.x - aciq.ALPHA_GAUS[bits]) < 0.05


def test_alpha_exp_minimizes_exponential_mse():
    # exp-prior MSE(a) = 2 e^{-a} + a^2 / (12 * 4^M) (beta=1); the table
    # coefficient must beat any nearby alpha (reference's -c exp crashes on
    # an undefined table — int_quantizer.py:277-282)
    for bits in (2, 4, 8):
        coeff = float(np.asarray(aciq.alpha_exp(1.0, bits)))

        def mse(a, M=bits):
            return 2.0 * np.exp(-a) + a ** 2 / (12.0 * 4.0 ** M)

        grid = np.linspace(0.1, 40.0, 20000)
        best = grid[np.argmin([mse(a) for a in grid])]
        assert abs(coeff - best) < 0.01, (bits, coeff, best)
    # scales linearly with beta
    a1 = float(np.asarray(aciq.alpha_exp(1.0, 4)))
    a3 = float(np.asarray(aciq.alpha_exp(3.0, 4)))
    assert abs(a3 - 3 * a1) < 1e-4


def test_exp_clipping_end_to_end():
    import jax.numpy as jnp
    from cnn_quantization_tpu.ops.quantizer import quantize_activation
    from cnn_quantization_tpu.engine.policy import QuantPolicy
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.exponential(0.7, size=(2, 8, 8, 16)).astype(np.float32))
    policy = QuantPolicy(arch='resnet18', qtype='int4', qweight='int4',
                         clipping='exp')
    cfg = policy.tag_configs()['activation']
    out, _ = quantize_activation(x, cfg, half_range=True, site_stats=None,
                                 channel_axis=-1, tag='activation')
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    # quantized output is close (clipping keeps most mass)
    err = np.mean((out - np.asarray(x)) ** 2) / np.mean(np.asarray(x) ** 2)
    assert err < 0.1
