"""ACIQ analytical clipping: optimal alpha per prior/bit-width.

Re-derivation of the reference's alpha machinery
(reference: pytorch_quantizer/quantization/qtypes/int_quantizer.py:34-51,
81-87, 227-325; closed forms in mse_analysis.py).

Clipping a zero-mean Laplace(b) at alpha with M-bit uniform quantization has
MSE(alpha) = 2 b^2 e^{-alpha/b} + alpha^2 / (3 * 2^{2M}).  Minimizing over
alpha gives alpha* = c_M * b with the coefficients tabulated below.  The
Gaussian coefficients come from the equivalent Gaussian clipping MSE.
Half-range ("positive") tables apply when the tensor is known non-negative
post-ReLU: one fewer sign bit, so the table shifts by one bit.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

# Optimal alpha/sigma for Gaussian prior, bits 1..8 (int_quantizer.py:81-82).
ALPHA_GAUS = {1: 1.24, 2: 1.71, 3: 2.15, 4: 2.55, 5: 2.93, 6: 3.28, 7: 3.61, 8: 3.92}
ALPHA_GAUS_POSITIVE = {1: 1.71, 2: 2.15, 3: 2.55, 4: 2.93, 5: 3.28, 6: 3.61, 7: 3.92, 8: 4.2}

# Optimal alpha/b for Laplace prior, bits 0..8 (int_quantizer.py:84-85).
ALPHA_LAPLACE = {0: 1.05, 1: 1.86, 2: 2.83, 3: 3.89, 4: 5.03, 5: 6.2, 6: 7.41, 7: 8.64, 8: 9.89}
ALPHA_LAPLACE_POSITIVE = {0: 1.86, 1: 2.83, 2: 3.89, 3: 5.02, 4: 6.2, 5: 7.41, 6: 8.64, 7: 9.89, 8: 11.16}

GAUSSIAN_CONST = (0.5 * 0.35) * (1 + (math.pi * math.log(4)) ** 0.5)

# Dense per-bit vectors (index = bit width 0..8) for vectorized per-channel
# table lookups under jit.  Kept as NUMPY constants: module-level jnp arrays
# would initialize the XLA backend at import time, which breaks
# jax.distributed.initialize for multi-host users (it must run before any
# backend-initializing call) — tests/_distributed_worker.py covers this.
LAPLACE_TABLE = np.asarray([ALPHA_LAPLACE[i] for i in range(9)], np.float32)
LAPLACE_POSITIVE_TABLE = np.asarray([ALPHA_LAPLACE_POSITIVE[i] for i in range(9)], np.float32)
GAUS_TABLE = np.asarray([ALPHA_GAUS[1]] + [ALPHA_GAUS[i] for i in range(1, 9)], np.float32)
GAUS_POSITIVE_TABLE = np.asarray(
    [ALPHA_GAUS_POSITIVE[1]] + [ALPHA_GAUS_POSITIVE[i] for i in range(1, 9)], np.float32)


def laplace_clipping_mse(b, alpha, num_bits):
    """Closed-form clipping+quantization MSE for Laplace(b) (mse_analysis.py:39-43)."""
    return 2.0 * (b ** 2) * np.exp(-alpha / b) + (alpha ** 2) / (3.0 * (2.0 ** (2 * num_bits)))


def gaussian_clipping_mse(sigma, alpha, num_bits):
    """Closed-form clipping+quantization MSE for N(0, sigma^2) (mse_analysis.py:10-16)."""
    clip = (sigma ** 2 + alpha ** 2) * (1 - math.erf(alpha / (sigma * np.sqrt(2.0)))) \
        - np.sqrt(2.0 / np.pi) * alpha * sigma * np.exp(-0.5 * alpha ** 2 / sigma ** 2)
    quant = (alpha ** 2) / (3.0 * (2.0 ** (2 * num_bits)))
    return clip + quant


def solve_alpha_laplace(num_bits: int, positive: bool = False) -> float:
    """Numerically minimize the Laplace clipping MSE (validates the tables).

    ``positive`` models the half-range case: a one-sided Laplace has half the
    tail mass and double the effective resolution, equivalent to bits+1 on the
    symmetric problem — which is exactly how the reference's positive table is
    shifted relative to the symmetric one.
    """
    from scipy.optimize import minimize_scalar
    bits = num_bits + 1 if positive else num_bits
    res = minimize_scalar(lambda a: laplace_clipping_mse(1.0, a, bits),
                          bounds=(0.1, 40.0), method='bounded')
    return float(res.x)


# ---------------------------------------------------------------------------
# omega -> alpha-multiplier interpolation table for mid-tread bin allocation.
#
# The mid-tread path allocates a *real-valued* number of bins omega per
# channel, so the optimal clip multiplier must be solved for arbitrary omega
# rather than per-integer-bit (int_quantizer.py:34-51, 137-145).  MSE model:
#   laplace_prior_mse(b=1, alpha, omega) = 2 e^{-alpha} + alpha^2/(3 omega^2)
# d/dalpha = 0  =>  2 e^{-alpha} = 2 alpha / (3 omega^2)
#                =>  alpha = W(3 omega^2) solved by Newton iteration below.
# ---------------------------------------------------------------------------

def _solve_alpha_for_omega(omega: np.ndarray) -> np.ndarray:
    """Solve 3*omega^2 * exp(-alpha) = alpha for alpha (elementwise).

    Equivalent to the reference's scipy minimize_scalar over
    laplace_prior_mse (int_quantizer.py:34-48) but in closed Newton form:
    f(a) = a * e^{a} - 3 w^2 = 0  =>  a = W(3 w^2) (Lambert W).
    """
    c = 3.0 * omega.astype(np.float64) ** 2
    # Newton on g(a) = a + log(a) - log(c)  (stable form of a e^a = c), a>0
    a = np.maximum(np.log(np.maximum(c, 1e-30)), 0.5)
    for _ in range(50):
        g = a + np.log(a) - np.log(c)
        dg = 1.0 + 1.0 / a
        a = np.maximum(a - g / dg, 1e-8)
    return a


_RESOLUTION = 20
_OMEGA_TABLE = np.concatenate([
    np.linspace(0.01, 0.1, _RESOLUTION, endpoint=False),
    np.linspace(0.1, 1, _RESOLUTION, endpoint=False),
    np.linspace(1, 10, _RESOLUTION, endpoint=False),
    np.linspace(10, 100, _RESOLUTION, endpoint=False),
    np.linspace(100, 1000, _RESOLUTION, endpoint=False),
])
_ALPHA_TABLE = np.concatenate([[0.0], _solve_alpha_for_omega(_OMEGA_TABLE)])
_OMEGA_TABLE = np.concatenate([[0.0], _OMEGA_TABLE])

OMEGA_TABLE = np.asarray(_OMEGA_TABLE, np.float32)
ALPHA_MULT_TABLE = np.asarray(_ALPHA_TABLE, np.float32)


def alpha_mult_for_omega(omega, sym: bool = True):
    """Piecewise-linear interpolation of the optimal clip multiplier for a
    real bin count omega (int_quantizer.py:137-145, ``get_alpha_mult``).

    For the asymmetric case the effective bin count doubles (only half the
    range is used), hence omega *= 2 before lookup.
    """
    omega = jnp.asarray(omega, jnp.float32)
    if not sym:
        omega = omega * 2.0
    i = jnp.clip(jnp.searchsorted(jnp.asarray(OMEGA_TABLE), omega), 1,
                 OMEGA_TABLE.shape[0] - 1)
    w_hi = jnp.take(OMEGA_TABLE, i)
    w_lo = jnp.take(OMEGA_TABLE, i - 1)
    a_hi = jnp.take(ALPHA_MULT_TABLE, i)
    a_lo = jnp.take(ALPHA_MULT_TABLE, i - 1)
    inc = (a_hi - a_lo) / (w_hi - w_lo)
    return a_hi - inc * (w_hi - omega)


def alpha_laplace(b, num_bits, *, half_range: bool):
    """alpha = coeff(bits) * b.  ``num_bits`` may be a per-channel int array
    (bit-allocation-aware alpha, int_quantizer.py:236-253)."""
    table = LAPLACE_POSITIVE_TABLE if half_range else LAPLACE_TABLE
    bits = jnp.clip(jnp.asarray(num_bits, jnp.int32), 0, 8)
    return jnp.asarray(b, jnp.float32) * jnp.take(table, bits)


def alpha_gaus(std, num_bits, *, half_range: bool):
    """alpha = coeff(bits) * sigma (int_quantizer.py:255-264)."""
    table = GAUS_POSITIVE_TABLE if half_range else GAUS_TABLE
    bits = jnp.clip(jnp.asarray(num_bits, jnp.int32), 0, 8)
    return jnp.asarray(std, jnp.float32) * jnp.take(table, bits)


def alpha_pstd(std, p):
    """alpha = p * sigma ("2std"-style clipping, int_quantizer.py:266-275)."""
    return jnp.asarray(p, jnp.float32) * jnp.asarray(std, jnp.float32)


# Exponential-prior alpha coefficients, bits 0..8.  The reference declares an
# 'exp' clipping mode but never defines its alpha table, so ``-c exp``
# crashes (int_quantizer.py:277-282; SURVEY.md §7 known-bugs).  Here the mode
# is derived properly: for a one-sided Exponential(beta) prior clipped at
# alpha and quantized to 2^M levels over [0, alpha],
#   MSE(alpha) = 2 beta^2 e^{-alpha/beta} + alpha^2 / (12 * 4^M)
# and d/dalpha = 0 gives (alpha/beta) e^{alpha/beta} = 12 * 4^M — a Lambert-W
# solve shared with the mid-tread omega machinery above (a e^a = 3 omega^2
# with omega = 2 * 2^M).
def _exp_coeff(num_bits: int) -> float:
    return float(_solve_alpha_for_omega(
        np.asarray([2.0 * 2.0 ** num_bits]))[0])


EXP_TABLE = np.asarray([_exp_coeff(m) for m in range(9)], np.float32)


def alpha_exp(mean, num_bits):
    """alpha = coeff(bits) * beta for a positive Exponential(beta) tensor
    (beta = mean of the positive data; fixes the reference's broken
    get_alpha_exp)."""
    bits = jnp.clip(jnp.asarray(num_bits, jnp.int32), 0, 8)
    return jnp.asarray(mean, jnp.float32) * jnp.take(EXP_TABLE, bits)
