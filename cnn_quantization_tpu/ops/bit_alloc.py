"""Per-channel bit allocation under a total bit budget.

Reference: pytorch_quantizer/quantization/qtypes/int_quantizer.py:128-145,
381-407; derivation in bit_allocation_synthetic.py.

Given per-channel dispersion alpha_i (std or Laplace-b), the MSE-optimal
allocation of B = C * 2**target total quantization bins gives channel i
  bins_i = B * alpha_i^(2/3) / sum_j alpha_j^(2/3)
  bits_i = clamp(round-or-ceil(log2 bins_i), 0, 8)
The fixed-target variant iterates the (continuous) target so that the
*mean* integer bit width hits the requested goal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_omega(sigma, target_bins):
    """Real-valued per-channel bin counts: omega_i = B * sigma_i^(2/3) / sum.

    Reference: int_quantizer.py:128-135 (``get_omega``).
    """
    sigma = jnp.asarray(sigma, jnp.float32)
    B = sigma.shape[0] * jnp.asarray(target_bins, jnp.float32)
    p = sigma ** (2.0 / 3.0)
    return B * p / jnp.sum(p)


def get_bits_alloc(alpha, num_bits, round_mode: bool = False):
    """Integer per-channel bit widths from dispersions ``alpha``.

    Reference: int_quantizer.py:381-391 (``get_bits_alloc``).
    ``num_bits`` may be fractional (the fixed-target loop feeds floats).
    ``round_mode=True`` rounds log2(bins); False takes ceil.
    """
    alpha = jnp.asarray(alpha, jnp.float32)
    B = alpha.shape[0] * 2.0 ** jnp.asarray(num_bits, jnp.float32)
    p = alpha ** (2.0 / 3.0)
    bin_alloc = B * p / jnp.sum(p)
    log_bins = jnp.log2(bin_alloc)
    bit_alloc = jnp.round(log_bins) if round_mode else jnp.ceil(log_bins)
    # log2(0) = -inf lands in the lower clamp, like the reference's masked fill.
    return jnp.clip(jnp.nan_to_num(bit_alloc, nan=0.0, neginf=0.0, posinf=8.0), 0.0, 8.0)


def get_bits_alloc_fixed_target(alpha, num_bits, round_mode: bool = False):
    """Feedback iteration so mean(bit_alloc) ~= num_bits.

    Reference: int_quantizer.py:393-407 (``get_bits_alloc_fixed_target``):
    up to 10 iterations of target += (goal - mean(bits)) / 2, stopping when
    |2*delta| <= 0.01.  Implemented as a lax.while_loop so it stays jittable
    with data-dependent early exit.
    """
    alpha = jnp.asarray(alpha, jnp.float32)
    goal = jnp.asarray(num_bits, jnp.float32)

    def cond(state):
        _, delta, it, _ = state
        return jnp.logical_and(jnp.abs(2.0 * delta) > 0.01, it < 10)

    def body(state):
        target, _, it, _ = state
        bits = get_bits_alloc(alpha, target, round_mode)
        delta = (goal - jnp.mean(bits)) / 2.0
        return target + delta, delta, it + 1, bits

    init = (goal, jnp.asarray(1.0, jnp.float32), jnp.asarray(0, jnp.int32),
            jnp.zeros_like(alpha))
    _, _, _, bits = jax.lax.while_loop(cond, body, init)
    return bits
