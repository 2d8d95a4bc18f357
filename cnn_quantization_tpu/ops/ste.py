"""Gradient attachment: run one transform in the forward pass and another on
the cotangent — the JAX equivalent of autograd-Function wrapping.

Reference: utils/attacher.py ``pytorch_attach(tensor, forward_functor,
backward_functor)`` (:6-58), the mechanism behind the training-era
QuantizationManager's fprop/bprop quantizers
(quantization_manager.py:60-217).  Dead on the reference's inference path;
provided here as ``jax.custom_vjp`` combinators so quantization-aware
fine-tuning composes with the PTQ pipeline (see utils/optim.py).
"""

from __future__ import annotations

import jax


def attach(forward_fn=None, backward_fn=None):
    """Return ``f(x)`` applying ``forward_fn`` to the primal and
    ``backward_fn`` to the incoming cotangent (either may be None = identity).
    Both must be shape-preserving."""
    fwd = forward_fn or (lambda x: x)
    bwd = backward_fn or (lambda g: g)

    @jax.custom_vjp
    def f(x):
        return fwd(x)

    def f_fwd(x):
        return fwd(x), None

    def f_bwd(_, g):
        return (bwd(g),)

    f.defvjp(f_fwd, f_bwd)
    return f


def straight_through(quant_fn):
    """Straight-through estimator: ``quant_fn`` in the forward pass, identity
    gradient — the standard QAT treatment of the non-differentiable
    round/clamp in fake-quant."""
    return attach(forward_fn=quant_fn, backward_fn=None)


@jax.custom_vjp
def fake_quant_ste(x, delta, offset, qmax):
    """STE-wrapped gemmlowp fake-quant (ops/quant_math.fake_quant):
    quantize forward, pass gradients straight through the rounding (the
    clamp boundary still blocks gradients outside the representable range,
    matching standard QAT practice)."""
    from .quant_math import fake_quant
    return fake_quant(x, delta, offset, qmax)


def _fq_fwd(x, delta, offset, qmax):
    return fake_quant_ste(x, delta, offset, qmax), (x, delta, offset)


def _fq_bwd(res, g):
    import jax.numpy as jnp
    x, delta, offset = res
    mask = (x >= offset) & (x <= offset + delta)
    return jnp.where(mask, g, 0.0), None, None, None


fake_quant_ste.defvjp(_fq_fwd, _fq_bwd)
