"""Precomputed per-site quantization parameters ("frozen qparams").

In use-stats mode every input to the quantizer decision (alpha, delta,
offset, bit allocation) is a *static* function of the calibration artifact —
the reference nonetheless recomputes them inside every forward
(int_quantizer.py:227-359).  Here we resolve them once into a pytree of
(delta, offset, qmax) per site; the eval step then applies a single fused
fake-quant per site with zero per-batch statistics work.

Numerics are identical to the dynamic path by construction: this module
calls the same dispatch with the same stats; it just does it once.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import jax
import numpy as np
import jax.numpy as jnp

from ..ops.quantizer import QuantConfig, quantize_activation
from ..ops import quant_math
from .context import Site, TapContext


class RecordingContext(TapContext):
    """Records (site, abstract shape) pairs during an eval_shape trace."""

    mode = 'record'

    def __init__(self):
        self.sites: list[tuple[Site, tuple[int, ...]]] = []

    def tap(self, x, site: Site):
        self.sites.append((site, tuple(x.shape)))
        return x


def discover_sites(model, input_shape) -> list[tuple[Site, tuple[int, ...]]]:
    """Trace the model abstractly; no FLOPs, no device work."""
    ctx = RecordingContext()

    def init_apply(k, x):
        variables = model.init(k, x, TapContext())
        return model.apply(variables, x, ctx)

    jax.eval_shape(init_apply, jax.random.PRNGKey(0),
                   jax.ShapeDtypeStruct(input_shape, jnp.float32))
    return ctx.sites


@dataclasses.dataclass(frozen=True)
class SiteQParams:
    delta: Any
    offset: Any
    qmax: Any
    per_channel: bool  # broadcast over the channel (last) axis


def freeze_qparams(policy, stats: Mapping[str, Any],
                   sites: list[tuple[Site, tuple[int, ...]]],
                   ignore_ids: tuple[str, ...] = ()) -> dict[str, SiteQParams]:
    """Resolve (delta, offset, qmax) per site from the stats artifact by
    evaluating the x-independent branches of the quantizer dispatch once.
    Sites whose config needs the live tensor (mid-tread) are skipped and fall
    back to the dynamic path; equivalence with the dynamic path is enforced
    by tests/test_qparams.py."""
    from .context import QuantizeContext

    qctx = QuantizeContext(policy, stats=stats, ignore_ids=ignore_ids)
    out: dict[str, SiteQParams] = {}
    for site, shape in sites:
        cfg = qctx.config_for(site)
        if cfg is None or cfg.mtd_quant:
            continue
        site_stats = qctx.site_stats(site, cfg)
        if site_stats is None:
            continue
        qp = _extract_affine(cfg, site, site_stats, shape)
        if qp is not None:
            out[site.id] = qp
    return out


def _extract_affine(cfg: QuantConfig, site: Site, site_stats, shape):
    """Recover (delta, offset, qmax) by reimplementing the stats-only parts
    of quantize_activation's dispatch (the x-independent branches)."""
    from ..ops import aciq
    from ..ops.bit_alloc import get_bits_alloc_fixed_target
    from ..ops.quantizer import _alpha, _stat

    half = cfg.force_positive or site.half_range
    ndim_ok = len(shape) == 4 and (shape[1] > 1 or shape[2] > 1)
    per_channel_ok = cfg.pcq_a and ndim_ok

    def stat(name, kind='mean'):
        return jnp.asarray(site_stats[f'{kind}_{name}'], jnp.float32)

    def has(name, kind='mean'):
        return f'{kind}_{name}' in site_stats

    def act_bit_alloc():
        if not (cfg.bit_alloc_act and cfg.num_bits <= 4):
            return None
        prior = 'std' if cfg.bit_alloc_prior == 'gaus' else 'b'
        if not has(prior):
            return None
        return get_bits_alloc_fixed_target(stat(prior), cfg.target_act(),
                                           cfg.bit_alloc_round)

    if cfg.kld:
        if not has('kld_th'):
            return None
        delta, offset = quant_math.alpha_to_delta_offset(
            stat('kld_th'), stat('max'), stat('min'), stat('mean'), half_range=half)
        return SiteQParams(delta, offset, jnp.float32(cfg.qmax), False)

    if cfg.clipping != 'no':
        if not (has('min') and has('max') and has('mean')):
            return None
        min_v, max_v, mean_v = stat('min'), stat('max'), stat('mean')
        pc = per_channel_ok and min_v.ndim > 0 and min_v.shape[0] > 1
        if cfg.clipping == 'laplace':
            if not has('b'):
                return None
            b = stat('b')
            if cfg.bit_alloc_act and pc and cfg.num_bits <= 4:
                bits = act_bit_alloc()
                alpha = aciq.alpha_laplace(b, bits.astype(jnp.int32), half_range=half)
            else:
                alpha = aciq.alpha_laplace(b, cfg.num_bits, half_range=half)
        elif cfg.clipping == 'gaus':
            if not has('std'):
                return None
            alpha = aciq.alpha_gaus(stat('std'), cfg.num_bits, half_range=half)
        elif cfg.clipping.endswith('std'):
            if not has('std'):
                return None
            alpha = aciq.alpha_pstd(stat('std'), float(cfg.clipping[:-3]))
        elif cfg.clipping == 'mix':
            if not all(has(k) for k in ('mse_laplace', 'mse_gaus', 'mse_lowp', 'b', 'std')):
                return None
            a_l = aciq.alpha_laplace(stat('b'), cfg.num_bits, half_range=half)
            a_g = aciq.alpha_gaus(stat('std'), cfg.num_bits, half_range=half)
            a_p = (stat('max') - stat('min')) / 2.0
            alpha = jnp.where(stat('mse_gaus') < stat('mse_laplace'), a_g, a_l)
            alpha = jnp.where(stat('mse_lowp') < stat('mse_gaus'), a_p, alpha)
        else:
            return None
        delta, offset = quant_math.alpha_to_delta_offset(alpha, max_v, min_v,
                                                         mean_v, half_range=half)
        if pc:
            bits = act_bit_alloc()
            qmax = (quant_math.qmax_for_bits(bits) if bits is not None
                    else jnp.float32(cfg.qmax))
            return SiteQParams(delta, offset, qmax, True)
        return SiteQParams(delta, offset, jnp.float32(cfg.qmax), False)

    if cfg.pcq_w:
        # default-quantizer pcq_w branch (avgpool quirk): per-SAMPLE min/max
        # from the live tensor (int_quantizer.py:453-461) — inherently
        # batch-dependent, cannot be frozen; dynamic path mirrors it.
        return None

    if per_channel_ok:
        if not has('max', cfg.stats_kind):
            return None
        max_v = stat('max', cfg.stats_kind)
        if max_v.ndim == 0:
            # per-channel artifact had no entry; scalar fallback below
            per_channel_ok = False
        else:
            if half:
                min_v = jnp.zeros_like(max_v)
            elif has('min', cfg.stats_kind):
                min_v = stat('min', cfg.stats_kind)
            else:
                return None
            bits = act_bit_alloc()
            qmax = (quant_math.qmax_for_bits(bits) if bits is not None
                    else jnp.float32(cfg.qmax))
            return SiteQParams(max_v - min_v, min_v, qmax, True)

    kmin, kmax = ('mean', 'mean') if cfg.stats_kind == 'mean' else ('min', 'max')
    if not (has('min', kmin) and has('max', kmax)):
        return None
    min_v, max_v = stat('min', kmin), stat('max', kmax)
    delta, offset = quant_math.minmax_delta_offset(min_v, max_v, half_range=half)
    return SiteQParams(delta, offset, jnp.float32(cfg.qmax), False)


import os

# Lowering for the frozen fake-quant: XLA-native jnp (default) fuses the
# whole fake-quant into the producing conv's epilogue; the Pallas kernel is
# a separate dispatch that breaks that fusion (measured 12.1k vs 3.0k img/s
# on the full W4A4 sim model, v5e batch 128 — see README "kernel lowering
# notes"), so it stays opt-in.
_USE_PALLAS = os.environ.get('CNNQ_FROZEN_PALLAS', '0') == '1'


def apply_frozen(x, qp: SiteQParams, use_pallas: bool | None = None):
    if use_pallas is None:
        use_pallas = _USE_PALLAS
    if use_pallas:
        from ..ops.kernels.fake_quant import fake_quant_fused
        return fake_quant_fused(
            x, qp.delta, qp.offset, qp.qmax,
            channel_axis=-1 if qp.per_channel else None)
    return quant_math.fake_quant(
        x, qp.delta, qp.offset, qp.qmax,
        channel_axis=-1 if qp.per_channel else None)
