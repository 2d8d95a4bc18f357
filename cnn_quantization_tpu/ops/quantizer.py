"""Functional quantizer: the TPU-native equivalent of the reference's
``IntQuantizer`` dispatch (reference: pytorch_quantizer/quantization/qtypes/
int_quantizer.py:92-122 and the per-path methods it selects).

Instead of a mutable quantizer object consulting singleton statistic
managers, quantization here is a pure function of
  (tensor, QuantConfig, site flags, optional calibration stats dict)
so the whole quantized forward pass jits into one XLA program.

Calibration statistics (``site_stats``) are dicts keyed ``"{kind}_{stat}"``
(e.g. ``"mean_b"``, ``"max_max"``) holding scalars (per-tensor manager) or
per-channel vectors (per-channel manager) — the pytree form of the
reference's CSV/pickle summaries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import jax.numpy as jnp

from . import aciq
from .bit_alloc import get_bits_alloc_fixed_target
from .mid_tread import mid_tread_quantize_tensor
from .quant_math import (alpha_to_delta_offset, fake_quant,
                         fake_quant_kernel_semantics, minmax_delta_offset,
                         qmax_for_bits, quantize_codes)
from .stats import act_stats, act_stats_per_channel, weight_stats_per_channel
from .entropy import shannon_entropy


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Static per-quantizer configuration (the reference's qparams dict plus
    the per-tag attribute overrides applied in
    inference_quantization_manager.py:407-476)."""
    num_bits: int = 8
    clipping: str = 'no'          # no | laplace | gaus | <p>std | mix | (kld via flag)
    stats_kind: str = 'mean'      # aggregation kind consulted for min/max stats
    kld: bool = False
    pcq_w: bool = False           # per-(output-)channel weights
    pcq_a: bool = False           # per-channel activations
    bit_alloc_act: bool = False
    bit_alloc_weight: bool = False
    bit_alloc_round: bool = True  # CLI default -bam round
    bit_alloc_prior: str = 'gaus'  # gaus -> std, laplace -> b
    bit_alloc_target_act: float | None = None
    bit_alloc_target_weight: float | None = None
    bcorr_act: bool = False
    bcorr_weight: bool = False
    vcorr_weight: bool = False
    measure_entropy: bool = False
    mtd_quant: bool = False
    force_positive: bool = False  # arch-level fused-relu (vgg/alexnet/...)
    stats_per_channel: bool = False  # consult the per-channel stats artifact
    # stochastic rounding via the Pallas PRNG kernel — the reference parses
    # --stochastic but never wires it (inference_sim.py:79,
    # int_quantizer.py:60); here the flag is live for activation tags
    stochastic: bool = False

    @property
    def qmax(self) -> float:
        return 2.0 ** self.num_bits - 1.0

    def target_act(self) -> float:
        return self.bit_alloc_target_act if self.bit_alloc_target_act is not None else self.num_bits

    def target_weight(self) -> float:
        return self.bit_alloc_target_weight if self.bit_alloc_target_weight is not None else self.num_bits


def _stat(site_stats: Mapping[str, Any], stat: str, kind: str = 'mean'):
    return jnp.asarray(site_stats[f'{kind}_{stat}'], jnp.float32)


def _is_spatial(x, channel_axis):
    """Reference per-channel-activation condition: 4-D with H*W > 1
    (int_quantizer.py:110)."""
    if x.ndim != 4:
        return False
    spatial = [x.shape[i] for i in range(1, 4) if i != channel_axis % 4]
    return spatial[0] > 1 or spatial[1] > 1


def _act_bit_alloc(cfg: QuantConfig, x, site_stats, channel_axis):
    """Per-channel activation bit widths (or None), gated on bits<=4.

    Reference: int_quantizer.py:430-438 — prior stat is std (gaus prior) or b
    (laplace prior), kind 'mean'; fixed-target feedback to the mean-bit goal.
    """
    if not (cfg.bit_alloc_act and cfg.num_bits <= 4):
        return None
    prior = 'std' if cfg.bit_alloc_prior == 'gaus' else 'b'
    if site_stats is not None:
        disp = _stat(site_stats, prior, 'mean')
    else:
        disp = act_stats_per_channel(x, [prior], channel_axis=channel_axis)[prior]
    return get_bits_alloc_fixed_target(disp, cfg.target_act(), cfg.bit_alloc_round)


def _alpha(cfg: QuantConfig, x, site_stats, *, half_range: bool,
           per_channel: bool, channel_axis: int):
    """Clip value per the configured clipping type.

    Reference: int_quantizer.py:227-325 (get_alpha_laplace / get_alpha_gaus /
    get_alpha_pstd / mix).
    """
    half = cfg.force_positive or half_range

    def online(stat):
        if per_channel:
            return act_stats_per_channel(x, [stat], channel_axis=channel_axis)[stat]
        return act_stats(x, [stat])[stat]

    clip = cfg.clipping
    if clip == 'laplace':
        b = _stat(site_stats, 'b', 'mean') if site_stats is not None else online('b')
        if cfg.bit_alloc_act and per_channel and cfg.num_bits <= 4:
            bits = _act_bit_alloc(cfg, x, site_stats, channel_axis)
            return aciq.alpha_laplace(b, bits.astype(jnp.int32), half_range=half)
        return aciq.alpha_laplace(b, cfg.num_bits, half_range=half)
    if clip == 'gaus':
        std = _stat(site_stats, 'std', 'mean') if site_stats is not None else online('std')
        return aciq.alpha_gaus(std, cfg.num_bits, half_range=half)
    if clip == 'exp':
        # exponential prior: alpha = coeff(bits) * mean_abs (the reference's
        # -c exp crashes on an undefined table — fixed here, ops/aciq.py)
        # mean_abs exists only in the per-tensor stat set; fall back online
        if site_stats is not None and 'mean_mean_abs' in site_stats:
            m = _stat(site_stats, 'mean_abs', 'mean')
        else:
            m = online('mean_abs')
        return aciq.alpha_exp(m, cfg.num_bits)
    if clip.endswith('std'):
        p = float(clip[:-len('std')])
        std = _stat(site_stats, 'std', 'mean') if site_stats is not None else online('std')
        return aciq.alpha_pstd(std, p)
    if clip == 'mix':
        # Pick the min-MSE prior per site from calibration-time error stats
        # (int_quantizer.py:310-323).  Requires stats.
        mse_laplace = _stat(site_stats, 'mse_laplace', 'mean')
        mse_gaus = _stat(site_stats, 'mse_gaus', 'mean')
        mse_lowp = _stat(site_stats, 'mse_lowp', 'mean')
        b = _stat(site_stats, 'b', 'mean')
        std = _stat(site_stats, 'std', 'mean')
        a_laplace = aciq.alpha_laplace(b, cfg.num_bits, half_range=half)
        a_gaus = aciq.alpha_gaus(std, cfg.num_bits, half_range=half)
        a_lowp = (_stat(site_stats, 'max', 'mean') - _stat(site_stats, 'min', 'mean')) / 2.0
        alpha = jnp.where(mse_gaus < mse_laplace, a_gaus, a_laplace)
        return jnp.where(mse_lowp < mse_gaus, a_lowp, alpha)
    raise ValueError(f'unknown clipping {clip!r}')


def _apply_fake_quant(x, cfg: QuantConfig, delta, offset, qmax, *,
                      channel_axis=None, seed: int = 0):
    """Deterministic jnp fake-quant, or the stochastic-rounding Pallas kernel
    when the config asks for it (noise-before-clamp, like gemmlowp.cu:16-18)."""
    if cfg.stochastic:
        from .kernels.fake_quant import fake_quant_fused
        ca = channel_axis if (channel_axis is not None and jnp.ndim(delta) > 0) \
            else None
        return fake_quant_fused(x, delta, offset, qmax, channel_axis=ca,
                                stochastic=True, seed=seed)
    return fake_quant(x, delta, offset, qmax, channel_axis=channel_axis)


def _fake_quant_with_alloc(x, cfg: QuantConfig, delta, offset, bit_alloc,
                           *, channel_axis, seed: int = 0):
    """Apply the gemmlowp fake-quant with optional per-channel bit widths,
    optionally measuring code entropy (int_quantizer.py:442-448, 469-474)."""
    qmax = cfg.qmax if bit_alloc is None else qmax_for_bits(bit_alloc)
    out = _apply_fake_quant(x, cfg, delta, offset, qmax,
                            channel_axis=channel_axis, seed=seed)
    ent = None
    if cfg.measure_entropy:
        codes, _ = quantize_codes(x, delta, offset, qmax, channel_axis=channel_axis)
        ent = shannon_entropy(codes)
    return out, ent


def quantize_activation(x, cfg: QuantConfig, *, half_range: bool = False,
                        site_stats: Mapping[str, Any] | None = None,
                        channel_axis: int = -1, tag: str = 'activation',
                        seed: int = 0):
    """Quantize an activation tensor.  Returns (tensor, aux) where aux may
    carry {'entropy': scalar}.

    Mirrors IntQuantizer.__call__ dispatch order (int_quantizer.py:92-122):
    kld -> clipping (mid-tread or gemmlowp) -> per-channel minmax -> minmax.
    ``seed`` feeds the stochastic-rounding PRNG when cfg.stochastic (the
    caller derives it per site so noise differs across layers).
    """
    half = cfg.force_positive or half_range
    per_channel_ok = cfg.pcq_a and _is_spatial(x, channel_axis)
    aux: dict[str, Any] = {}

    if cfg.kld:
        # TensorRT-style KLD threshold from calibration (int_quantizer.py:478-486).
        kld_th = _stat(site_stats, 'kld_th', 'mean')
        delta, offset = alpha_to_delta_offset(
            kld_th, _stat(site_stats, 'max', 'mean'), _stat(site_stats, 'min', 'mean'),
            _stat(site_stats, 'mean', 'mean'), half_range=half)
        # The reference KLD path runs through the native kernel
        # (int_quantizer.py:486) — use its exact semantics.
        return fake_quant_kernel_semantics(x, delta, offset, cfg.num_bits), aux

    if cfg.clipping != 'no':
        if cfg.mtd_quant:
            values, ent = mid_tread_quantize_tensor(
                x, cfg.target_act(), clip=True, sym=not half,
                per_channel=per_channel_ok, channel_axis=channel_axis,
                measure_entropy=cfg.measure_entropy)
            if ent is not None:
                aux['entropy'] = ent
            return values, aux

        # gemmlowp + ACIQ clipping (int_quantizer.py:327-359)
        if site_stats is not None:
            min_v = _stat(site_stats, 'min', 'mean')
            max_v = _stat(site_stats, 'max', 'mean')
            mean_v = _stat(site_stats, 'mean', 'mean')
        elif per_channel_ok:
            s = act_stats_per_channel(x, ['min', 'max'], channel_axis=channel_axis)
            mean_v = act_stats_per_channel(x, ['mean'], channel_axis=channel_axis,
                                           avg_over_batch=True)['mean']
            min_v, max_v = s['min'], s['max']
        else:
            s = act_stats(x, ['min', 'max', 'mean'])
            min_v, max_v, mean_v = s['min'], s['max'], s['mean']

        if per_channel_ok and jnp.ndim(min_v) > 0 and min_v.shape[0] > 1:
            alpha = _alpha(cfg, x, site_stats, half_range=half_range,
                           per_channel=True, channel_axis=channel_axis)
            delta, offset = alpha_to_delta_offset(alpha, max_v, min_v, mean_v,
                                                  half_range=half)
            bit_alloc = _act_bit_alloc(cfg, x, site_stats, channel_axis)
            out, ent = _fake_quant_with_alloc(x, cfg, delta, offset, bit_alloc,
                                              channel_axis=channel_axis, seed=seed)
            if ent is not None:
                aux['entropy'] = ent
            return out, aux

        alpha = _alpha(cfg, x, site_stats, half_range=half_range,
                       per_channel=False, channel_axis=channel_axis)
        delta, offset = alpha_to_delta_offset(alpha, max_v, min_v, mean_v,
                                              half_range=half)
        return _apply_fake_quant(x, cfg, delta, offset, cfg.qmax, seed=seed), aux

    if cfg.pcq_w:
        # The reference dispatch routes pcq_w AHEAD of pcq_a even for
        # activations (int_quantizer.py:101-106).  Reachable via the default
        # quantizer — the avgpool tag-as-id quirk (see engine/policy.py) —
        # which then runs gemmlowpQuantizeWeightsPerChannel on the 4-D
        # activation (int_quantizer.py:453-476): per-dim0 (i.e. per-SAMPLE)
        # min/max over the flattened rest, never consulting stats.
        t = x.reshape(x.shape[0], -1)
        min_v = jnp.min(t, axis=1)
        max_v = jnp.max(t, axis=1)
        bit_alloc = None
        if cfg.bit_alloc_weight and cfg.num_bits <= 4:
            std = jnp.std(t, axis=1, ddof=1)
            bit_alloc = get_bits_alloc_fixed_target(
                std, cfg.target_weight(), cfg.bit_alloc_round)
        out, ent = _fake_quant_with_alloc(t, cfg, max_v - min_v, min_v,
                                          bit_alloc, channel_axis=0, seed=seed)
        if ent is not None:
            aux['entropy'] = ent
        return out.reshape(x.shape), aux

    if per_channel_ok:
        # Per-channel min/max (int_quantizer.py:409-451)
        if half:
            min_v = None
        elif site_stats is not None:
            min_v = _stat(site_stats, 'min', cfg.stats_kind)
        else:
            min_v = act_stats_per_channel(x, ['min'], channel_axis=channel_axis)['min']
        if site_stats is not None:
            max_v = _stat(site_stats, 'max', cfg.stats_kind)
        else:
            max_v = act_stats_per_channel(x, ['max'], channel_axis=channel_axis)['max']
        if min_v is None:
            min_v = jnp.zeros_like(max_v)
        bit_alloc = _act_bit_alloc(cfg, x, site_stats, channel_axis)
        out, ent = _fake_quant_with_alloc(x, cfg, max_v - min_v, min_v, bit_alloc,
                                          channel_axis=channel_axis, seed=seed)
        if ent is not None:
            aux['entropy'] = ent
        return out, aux

    # Per-tensor min/max (int_quantizer.py:361-379)
    if site_stats is not None:
        if cfg.stats_kind == 'mean':
            kmin, kmax = 'mean', 'mean'
        else:
            kmin, kmax = 'min', 'max'
        min_v = _stat(site_stats, 'min', kmin)
        max_v = _stat(site_stats, 'max', kmax)
    else:
        avg = ('activation' in tag) and ('classifier' not in tag)
        s = act_stats(x, ['min', 'max'], avg_over_batch=avg)
        min_v, max_v = s['min'], s['max']
    delta, offset = minmax_delta_offset(min_v, max_v, half_range=half)
    if cfg.stochastic:
        # stochastic rounding replaces the deterministic native kernel (this
        # is exactly where the reference's noise tensor would have applied,
        # gemmlowp.cu:16); the exact-affine special case doesn't apply
        return _apply_fake_quant(x, cfg, delta, offset, cfg.qmax, seed=seed), aux
    # The reference per-tensor min/max path runs through the native kernel
    # (int_quantizer.py:379) — exact-affine when the range doesn't straddle 0.
    return fake_quant_kernel_semantics(x, delta, offset, cfg.num_bits), aux


def quantize_weight(w, cfg: QuantConfig, *, out_axis: int = -1):
    """Quantize a weight tensor per output channel (or per tensor).

    Mirrors the pcq_w branch of IntQuantizer.__call__ plus
    gemmlowpQuantizeWeightsPerChannel (int_quantizer.py:104-109, 453-476) and
    the per-tensor fallthrough when pcq_w is off.  Weight correction
    (bias/variance) is applied by the engine on top of this, not here.
    Returns (w_q, aux).
    """
    aux: dict[str, Any] = {}
    if cfg.pcq_w:
        if cfg.mtd_quant:
            values, ent = mid_tread_quantize_tensor(
                w, cfg.target_weight(), clip=False, sym=True,
                per_channel=True, channel_axis=out_axis,
                measure_entropy=cfg.measure_entropy)
            if ent is not None:
                aux['entropy'] = ent
            return values, aux
        s = weight_stats_per_channel(w, ['min', 'max'], out_axis=out_axis)
        min_v, max_v = s['min'], s['max']
        bit_alloc = None
        if cfg.bit_alloc_weight and cfg.num_bits <= 4:
            std = weight_stats_per_channel(w, ['std'], out_axis=out_axis)['std']
            bit_alloc = get_bits_alloc_fixed_target(std, cfg.target_weight(),
                                                    cfg.bit_alloc_round)
        out, ent = _fake_quant_with_alloc(w, cfg, max_v - min_v, min_v, bit_alloc,
                                          channel_axis=out_axis)
        if ent is not None:
            aux['entropy'] = ent
        return out, aux

    # Per-tensor min/max fallthrough (tag 'weight' never batch-averages);
    # runs through the native kernel in the reference (int_quantizer.py:379).
    s = act_stats(w, ['min', 'max'])
    delta, offset = minmax_delta_offset(s['min'], s['max'],
                                        half_range=cfg.force_positive)
    return fake_quant_kernel_semantics(w, delta, offset, cfg.num_bits), aux
