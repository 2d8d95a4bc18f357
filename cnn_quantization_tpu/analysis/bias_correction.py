"""Empirical study of per-channel weight-quantization bias.

Reference: bias_correction.ipynb — measures the normalized bias
|E[w] - E[w_q]| / sigma(w) per output channel after int4 quantization,
motivating the eq. 12/13 correction.  Run against any params tree; prints
the before/after-correction summary and optionally saves a histogram.

  python -m cnn_quantization_tpu.analysis.bias_correction -a resnet18
"""

from __future__ import annotations

import argparse

import numpy as np


def channel_bias(params, num_bits: int = 4):
    """Per-layer arrays of |E[w]-E[w_q]|/sigma before and after correction."""
    import jax.numpy as jnp
    from ..engine.engine import iter_weight_leaves
    from ..ops.quantizer import QuantConfig, quantize_weight
    from ..ops.bias_corr import weight_correction

    cfg = QuantConfig(num_bits=num_bits, pcq_w=True)
    rows = {}
    for path, leaf in iter_weight_leaves(params):
        w = np.asarray(leaf['kernel'], np.float32)
        if w.ndim != 4 or w.shape[2] == 3:
            continue
        wq, _ = quantize_weight(jnp.asarray(w), cfg, out_axis=-1)
        wq = np.asarray(wq)
        wc = np.asarray(weight_correction(w, wq, out_axis=-1, bias_corr=True))
        flat = w.reshape(-1, w.shape[-1])
        sig = flat.std(axis=0) + 1e-12
        bias_q = np.abs(flat.mean(0) - wq.reshape(-1, w.shape[-1]).mean(0)) / sig
        bias_c = np.abs(flat.mean(0) - wc.reshape(-1, w.shape[-1]).mean(0)) / sig
        rows[path] = (bias_q, bias_c)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--arch', '-a', default='resnet18')
    p.add_argument('-bits', '--num_bits', default=4, type=int)
    p.add_argument('--weights', '-w', default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..models import build_model
    from ..engine import TapContext

    model, meta = build_model(args.arch)
    if args.weights:
        from ..utils.torch_import import load_torch_checkpoint, import_arch
        params = import_arch(args.arch, load_torch_checkpoint(args.weights),
                             fold_bn=meta.fold_bn)
    else:
        s = meta.input_size
        params = jax.jit(lambda k: model.init(
            k, jnp.zeros((1, s, s, 3)), TapContext())['params'])(jax.random.PRNGKey(0))

    rows = channel_bias(params, args.num_bits)
    all_q = np.concatenate([q for q, _ in rows.values()])
    all_c = np.concatenate([c for _, c in rows.values()])
    print(f'{args.arch} int{args.num_bits}: mean normalized channel bias '
          f'{all_q.mean():.4f} -> {all_c.mean():.6f} after correction '
          f'({len(rows)} layers, {all_q.size} channels)')
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        plt.hist(all_q, bins=60, alpha=0.6, label='quantized')
        plt.hist(all_c, bins=60, alpha=0.6, label='bias-corrected')
        plt.xlabel('|E[w] - E[w_q]| / sigma'); plt.legend()
        plt.savefig(f'{args.arch}_bias_err.png', dpi=120)
        print(f'saved {args.arch}_bias_err.png')
    except Exception:
        pass


if __name__ == '__main__':
    main()
