"""Offline k-means (non-uniform) weight quantization CLI.

Reference: pytorch_quantizer/quantization/kmeans_quantization.py — cluster
each eligible weight tensor's values into 2^bits centroids (quantize) or
clip to the centroid range (clip), save the quantized params, then save a
bias-corrected variant (per-output-channel mean matching).

Skip rules mirror ``is_ignored`` (kmeans_quantization.py:33-39): classifier
weights (1000 outputs), first layer (3 input channels), biases, aux heads.

Usage:
  python -m cnn_quantization_tpu.cli.kmeans_quantization -a resnet18 \
      --weights resnet18.npz -bits 4 [-t clip]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def quantize1d_kmeans(x: np.ndarray, num_bits: int = 8, seed: int = 0) -> np.ndarray:
    """Replace each value with its k-means centroid (2^bits clusters)."""
    from sklearn.cluster import KMeans
    flat = x.reshape(-1, 1)
    k = min(2 ** num_bits, len(np.unique(flat)))
    km = KMeans(n_clusters=k, random_state=seed, n_init=1).fit(flat)
    return km.cluster_centers_[km.predict(flat)].reshape(x.shape).astype(x.dtype)


def clip1d_kmeans(x: np.ndarray, num_bits: int = 8, seed: int = 0) -> np.ndarray:
    """Clip values to the k-means centroid range."""
    from sklearn.cluster import KMeans
    flat = x.reshape(-1, 1)
    k = min(2 ** num_bits, len(np.unique(flat)))
    km = KMeans(n_clusters=k, random_state=seed, n_init=1).fit(flat)
    return np.clip(x, km.cluster_centers_.min(), km.cluster_centers_.max())


def is_ignored(path: str, kernel: np.ndarray) -> bool:
    """Classifier / first layer / aux tower weights stay fp32."""
    if kernel.ndim == 2 and kernel.shape[-1] == 1000:
        return True
    if kernel.ndim == 4 and kernel.shape[2] == 3:  # HWIO in_ch==3
        return True
    if 'AuxLogits' in path or 'Conv2d_2a_3x3' in path:
        return True
    return False


def process_params(params, num_bits: int, task: str = 'quantize',
                   bias_corr: bool = False, progress: bool = True):
    """Return a new params tree with k-means-quantized kernels."""
    from ..engine.engine import iter_weight_leaves
    from tqdm import tqdm

    fn = quantize1d_kmeans if task == 'quantize' else clip1d_kmeans
    leaves = list(iter_weight_leaves(params))
    out = _deep_copy(params)
    it = tqdm(leaves) if progress else leaves
    for path, leaf in it:
        k = np.asarray(leaf['kernel'])
        if is_ignored(path, k):
            continue
        kq = fn(k, num_bits=num_bits)
        if bias_corr:
            axes = tuple(range(k.ndim - 1))
            mean_delta = kq.mean(axis=axes) - k.mean(axis=axes)
            kq = kq - mean_delta
        _set_kernel(out, path, kq.astype(np.float32))
    return out


def _deep_copy(tree):
    if isinstance(tree, dict):
        return {k: _deep_copy(v) for k, v in tree.items()}
    return np.asarray(tree)


def _set_kernel(tree, path, value):
    node = tree
    for seg in path.split('/'):
        node = node[seg]
    node['kernel'] = value


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--arch', '-a', default='resnet18')
    p.add_argument('--weights', '-w', default=None,
                   help='.npz params or torch .pth (random init if absent)')
    p.add_argument('-bits', '--num_bits', default=4, type=int)
    p.add_argument('-t', '--task', default='quantize', choices=['quantize', 'clip'])
    p.add_argument('--out_dir', default=os.path.join(os.path.expanduser('~'),
                                                     'mxt-sim-tpu', 'models'))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..models import build_model
    from ..engine import TapContext
    from ..utils.checkpoint import save_params_npz, load_params_npz

    model, meta = build_model(args.arch)
    if args.weights and args.weights.endswith('.npz'):
        params = load_params_npz(args.weights)
    elif args.weights:
        from ..utils.torch_import import load_torch_checkpoint, import_arch
        params = import_arch(args.arch, load_torch_checkpoint(args.weights),
                             fold_bn=meta.fold_bn)
    else:
        print('=> no weights; random init (demo mode)')
        s = meta.input_size
        params = jax.jit(lambda k: model.init(
            k, jnp.zeros((1, s, s, 3)), TapContext())['params'])(jax.random.PRNGKey(0))

    print(f'{args.task} {args.arch} to {args.num_bits} bits')
    pq = process_params(params, args.num_bits, args.task)
    path = os.path.join(args.out_dir, f'{args.arch}_kmeans{args.num_bits}bit.npz')
    save_params_npz(path, pq)
    print(f'Saved quantized model to {path}')

    pq_bc = process_params(params, args.num_bits, args.task, bias_corr=True)
    path_bc = path.replace('.npz', '_bcorr.npz')
    save_params_npz(path_bc, pq_bc)
    print(f'Saved quantized model with bias correction to {path_bc}')
    print('Done')
    return 0


if __name__ == '__main__':
    sys.exit(main())
