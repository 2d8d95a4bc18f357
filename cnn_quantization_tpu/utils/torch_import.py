"""Convert torchvision-style checkpoints into our Flax parameter pytrees,
folding BatchNorm into the preceding conv/linear at load time.

This subsumes the reference's runtime BN folding
(reference: utils/absorb_bn.py:5-41 — invstd scaling of weights, running-mean
shift of bias, affine gamma/beta merge; grouped convs excluded) as a pure
checkpoint transformation: folded architectures simply have no BN parameters
in the converted tree.

Input format: a flat ``{torch_key: numpy array}`` state dict (load .pth with
torch on host, or .npz).  No torch dependency at import time.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

BN_EPS = 1e-5


def _module_prefixes(state: Mapping[str, np.ndarray]):
    """Ordered module prefixes (everything before the last dot)."""
    seen = []
    for k in state:
        prefix = k.rsplit('.', 1)[0]
        if prefix not in seen:
            seen.append(prefix)
    return seen


def _is_bn(state, prefix):
    return f'{prefix}.running_mean' in state


def _is_conv(state, prefix):
    w = state.get(f'{prefix}.weight')
    return w is not None and w.ndim == 4


def _is_linear(state, prefix):
    w = state.get(f'{prefix}.weight')
    return w is not None and w.ndim == 2


def fold_bn_state(state: Mapping[str, np.ndarray], eps: float = BN_EPS):
    """Fold each BN into the directly preceding conv/linear (absorb_bn.py:34-41).

    Grouped/depthwise convs (weight in_ch == 1 with out_ch > 1) are left
    unfolded, matching ``is_absorbing``'s groups==1 restriction
    (absorb_bn.py:31).  Returns (new_state, folded_bn_prefixes).
    """
    state = dict(state)
    prefixes = _module_prefixes(state)
    folded = []
    for prev, cur in zip(prefixes, prefixes[1:]):
        if not _is_bn(state, cur):
            continue
        w = state.get(f'{prev}.weight')
        if w is None or w.ndim not in (2, 4):
            continue
        if w.ndim == 4 and w.shape[1] == 1 and w.shape[0] > 1:
            continue  # depthwise: reference does not absorb grouped convs
        rm = state[f'{cur}.running_mean'].astype(np.float64)
        rv = state[f'{cur}.running_var'].astype(np.float64)
        invstd = 1.0 / np.sqrt(rv + eps)
        w = w.astype(np.float64)
        b = state.get(f'{prev}.bias')
        b = np.zeros(w.shape[0]) if b is None else b.astype(np.float64)
        shape = (-1,) + (1,) * (w.ndim - 1)
        w = w * invstd.reshape(shape)
        b = (b - rm) * invstd
        gamma = state.get(f'{cur}.weight')
        beta = state.get(f'{cur}.bias')
        if gamma is not None:
            w = w * gamma.astype(np.float64).reshape(shape)
            b = b * gamma.astype(np.float64) + beta.astype(np.float64)
        state[f'{prev}.weight'] = w.astype(np.float32)
        state[f'{prev}.bias'] = b.astype(np.float32)
        for suffix in ('running_mean', 'running_var', 'weight', 'bias',
                       'num_batches_tracked'):
            state.pop(f'{cur}.{suffix}', None)
        folded.append(cur)
    return state, folded


def _flax_path(torch_prefix: str) -> tuple[str, ...]:
    """'layer1.0.downsample.1' -> ('layer1_0', 'downsample_1').

    Rule: purely numeric path segments merge into their parent segment with
    an underscore — this is exactly how our model definitions name
    container children.
    """
    parts = []
    for seg in torch_prefix.split('.'):
        if re.fullmatch(r'\d+', seg) and parts:
            parts[-1] = f'{parts[-1]}_{seg}'
        else:
            parts.append(seg)
    return tuple(parts)


def state_dict_to_params(state: Mapping[str, np.ndarray], *,
                         fold_bn: bool = True,
                         flatten_inputs: Mapping[str, tuple[int, int, int]] | None = None,
                         skip_prefixes: tuple[str, ...] = ()):
    """Convert a torch state dict into a Flax params tree.

    ``flatten_inputs`` maps the flax path ('.'-joined) of any linear layer
    that consumes a flattened conv feature map to its (C, H, W) input shape;
    its kernel columns are permuted from CHW order to our HWC flatten order.
    """
    if skip_prefixes:
        state = {k: v for k, v in state.items()
                 if not any(k.startswith(p) for p in skip_prefixes)}
    if fold_bn:
        state, _ = fold_bn_state(state)
    flatten_inputs = flatten_inputs or {}

    params: dict[str, Any] = {}
    for prefix in _module_prefixes(state):
        path = _flax_path(prefix)
        w = state.get(f'{prefix}.weight')
        leaf: dict[str, np.ndarray] = {}
        if _is_bn(state, prefix):
            leaf = {
                'scale': state.get(f'{prefix}.weight'),
                'bias': state.get(f'{prefix}.bias'),
                'mean': state[f'{prefix}.running_mean'],
                'var': state[f'{prefix}.running_var'],
            }
            leaf = {k: np.asarray(v, np.float32) for k, v in leaf.items() if v is not None}
        elif w is not None and w.ndim == 4:
            leaf['kernel'] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)  # OIHW->HWIO
            if f'{prefix}.bias' in state:
                leaf['bias'] = np.asarray(state[f'{prefix}.bias'], np.float32)
        elif w is not None and w.ndim == 2:
            wk = np.asarray(w, np.float32)
            key = '.'.join(path)
            if key in flatten_inputs:
                c, h, wd = flatten_inputs[key]
                wk = wk.reshape(wk.shape[0], c, h, wd).transpose(0, 2, 3, 1).reshape(wk.shape[0], -1)
            leaf['kernel'] = wk.T
            if f'{prefix}.bias' in state:
                leaf['bias'] = np.asarray(state[f'{prefix}.bias'], np.float32)
        else:
            continue

        node = params
        for seg in path[:-1]:
            node = node.setdefault(seg, {})
        node[path[-1]] = leaf
    return params


def load_torch_checkpoint(path: str):
    """Load a .pth/.pt state dict into {key: np.ndarray} (torch on host)."""
    import torch  # local import: torch is optional at runtime
    obj = torch.load(path, map_location='cpu', weights_only=False)
    if hasattr(obj, 'state_dict'):
        obj = obj.state_dict()
    if 'state_dict' in obj and isinstance(obj['state_dict'], dict):
        obj = obj['state_dict']
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, 'detach')}


# (C, H, W) feature-map shapes at the conv->linear flatten point, needed to
# permute the first classifier kernel into HWC flatten order.
FLATTEN_INPUTS = {
    'vgg11': {'classifier_0': (512, 7, 7)},
    'vgg13': {'classifier_0': (512, 7, 7)},
    'vgg16': {'classifier_0': (512, 7, 7)},
    'vgg19': {'classifier_0': (512, 7, 7)},
    'vgg16_bn': {'classifier_0': (512, 7, 7)},
    'alexnet': {'classifier_1': (256, 6, 6)},
}


def import_arch(arch: str, state: Mapping[str, np.ndarray], fold_bn: bool):
    skip = ('AuxLogits',) if arch == 'inception_v3' else ()
    eps = 1e-3 if arch == 'inception_v3' else BN_EPS
    if fold_bn:
        state, _ = fold_bn_state(
            {k: v for k, v in state.items()
             if not any(k.startswith(p) for p in skip)}, eps=eps)
        fold = False
    else:
        fold = False
        state = {k: v for k, v in state.items()
                 if not any(k.startswith(p) for p in skip)}
    return state_dict_to_params(
        state, fold_bn=fold,
        flatten_inputs=FLATTEN_INPUTS.get(arch.replace('_bn', ''), FLATTEN_INPUTS.get(arch)))
