"""Offline calibration: collect per-site statistics, aggregate, persist.

Replaces the reference's StatisticManager / StatisticManagerPerChannel
singletons (reference: pytorch_quantizer/quantization/inference/
statistic_manager.py, statistic_manager_perchannel.py): a jitted collect step
emits per-batch stats pytrees; this module aggregates min/mean/max across
batches (the reference's summary CSV/pickle columns) and saves one .npz
artifact per (arch, config) — the de-facto checkpoint of the pipeline
(SURVEY.md §5).

Artifact layout: {site_id: {"scalar/<kind>_<stat>": scalar,
                            "channel/<kind>_<stat>": [C] vector}}.
"""

from __future__ import annotations

import os
from typing import Any, Iterable, Mapping

import numpy as np

KINDS = ('min', 'mean', 'max')


class StatsAggregator:
    """Running min/mean/max across batch-steps for each (site, stat)."""

    def __init__(self):
        self.count: dict[tuple[str, str], int] = {}
        self.sum: dict[tuple[str, str], np.ndarray] = {}
        self.min: dict[tuple[str, str], np.ndarray] = {}
        self.max: dict[tuple[str, str], np.ndarray] = {}

    def update(self, batch_stats: Mapping[str, Mapping[str, Any]]):
        for site, entry in batch_stats.items():
            for stat, value in entry.items():
                v = np.asarray(value, np.float64)
                key = (site, stat)
                if key not in self.count:
                    self.count[key] = 1
                    self.sum[key] = v.copy()
                    self.min[key] = v.copy()
                    self.max[key] = v.copy()
                else:
                    self.count[key] += 1
                    self.sum[key] += v
                    np.minimum(self.min[key], v, out=self.min[key])
                    np.maximum(self.max[key], v, out=self.max[key])

    def summary(self) -> dict[str, dict[str, np.ndarray]]:
        out: dict[str, dict[str, np.ndarray]] = {}
        for (site, stat), n in self.count.items():
            space, name = stat.split('/', 1)
            entry = out.setdefault(site, {})
            entry[f'{space}/min_{name}'] = self.min[(site, stat)].astype(np.float32)
            entry[f'{space}/mean_{name}'] = (self.sum[(site, stat)] / n).astype(np.float32)
            entry[f'{space}/max_{name}'] = self.max[(site, stat)].astype(np.float32)
        return out


def collect_statistics(collect_fn, params, batches: Iterable, *,
                       cal_set_size: int | None = None,
                       progress: bool = False):
    """Run the jitted collect step over ``batches`` and aggregate.

    ``cal_set_size`` stops after that many images (inference_sim.py:294-296).
    KLD thresholds are collected separately (calib/kld.py via the CLI's
    activation-capture path) since they need raw activations on host.
    """
    agg = StatsAggregator()
    seen = 0
    for images, _ in batches:
        if cal_set_size is not None and seen >= cal_set_size:
            break
        _, batch_stats = collect_fn(params, images)
        batch_stats = {k: {s: np.asarray(v) for s, v in e.items()}
                       for k, e in batch_stats.items()}
        agg.update(batch_stats)
        seen += images.shape[0]
    summary = agg.summary()
    return summary


def save_stats(path: str, summary: Mapping[str, Mapping[str, np.ndarray]]):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = {f'{site}|{stat}': np.asarray(v)
            for site, entry in summary.items() for stat, v in entry.items()}
    np.savez_compressed(path, **flat)


def load_stats(path: str) -> dict[str, dict[str, np.ndarray]]:
    out: dict[str, dict[str, np.ndarray]] = {}
    with np.load(path) as data:
        for key in data.files:
            site, stat = key.split('|', 1)
            out.setdefault(site, {})[stat] = data[key]
    return out


def default_stats_path(arch: str, *, per_channel: bool, base_dir: str | None = None,
                       suffix: str = '') -> str:
    base = base_dir or os.path.join(os.path.expanduser('~'), 'mxt-sim-tpu')
    sub = 'statistics/per_channel' if per_channel else 'statistics'
    return os.path.join(base, sub, f'{arch}{suffix}.npz')
