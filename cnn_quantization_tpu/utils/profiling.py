"""Profiling and roofline accounting.

The reference's only timing is a wall-clock batch meter
(inference_sim.py:279, 328-329); SURVEY.md §5 calls for jax.profiler traces
and per-kernel roofline accounting.  This module provides:

  * ``cost_analysis(fn, *args)`` — XLA's compiled FLOP/byte estimates,
  * ``roofline_report`` — achieved vs peak utilization for a measured
    throughput,
  * ``trace`` — context manager around jax.profiler for TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax

# per-chip peaks (dense) — TPU v5e datasheet numbers
PEAKS = {
    'tpu v5 lite': {'bf16_flops': 197e12, 'int8_ops': 394e12, 'hbm_gbps': 819e9},
    'tpu v5': {'bf16_flops': 459e12, 'int8_ops': 918e12, 'hbm_gbps': 1228e9},
    'cpu': {'bf16_flops': 1e12, 'int8_ops': 2e12, 'hbm_gbps': 50e9},
}


def device_peaks():
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in PEAKS.items():
        if key in kind:
            return peaks
    return PEAKS['cpu']


def cost_analysis(fn, *args):
    """XLA cost analysis of the jitted fn: {'flops', 'bytes accessed', ...}."""
    compiled = jax.jit(fn).lower(*args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a list per computation
        costs = costs[0]
    return dict(costs or {})


@dataclasses.dataclass
class RooflineReport:
    flops_per_call: float
    bytes_per_call: float
    calls_per_sec: float
    achieved_flops: float
    achieved_bw: float
    peak_flops: float
    peak_bw: float

    @property
    def compute_util(self):
        return self.achieved_flops / self.peak_flops

    @property
    def bandwidth_util(self):
        return self.achieved_bw / self.peak_bw

    @property
    def bound(self):
        return 'compute' if self.compute_util >= self.bandwidth_util else 'memory'

    @property
    def mem_roofline_mfu(self):
        """The compute utilization the memory roofline permits at this
        byte count: flops / (peak_flops * bytes / peak_bw).  compute_util
        close to this value means the path is running at the HBM limit and
        only reducing bytes-per-call can raise MFU further."""
        if self.bytes_per_call == 0:
            return float('inf')
        return (self.flops_per_call / self.bytes_per_call
                * self.peak_bw / self.peak_flops)

    def __str__(self):
        return (f'{self.flops_per_call / 1e9:.2f} GFLOP/call @ '
                f'{self.calls_per_sec:.1f} calls/s -> '
                f'{self.achieved_flops / 1e12:.1f} TFLOP/s '
                f'({self.compute_util:.1%} of peak), '
                f'{self.achieved_bw / 1e9:.0f} GB/s '
                f'({self.bandwidth_util:.1%} of HBM) [{self.bound}-bound]')


def roofline_report(fn, args, calls_per_sec: float, *, int8: bool = False):
    costs = cost_analysis(fn, *args)
    peaks = device_peaks()
    flops = float(costs.get('flops', 0.0))
    byts = float(costs.get('bytes accessed', 0.0))
    return RooflineReport(
        flops_per_call=flops, bytes_per_call=byts, calls_per_sec=calls_per_sec,
        achieved_flops=flops * calls_per_sec, achieved_bw=byts * calls_per_sec,
        peak_flops=peaks['int8_ops'] if int8 else peaks['bf16_flops'],
        peak_bw=peaks['hbm_gbps'])


@contextlib.contextmanager
def trace(logdir: str = '/tmp/jax-trace'):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
