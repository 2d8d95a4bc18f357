"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-host logic is validated the standard JAX way:
XLA_FLAGS=--xla_force_host_platform_device_count=8 gives 8 independent CPU
devices to shard over without TPU hardware (SURVEY.md §4).

Note: this machine's sitecustomize registers the experimental ``axon`` TPU
platform and force-sets ``jax_platforms=axon,cpu`` via jax.config — env vars
alone don't override that, so we update jax.config after import.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax

jax.config.update('jax_platforms', 'cpu')
