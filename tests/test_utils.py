"""Utility modules: noise generators and memory reporting."""

import numpy as np

from tomofastx_tpu.utils import memory, noise


def test_gaussian_noise_statistics():
    rng = np.random.default_rng(0)
    x = noise.gaussian_noise(rng, 200000, std=2.5)
    assert abs(x.mean()) < 0.05
    assert abs(x.std() - 2.5) < 0.05


def test_uniform_noise_bounds():
    rng = np.random.default_rng(1)
    x = noise.uniform_noise(rng, 10000, amplitude=3.0)
    assert x.min() >= -3.0 and x.max() <= 3.0
    assert abs(x.mean()) < 0.1


def test_add_relative_noise():
    rng = np.random.default_rng(2)
    d = np.ones(10000)
    out = noise.add_relative_noise(rng, d, 0.01)
    assert abs(np.std(out - d) - 0.01) < 0.002


def test_memory_report():
    rep = memory.report()
    assert "MEMORY USED (host)" in rep
    assert memory.host_memory_gb() > 0.0
