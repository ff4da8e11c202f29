"""Visualization contract: importable (unlike the reference's shadowed module)
and emits the expected PNG set."""

import os

import numpy as np


def test_visualize_gates_outputs(tmp_path):
    from mop_tpu.visualization import visualize_gates

    b = 3
    images = np.random.rand(b, 3, 32, 32).astype(np.float32)
    gates = np.random.rand(b, 1, 8, 8).astype(np.float32)
    views = np.random.rand(b, 2, 8, 8).astype(np.float32)
    kernels = np.random.rand(b, 1, 8, 8).astype(np.float32)
    out = str(tmp_path / "maps.png")
    visualize_gates(images, gates, views, kernels, save_path=out)
    assert os.path.exists(out)  # mosaic
    for i in range(b):
        assert os.path.exists(str(tmp_path / f"maps.gates.{i}.png"))
        assert os.path.exists(str(tmp_path / f"maps.sample.{i}.png"))
