"""Native C++ prefetch loader: build, correctness, epoch-permutation property."""

import numpy as np
import pytest

from mop_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.is_available(), reason="g++ / native build unavailable"
)


def test_batches_are_valid_rows():
    n, c, h, w = 64, 3, 8, 8
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (n, c, h, w), dtype=np.uint8)
    # encode the row id into the first byte so provenance is checkable
    for i in range(n):
        x[i, 0, 0, 0] = i
    y = np.arange(n, dtype=np.int32)
    it = native_loader.NativeBatchIterator(x, y, batch=16, seed=7)
    seen = []
    for _ in range(4):  # one epoch
        xb, yb = next(it)
        assert xb.shape == (16, c, h, w) and yb.shape == (16,)
        for j in range(16):
            row = int(xb[j, 0, 0, 0])
            assert yb[j] == row  # label rides with its sample
            np.testing.assert_array_equal(xb[j], x[row])
            seen.append(row)
    # one full epoch must be a permutation of the dataset
    assert sorted(seen) == list(range(n))
    it.close()


def test_epochs_reshuffle():
    n = 32
    x = np.zeros((n, 1, 2, 2), np.uint8)
    for i in range(n):
        x[i, 0, 0, 0] = i
    y = np.arange(n, dtype=np.int32)
    it = native_loader.NativeBatchIterator(x, y, batch=n, seed=3)
    e1 = next(it)[1].copy()
    e2 = next(it)[1].copy()
    assert sorted(e1) == sorted(e2) == list(range(n))
    assert not np.array_equal(e1, e2)  # different shuffles
    it.close()
