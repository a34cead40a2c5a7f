"""In-kernel bitonic lane sort (ops/pallas_sort.py) vs numpy."""

import numpy as np
import pytest

from raytrace_tpu.ops.pallas_sort import sort_lanes_by_key


@pytest.mark.parametrize("t", [128, 256, 1024])
def test_sorts_ascending(t):
    rng = np.random.default_rng(t)
    keys = rng.integers(0, 64, (3, t), dtype=np.int32)
    sk, order = map(np.asarray, sort_lanes_by_key(keys))
    for g in range(3):
        assert np.array_equal(sk[g], np.sort(keys[g]))
        # order is a permutation reproducing the sorted keys
        assert np.array_equal(np.sort(order[g]), np.arange(t))
        assert np.array_equal(keys[g][order[g]], sk[g])


def test_already_sorted_and_reverse():
    t = 256
    up = np.arange(t, dtype=np.int32)[None]
    sk, order = map(np.asarray, sort_lanes_by_key(up))
    assert np.array_equal(sk[0], up[0])
    assert np.array_equal(order[0], up[0])
    down = up[:, ::-1].copy()
    sk, order = map(np.asarray, sort_lanes_by_key(down))
    assert np.array_equal(sk[0], up[0])


def test_non_power_of_two_rejected():
    with pytest.raises(ValueError):
        sort_lanes_by_key(np.zeros((1, 384), np.int32))
