import numpy as np

import jax.numpy as jnp

from sycl_points_tpu.ops.prefix_sum import (
    compaction_indices,
    compaction_offsets,
    exclusive_scan,
    inclusive_scan,
    scatter_compact,
)


def test_scans():
    x = jnp.asarray([1, 2, 3, 4])
    np.testing.assert_array_equal(np.asarray(inclusive_scan(x)), [1, 3, 6, 10])
    np.testing.assert_array_equal(np.asarray(exclusive_scan(x)), [0, 1, 3, 6])


def test_compaction():
    flags = jnp.asarray([True, False, True, True, False])
    offsets, count = compaction_offsets(flags)
    assert int(count) == 3
    idx = np.asarray(compaction_indices(flags))
    np.testing.assert_array_equal(idx, [0, -1, 1, 2, -1])

    vals = jnp.arange(5.0)
    out = np.asarray(scatter_compact(vals, flags, 5))
    np.testing.assert_array_equal(out[:3], [0.0, 2.0, 3.0])
