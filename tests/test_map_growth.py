"""Hash-map growth, overflow telemetry, and geometry-derived DDA budgets.

Covers the reference rehash policy (voxel_hash_map.hpp:847-934: grow at 0.7
load, never lose contributions) and the occupancy DDA step budget derived
from max_ray_distance/voxel_size (occupancy_grid_map.hpp:821-900 walks
unbounded; the static-shape analog must budget enough steps and count any
truncation).
"""

import numpy as np
import jax.numpy as jnp

from sycl_points_tpu.mapping import occupancy_grid as og
from sycl_points_tpu.mapping import voxel_hash_map as vhm
from sycl_points_tpu.points.point_cloud import PointCloud


def _grid_cloud(n, spacing=1.5, offset=0.0):
    """n points in distinct voxels (spacing > voxel_size=1)."""
    side = int(np.ceil(n ** (1 / 3)))
    g = np.arange(side, dtype=np.float32) * spacing + offset
    pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)[:n]
    return PointCloud.from_numpy(pts, capacity=n)


def test_vhm_growth_zero_loss_past_07_load():
    config = vhm.VoxelHashMapConfig(voxel_size=1.0, capacity=256, max_probes=8)
    state = vhm.create(config)
    eye = jnp.eye(4, dtype=jnp.float32)

    total = 0
    for batch in range(4):
        cloud = _grid_cloud(200, offset=batch * 400.0)  # all-unique voxels
        state, config = vhm.add_point_cloud_auto(state, config, cloud, eye)
        total += 200

    assert config.capacity > 256  # grew past the initial table
    assert int(state.dropped) == 0  # telemetry: nothing lost
    # zero lost contributions: every inserted point is accounted for
    assert float(jnp.sum(state.count)) == float(total)
    assert int(vhm.voxel_count(state)) == total  # all voxels unique
    assert float(vhm.load_factor(state, config)) <= 0.7 + 200 / config.capacity


def test_vhm_grow_preserves_payload_and_lookup():
    config = vhm.VoxelHashMapConfig(voxel_size=1.0, capacity=256)
    state = vhm.create(config)
    eye = jnp.eye(4, dtype=jnp.float32)
    cloud = _grid_cloud(64)
    state = vhm.add_point_cloud(state, config, cloud, eye)
    before = vhm.extract(state, config, jnp.zeros(3), 1e6, out_capacity=128,
                         with_covs=False)
    g_state, g_config = vhm.grow(state, config)
    assert g_config.capacity == 512
    after = vhm.extract(g_state, g_config, jnp.zeros(3), 1e6, out_capacity=128,
                        with_covs=False)
    b = np.asarray(before.points)[np.asarray(before.mask)]
    a = np.asarray(after.points)[np.asarray(after.mask)]
    np.testing.assert_allclose(
        b[np.lexsort(b.T)], a[np.lexsort(a.T)], atol=1e-6
    )
    # overlap lookup still finds every voxel through the new table
    ratio = vhm.compute_overlap_ratio(g_state, g_config, cloud, eye)
    assert float(ratio) == 1.0


def test_vhm_dropped_counter_without_growth():
    """Probe exhaustion on a deliberately tiny table is COUNTED, not silent."""
    config = vhm.VoxelHashMapConfig(voxel_size=1.0, capacity=64, max_probes=2)
    state = vhm.create(config)
    cloud = _grid_cloud(128)
    state = vhm.add_point_cloud(state, config, cloud, jnp.eye(4, dtype=jnp.float32))
    lost = int(state.dropped)
    kept = float(jnp.sum(state.count))
    assert lost > 0
    assert kept + lost == 128  # counter exactly accounts for the loss


def test_og_growth_zero_loss():
    config = og.OccupancyGridConfig(
        voxel_size=1.0, capacity=256, free_space_updates_enabled=False,
        voxel_pruning_enabled=False,
    )
    state = og.create(config)
    eye = jnp.eye(4, dtype=jnp.float32)
    total = 0
    for batch in range(3):
        cloud = _grid_cloud(150, offset=batch * 300.0 + 2.0)
        state, config = og.add_point_cloud_auto(state, config, cloud, eye)
        total += 150
    assert config.capacity > 256
    assert int(state.dropped) == 0
    assert float(jnp.sum(state.hit_count)) == float(total)


def test_og_ray_budget_derived_from_geometry():
    """A 50 m ray at 0.25 m voxels (~200 crossings) must carve the WHOLE ray
    with the auto budget; a deliberately small manual budget is counted."""
    config = og.OccupancyGridConfig(
        voxel_size=0.25, capacity=4096, max_ray_distance=50.0,
        voxel_pruning_enabled=False,
    )
    assert config.ray_step_budget >= int(np.sqrt(3) * 200)
    state = og.create(config)
    pts = np.array([[50.0, 0.0, 0.0]], np.float32)
    cloud = PointCloud.from_numpy(pts, capacity=4)
    state = og.add_point_cloud(state, config, cloud, jnp.eye(4, dtype=jnp.float32))
    assert int(state.truncated_rays) == 0
    # free space carved along the FULL ray, including near the far end
    for x in (1.1, 25.0, 49.1):
        p = og.voxel_probability(state, config, jnp.asarray([x, 0.1, 0.1]))
        assert float(p) < 0.5, f"voxel at x={x} not carved"
    # endpoint voxel is a hit
    p_hit = og.voxel_probability(state, config, jnp.asarray([50.05, 0.1, 0.1]))
    assert float(p_hit) > 0.5

    # truncation telemetry with a deliberately small manual budget
    small = og.OccupancyGridConfig(
        voxel_size=0.25, capacity=4096, max_ray_steps=32,
        voxel_pruning_enabled=False,
    )
    s2 = og.create(small)
    s2 = og.add_point_cloud(s2, small, cloud, jnp.eye(4, dtype=jnp.float32))
    assert int(s2.truncated_rays) == 1
    p_far = og.voxel_probability(s2, small, jnp.asarray([25.0, 0.1, 0.1]))
    assert float(p_far) == 0.5  # carving stopped before this voxel — unknown
