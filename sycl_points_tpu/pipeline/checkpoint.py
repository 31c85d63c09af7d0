"""Odometry checkpoint/resume (beyond-reference auxiliary subsystem).

The reference has no checkpointing (SURVEY.md section 5.4 — the closest is
the keyframe pose accessor).  For long production runs this module
serializes the full odometry state — pose/velocity bookkeeping, keyframe
poses, the persistent map arrays (voxel hash map or occupancy grid), and
the 15-DOF state/covariance for LIO — to a single ``.npz`` so a sequence
can resume mid-run.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Union

import jax.numpy as jnp
import numpy as np


def _flatten_state(prefix: str, state) -> dict:
    out = {}
    for f in dataclasses.fields(state) if dataclasses.is_dataclass(state) else []:
        out[f"{prefix}{f.name}"] = np.asarray(getattr(state, f.name))
    if not out and hasattr(state, "_fields"):  # NamedTuple
        for name in state._fields:
            out[f"{prefix}{name}"] = np.asarray(getattr(state, name))
    return out


def save_checkpoint(path: str, odometry) -> None:
    """Serialize a LidarOdometry / LidarInertialOdometry instance (or a
    pipelined subclass: the in-flight window is drained first so the host
    mirrors — which the device carry is rebuilt from on resume — are
    current)."""
    if hasattr(odometry, "flush"):
        odometry.flush()
    data = {
        "odom": np.asarray(odometry.odom),
        "prev_odom": np.asarray(odometry.prev_odom),
        "dt": np.float64(odometry.dt),
        "last_frame_time": np.float64(odometry.last_frame_time),
        "is_first_frame": np.bool_(odometry.is_first_frame),
        "frame_count": np.int64(getattr(odometry, "frame_count", 0)),
        "keyframe_poses": np.stack(odometry.submap.keyframe_poses),
        "last_keyframe_pose": np.asarray(odometry.submap.last_keyframe_pose),
        "last_keyframe_time": np.float64(odometry.submap.last_keyframe_time),
        "extract_capacity": np.int64(odometry.submap.extract_capacity),
    }
    data.update(_flatten_state("map_", odometry.submap.map_state))
    meta = {"kind": type(odometry).__name__, "is_occupancy": odometry.submap.is_occupancy}

    if hasattr(odometry, "linear_velocity"):
        data["linear_velocity"] = np.asarray(odometry.linear_velocity)
        data["angular_velocity"] = np.asarray(odometry.angular_velocity)
    if hasattr(odometry, "x"):  # LIO navigation state + covariance
        data.update(_flatten_state("x_", odometry.x))
        data["P_post"] = np.asarray(odometry.P_post)
        data["imu_R_world_at_reset"] = np.asarray(odometry.imu_R_world_at_reset)
        data["imu_v_world_at_reset"] = np.asarray(odometry.imu_v_world_at_reset)
    data["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **data)


def load_checkpoint(path: str, odometry) -> None:
    """Restore a previously saved state into a freshly constructed pipeline
    (must be built with the same parameters/capacities)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["__meta__"]).decode())
    compatible = {
        frozenset({"LidarOdometry", "PipelinedLidarOdometry"}),
        frozenset({"LidarInertialOdometry", "PipelinedLidarInertialOdometry"}),
    }
    kinds = {meta["kind"], type(odometry).__name__}
    if len(kinds) > 1 and frozenset(kinds) not in compatible:
        raise ValueError(
            f"checkpoint is for {meta['kind']}, not {type(odometry).__name__}"
        )
    # pipelined subclasses rebuild the device carry from the restored host
    # mirrors on the next frame
    if hasattr(odometry, "_carry"):
        odometry._carry = None
        odometry._pending.clear()

    odometry.odom = z["odom"]
    odometry.prev_odom = z["prev_odom"]
    odometry.dt = float(z["dt"])
    odometry.last_frame_time = float(z["last_frame_time"])
    odometry.is_first_frame = bool(z["is_first_frame"])
    if "frame_count" in z:  # keeps post-resume frame indices monotone
        odometry.frame_count = int(z["frame_count"])
    odometry.submap.keyframe_poses = list(z["keyframe_poses"])
    odometry.submap.last_keyframe_pose = z["last_keyframe_pose"]
    odometry.submap.last_keyframe_time = float(z["last_keyframe_time"])

    ms = odometry.submap.map_state
    kwargs = {}
    for name in ms.__dataclass_fields__:
        if f"map_{name}" in z:  # tolerate checkpoints predating new counters
            kwargs[name] = jnp.asarray(z[f"map_{name}"])
    sm = odometry.submap
    loaded_cap = int(kwargs["coords"].shape[0])
    want_ext = (
        int(z["extract_capacity"]) if "extract_capacity" in z
        else sm.extract_tier_for(loaded_cap)
    )
    if loaded_cap != sm.map_capacity or want_ext != sm.extract_capacity:
        # map (and/or extraction tier) had grown when saved
        if sm.is_occupancy:
            sm.og_config = dataclasses.replace(sm.og_config, capacity=loaded_cap)
        else:
            sm.vhm_config = dataclasses.replace(sm.vhm_config, capacity=loaded_cap)
        sm.extract_capacity = want_ext
        sm._rebuild_insert_extract()
    sm.map_state = dataclasses.replace(ms, **kwargs)
    # re-sync the drop mirror: map_state.dropped is cumulative, and a fresh
    # instance's _dropped_seen=0 would read a restored nonzero counter as a
    # new drop and fire the growth slow path on the first resumed frame
    if "map_dropped" in z:
        odometry._dropped_seen = int(z["map_dropped"])

    if "linear_velocity" in z:
        odometry.linear_velocity = z["linear_velocity"]
        odometry.angular_velocity = z["angular_velocity"]
        odometry.registrated = not odometry.is_first_frame
    if "x_position" in z and hasattr(odometry, "x"):
        odometry.x = type(odometry.x)(
            **{n: jnp.asarray(z[f"x_{n}"]) for n in odometry.x._fields}
        )
        odometry.P_post = jnp.asarray(z["P_post"])
        odometry.imu_R_world_at_reset = z["imu_R_world_at_reset"]
        odometry.imu_v_world_at_reset = z["imu_v_world_at_reset"]
        odometry.last_imu_reset_timestamp = float(z["last_frame_time"])
        # host mirrors of the device filter state (one-time sync at restore)
        if hasattr(odometry, "gyro_bias_np"):
            odometry.gyro_bias_np = np.asarray(odometry.x.gyro_bias)
            odometry.accel_bias_np = np.asarray(odometry.x.accel_bias)
            odometry.velocity_np = np.asarray(odometry.x.velocity)

    # Rebuild the registration target from the restored map.
    if not odometry.is_first_frame:
        center = jnp.asarray(odometry.odom[:3, 3])
        sm = odometry.submap
        if sm.is_occupancy:
            from sycl_points_tpu.mapping import occupancy_grid as og

            extracted = og.extract_occupied_points(
                sm.map_state, sm.og_config, center,
                sm.params.submap.max_distance_range,
                out_capacity=sm.extract_capacity,
            )
        else:
            from sycl_points_tpu.mapping import voxel_hash_map as vhm

            extracted = vhm.extract(
                sm.map_state, sm.vhm_config, center,
                sm.params.submap.max_distance_range,
                out_capacity=sm.extract_capacity, with_covs=False,
            )
        from sycl_points_tpu.ops.knn import build_target_knn

        sm.submap_cloud = sm._finalize_target(extracted)
        sm.submap_knn = build_target_knn(
            sm.submap_cloud,
            max_correspondence_distance=(
                sm.params.registration.factor.max_correspondence_distance
            ),
        )
