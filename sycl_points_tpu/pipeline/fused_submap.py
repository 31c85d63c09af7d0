"""Shared fused submap-update program for the odometry pipelines.

Both LidarOdometry and LidarInertialOdometry submit the same keyframe
submap update (robust-weighted sampling -> map insert -> in-range
extraction -> covariance finalize, submapping.hpp:163-247) as ONE jitted
program gated by a device-side keyframe flag, so the host needs no
intermediate readbacks.  The program is re-built (re-jitted) after every
map-capacity growth; ``Submap.version`` tracks that.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sycl_points_tpu.ops.knn import BruteForceKNN
from sycl_points_tpu.ops.sampling import mixed_sampling, random_sampling
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.registration.registration import compute_icp_robust_weights


def build_submap_step(params, submap, use_pallas: bool,
                      robust_scale: Optional[float] = None,
                      *, ie=None, cfg=None):
    """Build the jitted submap-update program for the CURRENT map config.

    Returns a jit of ``(map_state, submap_prev, deskewed, T_eff, is_kf, key)
    -> (new_map_state, target, sampled, stats2)`` where ``stats2`` is
    ``[load, extract_overflow, extract_ok, dropped, budget_lost,
    n_extracted]`` (float32).  ``robust_scale=None`` uses the registration
    params' default scale for the sampling weights (LIO convention).

    ``ie``/``cfg`` override the submap's current insert-extract closure and
    map config — used by the background growth precompile to build the
    NEXT capacity's program ahead of the growth event (pure reads only).
    """
    sp = params.submap
    min_pts = params.registration.min_num_points
    num = sp.point_random_sampling_num
    ie = submap.insert_extract_fn if ie is None else ie
    finalize = submap.finalize_traced
    need_finalize = submap._need_covs or submap._need_normals
    if submap.is_occupancy:
        from sycl_points_tpu.mapping import occupancy_grid as _m
        cfg = submap.og_config if cfg is None else cfg
    else:
        from sycl_points_tpu.mapping import voxel_hash_map as _m
        cfg = submap.vhm_config if cfg is None else cfg

    def _zeros_sampled(deskewed):
        # the samplers return the cloud unchanged when num >= capacity,
        # so the structural dummy must match that shape
        cap = num if num < deskewed.capacity else deskewed.capacity

        def z(a):
            return None if a is None else jnp.zeros((cap,) + a.shape[1:], a.dtype)
        return PointCloud(
            points=jnp.zeros((cap, 3), jnp.float32),
            mask=jnp.zeros((cap,), bool),
            covs=z(deskewed.covs), normals=z(deskewed.normals),
            rgb=z(deskewed.rgb), intensities=z(deskewed.intensities),
            timestamp_offsets=z(deskewed.timestamp_offsets),
        )

    def _submap_step(map_state, submap_prev, deskewed, T_eff, is_kf, key):
        f32 = lambda x: jnp.asarray(x, jnp.float32)

        def do_update(_):
            n_desk = deskewed.count()
            knn_prev = BruteForceKNN(
                points=submap_prev.points, mask=submap_prev.mask,
                use_pallas=use_pallas,
            )

            def with_weights(k):
                w = compute_icp_robust_weights(
                    deskewed, submap_prev, knn_prev, T_eff,
                    params.registration.factor,
                    None if robust_scale is None else jnp.float32(robust_scale),
                )
                return mixed_sampling(
                    deskewed, num, w, k, sp.weighted_sampling_ratio
                )

            def without_weights(k):
                return random_sampling(deskewed, num, k)

            sampled = jax.lax.cond(
                n_desk > num, with_weights, without_weights, key
            )
            new_state, extracted, load, overflow = ie(map_state, sampled, T_eff)
            ext_ok = extracted.count() >= min_pts
            target = PointCloud(
                points=jnp.where(ext_ok, extracted.points, submap_prev.points),
                mask=jnp.where(ext_ok, extracted.mask, submap_prev.mask),
            )
            if need_finalize:
                target = finalize(target)
            stats2 = jnp.stack([
                f32(load), f32(overflow), f32(ext_ok),
                f32(new_state.dropped), f32(new_state.budget_lost),
                f32(extracted.count()),
            ])
            return new_state, target, sampled, stats2

        def no_update(_):
            stats2 = jnp.stack([
                f32(_m.load_factor(map_state, cfg)), f32(0.0), f32(0.0),
                f32(map_state.dropped), f32(map_state.budget_lost),
                f32(0.0),
            ])
            return map_state, submap_prev, _zeros_sampled(deskewed), stats2

        return jax.lax.cond(is_kf, do_update, no_update, None)

    return jax.jit(_submap_step)


def start_growth_precompile(pipeline, robust_scale, call_args) -> None:
    """Compile the NEXT map capacity's submap program in a background
    daemon thread, so a growth event swaps in a ready executable instead of
    stalling the frame stream for the 15-30 s growth recompile.

    ``call_args`` are the concrete arguments of a just-dispatched submap
    step — their shapes/dtypes (with the map state swapped for the grown
    capacity's) define the compile signature.  Thread-safety: the worker
    only reads immutable config/params and compiles (PJRT compilation is
    thread-safe); the compiled jit is published into
    ``pipeline._prebuilt_submap`` for ``_build_submap_step`` to pick up.
    """
    submap = pipeline.submap
    next_cap = submap.map_config.capacity * 2
    started = getattr(pipeline, "_prebuilt_started", set())
    pipeline._prebuilt_started = started
    if next_cap in started:
        return
    started.add(next_cap)

    import threading

    struct = lambda tree: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
    )
    arg_structs = struct(call_args)

    def work():
        try:
            next_cfg = submap.peek_grown_config()
            ie = submap.make_insert_extract(next_cfg)
            fn = build_submap_step(
                pipeline.params, submap, pipeline._use_pallas, robust_scale,
                ie=ie, cfg=next_cfg,
            )
            if submap.is_occupancy:
                from sycl_points_tpu.mapping import occupancy_grid as _m
            else:
                from sycl_points_tpu.mapping import voxel_hash_map as _m
            state_structs = jax.eval_shape(lambda: _m.create(next_cfg))
            fn.lower(state_structs, *arg_structs[1:]).compile()
            prebuilt = getattr(pipeline, "_prebuilt_submap", {})
            prebuilt[next_cap] = fn
            pipeline._prebuilt_submap = prebuilt
        except Exception:  # precompile is best-effort; growth falls back
            pass

    threading.Thread(target=work, daemon=True, name="growth-precompile").start()
