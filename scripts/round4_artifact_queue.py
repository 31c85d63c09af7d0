"""Round-4 TPU artifact queue: every on-chip artifact for the round, run
sequentially (the chip and the host tunnel are single-tenant).  Markers let
retries skip completed jobs after a mid-run wedge.

Usage: timeout 28800 python scripts/round4_artifact_queue.py [tag ...]
(no args = all jobs in order; tags select a subset)
"""
import json
import os
import runpy
import sys
import traceback

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.getcwd() not in sys.path:
    sys.path.insert(0, os.getcwd())

JOBS = [
    # headline (ask 10) — keep green
    ("bench_headline", "bench.py", []),
    # standard replays, sync + pipelined (round-over-round continuity)
    ("replay", "benchmarks/bench_odometry_replay.py",
     ["--json", "benchmarks/REPLAY_r4.json"]),
    ("replay_pl", "benchmarks/bench_odometry_replay.py",
     ["--pipelined", "--json", "benchmarks/REPLAY_PL_r4.json"]),
    # ask 2: motion-distorted sequence evidence, deskew on vs off (LO/VICP).
    # Speed 0.7 m/frame puts the per-scan skew well above the 1 m map voxel
    # (at the default 0.35 the distortion drowned in the discretization and
    # the on/off ATEs were statistically indistinguishable — kept as the
    # *_SLOW artifacts for the record).
    ("deskew_on", "benchmarks/bench_odometry_replay.py",
     ["--distort", "--deskew", "on", "--speed", "0.7",
      "--json", "benchmarks/REPLAY_DESKEW_r4.json"]),
    ("deskew_off", "benchmarks/bench_odometry_replay.py",
     ["--distort", "--deskew", "off", "--speed", "0.7",
      "--json", "benchmarks/REPLAY_DESKEW_OFF_r4.json"]),
    ("deskew_on_slow", "benchmarks/bench_odometry_replay.py",
     ["--distort", "--deskew", "on",
      "--json", "benchmarks/REPLAY_DESKEW_SLOW_r4.json"]),
    ("deskew_off_slow", "benchmarks/bench_odometry_replay.py",
     ["--distort", "--deskew", "off",
      "--json", "benchmarks/REPLAY_DESKEW_SLOW_OFF_r4.json"]),
    # ask 2: LIO with IMU deskew on distorted scans
    ("lio_deskew_on", "benchmarks/bench_lio_replay.py",
     ["--distort", "--deskew", "on", "--speed", "0.7",
      "--json", "benchmarks/REPLAY_DESKEW_LIO_r4.json"]),
    ("lio_deskew_off", "benchmarks/bench_lio_replay.py",
     ["--distort", "--deskew", "off", "--speed", "0.7",
      "--json", "benchmarks/REPLAY_DESKEW_LIO_OFF_r4.json"]),
    # ask 3: bias-free LIO baseline + injected-bias convergence
    ("lio", "benchmarks/bench_lio_replay.py",
     ["--json", "benchmarks/REPLAY_LIO_r4.json"]),
    # rw densities raised so the bias prior lets the filter adapt at a
    # realistic MEMS rate (the default 1e-5/1e-4 stiffness allows only
    # ~3e-4 m/s^2 of accel-bias motion over the whole run).  Gyro bias is
    # the observable one on a planar yaw-only trajectory; accel bias is
    # weakly observable by construction (z absorbs into gravity) — the
    # artifact records both honestly, the control proves no bias is
    # INVENTED and the ATE cost of the injected bias stays bounded.
    ("lio_bias", "benchmarks/bench_lio_replay.py",
     ["--frames", "120",
      "--gyro-bias", "0.02,-0.01,0.015", "--accel-bias", "0.05,0.03,-0.04",
      "--gyro-bias-rw", "1e-4", "--accel-bias-rw", "1e-3",
      "--json", "benchmarks/REPLAY_LIO_BIAS_r4.json"]),
    # bias-free control at the SAME rw densities / length (the ATE-unchanged
    # comparison must not mix prior stiffnesses)
    ("lio_bias_control", "benchmarks/bench_lio_replay.py",
     ["--frames", "120",
      "--gyro-bias-rw", "1e-4", "--accel-bias-rw", "1e-3",
      "--json", "benchmarks/REPLAY_LIO_BIAS_CTRL_r4.json"]),
    # asks 1+6+7: growth replays with ladder warm start, extract tiering,
    # and an ample-capacity oracle ATE control in the same artifact
    ("growth_sync", "benchmarks/bench_odometry_replay.py",
     ["--frames", "300", "--speed", "0.6", "--hard",
      "--map-capacity", "1024", "--map-voxel", "0.5", "--kf-points", "2048",
      "--precompile-growth", "65536", "--oracle-capacity", str(1 << 17),
      "--json", "benchmarks/REPLAY_GROWTH_r4.json"]),
    ("growth_pl", "benchmarks/bench_odometry_replay.py",
     ["--frames", "300", "--speed", "0.6", "--hard", "--pipelined",
      "--map-capacity", "1024", "--map-voxel", "0.5", "--kf-points", "2048",
      "--precompile-growth", "65536", "--oracle-capacity", str(1 << 17),
      "--json", "benchmarks/REPLAY_GROWTH_PL_r4.json"]),
    # occupancy-grid replays (carve budget evidence)
    ("replay_og", "benchmarks/bench_odometry_replay.py",
     ["--map-type", "OCCUPANCY_GRID_MAP",
      "--json", "benchmarks/REPLAY_OG_r4.json"]),
    ("replay_pl_og", "benchmarks/bench_odometry_replay.py",
     ["--map-type", "OCCUPANCY_GRID_MAP", "--pipelined",
      "--json", "benchmarks/REPLAY_PL_OG_r4.json"]),
    # ask 8: carve-on-cycle at the pipeline level (same replay, cycle=2)
    ("replay_og_c2", "benchmarks/bench_odometry_replay.py",
     ["--map-type", "OCCUPANCY_GRID_MAP", "--og-carve-cycle", "2",
      "--json", "benchmarks/REPLAY_OG_C2_r4.json"]),
    # ask 9: coarse-to-fine through the PIPELINE params at a full-cloud tier
    ("replay_fullcloud_c2f", "benchmarks/bench_odometry_replay.py",
     ["--scan-points", "30000", "--reg-sampling", "0",
      "--coarse-to-fine", "20", "--frames", "30", "--warmup", "5",
      "--json", "benchmarks/REPLAY_FULLCLOUD_C2F_r4.json"]),
    # ask 7: fleet with per-result-type histograms
    ("fleet", "benchmarks/bench_fleet.py",
     ["--streams", "8", "--frames", "40",
      "--json", "benchmarks/FLEET_r4.json"]),
    ("fleet_lio", "benchmarks/bench_fleet.py",
     ["--streams", "8", "--frames", "40", "--lio",
      "--json", "benchmarks/FLEET_LIO_r4.json"]),
    # ask 4: the live-serving benchmark at three offered rates
    # warmup 10: the first ~5 frames carry jit compiles whose end-to-end
    # latencies would otherwise dominate the percentiles.  Rates bracket the
    # measured closed-loop ceiling (~12 fps on the dev tunnel): 10 Hz must
    # serve with zero QoS drops; 20 Hz documents over-capacity behavior
    # (keep-last queue drops, latest-scan semantics).
    ("stream_closed", "benchmarks/bench_stream.py",
     ["--hz", "0", "--warmup", "10", "--json", "/tmp/stream_r4_closed.json"]),
    ("stream_10", "benchmarks/bench_stream.py",
     ["--hz", "10", "--warmup", "10", "--json", "/tmp/stream_r4_10.json"]),
    ("stream_20", "benchmarks/bench_stream.py",
     ["--hz", "20", "--warmup", "10", "--json", "/tmp/stream_r4_20.json"]),
    # ask 10 + 8: refreshed bench suite (configs 5/6 re-pinned; config 7
    # carries the carve cycle=2 number)
    ("bench_suite", "benchmarks/bench_suite.py",
     ["--json", "benchmarks/BENCH_SUITE_r4.json"]),
]


def merge_stream_artifact():
    runs = []
    for tag in ("closed", "10", "20"):
        path = f"/tmp/stream_r4_{tag}.json"
        if os.path.exists(path):
            with open(path) as f:
                runs.append(json.load(f))
    if runs:
        with open("benchmarks/STREAM_r4.json", "w") as f:
            json.dump({"config": "stream-serving", "runs": runs}, f, indent=1)
        print("=== wrote benchmarks/STREAM_r4.json", flush=True)


def main():
    only = set(sys.argv[1:])
    for tag, path, argv in JOBS:
        if only and tag not in only:
            continue
        marker = f"/tmp/r4_done_{tag}"
        if os.path.exists(marker):
            print(f"=== SKIP {tag}", flush=True)
            continue
        print(f"=== RUNNING {tag}", flush=True)
        sys.argv = [path] + argv
        try:
            runpy.run_path(path, run_name="__main__")
        except SystemExit as e:
            if e.code not in (0, None):
                print(f"=== {tag} exited {e.code}", flush=True)
                sys.exit(1)
        except Exception:
            traceback.print_exc()
            sys.exit(1)
        open(marker, "w").close()
        print(f"=== {tag} done", flush=True)
    merge_stream_artifact()
    print("=== ALL DONE", flush=True)


if __name__ == "__main__":
    main()
