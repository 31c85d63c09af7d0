"""Round-5 TPU artifact queue: every on-chip artifact for the round, run
sequentially (the chip and the host tunnel are single-tenant; NEVER run the
CPU test suite concurrently — host contention inflated r4's committed
numbers 2x, verdict weak #3).

Round-5 asks covered (VERDICT.md "Next round"):
  1  distorted LIO with fixed deskew (+trace artifact)
  2  paced serving with per-frame server telemetry
  4  regression table vs r4 (render_round_summary --fail-on-regression)
  5  KITTI-scale raw-features preprocess + range-image KNN metrics
  6  growth replays with ladder precompile (+oracle_note)
  7  3-D-excited bias observability pair
  9  slow-sequence deskew on/off with --noise-seed variance repeats
  10 scripts/check_artifacts.py gates the queue before the notes render

Usage: timeout 28800 python scripts/round5_artifact_queue.py [tag ...]
(no args = all jobs in order; tags select a subset).  /tmp/r5_done_* markers
let retries skip completed jobs after a mid-run wedge.
"""
import json
import os
import runpy
import subprocess
import sys
import traceback

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.getcwd() not in sys.path:
    sys.path.insert(0, os.getcwd())

JOBS = [
    # headline — keep green
    ("bench_headline", "bench.py", []),
    # standard replays (continuity + the r4 stats-fetch regression recheck on
    # an idle host, ask 4)
    ("replay", "benchmarks/bench_odometry_replay.py",
     ["--json", "benchmarks/REPLAY_r5.json"]),
    ("replay_pl", "benchmarks/bench_odometry_replay.py",
     ["--pipelined", "--json", "benchmarks/REPLAY_PL_r5.json"]),
    # ask 1: distorted LIO, deskew on/off at speed 0.7 — the r4 failure case.
    # Done-criteria: deskew-on ATE <= 2x undistorted, beats OFF, invents
    # <= 0.005 rad/s gyro bias.  --trace dumps the 15-DOF iteration trace.
    ("lio_deskew_on", "benchmarks/bench_lio_replay.py",
     ["--distort", "--deskew", "on", "--speed", "0.7",
      "--trace", "benchmarks/TRACE_DESKEW_LIO_r5.npz",
      "--json", "benchmarks/REPLAY_DESKEW_LIO_r5.json"]),
    ("lio_deskew_off", "benchmarks/bench_lio_replay.py",
     ["--distort", "--deskew", "off", "--speed", "0.7",
      "--json", "benchmarks/REPLAY_DESKEW_LIO_OFF_r5.json"]),
    # LIO undistorted controls: baseline (0.35) + the speed-matched control
    # the r4 comparison lacked
    ("lio", "benchmarks/bench_lio_replay.py",
     ["--json", "benchmarks/REPLAY_LIO_r5.json"]),
    ("lio_v07", "benchmarks/bench_lio_replay.py",
     ["--speed", "0.7", "--json", "benchmarks/REPLAY_LIO_V07_r5.json"]),
    # LO deskew pair at 0.7 (continuity with r4)
    ("deskew_on", "benchmarks/bench_odometry_replay.py",
     ["--distort", "--deskew", "on", "--speed", "0.7",
      "--json", "benchmarks/REPLAY_DESKEW_r5.json"]),
    ("deskew_off", "benchmarks/bench_odometry_replay.py",
     ["--distort", "--deskew", "off", "--speed", "0.7",
      "--json", "benchmarks/REPLAY_DESKEW_OFF_r5.json"]),
    # ask 9: the slow pair where r4 saw deskew HURT (0.215 on vs 0.154 off)
    # — on/off x 3 noise seeds quantifies run-to-run variance honestly
    *[(f"deskew_slow_{mode}_ns{ns}", "benchmarks/bench_odometry_replay.py",
       ["--distort", "--deskew", mode, "--noise-seed", str(ns),
        "--json", f"benchmarks/REPLAY_DESKEW_SLOW_{mode.upper()}_NS{ns}_r5.json"])
      for ns in (0, 1, 2) for mode in ("on", "off")],
    # ask 7: 3-D-excited bias observability pair (accel bias separable from
    # gravity; 150 frames for the adaptation to converge) + control
    ("lio_bias_3d", "benchmarks/bench_lio_replay.py",
     ["--frames", "150", "--excite3d",
      "--gyro-bias", "0.02,-0.01,0.015", "--accel-bias", "0.05,0.03,-0.04",
      "--gyro-bias-rw", "1e-4", "--accel-bias-rw", "1e-3",
      "--json", "benchmarks/REPLAY_LIO_BIAS3D_r5.json"]),
    ("lio_bias_3d_control", "benchmarks/bench_lio_replay.py",
     ["--frames", "150", "--excite3d",
      "--gyro-bias-rw", "1e-4", "--accel-bias-rw", "1e-3",
      "--json", "benchmarks/REPLAY_LIO_BIAS3D_CTRL_r5.json"]),
    # ask 6: growth replays with the full ladder precompile; ample-capacity
    # oracle with the now-mandatory oracle_note
    ("growth_sync", "benchmarks/bench_odometry_replay.py",
     ["--frames", "300", "--speed", "0.6", "--hard",
      "--map-capacity", "1024", "--map-voxel", "0.5", "--kf-points", "2048",
      "--precompile-growth", "65536", "--oracle-capacity", str(1 << 17),
      "--json", "benchmarks/REPLAY_GROWTH_r5.json"]),
    ("growth_pl", "benchmarks/bench_odometry_replay.py",
     ["--frames", "300", "--speed", "0.6", "--hard", "--pipelined",
      "--map-capacity", "1024", "--map-voxel", "0.5", "--kf-points", "2048",
      "--precompile-growth", "65536", "--oracle-capacity", str(1 << 17),
      "--json", "benchmarks/REPLAY_GROWTH_PL_r5.json"]),
    # occupancy-grid continuity
    ("replay_og", "benchmarks/bench_odometry_replay.py",
     ["--map-type", "OCCUPANCY_GRID_MAP",
      "--json", "benchmarks/REPLAY_OG_r5.json"]),
    ("replay_pl_og", "benchmarks/bench_odometry_replay.py",
     ["--map-type", "OCCUPANCY_GRID_MAP", "--pipelined",
      "--json", "benchmarks/REPLAY_PL_OG_r5.json"]),
    # full-cloud c2f continuity
    ("replay_fullcloud_c2f", "benchmarks/bench_odometry_replay.py",
     ["--scan-points", "30000", "--reg-sampling", "0",
      "--coarse-to-fine", "20", "--frames", "30", "--warmup", "5",
      "--json", "benchmarks/REPLAY_FULLCLOUD_C2F_r5.json"]),
    # fleet continuity
    ("fleet", "benchmarks/bench_fleet.py",
     ["--streams", "8", "--frames", "40",
      "--json", "benchmarks/FLEET_r5.json"]),
    ("fleet_lio", "benchmarks/bench_fleet.py",
     ["--streams", "8", "--frames", "40", "--lio",
      "--json", "benchmarks/FLEET_LIO_r5.json"]),
    # ask 2: serving — closed loop, 10 Hz (must deliver >= 59/60, 0 drops,
    # p99 < 150 ms) and 20 Hz (graceful keep-last degradation with RECENT
    # poses); server breakdown telemetry rides the artifacts
    ("stream_closed", "benchmarks/bench_stream.py",
     ["--hz", "0", "--warmup", "10", "--json", "/tmp/stream_r5_closed.json"]),
    ("stream_10", "benchmarks/bench_stream.py",
     ["--hz", "10", "--warmup", "10", "--json", "/tmp/stream_r5_10.json"]),
    ("stream_20", "benchmarks/bench_stream.py",
     ["--hz", "20", "--warmup", "10", "--json", "/tmp/stream_r5_20.json"]),
    # ask 5 + 10: the refreshed suite (raw-features preprocess, range-image
    # KNN, the e2e north-star pair metric)
    ("bench_suite", "benchmarks/bench_suite.py",
     ["--json", "benchmarks/BENCH_SUITE_r5.json"]),
]


def merge_stream_artifact():
    runs = []
    for tag in ("closed", "10", "20"):
        path = f"/tmp/stream_r5_{tag}.json"
        if os.path.exists(path):
            with open(path) as f:
                runs.append(json.load(f))
    if runs:
        with open("benchmarks/STREAM_r5.json", "w") as f:
            json.dump({"config": "stream-serving", "runs": runs}, f, indent=1)
        print("=== wrote benchmarks/STREAM_r5.json", flush=True)


def write_manifest():
    """QUEUE_MANIFEST_r5.json: artifact path -> argv that produced it
    (consumed by scripts/check_artifacts.py — flags-vs-artifact guard)."""
    manifest = {}
    for tag, path, argv in JOBS:
        tgt = None
        for flag in ("--json",):
            if flag in argv:
                tgt = argv[argv.index(flag) + 1]
        if tgt is None:
            continue
        if tgt.startswith("/tmp/"):
            tgt = "benchmarks/STREAM_r5.json"  # merged later
            manifest.setdefault(tgt, argv)
            continue
        manifest[tgt] = argv
    with open("benchmarks/QUEUE_MANIFEST_r5.json", "w") as f:
        json.dump(manifest, f, indent=1)


_PROBE = (
    "import time, jax, jax.numpy as jnp\n"
    "f = jax.jit(lambda x: (x*2.0).sum())\n"
    "jax.device_get(f(jnp.ones(8)))\n"
    "t0 = time.perf_counter()\n"
    "for _ in range(4): jax.device_get(f(jnp.ones(8)))\n"
    "print((time.perf_counter() - t0) / 4 * 1e3)\n"
)


def wait_for_healthy_tunnel(max_wait_s: float = 7200.0,
                            floor_limit_ms: float = 80.0) -> float:
    """Block until the axon tunnel answers a trivial readback under the
    floor limit (subprocess probe so a wedged tunnel cannot hang the
    queue).  The r4 queue ran jobs through a degrading tunnel and committed
    2x-inflated numbers without noticing (verdict weak #3); r5 gates every
    job on measured link health instead."""
    import subprocess as sp
    import time as _time

    t0 = _time.time()
    while _time.time() - t0 < max_wait_s:
        try:
            out = sp.run([sys.executable, "-c", _PROBE], timeout=90,
                         capture_output=True, text=True)
            if out.returncode == 0:
                floor = float(out.stdout.strip().splitlines()[-1])
                if floor < floor_limit_ms:
                    return floor
                print(f"=== tunnel floor {floor:.1f} ms > {floor_limit_ms}; "
                      "waiting 120 s", flush=True)
            else:
                print("=== tunnel probe failed; waiting 120 s", flush=True)
        except sp.TimeoutExpired:
            print("=== tunnel probe HUNG (wedged); waiting 120 s", flush=True)
        _time.sleep(120.0)
    raise RuntimeError("tunnel never became healthy")


def main():
    only = set(sys.argv[1:])
    write_manifest()
    for tag, path, argv in JOBS:
        if only and tag not in only:
            continue
        marker = f"/tmp/r5_done_{tag}"
        if os.path.exists(marker):
            print(f"=== SKIP {tag}", flush=True)
            continue
        floor = wait_for_healthy_tunnel()
        print(f"=== RUNNING {tag} (tunnel floor {floor:.1f} ms)", flush=True)
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
    # ask 10: gate the artifacts, then render the summary + regression table
    rc = subprocess.run(
        [sys.executable, "scripts/check_artifacts.py", "--round", "5"]
    ).returncode
    print(f"=== check_artifacts rc={rc}", flush=True)
    with open("/tmp/round5_summary.md", "w") as f:
        subprocess.run(
            [sys.executable, "scripts/render_round_summary.py", "--round", "5"],
            stdout=f,
        )
    print("=== summary rendered to /tmp/round5_summary.md "
          "(append to ROUND5_NOTES.md)", flush=True)
    print("=== ALL DONE", flush=True)


if __name__ == "__main__":
    main()
