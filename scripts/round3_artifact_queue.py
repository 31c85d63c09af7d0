"""Round-3 TPU artifact queue: run after tunnel recovery.
Markers let retries skip completed jobs after a mid-run wedge."""
import os, runpy, sys, traceback
os.chdir("/root/repo")
if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")
JOBS = [
    ("bench_headline", "bench.py", []),
    ("growth_pl", "benchmarks/bench_odometry_replay.py",
     ["--frames", "300", "--speed", "0.6", "--hard", "--pipelined",
      "--map-capacity", "1024", "--map-voxel", "0.5", "--kf-points", "2048",
      "--precompile-growth", "65536",
      "--json", "benchmarks/REPLAY_GROWTH_PL_r3.json"]),
    ("fleet", "benchmarks/bench_fleet.py",
     ["--streams", "8", "--frames", "40",
      "--json", "benchmarks/FLEET_r3.json"]),
    ("fleet_lio", "benchmarks/bench_fleet.py",
     ["--streams", "8", "--frames", "40", "--lio",
      "--json", "benchmarks/FLEET_LIO_r3.json"]),
    ("grid_warm", "scripts/probe_grid_warm_build.py", []),
    ("coarse_crossover", "scripts/measure_coarse_crossover.py", []),
]
for tag, path, argv in JOBS:
    marker = f"/tmp/combo8_done_{tag}"
    if os.path.exists(marker):
        print(f"=== SKIP {tag}", flush=True); continue
    print(f"=== RUNNING {tag}", flush=True)
    sys.argv = [path] + argv
    try:
        runpy.run_path(path, run_name="__main__")
    except SystemExit as e:
        if e.code not in (0, None):
            print(f"=== {tag} exited {e.code}", flush=True); sys.exit(1)
    except Exception:
        traceback.print_exc(); sys.exit(1)
    open(marker, "w").close()
    print(f"=== {tag} done", flush=True)
print("=== ALL DONE", flush=True)
