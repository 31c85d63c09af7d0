"""Artifact sanity checker (round-4 verdict ask 10).

Validates the round's committed benchmark JSONs BEFORE the notes render:

1. **No negative timings** — any numeric leaf under a timing-shaped key
   (``*_ms``, ``ms_per_*``, ``*_sec``, ``*fps*``, ``latency*``) must be
   >= 0 (r4 shipped ``vhm_extract_ms: -0.213`` without comment: the
   marginal-subtraction noise exceeded the quantity).
2. **Flags match the queue** — when the round's queue manifest
   (``benchmarks/QUEUE_MANIFEST_r{N}.json``, written by the artifact queue)
   exists, each artifact's recorded ``run_params``/``config`` must agree
   with the argv that produced it (r4's notes misquoted the stream rates).
3. **Oracle comparisons surfaced** — artifacts carrying an ample-capacity
   ``oracle`` control must also carry ``oracle_note`` explaining the
   run-vs-oracle ATE difference (r4's oracle ATE was WORSE than the run and
   nobody discussed it).

Exit code 1 on any violation; run it in the queue after the artifacts land
and before rendering ROUND{N}_NOTES.md.

Usage: python scripts/check_artifacts.py --round 5 [paths...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_TIMING_KEY = re.compile(
    r"(_ms$|^ms_|ms_per|_msec$|_sec$|_seconds$|fps|latency|_wall$|queue_wait|process_ms)"
)
# timing keys that legitimately may be absent/null but never negative
_SKIP_KEYS = {"timestamp", "t_ms"}


def _walk(node, path=""):
    if isinstance(node, dict):
        for k, v in node.items():
            yield from _walk(v, f"{path}.{k}" if path else str(k))
    elif isinstance(node, list):
        for i, v in enumerate(node):
            yield from _walk(v, f"{path}[{i}]")
    else:
        yield path, node


def check_negative_timings(path, data, errors):
    for key_path, value in _walk(data):
        leaf = key_path.rsplit(".", 1)[-1].split("[", 1)[0]
        if leaf in _SKIP_KEYS:
            continue
        if not isinstance(value, (int, float)) or isinstance(value, bool):
            continue
        if _TIMING_KEY.search(leaf) and value < 0.0:
            errors.append(
                f"{os.path.basename(path)}: negative timing {key_path} = {value}"
            )


_FLAG_TO_PARAM = {
    "--speed": ("speed", float),
    "--frames": ("frames", int),
    "--deskew": ("deskew", str),
    "--rings": ("rings", int),
    "--az": ("az", int),
    "--imu-hz": ("imu_hz", int),
    "--gyro-bias-rw": ("gyro_bias_rw", float),
    "--accel-bias-rw": ("accel_bias_rw", float),
    "--map-capacity": ("map_capacity_initial", int),
    "--map-voxel": ("map_voxel", float),
    "--kf-points": ("kf_points", int),
    "--scan-points": ("scan_points", int),
    "--reg-sampling": ("reg_sampling", int),
    "--coarse-to-fine": ("coarse_to_fine", int),
    "--og-carve-cycle": ("og_carve_cycle", int),
    "--hz": ("offered_hz", float),
}
_STORE_TRUE_TO_PARAM = {
    "--distort": "distort",
    "--excite3d": "excite3d",
    "--pipelined": "pipelined",
    "--hard": "hard",
}


def check_flags(path, data, argv, errors):
    rp = dict(data.get("run_params") or {})
    # top-level fallbacks (stream artifacts record offered_hz/frames there)
    for k in ("offered_hz", "frames"):
        if k not in rp and k in data:
            rp[k] = data[k]
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok in _FLAG_TO_PARAM:
            name, cast = _FLAG_TO_PARAM[tok]
            want = cast(argv[i + 1])
            i += 2
            if name in rp and rp[name] is not None:
                got = cast(rp[name])
                if got != want:
                    errors.append(
                        f"{os.path.basename(path)}: {name} = {got} but queue "
                        f"passed {tok} {want}"
                    )
        elif tok in _STORE_TRUE_TO_PARAM:
            name = _STORE_TRUE_TO_PARAM[tok]
            i += 1
            if name in rp and not rp[name]:
                errors.append(
                    f"{os.path.basename(path)}: {name} false but queue passed {tok}"
                )
        else:
            i += 1


def check_oracle(path, data, errors):
    for run in data.get("runs", [data]) if isinstance(data, dict) else []:
        if isinstance(run, dict) and "oracle" in run and "oracle_note" not in run:
            errors.append(
                f"{os.path.basename(path)}: has an 'oracle' control but no "
                f"'oracle_note' discussing run-vs-oracle ATE (r4 weak #6d)"
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("paths", nargs="*", help="explicit artifact paths (default: "
                    "benchmarks/*_r{N}.json + BENCH_r{N:02d}.json)")
    args = ap.parse_args()
    n = args.round

    paths = args.paths or sorted(
        glob.glob(os.path.join(ROOT, "benchmarks", f"*_r{n}.json"))
    )
    manifest_path = os.path.join(ROOT, "benchmarks", f"QUEUE_MANIFEST_r{n}.json")
    manifest = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)

    errors = []
    checked = 0
    for path in paths:
        if os.path.basename(path).startswith("QUEUE_MANIFEST"):
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            errors.append(f"{os.path.basename(path)}: unreadable ({e})")
            continue
        checked += 1
        check_negative_timings(path, data, errors)
        if isinstance(data, dict):
            check_oracle(path, data, errors)
            rel = os.path.relpath(path, ROOT)
            argv = manifest.get(rel) or manifest.get(os.path.basename(path))
            if argv:
                check_flags(path, data, argv, errors)

    # every queue-manifest artifact must exist (a job that silently never ran
    # is itself an artifact-hygiene failure)
    for rel in manifest:
        p = os.path.join(ROOT, rel)
        if not os.path.exists(p):
            errors.append(f"{rel}: in the queue manifest but never written")

    if errors:
        print(f"check_artifacts: {len(errors)} violation(s) in {checked} artifacts:")
        for e in errors:
            print(f"  FAIL {e}")
        return 1
    print(f"check_artifacts: {checked} artifacts clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
