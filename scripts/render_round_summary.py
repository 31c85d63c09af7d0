"""Render the round summary tables FROM the committed JSON artifacts.

Round-3 verdict weak #1: hand-typed numbers in the round notes misquoted the
committed artifacts four times.  This script is the fix: the notes' numbers
are GENERATED from the JSONs, never typed.  Usage:

    python scripts/render_round_summary.py --round 4 >> ROUND4_NOTES.md

Prints a markdown section: one row per replay/fleet/stream artifact with its
headline numbers and telemetry counters, plus the BENCH_r{N} headline.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fmt(v):
    if v is None:
        return "—"
    if isinstance(v, float):
        return f"{v:g}"
    return str(v)


def _load(path):
    with open(path) as f:
        return json.load(f)


def replay_rows(round_no: int):
    rows = []
    for path in sorted(glob.glob(os.path.join(ROOT, "benchmarks", f"*_r{round_no}.json"))):
        d = _load(path)
        name = os.path.basename(path)
        if not isinstance(d, dict):
            continue  # list-style artifacts (bench suite) render separately
        cfg = d.get("config", "?")
        if "ms_per_fleet_frame" in d:  # fleet artifact
            hist = d.get("result_histogram")
            rows.append({
                "artifact": name, "config": cfg,
                "wall": f"{_fmt(d.get('ms_per_fleet_frame'))} ms/fleet-frame "
                        f"({_fmt(d.get('stream_frames_per_sec'))} stream-fps)",
                "ate": f"{_fmt(d.get('ate_translation_m_mean'))} (max "
                       f"{_fmt(d.get('ate_translation_m_max'))})",
                "counters": (
                    f"ok {_fmt(d.get('frames_ok'))}/{_fmt(d.get('frames_expected'))}"
                    + (f", hist {hist}" if hist else "")
                    + f", dropped {_fmt(d.get('map_dropped'))}"
                ),
            })
        elif cfg == "stream-serving" or "runs" in d:
            runs = d.get("runs", [d])
            for r in runs:
                rows.append({
                    "artifact": name,
                    "config": f"{r.get('config', cfg)} @ "
                              f"{_fmt(r.get('offered_hz'))} Hz "
                              f"({r.get('pipeline', '?')})",
                    "wall": f"served {_fmt(r.get('served_frames_per_sec'))} fps, "
                            f"e2e p50 {_fmt(r.get('ms_per_frame_e2e_median'))} / "
                            f"p99 {_fmt(r.get('ms_per_frame_e2e_p99'))} ms",
                    "ate": _fmt(r.get("ate_translation_m")),
                    "counters": (
                        f"queue_dropped {_fmt(r.get('scan_queue_dropped'))}, "
                        f"truncated {_fmt(r.get('frames_truncated_points'))}"
                    ),
                })
        elif "ms_per_frame_wall" in d:  # replay artifact
            ctr = (
                f"syncs {_fmt(d.get('device_syncs_per_frame'))}"
                f", dropped {_fmt(d.get('map_dropped'))}"
                f", budget_lost {_fmt(d.get('map_budget_lost'))}"
                f", extract_overflow {_fmt(d.get('extract_overflow_last'))}"
            )
            ate = _fmt(d.get("ate_translation_m"))
            if "oracle" in d:
                ate += f" (oracle {_fmt(d['oracle'].get('ate_translation_m'))})"
            if "gyro_bias_final_err" in d and (
                any(d.get("gyro_bias_true", [])) or any(d.get("accel_bias_true", []))
            ):
                ctr += (
                    f", bias_err g={d['gyro_bias_final_err']:.2g}"
                    f"/a={d['accel_bias_final_err']:.2g}"
                )
            rows.append({
                "artifact": name, "config": cfg,
                "wall": f"{_fmt(d.get('ms_per_frame_wall'))} ms/frame (median "
                        f"{_fmt(d.get('ms_per_frame_median'))}, max "
                        f"{_fmt(d.get('ms_per_frame_max'))})",
                "ate": ate,
                "counters": ctr,
            })
        elif "results" in d or "configs" in d:
            continue  # bench-suite style; summarized separately
    return rows


def bench_headline(round_no: int):
    path = os.path.join(ROOT, f"BENCH_r{round_no:02d}.json")
    if not os.path.exists(path):
        return None
    d = _load(path)
    # the driver wraps bench.py's JSON line inside the 'tail' field
    if "metric" not in d and "tail" in d:
        for line in reversed(d["tail"].splitlines()):
            line = line.strip()
            if line.startswith("{") and "metric" in line:
                try:
                    d = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
    if "metric" not in d:
        return None
    return (
        f"`BENCH_r{round_no:02d}.json`: {_fmt(d.get('value'))} "
        f"{_fmt(d.get('unit'))} ({_fmt(d.get('metric'))}, "
        f"vs_baseline {_fmt(d.get('vs_baseline'))})"
    )


def suite_rows(round_no: int):
    path = os.path.join(ROOT, "benchmarks", f"BENCH_SUITE_r{round_no}.json")
    if not os.path.exists(path):
        return []
    d = _load(path)
    entries = d if isinstance(d, list) else d.get("results", [])
    rows = []
    for r in entries:
        if not isinstance(r, dict):
            continue
        cfg = r.get("config", "?")
        nums = ", ".join(
            f"{k}={_fmt(v)}" for k, v in r.items()
            if k != "config" and isinstance(v, (int, float, str))
        )
        rows.append(f"| {cfg} | {nums} |")
    return rows


# lower-is-better metrics diffed round-over-round; >25% worse = red cell
_REGRESSION_METRICS_LOW = (
    "ms_per_frame_wall", "ms_per_frame_median", "ms_per_frame_max",
    "ate_translation_m", "ms_per_frame_e2e_median", "ms_per_frame_e2e_p99",
    "ms_per_fleet_frame",
)
_REGRESSION_METRICS_HIGH = ("served_frames_per_sec", "stream_frames_per_sec")
_REGRESSION_THRESHOLD = 0.25


def _flat_metrics(d: dict):
    out = {}
    for k in _REGRESSION_METRICS_LOW:
        if isinstance(d.get(k), (int, float)):
            out[k] = (float(d[k]), "low")
    for k in _REGRESSION_METRICS_HIGH:
        if isinstance(d.get(k), (int, float)):
            out[k] = (float(d[k]), "high")
    for k, v in (d.get("stage_ms") or {}).items():
        if isinstance(v, (int, float)):
            out[f"stage:{k}"] = (float(v), "low")
    return out


def regression_rows(round_no: int):
    """Diff every r{N} artifact against its r{N-1} counterpart on shared
    metrics; rows worse by > threshold are flagged — the loud-failure gate
    the r4 stats-fetch regression slipped past (verdict weak #3 + ask 4)."""
    prev = round_no - 1
    rows = []
    for path in sorted(glob.glob(os.path.join(ROOT, "benchmarks", f"*_r{round_no}.json"))):
        base = os.path.basename(path)
        if base.startswith(("BENCH_SUITE", "QUEUE_MANIFEST")):
            continue
        prev_path = os.path.join(
            ROOT, "benchmarks", base.replace(f"_r{round_no}.json", f"_r{prev}.json")
        )
        if not os.path.exists(prev_path):
            continue
        cur, old = _load(path), _load(prev_path)
        if not (isinstance(cur, dict) and isinstance(old, dict)):
            continue
        pairs = [(base, cur, old)]
        if "runs" in cur and "runs" in old:  # stream artifact
            old_by = {r.get("offered_hz"): r for r in old["runs"]}
            pairs = [
                (f"{base}@{r.get('offered_hz')}Hz", r, old_by[r.get("offered_hz")])
                for r in cur["runs"] if r.get("offered_hz") in old_by
            ]
        for tag, c, o in pairs:
            cm, om = _flat_metrics(c), _flat_metrics(o)
            for k in sorted(set(cm) & set(om)):
                new_v, sense = cm[k]
                old_v, _ = om[k]
                if old_v == 0:
                    continue
                delta = (new_v - old_v) / abs(old_v)
                worse = delta > _REGRESSION_THRESHOLD if sense == "low" else (
                    -delta > _REGRESSION_THRESHOLD
                )
                rows.append({
                    "artifact": tag, "metric": k,
                    "prev": old_v, "cur": new_v,
                    "delta_pct": round(delta * 100.0, 1),
                    "worse": worse,
                })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--fail-on-regression", action="store_true",
                    help="exit 1 when any metric regressed > 25% vs the "
                         "previous round (the queue runs this to fail loudly)")
    args = ap.parse_args()
    n = args.round

    print(f"## Round {n} artifact summary (generated — do not hand-edit)\n")
    print("Rendered by `scripts/render_round_summary.py` from the committed")
    print("JSONs; every number below IS the artifact.\n")
    hl = bench_headline(n)
    if hl:
        print(f"**Headline** — {hl}\n")
    rows = replay_rows(n)
    if rows:
        print("| artifact | config | wall | ATE [m] | counters |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(f"| `{r['artifact']}` | {r['config']} | {r['wall']} | "
                  f"{r['ate']} | {r['counters']} |")
        print()
    srows = suite_rows(n)
    if srows:
        print(f"`benchmarks/BENCH_SUITE_r{n}.json`:\n")
        print("| config | numbers |")
        print("|---|---|")
        for r in srows:
            print(r)
        print()

    rrows = regression_rows(n)
    flagged = [r for r in rrows if r["worse"]]
    if rrows:
        print(f"### Round-over-round regression table (r{n-1} -> r{n}, "
              f"flag at >{int(_REGRESSION_THRESHOLD*100)}%)\n")
        print("| artifact | metric | r{} | r{} | delta | |".format(n - 1, n))
        print("|---|---|---|---|---|---|")
        for r in rrows:
            mark = "**REGRESSED**" if r["worse"] else ""
            print(f"| `{r['artifact']}` | {r['metric']} | {_fmt(r['prev'])} | "
                  f"{_fmt(r['cur'])} | {r['delta_pct']:+.1f}% | {mark} |")
        print()
        if flagged:
            print(f"**{len(flagged)} metric(s) regressed beyond the threshold "
                  f"— each needs an explanation in the notes.**\n")
    if args.fail_on_regression and flagged:
        import sys
        for r in flagged:
            print(f"REGRESSION {r['artifact']} {r['metric']} "
                  f"{r['prev']} -> {r['cur']} ({r['delta_pct']:+.1f}%)",
                  file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
