"""Measure the reference oracle's wall-clock on synthetic datasets.

Writes/updates baseline_measured.json with keys
``{type}[_covis]_{maps_per_s,wall_s,solve_s}_{num}``. The covis variants are
loop-closure datasets (covis_radius=6, covis_max=6 — every bundled reference
dataset revisits landmarks, /root/reference/README.txt:63-65), which are the
bench datasets from round 4 on.

Usage: python tools/measure_baseline.py [--covis] [--types stereo,mono]
           [--sizes 64,128,...] [--keep-data DIR]
Results are flushed to the json after every run so a timeout keeps partials.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ORACLE = os.path.join(REPO, "tools", "oracle", "linearsfm_oracle")
BMJ = os.path.join(REPO, "baseline_measured.json")


def run_one(datatype, num, covis, seed=7, noise=0.005, keep_dir=None,
            pattern="loop"):
    from synth import generate as gen
    kw = dict(covis_radius=6.0, covis_max=6) if covis else {}
    t0 = time.time()
    maps, _, _ = gen.make_dataset(num, datatype, noise=noise, seed=seed,
                                  pattern=pattern, **kw)
    d = keep_dir or tempfile.mkdtemp(prefix=f"base_{datatype}_{num}_")
    gen.write_dataset(maps, d)
    gen_s = time.time() - t0
    typ = "Stereo" if datatype == "stereo" else "Monocular"
    t0 = time.time()
    r = subprocess.run(
        [ORACLE, "-path", d, "-num", str(num), "-type", typ,
         "-p", os.path.join(d, "pose_ref.txt"),
         "-f", os.path.join(d, "feat_ref.txt")],
        capture_output=True, timeout=7200, check=True)
    wall = time.time() - t0
    out = r.stdout.decode()
    m = re.search(r"Total Used Time:\s*([0-9.]+)", out)
    solve = float(m.group(1)) if m else wall
    if not keep_dir:
        import shutil
        shutil.rmtree(d, ignore_errors=True)
    return dict(wall=wall, solve=solve, gen=gen_s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--covis", action="store_true")
    ap.add_argument("--pattern", default="loop", choices=["loop", "grid"],
                    help="'grid' = AP_*-style aerial lawnmower sweep "
                         "(/root/reference/DataForC/AP_Vaihingen_C/*.txt:1); "
                         "keys gain a _grid tag, matching bench.py")
    ap.add_argument("--types", default="stereo,mono")
    ap.add_argument("--sizes", default="")
    ap.add_argument("--keep-data", default=None)
    args = ap.parse_args()

    sizes = {
        "stereo": [64, 128, 256, 512, 1024, 2048, 3499, 4096],
        "mono": [64, 128, 256, 512, 1024, 2048],
    }
    if args.sizes:
        ss = [int(x) for x in args.sizes.split(",")]
        sizes = {k: ss for k in sizes}

    data = {}
    if os.path.exists(BMJ):
        with open(BMJ) as fh:
            data = json.load(fh)

    tag = ("_covis" if args.covis else "") + \
          ("_grid" if args.pattern == "grid" else "")
    for datatype in args.types.split(","):
        for num in sizes[datatype]:
            key = f"{datatype}{tag}_maps_per_s_{num}"
            if key in data:
                print(f"skip {key} (have {data[key]:.1f})", flush=True)
                continue
            print(f"measuring {datatype}{tag} {num} ...", flush=True)
            keep = None
            if args.keep_data:
                keep = os.path.join(args.keep_data, f"{datatype}{tag}_{num}")
                os.makedirs(keep, exist_ok=True)
            try:
                r = run_one(datatype, num, args.covis, keep_dir=keep,
                            pattern=args.pattern)
            except Exception as e:  # noqa: BLE001
                print(f"  FAILED: {e}", flush=True)
                continue
            data[key] = (num - 1) / r["solve"]  # reference-reported solve time
            data[f"{datatype}{tag}_wall_s_{num}"] = r["wall"]
            data[f"{datatype}{tag}_solve_s_{num}"] = r["solve"]
            with open(BMJ, "w") as fh:
                json.dump(data, fh, indent=1)
            print(f"  wall {r['wall']:.2f}s solve {r['solve']:.2f}s "
                  f"({data[key]:.1f} maps/s; gen {r['gen']:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
