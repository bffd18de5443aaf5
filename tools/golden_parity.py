"""One-command golden-number parity check vs the reference (BASELINE.md).

The north-star parity criterion is: KITTI eigen abs_rel and δ<1.25 within
0.001 of the PyTorch reference's own `evaluate_depth.py` output on the
released HuggingFace checkpoints (reference README.md:149-180 gives the
commands). This container has neither KITTI nor the released weights
(zero egress), so parity has never been *computed* — this script makes it
mechanical the day they become reachable:

    # single-frame (converts .pth on the fly, runs our eval, compares)
    python tools/golden_parity.py --kitti_path /data/kitti \
        --ckpt ResNet18_KITTI_MR.pth --backbone ResNet18

    # multi-frame (eigen_benchmark protocol via evaluate_depth_mf)
    python tools/golden_parity.py --kitti_path /data/kitti \
        --ckpt ResNet18_KITTI_MR.pth --backbone ResNet18 --mf \
        --weights_dir ./weights   # IFRNet_S_KITTI.pth lives here

Golden numbers come from one of two sources (checked in this order):
  1. --golden golden.json — metrics recorded from a prior run of the
     reference's evaluate_depth.py on a CUDA box, shaped
     {"eigen": {"abs_rel": ..., "a1": ...}, "eigen_benchmark": {...}}.
  2. --run_reference — invoke /root/reference/evaluate_depth.py as a
     subprocess with the same data/ckpt and parse its printed metric row
     (requires a CUDA-capable torch; the reference calls .cuda()).

Exit code 0 = every compared metric within --tolerance (default 0.001,
per BASELINE.json), 1 = any miss, 2 = no golden source available.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

METRICS = ("abs_rel", "a1")  # the BASELINE.json parity pair
ALL_NAMES = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def run_ours(args) -> dict:
    """Run our evaluate_depth(-mf) in-process, capturing per-split metrics."""
    from mono_vifi_tpu import evaluation

    results = {}
    orig = evaluation._report

    def record_report(errors, ratios, use_stereo, printer=print):
        out = orig(errors, ratios, use_stereo, printer=printer)
        results[record_report.current_split] = out
        return out

    evaluation._report = record_report
    try:
        if args.mf:
            import evaluate_depth_mf as ev

            argv = [
                "--pretrained_path", args.ckpt, "--backbone", args.backbone,
                "--kitti_path", args.kitti_path, "--batch_size",
                str(args.batch_size), "--num_workers", str(args.num_workers),
                "--weights_dir", args.weights_dir, "--vfi_scale",
                args.vfi_scale,
            ]
        else:
            import evaluate_depth as ev

            argv = [
                "--pretrained_path", args.ckpt, "--backbone", args.backbone,
                "--kitti_path", args.kitti_path, "--batch_size",
                str(args.batch_size), "--num_workers", str(args.num_workers),
            ]
            if args.post_process:
                argv.append("--post_process")

        # evaluate_kitti is called once per split, in (eigen,
        # eigen_benchmark) order — tag the recorder accordingly
        splits = iter(("eigen", "eigen_benchmark"))
        wrapped = ev.evaluation.evaluate_kitti

        def tagged(*a, **kw):
            record_report.current_split = next(splits)
            return wrapped(*a, **kw)

        ev.evaluation.evaluate_kitti = tagged
        try:
            ev.main(ev.eval_args(argv))
        finally:
            ev.evaluation.evaluate_kitti = wrapped
    finally:
        evaluation._report = orig
    return results


def run_reference(args) -> dict:
    """Run the reference's own evaluate_depth.py (CUDA required) and parse
    the printed metric rows (reference evaluate_depth.py:192-193 prints the
    7 metrics in ALL_NAMES order after an 'abs_rel' header line)."""
    script = "evaluate_depth_mf.py" if args.mf else "evaluate_depth.py"
    cmd = [
        sys.executable, os.path.join(args.reference, script),
        "--pretrained_path", args.ckpt, "--backbone", args.backbone,
        "--kitti_path", args.kitti_path, "--batch_size", str(args.batch_size),
    ]
    if args.post_process and not args.mf:
        cmd.append("--post_process")
    print(f"-> running reference: {' '.join(cmd)}")
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=args.reference
    )
    if out.returncode != 0:
        print(out.stdout[-2000:])
        print(out.stderr[-2000:])
        raise RuntimeError(f"reference eval failed (rc={out.returncode})")
    rows = re.findall(
        r"abs_rel[^\n]*\n[^\d\-]*((?:[-\d.]+\s*[|&]?\s*){7})", out.stdout
    )
    golden = {}
    for split, row in zip(("eigen", "eigen_benchmark"), rows):
        vals = [float(v) for v in re.findall(r"[-\d.]+", row)]
        golden[split] = dict(zip(ALL_NAMES, vals))
    if not golden:
        print(out.stdout[-2000:])
        raise RuntimeError("could not parse reference metric rows")
    return golden


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--kitti_path", required=True)
    p.add_argument("--ckpt", required=True, help="reference .pth or our .pkl")
    p.add_argument("--backbone", default="ResNet18",
                   choices=["ResNet18", "ResNet50", "LiteMono", "DHRNet"])
    p.add_argument("--mf", action="store_true",
                   help="multi-frame protocol (evaluate_depth_mf)")
    p.add_argument("--vfi_scale", default="small", choices=["small", "large"])
    p.add_argument("--weights_dir", default="./weights")
    p.add_argument("--post_process", action="store_true")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--golden", type=str,
                   help="json of recorded reference metrics per split")
    p.add_argument("--run_reference", action="store_true",
                   help="run /root/reference eval as the golden source")
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--tolerance", type=float, default=0.001)
    p.add_argument("--save", type=str,
                   help="write both metric sets to this json")
    args = p.parse_args()

    if args.golden:
        with open(args.golden) as f:
            golden = json.load(f)
    elif args.run_reference:
        golden = run_reference(args)
    else:
        print("No golden source: pass --golden metrics.json or "
              "--run_reference (needs CUDA torch).")
        sys.exit(2)

    ours = run_ours(args)

    ok = True
    print(f"\n== parity vs golden (tolerance {args.tolerance}) ==")
    for split, gvals in golden.items():
        if split not in ours:
            print(f"  {split}: MISSING from our run")
            ok = False
            continue
        for m in METRICS:
            if m not in gvals:
                continue
            d = abs(ours[split][m] - gvals[m])
            verdict = "PASS" if d <= args.tolerance else "FAIL"
            if verdict == "FAIL":
                ok = False
            print(f"  {split:16s} {m:8s} ours={ours[split][m]:.4f} "
                  f"golden={gvals[m]:.4f} |Δ|={d:.4f}  {verdict}")

    if args.save:
        with open(args.save, "w") as f:
            json.dump({"ours": ours, "golden": golden,
                       "tolerance": args.tolerance, "pass": ok}, f, indent=2)
        print(f"-> wrote {args.save}")
    print("\nRESULT:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
