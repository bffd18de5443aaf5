"""Profile the fused Mono-ViFI train step on the real TPU and print the
per-category XLA op breakdown (the PERF.md table).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_step.py \
        [--steps 3] [--batch 10] [--height 192] [--width 640] [--no-affine]

Equivalent of the reference's wall-clock step breakdown (train.py:652-674)
plus thop FLOPs (utils.py:18-28), done the TPU way: jax.profiler trace ->
xprof op_profile. NOTE: on the axon platform block_until_ready can return
early — this script syncs by materializing the loss.
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--no-affine", action="store_true")
    ap.add_argument("--backbone", default="ResNet18",
                    help="ResNet18 | LiteMono | DHRNet")
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--top", type=int, default=0,
                    help="also print the top-N individual fusions/ops")
    args = ap.parse_args()

    import jax
    import bench

    bench.enable_compile_cache()
    from mono_vifi_tpu.config import Options
    from mono_vifi_tpu.training import monovifi
    from mono_vifi_tpu.training.monovifi import MonoViFiStep

    cfg = Options(
        height=args.height,
        width=args.width,
        batch_size=args.batch,
        backbone=args.backbone,
        use_affine=not args.no_affine,
        compute_dtype="bfloat16",
    )
    bundle, tx, state = monovifi.create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100
    )
    vfi_params = bundle.init_vfi(jax.random.PRNGKey(1), "train")
    batch = {
        k: jax.numpy.asarray(v)
        for k, v in bench.make_batch(args.batch, args.height, args.width).items()
        if not args.no_affine or not k.startswith(("color_affine", "Rc", "ratio",
                                                   "angle", "box", "valid_mask"))
    }
    step = jax.jit(MonoViFiStep(bundle, tx).make_train_step(), donate_argnums=0)

    # warmup/compile
    state, metrics = step(state, vfi_params, batch, jax.random.PRNGKey(2))
    _ = float(metrics["loss"])

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="mvtrace_")
    jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    for i in range(args.steps):
        state, metrics = step(state, vfi_params, batch, jax.random.PRNGKey(3 + i))
        _ = float(metrics["loss"])  # honest sync (block_until_ready lies here)
    dt = (time.time() - t0) / args.steps
    jax.profiler.stop_trace()
    print(f"step time: {dt*1e3:.1f} ms  ({args.batch / dt:.2f} samples/s)")

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        print(f"no xplane.pb under {trace_dir}")
        return
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "op_profile", {})
    prof = json.loads(data)
    by_prog = prof["byProgram"]
    cats = by_prog["children"][0]["children"]
    rows = []
    for c in cats:
        t_ps = float(c["metrics"].get("rawTime", 0.0))
        rows.append((t_ps / 1e9 / args.steps, c["name"]))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"\n{'ms/step':>9}  {'share':>6}  category")
    for ms, name in rows:
        print(f"{ms:9.1f}  {100*ms/total:5.1f}%  {name}")
    print(f"{total:9.1f}  100.0%  TOTAL (device busy)")

    if args.top:
        # fusion-level breakdown: times live at the fusion nodes one level
        # below the categories; leaves carry xla.provenance for attribution
        ops = []

        def walk(node, cat):
            t_ps = float(node.get("metrics", {}).get("rawTime", 0.0))
            kids = node.get("children", [])
            if t_ps > 0 and not any(
                float(k.get("metrics", {}).get("rawTime", 0.0)) > 0 for k in kids
            ):
                prov = ""
                stack = [node]
                while stack:
                    n = stack.pop()
                    x = n.get("xla", {})
                    if x.get("provenance"):
                        prov = x["provenance"]
                        break
                    stack.extend(n.get("children", []))
                ops.append((t_ps / 1e9 / args.steps, cat, node["name"], prov))
            for k in kids:
                walk(k, cat)

        for c in cats:
            for fusion in c.get("children", []):
                walk(fusion, c["name"])
        ops.sort(reverse=True)
        print(f"\n{'ms/step':>9}  top individual ops")
        for ms, cat, name, prov in ops[: args.top]:
            print(f"{ms:9.2f}  [{cat}] {name}  {prov[:110]}")
    print(f"\ntrace dir: {trace_dir}")


if __name__ == "__main__":
    main()
