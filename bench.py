"""Benchmark: full Mono-ViFI fused training-step throughput on one TPU chip.

Measures the flagship config (reference configs/resnet18/ResNet18_KITTI_MR.txt:
ResNet18, 640x192, batch 10, affine augmentation on) — the same per-step work
as reference train.py:698-886 (2x IFRNet-L synthesis + flows, 6 pose pairs,
single+multi-frame depth branches, photometric/SVDC/SADC losses, backward,
AdamW update) — and prints one JSON line.

vs_baseline compares against an estimated PyTorch reference throughput of
20 samples/s (≈2 steps/s x batch 10 on a V100-class GPU; the repo publishes
no throughput numbers — see BASELINE.md. Regenerate when reference hardware
is available). BASELINE.json's target is >=5x per chip.
"""

import json
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 20.0  # estimated PyTorch-GPU reference (see above)


def make_batch(B, H, W):
    rng = np.random.default_rng(0)

    def r(*shape):
        return rng.random(shape, dtype=np.float32)

    K = np.zeros((B, 4, 4), np.float32)
    K[:, 0, 0], K[:, 1, 1] = 0.58 * W, 1.92 * H
    K[:, 0, 2], K[:, 1, 2] = 0.5 * W, 0.5 * H
    K[:, 2, 2] = K[:, 3, 3] = 1
    w_box, h_box = round(W / 1.5), round(H / 1.5)
    return {
        "color_n1": r(B, H, W, 3),
        "color_0": r(B, H, W, 3),
        "color_p1": r(B, H, W, 3),
        "color_aug_n1": r(B, H, W, 3),
        "color_aug_0": r(B, H, W, 3),
        "color_aug_p1": r(B, H, W, 3),
        "K": K,
        "inv_K": np.linalg.pinv(K).astype(np.float32),
        "color_affine_n1": r(B, H, W, 3),
        "color_affine_0": r(B, H, W, 3),
        "color_affine_p1": r(B, H, W, 3),
        "color_affine_aug_0": r(B, H, W, 3),
        "Rc": np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)),
        "ratio_local": np.full((B, 1), 1.5, np.float32),
        "angle": np.full((B,), 3.0, np.float32),
        "box": np.tile(np.array([2, 1, w_box, h_box], np.float32), (B, 1)),
        "valid_mask_rec": np.ones((B, H, W, 1), np.float32),
        "valid_mask_cons": np.ones((B, H, W, 1), np.float32),
    }


def enable_compile_cache():
    """Persistent XLA compile cache (shared with tools/): makes repeat
    bench/profile invocations start in seconds instead of minutes."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mono_vifi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    import argparse

    import jax

    enable_compile_cache()

    from mono_vifi_tpu.config import Options
    from mono_vifi_tpu.training import monovifi
    from mono_vifi_tpu.training.monovifi import MonoViFiStep

    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="ResNet18",
                    help="ResNet18 (default, the tracked metric) | LiteMono | DHRNet")
    ap.add_argument("--batch", type=int, default=0,
                    help="override batch size (default: reference config's)")
    ap.add_argument("--hr", action="store_true",
                    help="high-res 320x1024 config (reference *_KITTI_HR.txt: "
                         "bs4, encoder remat)")
    args = ap.parse_args()
    # reference per-backbone KITTI-MR batch sizes (configs/*/*.txt)
    B = args.batch or (
        4 if args.hr else {"ResNet18": 10, "LiteMono": 8, "DHRNet": 6}[args.backbone]
    )
    H, W = (320, 1024) if args.hr else (192, 640)
    cfg = Options(
        height=H,
        width=W,
        batch_size=B,
        backbone=args.backbone,
        use_affine=True,
        compute_dtype="bfloat16",
        fuse_model_type="shared_encoder",
        encoder_remat=args.hr,
    )
    bundle, tx, state = monovifi.create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=3981
    )
    vfi_params = bundle.init_vfi(jax.random.PRNGKey(1), "train")
    batch = jax.device_put(make_batch(B, H, W))
    step = jax.jit(MonoViFiStep(bundle, tx).make_train_step(), donate_argnums=0)

    rng = jax.random.PRNGKey(2)
    # warmup / compile (host-materialize the loss: a real device sync even on
    # experimental platforms where block_until_ready may return early)
    for i in range(2):
        state, metrics = step(state, vfi_params, batch, jax.random.fold_in(rng, i))
    float(metrics["loss"])

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, vfi_params, batch, jax.random.fold_in(rng, i))
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)

    samples_per_sec = B * iters / dt

    # MFU: estimate-free distance-to-peak (PERF.md "distance to target").
    # XLA cost analysis counts the whole step (fwd+bwd+optimizer); v5e bf16
    # peak is ~197 TFLOP/s/chip.
    mfu = tf_step = None
    try:
        cost = step.lower(
            state, vfi_params, batch, rng
        ).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", -1.0))
        if flops > 0:
            tf_step = flops / 1e12
            mfu = (flops * iters / dt) / 197e12
    except Exception:
        pass
    name = "monovifi_train_samples_per_sec_640x192_bs10_1chip"
    if args.backbone != "ResNet18" or args.hr:
        name = (
            f"monovifi_{args.backbone.lower()}_train_samples_per_sec_"
            f"{W}x{H}_bs{B}_1chip"
        )
    rec = {
        "metric": name,
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
    }
    if mfu is not None:
        rec["tflop_per_step"] = round(tf_step, 2)
        rec["mfu_vs_197tflops_bf16"] = round(mfu, 4)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
