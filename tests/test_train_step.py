"""End-to-end train-step tests: the full fused Mono-ViFI step runs under jit,
produces finite losses/grads, updates params, and executes sharded over a
virtual 8-device data mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mono_vifi_tpu.config import Options
from mono_vifi_tpu.training import monovifi
from mono_vifi_tpu.training.monovifi import MonoViFiStep

RNG = np.random.default_rng(3)


def rand(*shape, lo=0.0, hi=1.0):
    return (lo + (hi - lo) * RNG.random(shape)).astype(np.float32)


def make_batch(B, H, W, use_affine=True):
    K = np.zeros((B, 4, 4), np.float32)
    K[:, 0, 0], K[:, 1, 1] = 0.58 * W, 1.92 * H
    K[:, 0, 2], K[:, 1, 2] = 0.5 * W, 0.5 * H
    K[:, 2, 2] = K[:, 3, 3] = 1
    batch = {
        "color_n1": rand(B, H, W, 3),
        "color_0": rand(B, H, W, 3),
        "color_p1": rand(B, H, W, 3),
        "color_aug_n1": rand(B, H, W, 3),
        "color_aug_0": rand(B, H, W, 3),
        "color_aug_p1": rand(B, H, W, 3),
        "K": K,
        "inv_K": np.linalg.pinv(K).astype(np.float32),
    }
    if use_affine:
        ratio = 1.5
        w, h = round(W / ratio), round(H / ratio)
        batch.update(
            {
                "color_affine_n1": rand(B, H, W, 3),
                "color_affine_0": rand(B, H, W, 3),
                "color_affine_p1": rand(B, H, W, 3),
                "color_affine_aug_0": rand(B, H, W, 3),
                "Rc": np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)),
                "ratio_local": np.full((B, 1), ratio, np.float32),
                "angle": np.full((B,), 3.0, np.float32),
                "box": np.tile(
                    np.array([2, 1, w, h], np.float32), (B, 1)
                ),
                "valid_mask_rec": np.ones((B, H, W, 1), np.float32),
                "valid_mask_cons": np.ones((B, H, W, 1), np.float32),
            }
        )
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope="module")
def setup():
    cfg = Options(
        height=64,
        width=96,
        batch_size=2,
        use_affine=True,
        compute_dtype="float32",
        fuse_model_type="shared_encoder",
        vfi_train_scale="tiny",  # step-mechanics test: tiny frozen VFI
        vfi_test_scale="tiny",   # keeps the CPU compile in seconds
    )
    rng = jax.random.PRNGKey(0)
    bundle, tx, state = monovifi.create_train_state(cfg, rng, steps_per_epoch=10)
    vfi_params = bundle.init_vfi(jax.random.PRNGKey(1), "train")
    return cfg, bundle, tx, state, vfi_params


@pytest.mark.slow
def test_train_step_runs_and_updates(setup):
    cfg, bundle, tx, state, vfi_params = setup
    step = jax.jit(MonoViFiStep(bundle, tx).make_train_step())
    batch = make_batch(2, cfg.height, cfg.width)

    state1, metrics = step(state, vfi_params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_base"]))
    assert np.isfinite(float(metrics["loss_dc"]))
    assert float(metrics["grad_norm"]) > 0

    # params actually moved
    d0 = jax.tree.leaves(state.params["depth"])[0]
    d1 = jax.tree.leaves(state1.params["depth"])[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))

    # depth_mf moved independently of depth (shared_encoder mode)
    m0 = jax.tree.leaves(state.params["depth_mf"])[0]
    m1 = jax.tree.leaves(state1.params["depth_mf"])[0]
    assert not np.allclose(np.asarray(m0), np.asarray(m1))

    # second step runs off the first's state
    state2, metrics2 = step(state1, vfi_params, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics2["loss"]))
    assert int(state2.step) == 2


@pytest.mark.slow
def test_uint8_batch_matches_float_batch(setup):
    """A uint8-staged batch (color planes quantized, masks {0,255}) must give
    the same loss as its f32(u8)/255 twin via dequantize_batch. The
    dequantized VALUES are exactly equal (tests/test_data.py pins that);
    at the whole-graph level XLA may fuse the in-graph /255 into downstream
    ops and reassociate, so the loss is compared at f32-noise tolerance."""
    cfg, bundle, tx, state, vfi_params = setup
    fb = make_batch(2, cfg.height, cfg.width)
    u8, f32 = {}, {}
    for k, v in fb.items():
        if k.startswith(("color_", "valid_mask_")):
            q = jnp.round(v * 255.0).astype(jnp.uint8)
            u8[k] = q
            f32[k] = q.astype(jnp.float32) / 255.0
        else:
            u8[k] = f32[k] = v
    mv = MonoViFiStep(bundle, tx)
    lf = jax.jit(
        lambda b: mv.loss_fn(
            state.params, state.batch_stats, vfi_params, b,
            jax.random.PRNGKey(5), train=False,
        )[0]
    )
    a, b = float(lf(u8)), float(lf(f32))
    assert abs(a - b) <= 1e-4 * max(1.0, abs(b)), (a, b)


def test_eval_forwards(setup):
    cfg, bundle, tx, state, vfi_params = setup
    vfi_small = bundle.init_vfi(jax.random.PRNGKey(4), "test")
    img = jnp.asarray(rand(2, cfg.height, cfg.width, 3))
    disp = monovifi.single_frame_disp(bundle, state.params, state.batch_stats, img)
    assert disp.shape == (2, cfg.height, cfg.width, 1)
    assert np.isfinite(np.asarray(disp)).all()

    disp_mf = monovifi.multi_frame_disp(
        bundle, state.params, state.batch_stats, vfi_small, img, img, img
    )
    assert disp_mf.shape == (2, cfg.height, cfg.width, 1)
    assert np.isfinite(np.asarray(disp_mf)).all()


def test_photometric_automask(setup):
    """return_automask parity (reference train.py:1038-1050): same loss,
    plus a {0,1} mask marking pixels where a reprojection candidate won."""
    cfg, bundle, tx, state, vfi_params = setup
    step = MonoViFiStep(bundle, tx)
    B, H, W = 2, cfg.height, cfg.width
    batch = make_batch(B, H, W, use_affine=False)
    disp = jnp.asarray(rand(B, H, W, 1, lo=0.01, hi=0.99))
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[:, 0, 3] = 0.1  # small x-translation
    T = jnp.asarray(T)
    args = (
        disp, batch["color_0"], batch["color_n1"], batch["color_p1"],
        T, T, batch["K"], batch["inv_K"], jax.random.PRNGKey(7),
    )
    loss = step._photometric(*args)
    loss2, am = step._photometric(*args, return_automask=True)
    assert np.allclose(float(loss), float(loss2))
    am = np.asarray(am)
    assert am.shape == (B, H, W)
    assert set(np.unique(am)).issubset({0.0, 1.0})
    # with distinct random sources both outcomes should occur somewhere
    assert 0.0 < am.mean() < 1.0


@pytest.mark.slow
def test_train_step_num_scales_4():
    """A num_scales=4 config trains: the decoder emits 4 disp scales and the
    step tolerates the pyramid batch keys (reference contract,
    mono_dataset.py:87-91; loss still reads scale 0 only, train.py:994)."""
    cfg = Options(
        height=64,
        width=64,
        batch_size=2,
        num_scales=4,
        use_affine=False,
        compute_dtype="float32",
        fuse_model_type="shared_encoder",
        vfi_train_scale="tiny",
        vfi_test_scale="tiny",
    )
    bundle, tx, state = monovifi.create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=10
    )
    vfi_params = bundle.init_vfi(jax.random.PRNGKey(1), "train")
    batch = make_batch(2, cfg.height, cfg.width, use_affine=False)
    for s in range(1, 4):  # the pyramid keys the dataset emits at scales>=1
        h, w = cfg.height // 2**s, cfg.width // 2**s
        for name in ("n1", "0", "p1"):
            batch[f"color_{name}_s{s}"] = jnp.asarray(rand(2, h, w, 3))
            batch[f"color_aug_{name}_s{s}"] = jnp.asarray(rand(2, h, w, 3))
        batch[f"K_s{s}"] = batch["K"]
        batch[f"inv_K_s{s}"] = batch["inv_K"]
    step = jax.jit(MonoViFiStep(bundle, tx).make_train_step())
    state1, metrics = step(state, vfi_params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # the decoder itself produces all 4 scales
    feats = bundle.encoder.apply(
        {
            "params": state.params["encoder"],
            "batch_stats": state.batch_stats["encoder"],
        },
        batch["color_0"],
        train=False,
    )
    disps = bundle.depth.apply({"params": state.params["depth"]}, feats)
    assert sorted(disps) == [0, 1, 2, 3]
    for s in range(4):
        assert disps[s].shape == (2, cfg.height // 2**s, cfg.width // 2**s, 1)


@pytest.mark.slow
def test_train_step_sharded_8_devices():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert len(jax.devices()) == 8
    cfg = Options(
        height=64,
        width=64,
        batch_size=8,
        use_affine=False,
        compute_dtype="float32",
        fuse_model_type="shared_encoder",
        vfi_train_scale="tiny",
        vfi_test_scale="tiny",
    )
    bundle, tx, state = monovifi.create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=10
    )
    vfi_params = bundle.init_vfi(jax.random.PRNGKey(1), "train")

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    batch = make_batch(8, cfg.height, cfg.width, use_affine=False)
    batch = jax.device_put(batch, data_sharding)
    state = jax.device_put(state, replicated)
    vfi_params = jax.device_put(vfi_params, replicated)

    step = jax.jit(MonoViFiStep(bundle, tx).make_train_step())
    state1, metrics = step(state, vfi_params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # grads are averaged across the mesh -> params identical (replicated)
    leaf = jax.tree.leaves(state1.params["depth"])[0]
    assert np.isfinite(np.asarray(leaf)).all()

    # DDP-equivalence contract (reference train.py:205-227): the 8-way
    # data-parallel step must produce the same updated params as the same
    # global batch on ONE device (GSPMD BatchNorm == SyncBN semantics).
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    batch_1 = jax.device_put(batch, NamedSharding(mesh1, P("data")))
    state_1 = jax.device_put(
        jax.tree.map(np.asarray, state), NamedSharding(mesh1, P())
    )
    vfi_1 = jax.device_put(
        jax.tree.map(np.asarray, vfi_params), NamedSharding(mesh1, P())
    )
    state1_single, metrics_single = step(state_1, vfi_1, batch_1, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_single["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(state1.params), jax.tree.leaves(state1_single.params)
    ):
        # atol covers reduction-order fp differences of the sharded
        # interpolation-matmul affine ops (1-2 ulp-scale on grads)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=6e-4, rtol=2e-3
        )
