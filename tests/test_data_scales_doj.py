"""Multi-scale augmentation pyramid + per-scale intrinsics, and the
Cityscapes dynamic-object (doj) mask wiring (VERDICT r2 missing #1/#2;
reference datasets/mono_dataset.py:87-91, :156-186, :243-252 and
cityscapes_dataset.py:137-161)."""

import os

import numpy as np
import pytest
from PIL import Image

from mono_vifi_tpu.data import CityscapesDataset, KITTIRAWDataset


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    img_dir = root / "2011_09_26" / "2011_09_26_drive_0001_sync" / "image_02" / "data"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = (rng.random((96, 320, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:010d}.png")
    return str(root)


@pytest.fixture(scope="module")
def cs_dir(tmp_path_factory):
    """Synthetic preprocessed-Cityscapes train layout: vertical 3-frame
    concat pngs + per-sequence cam.txt + doj mask npy files."""
    root = tmp_path_factory.mktemp("cs")
    city_dir = root / "aachen"
    city_dir.mkdir()
    mask_dir = root / "train_mask"
    mask_dir.mkdir()
    rng = np.random.default_rng(1)
    name = "aachen_000000_000010"
    arr = (rng.random((3 * 96, 256, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(city_dir / f"{name}.png")
    # fx, 0, u0, 0, fy, v0, 0, 0, 1 (reference cam.txt layout)
    np.savetxt(
        city_dir / f"{name}_cam.txt",
        np.array([[128.0, 0, 128.0, 0, 96.0, 48.0, 0, 0, 1.0]]),
        delimiter=",",
    )
    for suffix in ("", "-1", "+1"):
        m = np.zeros((96, 256), np.uint8)
        m[20:60, 40:200] = 255
        np.save(mask_dir / f"aachen_000000_10{suffix}.npy", m)
    return str(root), str(mask_dir)


def test_multiscale_pyramid_and_per_scale_K(kitti_dir):
    fnames = ["2011_09_26/2011_09_26_drive_0001_sync 2 l"]
    ds = KITTIRAWDataset(
        kitti_dir, fnames, height=64, width=96, frame_idxs=[0, -1, 1],
        num_scales=4, use_affine=True, is_train=True,
    )
    item = ds[0]
    for name in ("n1", "0", "p1"):
        for s in range(1, 4):
            shp = (64 // 2**s, 96 // 2**s, 3)
            assert item[f"color_{name}_s{s}"].shape == shp
            assert item[f"color_aug_{name}_s{s}"].shape == shp
            assert item[f"color_affine_{name}_s{s}"].shape == shp
            assert item[f"color_affine_aug_{name}_s{s}"].shape == shp
        # full-pyramid mode also emits affine_aug for every frame at scale 0
        assert item[f"color_affine_aug_{name}"].shape == (64, 96, 3)
    # per-scale K matches the reference's integer-divided scaling
    # (mono_dataset.py:243-252): K[0,:] *= width // 2**s
    for s in range(1, 4):
        K = item[f"K_s{s}"]
        assert K.shape == (4, 4)
        np.testing.assert_allclose(K[0, 0], 0.58 * (96 // 2**s), rtol=1e-5)
        np.testing.assert_allclose(K[1, 1], 1.92 * (64 // 2**s), rtol=1e-5)
        np.testing.assert_allclose(
            item[f"inv_K_s{s}"] @ K, np.eye(4), atol=1e-4
        )
    # progressive resize: scale s comes from scale s-1, not from native
    # (reference :156-162) — reproduce scale 2 from the emitted scale 1
    src = Image.fromarray(
        (item["color_0_s1"] * 255).astype(np.uint8)
    ).resize((96 // 4, 64 // 4), ds.interp)
    np.testing.assert_allclose(
        item["color_0_s2"], np.asarray(src, np.float32) / 255.0, atol=2e-2
    )


def test_num_scales_1_contract_unchanged(kitti_dir):
    """Shipped configs (num_scales=1) keep the lean scale-0 contract."""
    fnames = ["2011_09_26/2011_09_26_drive_0001_sync 2 l"]
    ds = KITTIRAWDataset(
        kitti_dir, fnames, height=64, width=96, frame_idxs=[0, -1, 1],
        num_scales=1, use_affine=True, is_train=True,
    )
    item = ds[0]
    assert not any(k.endswith("_s1") for k in item)
    assert "color_affine_aug_n1" not in item
    assert "color_affine_aug_0" in item


def test_cityscapes_doj_masks(cs_dir):
    root, mask_dir = cs_dir
    fnames = ["aachen aachen_000000_000010"]
    ds = CityscapesDataset(
        root, fnames, height=64, width=128, frame_idxs=[0, -1, 1],
        num_scales=1, use_affine=True, is_train=True,
        doj_mask=True, mask_dir=mask_dir,
    )
    item = ds[0]
    # reference key set (mono_dataset.py:171-186): per-frame masks at the
    # network resolution plus affine (resize_local->rotate->crop) variants
    for name in ("0", "n1", "p1"):
        m = item[f"doj_mask_{name}"]
        assert m.shape == (64, 128, 1)
        assert 0.0 <= m.min() and m.max() <= 1.0
        assert m.max() > 0.5  # the synthetic object survives the resize
        ma = item[f"doj_mask_{name}_affine"]
        assert ma.shape == (64, 128, 1)
    # deterministic per (seed, epoch, index)
    item2 = ds[0]
    np.testing.assert_array_equal(
        item["doj_mask_0_affine"], item2["doj_mask_0_affine"]
    )


def test_cityscapes_doj_disabled_by_default(cs_dir):
    root, _ = cs_dir
    fnames = ["aachen aachen_000000_000010"]
    ds = CityscapesDataset(
        root, fnames, height=64, width=128, frame_idxs=[0, -1, 1],
        num_scales=1, use_affine=True, is_train=True,
    )
    assert not any(k.startswith("doj") for k in ds[0])


def test_smooth_loss_dyn_planar_zero_mask_reduces_to_plain():
    import jax.numpy as jnp

    from mono_vifi_tpu.ops import losses as L

    rng = np.random.default_rng(3)
    disp = jnp.asarray(rng.random((2, 16, 32)), jnp.float32)
    img = jnp.asarray(rng.random((2, 3, 16, 32)), jnp.float32)
    zero = jnp.zeros((2, 16, 32), jnp.float32)
    np.testing.assert_allclose(
        L.smooth_loss_dyn_planar(disp, img, zero),
        L.smooth_loss_planar(disp, img),
        rtol=1e-6,
    )
    # non-zero mask matches the reference NHWC formulation
    mask = jnp.asarray((rng.random((2, 16, 32)) > 0.7), jnp.float32)
    ref = L.smooth_loss_dyn(
        disp[..., None], jnp.transpose(img, (0, 2, 3, 1)), mask[..., None]
    )
    np.testing.assert_allclose(
        L.smooth_loss_dyn_planar(disp, img, mask), ref, rtol=1e-5
    )


def test_use_smooth_dyn_changes_trainer_loss_by_reference_formula():
    """Behavioral check of the use_smooth_dyn wiring (monovifi.py): with a
    NONZERO doj mask, the trainer's photometric loss must differ from the
    plain-smoothness loss by exactly disparity_smoothness * (dyn - plain)
    where dyn/plain are hand-computed in numpy from the reference formulas
    (layers.py:231-242 get_smooth_loss, :244-258 get_smooth_loss_dyn)."""
    import jax
    import jax.numpy as jnp

    from mono_vifi_tpu.config import Options
    from mono_vifi_tpu.training.monovifi import MonoViFiStep

    cfg = Options(
        height=32, width=64, batch_size=2, use_affine=False,
        compute_dtype="float32", use_smooth_dyn=True,
    )

    class _Bundle:  # _photometric only reads cfg, fast_warp, dtype
        pass

    b = _Bundle()
    b.cfg = cfg
    b.fast_warp = False
    b.dtype = None
    step = MonoViFiStep(b, tx=None)

    rng = np.random.default_rng(11)
    B, H, W = 2, cfg.height, cfg.width
    disp = rng.random((B, H, W, 1)).astype(np.float32) * 0.9 + 0.05
    tgt = rng.random((B, H, W, 3)).astype(np.float32)
    src_n1 = rng.random((B, H, W, 3)).astype(np.float32)
    src_p1 = rng.random((B, H, W, 3)).astype(np.float32)
    mask = (rng.random((B, H, W)) > 0.6).astype(np.float32)
    assert mask.sum() > 0
    K = np.zeros((B, 4, 4), np.float32)
    K[:, 0, 0], K[:, 1, 1] = 0.58 * W, 1.92 * H
    K[:, 0, 2], K[:, 1, 2] = 0.5 * W, 0.5 * H
    K[:, 2, 2] = K[:, 3, 3] = 1
    invK = np.linalg.pinv(K).astype(np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[:, 0, 3] = 0.1

    args = (
        jnp.asarray(disp), jnp.asarray(tgt), jnp.asarray(src_n1),
        jnp.asarray(src_p1), jnp.asarray(T), jnp.asarray(T),
        jnp.asarray(K), jnp.asarray(invK), jax.random.PRNGKey(5),
    )
    loss_plain = float(step._photometric(*args))
    loss_dyn = float(
        step._photometric(*args, smooth_dyn_mask=jnp.asarray(mask))
    )
    assert loss_dyn != loss_plain  # the mask must actually change training

    # ---- numpy hand-derivation of the two reference smoothness formulas
    nd = disp[..., 0] / (disp[..., 0].mean(axis=(1, 2), keepdims=True) + 1e-7)
    img = np.transpose(tgt, (0, 3, 1, 2))  # (B, C, H, W)

    def grads(d, im):
        gdx = np.abs(d[:, :, :-1] - d[:, :, 1:])
        gdy = np.abs(d[:, :-1, :] - d[:, 1:, :])
        gix = np.mean(np.abs(im[..., :, :-1] - im[..., :, 1:]), axis=1)
        giy = np.mean(np.abs(im[..., :-1, :] - im[..., 1:, :]), axis=1)
        return gdx * np.exp(-gix), gdy * np.exp(-giy)

    sx, sy = grads(nd, img)
    plain = sx.mean() + sy.mean()
    # layers.py:248-258: M = 100*mask + (1-mask); img zeroed inside the mask
    M = 100.0 * mask + (1.0 - mask)
    sxd, syd = grads(nd, (1.0 - mask)[:, None] * img)
    dyn = sxd.mean() + (syd * M[:, :-1, :]).mean()

    expected_delta = cfg.disparity_smoothness * (dyn - plain)
    np.testing.assert_allclose(
        loss_dyn - loss_plain, expected_delta, rtol=1e-4, atol=1e-7
    )


def test_affine_window_matches_full_chain(kitti_dir):
    """The windowed affine evaluation (resize(box=) + rotate(center=) on a
    padded window) must reproduce the reference chain
    resize_local -> rotate -> crop (mono_dataset.py:96-162) exactly up to
    float-reassociation ulps."""
    fnames = ["2011_09_26/2011_09_26_drive_0001_sync 2 l"]
    ds = KITTIRAWDataset(
        kitti_dir, fnames, height=64, width=96, frame_idxs=[0, -1, 1],
        num_scales=1, use_affine=True, is_train=True,
    )
    folder, fidx, side = ds.index_to_folder_and_frame_idx(0)
    img = ds.get_color(folder, fidx, side, False)
    K = ds.load_intrinsics(folder, fidx)
    K = K.copy()
    K[0, :] *= ds.width
    K[1, :] *= ds.height
    invK = np.linalg.pinv(K)
    for trial in range(12):
        rng = ds._rng(1000 + trial)
        p = ds._affine_params(rng, K, invK)
        full = (
            img.resize(p["size_re"], ds.interp)
            .rotate(p["angle"], resample=Image.BILINEAR, expand=False)
            .crop(p["crop"])
        )
        win = ds._affine_window(img, p)
        a = np.asarray(full, np.int16)
        b = np.asarray(win, np.int16)
        diff = np.abs(a - b)
        assert diff.max() <= 1, (trial, diff.max())
        assert (diff > 0).mean() < 0.002, (trial, (diff > 0).mean())
