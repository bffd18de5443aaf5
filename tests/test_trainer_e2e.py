"""End-to-end driver test: train.py Trainer on a synthetic KITTI directory —
dataloader -> fused step -> checkpoint save -> resume."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from mono_vifi_tpu.config import Options


@pytest.fixture(scope="module")
def kitti_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    drive = root / "2011_09_26" / "2011_09_26_drive_0001_sync"
    img_dir = drive / "image_02" / "data"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(8):
        arr = (rng.random((96, 320, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:010d}.png")

    splits = tmp_path_factory.mktemp("splits") / "kitti" / "tiny"
    splits.mkdir(parents=True)
    lines = [f"2011_09_26/2011_09_26_drive_0001_sync {i} l" for i in range(1, 7)]
    (splits / "train_files.txt").write_text("\n".join(lines))
    (splits / "test_files.txt").write_text("\n".join(lines[:2]))
    return str(root), str(splits.parent.parent)


@pytest.mark.slow
def test_trainer_end_to_end(kitti_env, tmp_path, monkeypatch):
    data_path, splits_dir = kitti_env
    import train as train_mod

    # point the trainer at the tiny synthetic split
    monkeypatch.setattr(train_mod, "SPLITS_DIR", splits_dir)

    cfg = Options(
        exp_name="e2e",
        data_path=data_path,
        log_dir=str(tmp_path),
        dataset="kitti",
        split="tiny",
        eval_split="tiny",
        height=64,
        width=96,
        batch_size=2,
        num_epochs=1,
        use_affine=True,
        compute_dtype="float32",
        num_workers=2,
        log_frequency=1,
        save_frequency=100,
        seed=1,
        num_devices=1,
        vfi_train_scale="tiny",
        vfi_test_scale="tiny",
    )
    trainer = train_mod.Trainer(cfg)
    assert trainer.steps_per_epoch == 3
    trainer.train()

    ckpt_path = os.path.join(str(tmp_path), "e2e", "ckpt.pkl")
    assert os.path.exists(ckpt_path)
    assert os.path.exists(os.path.join(str(tmp_path), "e2e", "models", "model_0.pkl"))
    step_after = int(trainer.state.step)
    assert step_after == 3

    # resume: a new trainer picks up epoch/step
    cfg.resume = True
    cfg.num_epochs = 1
    trainer2 = train_mod.Trainer(cfg)
    assert trainer2.ep_start == 1
    assert int(trainer2.state.step) == 3
