"""IFRNet VFI pre-training driver (reference train_vfi.py equivalent).

    python train_vfi.py -c configs/vfi/IFRNet_S_KITTI.txt

Trains IFRNet (small|large) on KITTI/Cityscapes triplets to interpolate the
middle frame; checkpoints carry the reference's `VFI` role key plus
`vfi_scale`. Periodically dumps interpolation + flow visualizations.
"""

from __future__ import annotations

import logging
import os
import pickle
import time

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from mono_vifi_tpu.config import parse_options
from mono_vifi_tpu.data import (
    CityscapesVFIDataset,
    DataLoader,
    KITTIVFIDataset,
    StatefulSampler,
)
from mono_vifi_tpu.data.loader import device_prefetch
from mono_vifi_tpu.parallel import make_mesh, data_sharding, replicated
from mono_vifi_tpu.training.vfi import (
    VFITrainState,
    create_vfi_state,
    make_vfi_train_step,
)
from mono_vifi_tpu.training import checkpoint as ckpt_lib
from mono_vifi_tpu.utils import readlines, sec_to_hm_str, setup_logging
from mono_vifi_tpu.utils.flow_vis import flow_to_color

SPLITS_DIR = os.path.join(os.path.dirname(__file__), "splits")


class VFITrainer:
    def __init__(self, cfg):
        self.cfg = cfg
        from mono_vifi_tpu.parallel import initialize_distributed

        self.rank, self.world = initialize_distributed(cfg)
        self.is_chief = self.rank == 0
        self.log_path = os.path.join(cfg.log_dir, cfg.exp_name)
        os.makedirs(self.log_path, exist_ok=True)
        setup_logging(os.path.join(self.log_path, "logger.log"),
                      filemode="a" if cfg.resume else "w", rank=self.rank)

        self.mesh = make_mesh(cfg.num_devices or None)
        self.n_dev = self.mesh.devices.size
        self.global_batch = cfg.batch_size * self.n_dev
        self.local_batch = self.global_batch // self.world

        if cfg.dataset == "kitti":
            files = readlines(
                os.path.join(SPLITS_DIR, "kitti", cfg.split, "train_files.txt")
            )
            self.dataset = KITTIVFIDataset(
                cfg.data_path, files, cfg.height, cfg.width, is_train=True,
                img_ext=".jpg" if cfg.jpg else ".png", seed=cfg.seed,
            )
        elif cfg.dataset == "cityscapes":
            files = readlines(os.path.join(SPLITS_DIR, "cityscapes", "train_files.txt"))
            self.dataset = CityscapesVFIDataset(
                cfg.data_path_pre or cfg.data_path, files, cfg.height, cfg.width,
                is_train=True, seed=cfg.seed,
            )
        else:
            raise ValueError(cfg.dataset)

        if self.world > 1:
            from mono_vifi_tpu.data.samplers import StatefulDistributedSampler

            self.sampler = StatefulDistributedSampler(
                len(self.dataset), cfg.seed, rank=self.rank,
                num_replicas=self.world,
            )
        else:
            self.sampler = StatefulSampler(len(self.dataset), cfg.seed)
        self.loader = DataLoader(self.dataset, self.local_batch,
                                 sampler=self.sampler, num_workers=cfg.num_workers)
        self.steps_per_epoch = len(self.sampler) // self.local_batch
        self.num_total_steps = self.steps_per_epoch * cfg.num_epochs

        self.module, self.tx, self.state = create_vfi_state(
            cfg, jax.random.PRNGKey(max(cfg.seed, 0)), self.steps_per_epoch
        )

        self.ep_start, self.batch_start = 0, 0
        if cfg.pretrained_path and os.path.exists(cfg.pretrained_path):
            self.load_pretrained(cfg.pretrained_path)
        if cfg.resume:
            self.load_ckpt()

        self.state = jax.device_put(self.state, replicated(self.mesh))
        self.data_sharding = data_sharding(self.mesh)
        self.step_fn = jax.jit(
            make_vfi_train_step(self.module, self.tx), donate_argnums=0
        )
        self.writer = None
        if self.is_chief:
            try:  # TB scalars + image/flow panels (reference train_vfi.py:251-268)
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(
                    os.path.join(self.log_path, "tensorboard", "train")
                )
            except ImportError:
                pass
        logging.info(
            "VFI training: %s (%s) | %d items | %d steps/epoch | %d devices",
            cfg.dataset, cfg.vfi_scale, len(self.dataset), self.steps_per_epoch,
            self.n_dev,
        )

    def load_pretrained(self, path):
        logging.info("Loading pretrained VFI from %s", path)
        if path.endswith(".pth"):
            from mono_vifi_tpu.convert import load_torch_checkpoint, convert_ifrnet

            raw = load_torch_checkpoint(path)
            sd = raw["VFI"] if "VFI" in raw else raw
            params = convert_ifrnet(sd)["params"]
        else:
            params = ckpt_lib.load_checkpoint(path)["params"]["VFI"]
        self.state = self.state.replace(
            params=ckpt_lib.merge_params(self.state.params, params)
        )

    def _ckpt_path(self):
        return os.path.join(self.log_path, "ckpt.pkl")

    def load_ckpt(self):
        if not os.path.exists(self._ckpt_path()):
            logging.info("No VFI checkpoint to resume")
            return
        ckpt = ckpt_lib.load_checkpoint(self._ckpt_path())
        self.state = VFITrainState(
            step=jnp.asarray(ckpt["step_in_total"], jnp.int32),
            params=ckpt_lib.merge_params(self.state.params, ckpt["params"]["VFI"]),
            opt_state=jax.tree.map(
                lambda t, l: jnp.asarray(l) if np.shape(t) == np.shape(l) else t,
                self.state.opt_state, ckpt["opt_state"],
            ),
        )
        self.ep_start, self.batch_start = ckpt["epoch"], ckpt["batch_idx"]
        logging.info("Resumed at epoch %d batch %d", self.ep_start, self.batch_start)

    def save_model(self, epoch, batch_idx=0, ep_end=False):
        if not self.is_chief:
            return
        payload = {
            "params": {"VFI": jax.tree.map(np.asarray, self.state.params)},
            "opt_state": jax.tree.map(np.asarray, self.state.opt_state),
            "height": self.cfg.height,
            "width": self.cfg.width,
            "vfi_scale": self.cfg.vfi_scale,
            "epoch": epoch + 1 if ep_end else epoch,
            "batch_idx": batch_idx,
            "step_in_total": int(self.state.step),
        }
        tmp = self._ckpt_path() + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, self._ckpt_path())

    def _log_visuals(self, batch, aux, step):
        vis_dir = os.path.join(self.log_path, "visuals")
        os.makedirs(vis_dir, exist_ok=True)
        pred = np.asarray(aux["imgt_pred"][0])
        gt = np.asarray(batch["img1"][0])
        fl0 = flow_to_color(np.asarray(aux["flow0"][0]))
        fl1 = flow_to_color(np.asarray(aux["flow1"][0]))
        top = np.concatenate([gt, pred], 1)
        bottom = np.concatenate([fl0 / 255.0, fl1 / 255.0], 1)
        panel = (np.concatenate([top, bottom], 0) * 255).astype(np.uint8)
        Image.fromarray(panel).save(os.path.join(vis_dir, f"step_{step}.jpeg"))
        if self.writer is not None:  # reference train_vfi.py:251-268
            self.writer.add_image("img1_gt", gt, step, dataformats="HWC")
            self.writer.add_image("img1_pred", pred, step, dataformats="HWC")
            self.writer.add_image("flow0", fl0.astype(np.uint8), step,
                                  dataformats="HWC")
            self.writer.add_image("flow1", fl1.astype(np.uint8), step,
                                  dataformats="HWC")

    def train(self):
        cfg = self.cfg
        for epoch in range(self.ep_start, cfg.num_epochs):
            self.sampler.set_epoch(epoch)
            self.sampler.set_start_iter(self.batch_start * self.local_batch)
            self.dataset.set_epoch(epoch)
            t0 = time.perf_counter()
            put = None
            if self.world > 1:
                from mono_vifi_tpu.parallel import shard_host_local_batch

                put = lambda b: shard_host_local_batch(b, self.mesh)
            for batch_idx, batch in enumerate(
                device_prefetch(self.loader, self.data_sharding, put_fn=put)
            ):
                self.state, metrics, aux = self.step_fn(self.state, batch)
                gidx = batch_idx + self.batch_start
                if gidx % cfg.log_frequency == 0:
                    loss = float(metrics["loss"])
                    psnr = float(metrics["psnr"])
                    dt = time.perf_counter() - t0
                    eta = (self.num_total_steps - int(self.state.step)) * dt
                    logging.info(
                        "epoch %3d/%d | batch %4d/%d | step %.3fs | loss %.4f "
                        "| psnr %.2f | eta %s",
                        epoch, cfg.num_epochs - 1, gidx, self.steps_per_epoch,
                        dt, loss, psnr, sec_to_hm_str(eta),
                    )
                    if self.writer is not None:
                        self.writer.add_scalar("loss", loss, int(self.state.step))
                        self.writer.add_scalar("psnr", psnr, int(self.state.step))
                    if self.world == 1 and self.is_chief:  # batch-sharded arrays
                        # aren't addressable cross-host; visuals single-host only
                        self._log_visuals(batch, aux, int(self.state.step))
                if gidx > 0 and gidx % cfg.save_frequency == 0:
                    self.save_model(epoch, batch_idx=gidx + 1)
                t0 = time.perf_counter()
            self.batch_start = 0
            self.save_model(epoch, ep_end=True)


if __name__ == "__main__":
    VFITrainer(parse_options()).train()
