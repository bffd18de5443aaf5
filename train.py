"""Mono-ViFI training driver (reference train.py equivalent).

Usage:  python train.py -c configs/resnet18/ResNet18_KITTI_MR.txt [--flag v]

One SPMD process drives all local TPU chips through a 1-D `data` mesh
(replacing the reference's one-process-per-GPU DDP launch, train.py:1178-1184).
`batch_size` is per-device; the global batch is batch_size * num_devices,
matching the reference's per-GPU batch semantics (train.py:106).
"""

from __future__ import annotations

import json
import logging
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from mono_vifi_tpu import evaluation
from mono_vifi_tpu.config import Options, parse_options
from mono_vifi_tpu.data import (
    CityscapesDataset,
    DataLoader,
    KITTIOdomDataset,
    KITTIRAWDataset,
    NYUDataset,
    StatefulSampler,
)
from mono_vifi_tpu.data.samplers import StatefulDistributedSampler
from mono_vifi_tpu.data.loader import device_prefetch
from mono_vifi_tpu.parallel import (
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_host_local_batch,
)
from mono_vifi_tpu.training import checkpoint as ckpt_lib
from mono_vifi_tpu.training.factory import ModelBundle
from mono_vifi_tpu.training.monovifi import (
    MonoViFiStep,
    TrainState,
    create_train_state,
    multi_frame_disp,
    single_frame_disp,
)
from mono_vifi_tpu.utils import readlines, sec_to_hm_str, setup_logging

SPLITS_DIR = os.path.join(os.path.dirname(__file__), "splits")

DATASETS = {
    "kitti": KITTIRAWDataset,
    "kitti_odom": KITTIOdomDataset,
    "cityscapes": CityscapesDataset,
    "nyuv2": NYUDataset,
}


class Trainer:
    def __init__(self, cfg: Options):
        self.cfg = cfg
        assert cfg.height % 32 == 0 and cfg.width % 32 == 0, "H, W must be x32"
        # multi-host rendezvous before any other JAX use (reference
        # dist.init_process_group, train.py:1179-1183)
        self.rank, self.world = initialize_distributed(cfg)
        self.is_chief = self.rank == 0
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)

        self.log_path = os.path.join(cfg.log_dir, cfg.exp_name)
        os.makedirs(self.log_path, exist_ok=True)
        setup_logging(os.path.join(self.log_path, "logger.log"),
                      filemode="a" if cfg.resume else "w",
                      rank=self.rank)
        if self.is_chief:
            self.save_opts()

        self.mesh = make_mesh(cfg.num_devices or None)
        self.n_dev = self.mesh.devices.size
        logging.info("Experiment: %s | devices: %d (%d processes) | backbone: %s",
                     cfg.exp_name, self.n_dev, self.world, cfg.backbone)

        self.writer = None
        if self.is_chief:
            try:  # TensorBoard scalars (reference train.py:45-47, :1062-1067)
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(
                    os.path.join(self.log_path, "tensorboard", "train")
                )
            except ImportError:
                pass

        # ---------------- data
        if cfg.dataset == "kitti":
            fpath = os.path.join(SPLITS_DIR, "kitti", cfg.split, "{}_files.txt")
            fpath_test = os.path.join(SPLITS_DIR, "kitti", cfg.eval_split, "{}_files.txt")
        elif cfg.dataset == "kitti_odom":
            fpath = os.path.join(SPLITS_DIR, "kitti", "odom", "{}_files.txt")
            fpath_test = os.path.join(SPLITS_DIR, "kitti", "odom", "{}_files_09.txt")
        elif cfg.dataset == "cityscapes":
            fpath = fpath_test = os.path.join(SPLITS_DIR, "cityscapes", "{}_files.txt")
        elif cfg.dataset == "nyuv2":
            fpath = fpath_test = os.path.join(SPLITS_DIR, "nyuv2", "{}_files.txt")
        else:
            raise ValueError(cfg.dataset)
        train_files = readlines(fpath.format("train"))
        test_files = readlines(fpath_test.format("test"))
        img_ext = ".jpg" if cfg.jpg else ".png"

        dataset_cls = DATASETS[cfg.dataset]
        data_path = cfg.data_path_pre if (
            cfg.dataset == "cityscapes" and cfg.data_path_pre
        ) else cfg.data_path
        extra = {}
        if cfg.dataset == "cityscapes" and cfg.doj_mask:
            extra = {"doj_mask": True, "mask_dir": cfg.mask_dir or None}
        self.train_dataset = dataset_cls(
            data_path, train_files, cfg.height, cfg.width, cfg.frame_ids,
            cfg.num_scales, use_affine=cfg.use_affine, is_train=True,
            img_ext=img_ext, seed=cfg.seed, stage_uint8=True, **extra,
        )
        self.test_dataset = dataset_cls(
            cfg.data_path, test_files, cfg.height, cfg.width, [0, -1, 1],
            cfg.num_scales, is_train=False, img_ext=img_ext,
        )
        # per-device batch semantics match the reference's per-GPU batch
        # (train.py:106); each process loads only its slice of the global
        # batch (local = global / process_count)
        self.global_batch = cfg.batch_size * self.n_dev
        self.local_batch = self.global_batch // self.world
        if self.world > 1:
            self.sampler = StatefulDistributedSampler(
                len(self.train_dataset), cfg.seed,
                rank=self.rank, num_replicas=self.world,
            )
        else:
            self.sampler = StatefulSampler(len(self.train_dataset), cfg.seed)
        self.train_loader = DataLoader(
            self.train_dataset, self.local_batch, sampler=self.sampler,
            num_workers=cfg.num_workers, drop_last=True,
        )
        self.test_loader = DataLoader(
            self.test_dataset, self.global_batch, num_workers=cfg.num_workers,
            drop_last=False,
        )
        self.steps_per_epoch = len(self.sampler) // self.local_batch
        self.num_total_steps = self.steps_per_epoch * cfg.num_epochs

        self.gt_depths = self._load_gt_depths()

        # ---------------- models / state
        self.bundle, self.tx, self.state = create_train_state(
            cfg, jax.random.PRNGKey(max(cfg.seed, 0)), self.steps_per_epoch
        )
        self.vfi_params = self._load_frozen_vfi("large")
        self.vfi_small_params = self._load_frozen_vfi("small")

        self.ep_start, self.batch_start = 0, 0
        if cfg.pretrained_path and not (
            cfg.resume and os.path.exists(os.path.join(self.log_path, "ckpt.pkl"))
        ):
            self.load_pretrained(cfg.pretrained_path)
        if cfg.resume:
            self.load_ckpt()

        # replicate state, shard batches
        self.state = jax.device_put(self.state, replicated(self.mesh))
        self.vfi_params = jax.device_put(self.vfi_params, replicated(self.mesh))
        self.data_sharding = data_sharding(self.mesh)

        self.train_step = jax.jit(
            MonoViFiStep(self.bundle, self.tx).make_train_step(), donate_argnums=0
        )
        # live LR for per-step logs (reference train.py:1053-1060)
        from mono_vifi_tpu.training.optim import lr_schedule

        self.lr_sched = lr_schedule(cfg, self.steps_per_epoch)
        self._sf_disp = jax.jit(
            lambda p, bs, img: single_frame_disp(self.bundle, p, bs, img)
        )
        self._mf_disp = jax.jit(
            lambda p, bs, v, a, b, c: multi_frame_disp(self.bundle, p, bs, v, a, b, c)
        )
        self.rng = jax.random.PRNGKey(max(cfg.seed, 0) + 17)
        logging.info(
            "%d train / %d test items | %d steps/epoch",
            len(self.train_dataset), len(self.test_dataset), self.steps_per_epoch,
        )

    # ------------------------------------------------------------ aux setup
    def save_opts(self):
        with open(os.path.join(self.log_path, "opt.json"), "w") as f:
            json.dump({k: str(v) for k, v in vars(self.cfg).items()}, f, indent=2)
        # experiment provenance: snapshot the source tree (reference
        # train.py:1095-1106)
        import shutil

        src_root = os.path.dirname(os.path.abspath(__file__))
        target = os.path.join(self.log_path, "codes")
        shutil.rmtree(target, ignore_errors=True)
        for root, dirs, files in os.walk(src_root):
            dirs[:] = [d for d in dirs if d not in
                       (".git", "logs", "codes", "__pycache__", "splits")]
            if os.path.abspath(root).startswith(os.path.abspath(self.cfg.log_dir)):
                continue
            for f in files:
                if f.endswith((".py", ".sh", ".txt")) and "test_files" not in f:
                    sp = os.path.join(root, f)
                    rel = os.path.relpath(sp, src_root)
                    tp = os.path.join(target, rel)
                    os.makedirs(os.path.dirname(tp), exist_ok=True)
                    shutil.copy(sp, tp)

    def _load_gt_depths(self):
        cfg = self.cfg
        try:
            if cfg.dataset == "kitti":
                gt_path = os.path.join(SPLITS_DIR, "kitti", cfg.eval_split, "gt_depths.npz")
                return np.load(gt_path, fix_imports=True, encoding="latin1",
                               allow_pickle=True)["data"]
            if cfg.dataset == "cityscapes":
                gt_path = os.path.join(SPLITS_DIR, "cityscapes", "gt_depths")
                return [
                    np.load(os.path.join(gt_path, str(i).zfill(3) + "_depth.npy"))
                    for i in range(len(self.test_dataset))
                ]
        except (FileNotFoundError, OSError):
            logging.warning("gt depths not found; per-epoch eval disabled "
                            "(run export_gt_depth.py to enable)")
        return None

    def _load_frozen_vfi(self, scale: str):
        cfg = self.cfg
        tag = "L" if scale == "large" else "S"
        ds = {"kitti": "KITTI", "cityscapes": "CS"}.get(cfg.dataset)
        path = os.path.join(cfg.weights_dir, f"IFRNet_{tag}_{ds}.pth") if ds else None
        if path and os.path.exists(path):
            from mono_vifi_tpu.convert import load_torch_checkpoint, convert_ifrnet

            logging.info("Loading frozen VFI (%s) from %s", scale, path)
            return convert_ifrnet(load_torch_checkpoint(path)["VFI"])["params"]
        pkl = path.replace(".pth", ".pkl") if path else None
        if pkl and os.path.exists(pkl):
            logging.info("Loading frozen VFI (%s) from %s", scale, pkl)
            return ckpt_lib.load_checkpoint(pkl)["params"]["VFI"]
        logging.warning("Frozen VFI weights missing (%s) — random init; train "
                        "IFRNet first with train_vfi.py", path)
        return self.bundle.init_vfi(jax.random.PRNGKey(7), scale if scale in
                                    ("train", "test") else
                                    ("train" if scale == "large" else "test"))

    # ------------------------------------------------------------ ckpt mgmt
    def load_ckpt(self):
        path = os.path.join(self.log_path, "ckpt.pkl")
        if not os.path.exists(path):
            logging.info("No checkpoint to resume; training from scratch")
            return
        logging.info("Resuming from %s", path)
        ckpt = ckpt_lib.load_checkpoint(path)
        self.state = TrainState(
            step=jnp.asarray(ckpt["step_in_total"], jnp.int32),
            params=ckpt_lib.merge_params(self.state.params, ckpt["params"]),
            batch_stats=ckpt_lib.merge_params(self.state.batch_stats, ckpt["batch_stats"]),
            opt_state=jax.tree.map(
                lambda t, l: jnp.asarray(l) if np.shape(t) == np.shape(l) else t,
                self.state.opt_state,
                ckpt["opt_state"],
            ),
        )
        self.ep_start = ckpt["epoch"]
        self.batch_start = ckpt["batch_idx"]

    def load_pretrained(self, path: str):
        logging.info("Loading pretrained model from %s", path)
        if path.endswith(".pth"):
            loaded = ckpt_lib.load_reference_pth(path, self.cfg,
                                                 len(self.bundle.num_ch_enc))
            self.state = self.state.replace(
                params=ckpt_lib.merge_params(self.state.params, loaded["params"]),
                batch_stats=ckpt_lib.merge_params(
                    self.state.batch_stats, loaded["batch_stats"]
                ),
            )
        else:
            ckpt = ckpt_lib.load_checkpoint(path)
            self.state = self.state.replace(
                params=ckpt_lib.merge_params(self.state.params, ckpt["params"]),
                batch_stats=ckpt_lib.merge_params(
                    self.state.batch_stats, ckpt.get("batch_stats", {})
                ),
            )

    def save_model(self, epoch: int, batch_idx: int = 0, ep_end: bool = False):
        if not self.is_chief:  # rank-0 saves, like reference train.py:302-303
            return
        if ep_end:
            ckpt_lib.save_weights(
                os.path.join(self.log_path, "models", f"model_{epoch}.pkl"),
                self.state.params, self.cfg,
            )
        ckpt_lib.save_checkpoint(
            os.path.join(self.log_path, "ckpt.pkl"),
            self.state, self.cfg,
            epoch=epoch + 1 if ep_end else epoch,
            batch_idx=batch_idx,
        )

    # -------------------------------------------------------------- training
    def train(self):
        for epoch in range(self.ep_start, self.cfg.num_epochs):
            self.run_epoch(epoch)
            if self.cfg.dataset in ("kitti", "cityscapes"):
                if self.gt_depths is not None:
                    self.test(epoch, multi_frame=False)
                    self.test(epoch, multi_frame=True)
            elif self.cfg.dataset == "nyuv2":
                self.test_nyuv2(epoch)
            self.save_model(epoch, ep_end=True)

    def test_nyuv2(self, epoch: int):
        """Per-epoch NYUv2 eval (reference train.py:305-354)."""
        logging.info("NYUv2 eval at epoch %d", epoch)
        ds = self.test_dataset
        params, batch_stats, _ = self._eval_vars()
        preds, gts = [], []
        for i in range(len(ds)):
            rgb, depth = ds.load_test_item(i)
            d = self._sf_disp(params, batch_stats, jnp.asarray(rgb)[None])
            from mono_vifi_tpu.ops.geometry import disp_to_depth

            sd, _ = disp_to_depth(d, self.cfg.min_depth, self.cfg.max_depth)
            preds.append(np.asarray(sd)[0, ..., 0])
            gts.append(depth)
        evaluation.evaluate_nyuv2(np.stack(preds), gts, printer=logging.info)

    def run_epoch(self, epoch: int):
        cfg = self.cfg
        logging.info("Training epoch %d", epoch)
        self.sampler.set_epoch(epoch)
        self.sampler.set_start_iter(self.batch_start * self.local_batch)
        self.train_dataset.set_epoch(epoch)

        profiling = False
        if cfg.profile_steps > 0 and epoch == self.ep_start:
            trace_dir = os.path.join(self.log_path, "profile")
            jax.profiler.start_trace(trace_dir)
            profiling = True
            logging.info("Capturing jax.profiler trace to %s", trace_dir)

        t_data = time.perf_counter()
        put = (
            (lambda b: shard_host_local_batch(b, self.mesh))
            if self.world > 1 else None
        )
        it = device_prefetch(self.train_loader, self.data_sharding, put_fn=put)
        for batch_idx, batch in enumerate(it):
            step_rng = jax.random.fold_in(self.rng, int(self.state.step))
            t_fp = time.perf_counter()
            self.state, metrics = self.train_step(
                self.state, self.vfi_params, batch, step_rng
            )
            if profiling and batch_idx + 1 >= cfg.profile_steps:
                float(metrics["loss"])
                jax.profiler.stop_trace()
                profiling = False
                logging.info("Profiler trace captured (%d steps)", cfg.profile_steps)

            global_idx = batch_idx + self.batch_start
            if global_idx % cfg.log_frequency == 0:
                loss = float(metrics["loss"])  # sync point
                t_now = time.perf_counter()
                step_no = int(self.state.step)
                eta = (self.num_total_steps - step_no) * (t_now - t_data)
                lr = float(self.lr_sched(step_no))
                logging.info(
                    "epoch %2d/%d | batch %4d/%d | data %.3fs | step %.3fs | "
                    "loss %.4f | lr %.2e | eta %s",
                    epoch, cfg.num_epochs - 1, global_idx, self.steps_per_epoch,
                    t_fp - t_data, t_now - t_data, loss, lr, sec_to_hm_str(eta),
                )
                if self.writer is not None:
                    for k, v in metrics.items():
                        self.writer.add_scalar(k, float(v), step_no)
                    self.writer.add_scalar("learning_rate", lr, step_no)
            if global_idx > 0 and global_idx % cfg.save_frequency == 0:
                self.save_model(epoch, batch_idx=global_idx + 1)
            t_data = time.perf_counter()
        self.batch_start = 0

    # ------------------------------------------------------------------ eval
    def _eval_vars(self):
        """Params/stats usable by the per-host eval jits. Multi-host: pull
        the (replicated, hence fully addressable) global arrays to host and
        re-put on local devices so eval runs process-local without
        cross-host collectives."""
        if self.world == 1:
            return self.state.params, self.state.batch_stats, self.vfi_small_params
        loc = lambda t: jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), t)
        return loc(self.state.params), loc(self.state.batch_stats), loc(
            self.vfi_small_params
        )

    def _predict_disps(self, multi_frame: bool):
        params, batch_stats, vfi_small = self._eval_vars()
        disps = []
        for batch in self.test_loader:
            n = batch["color_0"].shape[0]
            pad = (-n) % self.global_batch
            def get(key):
                x = batch[key]
                if pad:
                    x = np.concatenate([x, np.repeat(x[-1:], pad, 0)], 0)
                return jnp.asarray(x)
            if multi_frame:
                d = self._mf_disp(
                    params, batch_stats, vfi_small,
                    get("color_n1"), get("color_0"), get("color_p1"),
                )
            else:
                d = self._sf_disp(params, batch_stats, get("color_0"))
            from mono_vifi_tpu.ops.geometry import disp_to_depth

            sd, _ = disp_to_depth(d, self.cfg.min_depth, self.cfg.max_depth)
            disps.append(np.asarray(sd)[: n, ..., 0])
        return np.concatenate(disps, 0)

    def test(self, epoch: int, multi_frame: bool):
        tag = "multi-frame" if multi_frame else "single-frame"
        logging.info("Eval (%s) at epoch %d", tag, epoch)
        pred = self._predict_disps(multi_frame)
        if self.cfg.dataset == "kitti":
            evaluation.evaluate_kitti(
                pred, self.gt_depths, self.cfg.eval_split,
                self.cfg.use_stereo and not multi_frame, printer=logging.info,
            )
        else:
            evaluation.evaluate_cityscapes(
                pred, self.gt_depths,
                self.cfg.use_stereo and not multi_frame, printer=logging.info,
            )


if __name__ == "__main__":
    trainer = Trainer(parse_options())
    trainer.train()
