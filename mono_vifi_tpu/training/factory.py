"""Model construction per backbone + parameter-tree initialization.

Mirrors the reference trainer's model dict (train.py:142-227): roles
encoder / depth / [encoder_mf / depth_mf] / fusion_module / pose_encoder /
pose, plus the two frozen IFRNets. Sharing modes (train.py:170-179):
  shared_all:     encoder_mf IS encoder, depth_mf IS depth (aliases)
  shared_encoder: encoder shared, depth_mf a separate copy of depth
  separate_all:   both separate copies
In JAX the aliasing is explicit: shared roles simply reuse the same subtree
of the parameter pytree, so "deepcopy" becomes tree copy at init.
"""

from __future__ import annotations

import copy
from typing import Any

import jax
import jax.numpy as jnp

from mono_vifi_tpu.config import Options
from mono_vifi_tpu.models import monodepth2, posenet, ifrnet, fusion, resnet


class ModelBundle:
    """Static (hashable) container of the flax module definitions."""

    def __init__(self, cfg: Options):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        self.dtype = dtype

        if cfg.backbone in ("ResNet18", "ResNet50"):
            nl = 18 if cfg.backbone == "ResNet18" else 50
            self.num_ch_enc = resnet.num_ch_enc(nl)
            self.encoder = monodepth2.DepthEncoder(nl, dtype)
            self.depth = monodepth2.DepthDecoder(
                num_ch_enc=self.num_ch_enc,
                scales=tuple(range(cfg.num_scales)),
                dtype=dtype,
            )
        elif cfg.backbone == "LiteMono":
            from mono_vifi_tpu.models import litemono

            self.encoder = litemono.DepthEncoder(
                height=cfg.height, width=cfg.width, dtype=dtype
            )
            self.num_ch_enc = tuple(self.encoder.num_ch_enc)
            self.depth = litemono.DepthDecoder(
                num_ch_enc=self.num_ch_enc,
                scales=tuple(range(cfg.num_scales)),
                dtype=dtype,
            )
        elif cfg.backbone == "DHRNet":
            from mono_vifi_tpu.models import dhrnet

            self.encoder = dhrnet.DepthEncoder(dtype=dtype)
            self.num_ch_enc = tuple(self.encoder.num_ch_enc)
            self.depth = dhrnet.DepthDecoder(
                num_ch_enc=self.num_ch_enc,
                scales=tuple(range(cfg.num_scales)),
                dtype=dtype,
            )
        else:
            raise ValueError(f"unknown backbone {cfg.backbone}")

        import jax as _jax

        self.fast_warp = bool(cfg.fast_warp) and _jax.default_backend() == "tpu"
        self.fusion_module = fusion.FusionModule(
            num_ch_enc=self.num_ch_enc,
            backbone=cfg.backbone,
            dtype=dtype,
            fast_grad_warp=self.fast_warp,
        )
        self.pose_encoder = posenet.PoseEncoder(cfg.num_layers, dtype)
        self.pose = posenet.PoseDecoder(dtype=dtype)
        self.vfi_train = ifrnet.IFRNet(
            getattr(cfg, "vfi_train_scale", "large"), dtype, fast_warp=self.fast_warp
        )
        self.vfi_test = ifrnet.IFRNet(
            getattr(cfg, "vfi_test_scale", "small"), dtype, fast_warp=self.fast_warp
        )

    # ---------------------------------------------------------------- init
    def init_variables(self, rng: jax.Array) -> tuple[dict, dict]:
        """Random-init all trainable roles. Returns (params, batch_stats)."""
        cfg = self.cfg
        H, W = cfg.height, cfg.width
        img = jnp.zeros((1, H, W, 3), jnp.float32)
        pair = jnp.zeros((1, H, W, 6), jnp.float32)
        keys = jax.random.split(rng, 8)

        params: dict[str, Any] = {}
        batch_stats: dict[str, Any] = {}

        def init(module, key, *args, **kwargs):
            v = module.init(key, *args, **kwargs)
            return v.get("params", {}), v.get("batch_stats", {})

        params["encoder"], batch_stats["encoder"] = init(self.encoder, keys[0], img)
        feats = self.encoder.apply(
            {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
            img,
            train=False,
        )
        params["depth"], _ = init(self.depth, keys[1], feats)

        if cfg.fuse_model_type == "shared_encoder":
            params["depth_mf"] = copy.deepcopy(params["depth"])
        elif cfg.fuse_model_type == "separate_all":
            params["encoder_mf"] = copy.deepcopy(params["encoder"])
            batch_stats["encoder_mf"] = copy.deepcopy(batch_stats["encoder"])
            params["depth_mf"] = copy.deepcopy(params["depth"])

        flow = jnp.zeros((1, H, W, 2), jnp.float32)
        mask = jnp.zeros((1, H, W, 1), jnp.float32)
        params["fusion_module"], _ = init(
            self.fusion_module, keys[2], [feats, feats, feats], (flow, flow), mask
        )

        if cfg.use_pose_net:
            params["pose_encoder"], batch_stats["pose_encoder"] = init(
                self.pose_encoder, keys[3], pair
            )
            pfeats = self.pose_encoder.apply(
                {
                    "params": params["pose_encoder"],
                    "batch_stats": batch_stats["pose_encoder"],
                },
                pair,
                train=False,
            )
            params["pose"], _ = init(self.pose, keys[4], pfeats[-1])

        return params, batch_stats

    def init_vfi(self, rng: jax.Array, which: str = "train") -> dict:
        """Random-init a frozen VFI net (replaced by converted weights in
        real training — reference loads ./weights/IFRNet_{L,S}_*.pth)."""
        cfg = self.cfg
        H, W = cfg.height, cfg.width
        img = jnp.zeros((1, H, W, 3), jnp.float32)
        embt = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
        module = self.vfi_train if which == "train" else self.vfi_test
        return module.init(rng, img, img, embt, only_flow=True)["params"]
