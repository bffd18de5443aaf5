"""The fused Mono-ViFI training step: one jitted XLA program per step.

Re-designs reference train.py:698-941 (process_batch + losses) TPU-first:
the reference's ~17 sequential module forwards per step become a handful of
large batched calls so the MXU sees big convolutions:

  - 3 frozen IFRNet-L passes          -> 1 pass over 3B (pairs stacked)
  - 6 PoseNet passes                  -> 1 pass over 6B
  - 5-8 depth-encoder passes          -> 1 pass over (5|8)B
  - 3-6 depth-decoder passes          -> 1 pass
  - 3 fusion + 3 depth_mf passes      -> 1 + 1 over 3B
  - 12 photometric warps + losses     -> batched over 6B targets
  - per-sample affine rotate/crop loops (train.py:888-922) -> batched warps

Loss semantics match the reference exactly (photometric SSIM+L1 with
automasking and tie-break noise, edge-aware smoothness, SVDC/SADC SI-log
consistency, loss = loss_base + lamda * loss_dc); sums of per-call means
become (count x batched mean), which is algebraically identical. The one
deliberate deviation: BatchNorm batch statistics are computed over the
*combined* batch of a fused call instead of per-sub-forward (better
statistics, SyncBN-equivalent across devices under pjit).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import flax.struct
import optax

from mono_vifi_tpu.config import Options
from mono_vifi_tpu.training.factory import ModelBundle
from mono_vifi_tpu.ops import geometry, sampling
from mono_vifi_tpu.ops import image as image_ops
from mono_vifi_tpu.ops import losses as L
from mono_vifi_tpu.ops.pallas import warp as pwarp


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def _f32(x):
    return x.astype(jnp.float32)


def _tile(x, n):
    return jnp.concatenate([x] * n, axis=0)


def dequantize_batch(batch):
    """uint8-staged image/mask planes -> float32/255 ON DEVICE.

    The host pipeline optionally ships color/mask planes as uint8
    (data/mono_dataset.py stage_uint8: 4x less host convert/collate and
    host->device traffic); f32(u8)/255 here equals the host to_array
    conversion exactly. Float batches (tests, bench) pass through untouched.
    """
    return {
        k: (v.astype(jnp.float32) / 255.0 if v.dtype == jnp.uint8 else v)
        for k, v in batch.items()
    }


class MonoViFiStep:
    """Builds the jitted train step for a ModelBundle."""

    def __init__(self, bundle: ModelBundle, tx: optax.GradientTransformation):
        self.b = bundle
        self.cfg = bundle.cfg
        self.tx = tx

    # -------------------------------------------------------------- helpers
    def _apply_encoder(self, params, bstats, role, x, train, rng=None):
        module = self.b.encoder
        variables = {"params": params[role], "batch_stats": bstats[role]}
        if train:
            rngs = {"droppath": rng} if rng is not None else None

            def run(v, xx):
                return module.apply(
                    v, xx, train=True, mutable=["batch_stats"], rngs=rngs
                )

            if getattr(self.cfg, "encoder_remat", False):
                # rematerialize: recompute the fused encoder pass in the
                # backward instead of storing its activation pyramids.
                # Costs ~1 extra encoder forward per step — only worth it
                # when activations don't fit HBM (HR resolutions/big batch).
                run = jax.checkpoint(run)

            feats, mut = run(variables, x)
            return feats, mut["batch_stats"]
        return module.apply(variables, x, train=False), bstats[role]

    def _depth_params(self, params, multi_frame):
        if multi_frame:
            return params.get("depth_mf", params["depth"])
        return params["depth"]

    def _encoder_role(self, multi_frame):
        if multi_frame and self.cfg.fuse_model_type == "separate_all":
            return "encoder_mf"
        return "encoder"

    def _photometric(self, disp, tgt, src_n1, src_p1, T_n1, T_p1, K, invK, rng,
                     mask_rec=None, smooth_dyn_mask=None, ident_reuse=None,
                     return_automask=False):
        """Batched compute_losses_base (reference train.py:987-1051).

        All args stacked along batch; returns scalar mean over the stack.
        With return_automask=True also returns the (B, H, W) automask — 1.0
        where a reprojection (not identity) candidate won the per-pixel min
        (reference train.py:1038-1040; the reference trainer ignores it, it
        exists for visualization parity).
        """
        cfg = self.cfg
        disp = _f32(disp)
        _, depth = geometry.disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
        # PLANAR (gx, gy) coordinate planes end-to-end: a (..., 2)-minor grid
        # pays 64x lane-tile padding on every copy/concat/split it touches
        gx_n1, gy_n1 = geometry.reprojection_grid_planar(depth, K, invK, T_n1)
        gx_p1, gy_p1 = geometry.reprojection_grid_planar(depth, K, invK, T_p1)
        gshape = gx_n1.shape + (2,)
        if getattr(self.b, "fast_warp", False) and pwarp.windowed_ok(
            src_n1.shape, gshape
        ):
            td = self.b.dtype  # bf16 taps in the bf16 path (None = exact)
            # _safe: runtime span guard falls back to the exact gather when
            # early-training depth produces out-of-window offsets; both
            # source frames batch into ONE kernel launch. planar=True: the
            # kernel's native channel-planar taps feed the planar photometric
            # losses directly (no NHWC round-trip transpose)
            pred2 = _f32(
                pwarp.grid_sample_windowed_safe_planar(
                    jnp.concatenate([src_n1, src_p1], 0),
                    jnp.concatenate([gx_n1, gx_p1], 0),
                    jnp.concatenate([gy_n1, gy_p1], 0),
                    tap_dtype=td,
                    planar=True,
                )
            )
            N = src_n1.shape[0]
            pred_n1_pl, pred_p1_pl = pred2[:N], pred2[N:]
        else:
            gd = self.b.dtype  # bf16 taps in the bf16 path (None = exact)
            grid_n1 = jnp.stack([gx_n1, gy_n1], axis=-1)
            grid_p1 = jnp.stack([gx_p1, gy_p1], axis=-1)
            pred_n1_pl = L.to_planar(
                _f32(sampling.grid_sample(src_n1, grid_n1, gather_dtype=gd))
            )
            pred_p1_pl = L.to_planar(
                _f32(sampling.grid_sample(src_p1, grid_p1, gather_dtype=gd))
            )

        # channel-planar loss layout: stacking candidate loss maps along the
        # LEADING axis keeps the tiled (H, W) pair intact (a trailing
        # candidate axis would re-create the tiny-minor-dim tile padding).
        # On TPU the SSIM+L1 map is ONE fused Pallas pass per image
        # (ops/pallas/photometric.py) — the XLA chain is a ~20-op tail of
        # small fusions; off-TPU, target-side SSIM moments are shared by
        # all 4 comparisons per target (bit-identical, 30% fewer pools).
        use_ssim = not cfg.no_ssim
        fused = bool(getattr(self.b, "fast_warp", False))
        tgt_pl = L.to_planar(tgt)
        if fused:
            from mono_vifi_tpu.ops.pallas import photometric as PM

            moments = None
            rpl = lambda p: PM.ssim_l1_map(p, tgt_pl, use_ssim)
            rpl_ng = lambda p, t: PM.ssim_l1_map_nograd(p, t, use_ssim)
        else:
            moments = L.target_moments_planar(tgt_pl) if use_ssim else None
            rpl = lambda p: L.reprojection_loss_planar(
                p, tgt_pl, use_ssim, moments
            )
        reproj = jnp.stack(
            [rpl(pred_n1_pl), rpl(pred_p1_pl)],
            axis=0,
        )
        if cfg.avg_reprojection:
            reproj = jnp.mean(reproj, axis=0, keepdims=True)

        if not cfg.disable_automasking:
            if fused:
                ipl = lambda s, t: rpl_ng(L.to_planar(s), L.to_planar(t))
            else:
                ipl = lambda s, t, m=None: L.reprojection_loss_planar(
                    L.to_planar(s), L.to_planar(t), use_ssim, m
                )
            if ident_reuse is not None:
                # the stacked targets repeat (e.g. the 6-target stack's
                # entries 3..5 reuse targets 0, 2, 1): the gradient-free
                # identity losses are equal for equal (src, tgt) blocks, so
                # compute each unique block once and re-index — identical
                # values, 50% fewer identity SSIM maps
                k = len(ident_reuse)
                Bs = tgt_pl.shape[0] // k
                u = max(ident_reuse) + 1
                if fused:
                    ident_u = jnp.stack(
                        [
                            ipl(src_n1[: u * Bs], tgt[: u * Bs]),
                            ipl(src_p1[: u * Bs], tgt[: u * Bs]),
                        ],
                        axis=0,
                    )
                else:
                    mom_u = jax.tree.map(lambda m: m[: u * Bs], moments) \
                        if moments is not None else None
                    ident_u = jnp.stack(
                        [
                            ipl(src_n1[: u * Bs], tgt[: u * Bs], mom_u),
                            ipl(src_p1[: u * Bs], tgt[: u * Bs], mom_u),
                        ],
                        axis=0,
                    )
                ident = jnp.concatenate(
                    [ident_u[:, i * Bs : (i + 1) * Bs] for i in ident_reuse],
                    axis=1,
                )
            else:
                if fused:
                    ident = jnp.stack(
                        [ipl(src_n1, tgt), ipl(src_p1, tgt)], axis=0
                    )
                else:
                    ident = jnp.stack(
                        [
                            ipl(src_n1, tgt, moments),
                            ipl(src_p1, tgt, moments),
                        ],
                        axis=0,
                    )
            if cfg.avg_reprojection:
                ident = jnp.mean(ident, axis=0, keepdims=True)
            ident = ident + jax.random.normal(rng, ident.shape) * 1e-5
            combined = jnp.concatenate([ident, reproj], axis=0)
        else:
            combined = reproj

        to_opt = jnp.min(combined, axis=0) if combined.shape[0] > 1 else combined[0]
        automask = None
        if return_automask and not cfg.disable_automasking and combined.shape[0] > 1:
            # candidate index >= #identity-candidates means a reprojection won
            n_ident = combined.shape[0] - reproj.shape[0]
            automask = (jnp.argmin(combined, axis=0) >= n_ident).astype(jnp.float32)
        if mask_rec is not None:
            to_opt = to_opt * mask_rec[..., 0]
        loss = jnp.mean(to_opt)

        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        norm_disp = disp / (mean_disp + 1e-7)
        if smooth_dyn_mask is not None:
            # doj-weighted smoothness (reference layers.py:244-258); entries
            # with a zero mask reduce exactly to the plain smoothness
            smooth = L.smooth_loss_dyn_planar(
                norm_disp[..., 0], tgt_pl, smooth_dyn_mask
            )
        else:
            smooth = L.smooth_loss_planar(norm_disp[..., 0], tgt_pl)
        loss = loss + cfg.disparity_smoothness * smooth
        if return_automask:
            return loss, automask
        return loss

    # ------------------------------------------------------------ the loss
    def loss_fn(self, params, batch_stats, vfi_params, batch, rng, train=True):
        cfg = self.cfg
        b = self.b
        batch = dequantize_batch(batch)
        B = batch["color_0"].shape[0]
        rng_n1, rng_n2, rng_dp1, rng_dp2 = jax.random.split(rng, 4)

        img_n1, img_0, img_p1 = batch["color_n1"], batch["color_0"], batch["color_p1"]
        aug_n1, aug_0, aug_p1 = (
            batch["color_aug_n1"],
            batch["color_aug_0"],
            batch["color_aug_p1"],
        )
        K, invK = batch["K"], batch["inv_K"]
        new_bstats = dict(batch_stats)

        # ---- frozen VFI-L (reference train.py:715-718): the two synthesis
        # pairs batch into one full pass; the (n1, p1) pair takes the
        # onlyFlow fast path (no full-res image warps — they're gathers, the
        # most expensive op on TPU). NOTE: batching all THREE pairs into one
        # 3B-wide pass (trimmed synthesis) was MEASURED -4.8 samples/s on the
        # full step (23.5 -> 18.7): the 3B-wide VFI activation set raises
        # peak HBM pressure enough that XLA rematerializes — keep two calls.
        embt2 = jnp.full((2 * B, 1, 1, 1), 0.5, jnp.float32)
        vfi_out = b.vfi_train.apply(
            {"params": vfi_params},
            jnp.concatenate([img_n1, img_0], 0),
            jnp.concatenate([img_0, img_p1], 0),
            embt2,
        )
        vfi_out = jax.lax.stop_gradient(vfi_out)
        flows_01 = jax.lax.stop_gradient(
            b.vfi_train.apply(
                {"params": vfi_params}, img_n1, img_p1, embt2[:B], only_flow=True
            )
        )
        pred = _f32(vfi_out["imgt_pred"])
        fl0, fl1 = _f32(vfi_out["flow0"]), _f32(vfi_out["flow1"])
        msk = _f32(vfi_out["mask"])
        img_nt, img_pt = pred[:B], pred[B:]
        flow_nt_n1, flow_nt_0 = fl0[:B], fl1[:B]
        flow_pt_0, flow_pt_p1 = fl0[B:], fl1[B:]
        flow_0_n1, flow_0_p1 = _f32(flows_01["flow0"]), _f32(flows_01["flow1"])
        mask_nt, mask_pt, mask_01 = msk[:B], msk[B:], _f32(flows_01["mask"])

        # ---- 6 pose pairs in one pass (reference train.py:728-733, :943-954)
        pose_pairs = [
            (aug_n1, aug_0),  # -> inv = T_0_n1
            (aug_0, aug_p1),  # -> fwd = T_0_p1
            (img_n1, img_nt),  # -> inv = T_nt_n1
            (img_nt, img_p1),  # -> fwd = T_nt_p1
            (img_n1, img_pt),  # -> inv = T_pt_n1
            (img_pt, img_p1),  # -> fwd = T_pt_p1
        ]
        pose_in = jnp.concatenate(
            [jnp.concatenate([a, c], -1) for a, c in pose_pairs], 0
        )
        pe_vars = {
            "params": params["pose_encoder"],
            "batch_stats": batch_stats["pose_encoder"],
        }
        if train:
            pfeats, mut = b.pose_encoder.apply(
                pe_vars, pose_in, train=True, mutable=["batch_stats"]
            )
            new_bstats["pose_encoder"] = mut["batch_stats"]
        else:
            pfeats = b.pose_encoder.apply(pe_vars, pose_in, train=False)
        aa, tr = b.pose.apply({"params": params["pose"]}, _f32(pfeats[-1]))
        aa0, tr0 = aa[:, 0, 0], tr[:, 0, 0]  # (6B, 3)
        fwd = geometry.transformation_from_parameters(aa0, tr0, False)
        inv = geometry.transformation_from_parameters(aa0, tr0, True)
        T_0_n1, T_0_p1 = inv[:B], fwd[B : 2 * B]
        T_nt_n1, T_nt_p1 = inv[2 * B : 3 * B], fwd[3 * B : 4 * B]
        T_pt_n1, T_pt_p1 = inv[4 * B : 5 * B], fwd[5 * B : 6 * B]

        # ---- affine inputs (batched warps replacing train.py:888-902);
        # both synthesized frames rotate+crop in ONE batched call
        if cfg.use_affine:
            angle, box = batch["angle"], batch["box"]
            aff_aug_0 = batch["color_affine_aug_0"]
            rot2 = image_ops.rotate_bilinear(
                jnp.concatenate([img_nt, img_pt], 0), _tile(angle, 2),
                fast=getattr(self.b, "fast_warp", False),
            )
            aff2 = image_ops.batched_crop_resize(rot2, _tile(box, 2))
            img_nt_aff, img_pt_aff = aff2[:B], aff2[B:]

        # ---- depth encoder: single fused pass
        sf_inputs = [aug_0, img_nt, img_pt]
        if cfg.use_affine:
            sf_inputs += [aff_aug_0, img_nt_aff, img_pt_aff]
        if cfg.fuse_model_type == "separate_all":
            feats_sf, new_bstats["encoder"] = self._apply_encoder(
                params, batch_stats, "encoder", jnp.concatenate(sf_inputs, 0),
                train, rng_dp1,
            )
            mf_in = jnp.concatenate([aug_0, img_nt, img_pt, aug_n1, aug_p1], 0)
            feats_mf_all, new_bstats["encoder_mf"] = self._apply_encoder(
                params, batch_stats, "encoder_mf", mf_in, train, rng_dp2
            )
            feats_mf = [
                [f[i * B : (i + 1) * B] for f in feats_mf_all] for i in range(5)
            ]
            f0_mf, fnt_mf, fpt_mf, fn1_mf, fp1_mf = feats_mf
        else:
            all_in = jnp.concatenate(sf_inputs + [aug_n1, aug_p1], 0)
            feats_all, new_bstats["encoder"] = self._apply_encoder(
                params, batch_stats, "encoder", all_in, train, rng_dp1
            )
            n_sf = len(sf_inputs)
            feats_sf = [f[: n_sf * B] for f in feats_all]
            fn1_mf = [f[n_sf * B : (n_sf + 1) * B] for f in feats_all]
            fp1_mf = [f[(n_sf + 1) * B :] for f in feats_all]
            f0_mf = [f[:B] for f in feats_all]
            fnt_mf = [f[B : 2 * B] for f in feats_all]
            fpt_mf = [f[2 * B : 3 * B] for f in feats_all]

        # ---- single-frame disparities (one decoder pass)
        disp_sf = b.depth.apply({"params": params["depth"]}, feats_sf)[0]
        disp_sf = _f32(disp_sf)
        disp_0, disp_nt, disp_pt = disp_sf[:B], disp_sf[B : 2 * B], disp_sf[2 * B : 3 * B]
        if cfg.use_affine:
            disp_0_aff = disp_sf[3 * B : 4 * B]
            disp_nt_aff = disp_sf[4 * B : 5 * B]
            disp_pt_aff = disp_sf[5 * B : 6 * B]

        def to_depth(d):
            return geometry.disp_to_depth(d, cfg.min_depth, cfg.max_depth)[1]

        # ---- multi-frame: 3 fusion triplets in one pass (train.py:762-789).
        # The 3 triplets' prev/next pyramids repeat 3 unique pyramids
        # (f0, fn1, fp1) across 6 warp uses — the TPU path passes them as a
        # unique-image table + static use->image ids (no repeated-pyramid
        # concat; the center stack is a contiguous slice of the fused
        # encoder output). Values identical to the concat formulation.
        # [f0, fnt, fpt] are the first three B-slices of the fused encoder
        # stack in both sharing modes -> the center stack is one free slice
        mf_stack = (
            feats_mf_all if cfg.fuse_model_type == "separate_all" else feats_all
        )
        center_feats = [f[: 3 * B] for f in mf_stack]
        flow_prev = jnp.concatenate([flow_0_n1, flow_nt_n1, flow_pt_0], 0)
        flow_next = jnp.concatenate([flow_0_p1, flow_nt_0, flow_pt_p1], 0)
        mask3 = jnp.concatenate([mask_01, mask_nt, mask_pt], 0)
        if getattr(b, "fast_warp", False):
            unique = [
                jnp.concatenate([a, a2, a3], 0)
                for a, a2, a3 in zip(f0_mf, fn1_mf, fp1_mf)
            ]
            ids = []
            for p in (1, 1, 0, 2, 0, 2):  # prev: fn1,fn1,f0; next: fp1,f0,fp1
                ids += [p * B + j for j in range(B)]
            fused = b.fusion_module.apply(
                {"params": params["fusion_module"]},
                [None, center_feats, None],
                (flow_prev, flow_next),
                mask3,
                warp_table=(unique, tuple(ids)),
            )
        else:
            prev_feats = [jnp.concatenate([a, a2, a3], 0) for a, a2, a3 in
                          zip(fn1_mf, fn1_mf, f0_mf)]
            next_feats = [jnp.concatenate([a, a2, a3], 0) for a, a2, a3 in
                          zip(fp1_mf, f0_mf, fp1_mf)]
            fused = b.fusion_module.apply(
                {"params": params["fusion_module"]},
                [prev_feats, center_feats, next_feats],
                (flow_prev, flow_next),
                mask3,
            )
        disp_fuse = _f32(
            b.depth.apply({"params": self._depth_params(params, True)}, fused)[0]
        )
        disp_0_fuse = disp_fuse[:B]
        disp_nt_fuse = disp_fuse[B : 2 * B]
        disp_pt_fuse = disp_fuse[2 * B :]

        # ---- photometric losses over 6 stacked targets (train.py:746-812)
        disp_stack = jnp.concatenate(
            [disp_0, disp_pt, disp_nt, disp_0_fuse, disp_nt_fuse, disp_pt_fuse], 0
        )
        tgt_stack = jnp.concatenate([img_0, img_pt, img_nt, img_0, img_nt, img_pt], 0)
        Tn1_stack = jnp.concatenate(
            [T_0_n1, T_pt_n1, T_nt_n1, T_0_n1, T_nt_n1, T_pt_n1], 0
        )
        Tp1_stack = jnp.concatenate(
            [T_0_p1, T_pt_p1, T_nt_p1, T_0_p1, T_nt_p1, T_pt_p1], 0
        )
        # optional doj-weighted smoothness (cfg.use_smooth_dyn + CS doj
        # masks): only frame-0 targets (stack slots 0 and 3) have masks;
        # zero entries reduce to the plain smoothness exactly
        sdm6 = None
        use_dyn = cfg.use_smooth_dyn and "doj_mask_0" in batch
        if use_dyn:
            d0 = batch["doj_mask_0"][..., 0]
            z = jnp.zeros_like(d0)
            sdm6 = jnp.concatenate([d0, z, z, d0, z, z], 0)
        loss_base = 6.0 * self._photometric(
            disp_stack,
            tgt_stack,
            _tile(img_n1, 6),
            _tile(img_p1, 6),
            Tn1_stack,
            Tp1_stack,
            _tile(K, 6),
            _tile(invK, 6),
            rng_n1,
            smooth_dyn_mask=sdm6,
            # targets repeat as (0, pt, nt, 0, nt, pt): identity losses for
            # entries 3..5 equal those of entries 0, 2, 1
            ident_reuse=(0, 1, 2, 0, 2, 1),
        )

        # ---- SVDC: single <-> fused SI-log consistency (train.py:797-812)
        depth_single3 = to_depth(jnp.concatenate([disp_0, disp_nt, disp_pt], 0))
        depth_fuse3 = to_depth(
            jnp.concatenate([disp_0_fuse, disp_nt_fuse, disp_pt_fuse], 0)
        )
        loss_dc = 3.0 * L.si_log_depth_loss(depth_single3, depth_fuse3)

        # ---- affine branch (train.py:814-922)
        if cfg.use_affine:
            Rc = batch["Rc"]
            mask_rec = batch["valid_mask_rec"]
            mask_cons = batch["valid_mask_cons"]
            img_n1_aff = batch["color_affine_n1"]
            img_0_aff = batch["color_affine_0"]
            img_p1_aff = batch["color_affine_p1"]

            T6 = jnp.concatenate(
                [T_0_n1, T_pt_n1, T_nt_n1, T_0_p1, T_pt_p1, T_nt_p1], 0
            )
            T6_aff = geometry.conjugate_pose(T6, _tile(Rc, 6))
            Tn1_aff = T6_aff[: 3 * B]  # order: (0, pt, nt)
            Tp1_aff = T6_aff[3 * B :]

            disp_aff_stack = jnp.concatenate(
                [disp_0_aff, disp_pt_aff, disp_nt_aff], 0
            )
            tgt_aff_stack = jnp.concatenate([img_0_aff, img_pt_aff, img_nt_aff], 0)
            sdm3 = None
            if use_dyn and "doj_mask_0_affine" in batch:
                da = batch["doj_mask_0_affine"][..., 0]
                za = jnp.zeros_like(da)
                sdm3 = jnp.concatenate([da, za, za], 0)
            loss_base = loss_base + 3.0 * self._photometric(
                disp_aff_stack,
                tgt_aff_stack,
                _tile(img_n1_aff, 3),
                _tile(img_p1_aff, 3),
                Tn1_aff,
                Tp1_aff,
                _tile(K, 3),
                _tile(invK, 3),
                rng_n2,
                mask_rec=_tile(mask_rec, 3),
                smooth_dyn_mask=sdm3,
            )

            # SADC: restore the affine depths and compare (train.py:904-922).
            # place/crop are MXU interpolation matmuls; the rotate of the
            # gradient-carrying depth uses the splat-backward path on TPU
            depth_aff3 = to_depth(disp_aff_stack)
            placed = image_ops.batched_place_resize(depth_aff3, _tile(box, 3))
            restored = image_ops.rotate_bilinear(
                placed, -_tile(angle, 3),
                grad_via_splat=getattr(self.b, "fast_warp", False),
                fast=getattr(self.b, "fast_warp", False),
            )
            ratio = batch["ratio_local"].reshape(B, 1, 1, 1)
            restored = restored * _tile(ratio, 3)
            depth_single3o = to_depth(
                jnp.concatenate([disp_0, disp_pt, disp_nt], 0)
            )
            depth_fuse3o = to_depth(
                jnp.concatenate([disp_0_fuse, disp_pt_fuse, disp_nt_fuse], 0)
            )
            mc3 = _tile(mask_cons, 3)
            loss_sadc = 3.0 * (
                L.si_log_depth_loss(restored, depth_fuse3o, mc3)
                + L.si_log_depth_loss(restored, depth_single3o, mc3)
            )
            loss_dc = loss_dc + loss_sadc
        else:
            loss_sadc = jnp.zeros(())

        loss = loss_base + cfg.lamda * loss_dc
        metrics = {
            "loss": loss,
            "loss_base": loss_base,
            "loss_dc": loss_dc,
            "loss_sadc": loss_sadc,
        }
        return loss, (new_bstats, metrics)

    # ------------------------------------------------------------ train step
    def make_train_step(self):
        def train_step(state: TrainState, vfi_params, batch, rng):
            def lf(p):
                return self.loss_fn(
                    p, state.batch_stats, vfi_params, batch, rng, train=True
                )

            (loss, (bstats, metrics)), grads = jax.value_and_grad(lf, has_aux=True)(
                state.params
            )
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
            return (
                TrainState(
                    step=state.step + 1,
                    params=params,
                    batch_stats=bstats,
                    opt_state=opt_state,
                ),
                metrics,
            )

        return train_step


def create_train_state(cfg: Options, rng, steps_per_epoch: int = 1000):
    """Build models, init params (ImageNet-pretrained encoders when
    weights_init="pretrained", reference train.py:142-190), and assemble
    optimizer + TrainState."""
    from mono_vifi_tpu.training.optim import make_optimizer
    from mono_vifi_tpu.training.pretrained import apply_pretrained

    bundle = ModelBundle(cfg)
    params, bstats = bundle.init_variables(rng)
    params, bstats = apply_pretrained(cfg, params, bstats)
    tx = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=bstats,
        opt_state=tx.init(params),
    )
    return bundle, tx, state


# -------------------------------------------------------------- eval forward
def single_frame_disp(bundle: ModelBundle, params, batch_stats, img):
    """Eval-mode disparity for one image batch (evaluate_depth.py pipeline)."""
    feats = bundle.encoder.apply(
        {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
        img,
        train=False,
    )
    return _f32(bundle.depth.apply({"params": params["depth"]}, feats)[0])


def multi_frame_disp(
    bundle: ModelBundle, params, batch_stats, vfi_small_params,
    img_n1, img_0, img_p1,
):
    """Eval-mode fused disparity (evaluate_depth_mf.py:179-188): small-VFI
    flows (onlyFlow) -> 3x encoder -> fusion -> depth_mf."""
    B = img_0.shape[0]
    embt = jnp.full((B, 1, 1, 1), 0.5, jnp.float32)
    flows = bundle.vfi_test.apply(
        {"params": vfi_small_params}, img_n1, img_p1, embt, only_flow=True
    )
    enc_role = (
        "encoder_mf"
        if (
            bundle.cfg.fuse_model_type == "separate_all" and "encoder_mf" in params
        )
        else "encoder"
    )
    enc_vars = {
        "params": params[enc_role],
        "batch_stats": batch_stats.get(enc_role, batch_stats["encoder"]),
    }
    feats = bundle.encoder.apply(
        enc_vars, jnp.concatenate([img_n1, img_0, img_p1], 0), train=False
    )
    f_n1 = [f[:B] for f in feats]
    f_0 = [f[B : 2 * B] for f in feats]
    f_p1 = [f[2 * B :] for f in feats]
    fused = bundle.fusion_module.apply(
        {"params": params["fusion_module"]},
        [f_n1, f_0, f_p1],
        (_f32(flows["flow0"]), _f32(flows["flow1"])),
        _f32(flows["mask"]),
    )
    dp = params.get("depth_mf", params["depth"])
    return _f32(bundle.depth.apply({"params": dp}, fused)[0])
