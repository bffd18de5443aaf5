"""Flow-guided multi-frame feature fusion (reference networks/fusion_module.py).

Warps the +/-1-frame encoder pyramids to frame 0 using the VFI flows, embeds
the per-level flows with NeRF-style sin/cos positional encoding (10 octaves,
2 -> 42 channels), mask-blends the two warped neighbors, concatenates with
the center features and fuses with a per-level 1x1 conv + ELU.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mono_vifi_tpu.models.common import ConvBlock1x1
from mono_vifi_tpu.ops.image import resize_bilinear
from mono_vifi_tpu.ops.sampling import warp
from mono_vifi_tpu.ops.pallas.splat import warp_frozen_flow, warp_frozen_flow_table


def embed_flow(x: jax.Array, num_freqs: int = 10) -> jax.Array:
    """[x, sin(2^k x), cos(2^k x) for k < num_freqs] along channels.

    Reference networks/fusion_module.py:7-37 (include_input=True,
    log_sampling). (B, H, W, 2) -> (B, H, W, 2 + 4*num_freqs).

    Computed as ONE phase-shifted sine over a channel-major (B, H, W, 4K)
    tensor (cos t = sin(t + pi/2)) instead of 2K separate (.., 2)-channel
    temps — tiny-minor-dim temps get catastrophic (8, 128) tile padding on
    TPU (68x memory blowup observed).
    """
    K = num_freqs
    n = x.shape[-1]
    # channels: per k: [sin(f_k x0), sin(f_k x1), cos(f_k x0), cos(f_k x1)]
    base = jnp.tile(x, (1,) * (x.ndim - 1) + (2 * K,))
    freqs = np.repeat(2.0 ** np.arange(K), 2 * n).astype(np.float32)
    phase = np.tile(
        np.concatenate([np.zeros(n), np.full(n, np.pi / 2)]).astype(np.float32), K
    )
    out = jnp.sin(base * jnp.asarray(freqs, x.dtype) + jnp.asarray(phase, x.dtype))
    return jnp.concatenate([x, out], axis=-1)


class FusionModule(nn.Module):
    """Fuse [feats_-1, feats_0, feats_+1] into frame-0 features.

    Reference networks/fusion_module.py:40-130. `backbone` controls the extra
    level-0 flow halving LiteMono needs (its pyramid starts at 1/4 res,
    reference :71-74).
    """

    num_ch_enc: Sequence[int]
    backbone: str = "ResNet18"
    embed_multires: int = 10
    dtype: jnp.dtype | None = None
    fast_grad_warp: bool = False  # MXU-splat image adjoint (training on TPU)

    def _embedding_pyramid(self, flow):
        """Progressively halved + value-rescaled flow embeddings per level.

        The sin phases (2^k * flow, k<10) MUST be computed in f32 — bf16
        ulp exceeds 2*pi for large flows at high octaves — but the VFI flow
        is frozen (no gradient), so the embedding OUTPUT is cast to the
        module dtype to halve its write bandwidth."""
        ed = self.dtype or flow.dtype
        oups = []
        x = flow
        for i in range(len(self.num_ch_enc)):
            h, w = x.shape[1] // 2, x.shape[2] // 2
            x = resize_bilinear(x, (h, w)) * 0.5
            if i == 0 and self.backbone == "LiteMono":
                x = resize_bilinear(x, (h // 2, w // 2)) * 0.5
            oups.append(embed_flow(x, self.embed_multires).astype(ed))
        return oups

    def _warp_pyramid(self, features, flow):
        """Warp each pyramid level by the flow resized+rescaled to its size.

        The VFI flow is frozen (reference train.py:715-718 no_grad), so with
        `fast_grad_warp` the warp goes through the custom-VJP path whose
        image adjoint is the MXU splat kernel instead of XLA's scatter-add
        (the single most expensive backward op group of the train step).
        """
        out = []
        fh, fw = flow.shape[1], flow.shape[2]
        for feat in features:
            H, W = feat.shape[1], feat.shape[2]
            scale = jnp.asarray([W / fw, H / fh], flow.dtype)
            flow_ = resize_bilinear(flow, (H, W)) * scale
            if self.fast_grad_warp:
                out.append(warp_frozen_flow(feat, flow_))
            else:
                out.append(warp(feat, flow_))
        return out

    def _warp_pyramid_table(self, unique_feats, ids, flow):
        """Indexed variant of _warp_pyramid: all warp uses draw from one
        unique-image table per level (no repeated-pyramid batch concat; its
        backward statically sums each unique's uses). Per-pixel
        packed-footprint gather, NOT patch_gather: the C>=64 feature gather
        is BYTE-bound (~44 GB/s, PERF.md round-4 microbench), the patch
        footprint saves no bytes at the span real flows need (floor-noise
        alone breaks span<=1), and its lax.cond guard costs ~ms/step in
        operand copies."""
        out = []
        fh, fw = flow.shape[1], flow.shape[2]
        for feat in unique_feats:
            H, W = feat.shape[1], feat.shape[2]
            scale = jnp.asarray([W / fw, H / fh], flow.dtype)
            flow_ = resize_bilinear(flow, (H, W)) * scale
            out.append(warp_frozen_flow_table(feat, ids, flow_))
        return out

    @nn.compact
    def __call__(self, features, flows, merge_mask, warp_table=None):
        """`features` = [feats_n1, feats_0, feats_p1] pyramids.

        `warp_table`: optional (unique_feats_pyramid, ids) — the TPU training
        path: `features[0]`/`features[2]` entries are repeats of the unique
        pyramids, and the 2B stacked warp reads `unique[ids[k]]` for use k
        (first half = prev uses, second half = next uses). Values are
        identical to the plain path.
        """
        feats_n1, feats_0, feats_p1 = features
        flow_0_n1, flow_0_p1 = flows
        levels = len(self.num_ch_enc)

        # both neighbors' pyramids warp in one batched gather per level
        B = flow_0_n1.shape[0]
        flow_both = jnp.concatenate([flow_0_n1, flow_0_p1], 0)
        if warp_table is not None and self.fast_grad_warp:
            unique_feats, ids = warp_table
            both = self._warp_pyramid_table(unique_feats, tuple(ids), flow_both)
        else:
            both = self._warp_pyramid(
                [jnp.concatenate([a, b], 0) for a, b in zip(feats_n1, feats_p1)],
                flow_both,
            )
        feats_n1_0 = [f[:B] for f in both]
        feats_p1_0 = [f[B:] for f in both]

        # zeros (not 0.0*flow): lets XLA constant-fold the whole zero-flow
        # embedding pyramid (0*x can't fold through NaN semantics)
        zero_flow = jnp.zeros_like(flow_0_n1)
        emb_0 = self._embedding_pyramid(zero_flow)
        # both neighbors' embedding pyramids in ONE batched pass (identical
        # per-sample values; halves the op count of the resize+sin chains)
        emb_np = self._embedding_pyramid(
            jnp.concatenate([flow_0_n1, flow_0_p1], 0)
        )
        emb_n1 = [e[:B] for e in emb_np]
        emb_p1 = [e[B:] for e in emb_np]

        fused = []
        for i in range(levels):
            H, W = feats_0[i].shape[1], feats_0[i].shape[2]
            mask = resize_bilinear(merge_mask, (H, W))
            fused.append(
                _SplitFuse1x1(
                    int(self.num_ch_enc[i]), self.dtype, name=f"conv1x1_{i}"
                )(
                    feats_0[i], emb_0[i],
                    feats_n1_0[i], emb_n1[i],
                    feats_p1_0[i], emb_p1[i],
                    mask,
                )
            )
        return fused


class _Conv1x1Params(nn.Module):
    """Parameter container matching nn.Conv's {kernel, bias} names/inits so
    checkpoints and converters see an ordinary 1x1 conv."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, self.cin, self.cout)
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.cout,))
        return k, b


class _SplitFuse1x1(nn.Module):
    """elu(conv1x1(concat([feat0, emb0, mask*[fn1|en1] + (1-mask)*[fp1|ep1]])))
    evaluated as a sum of sliced-kernel matmuls (reference
    networks/fusion_module.py:105-130 semantics, identical up to fp
    reassociation). Avoids materializing the two ~(C+42)-channel concat
    tensors, and the zero-flow embedding term (emb0 is a spatial constant)
    constant-folds to an effective bias."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feat0, emb0, fn1, en1, fp1, ep1, mask):
        cf = feat0.shape[-1]
        ce = emb0.shape[-1]
        k, b = _Conv1x1Params(2 * (cf + ce), self.features, name="conv")()
        cd = self.dtype or jnp.float32
        kd = k[0, 0].astype(cd)  # (2*(cf+ce), features)
        k_f0 = kd[:cf]
        k_e0 = kd[cf : cf + ce]
        k_bf = kd[cf + ce : 2 * cf + ce]
        k_be = kd[2 * cf + ce :]
        mask = mask.astype(cd)
        one = jnp.ones((), cd)
        bfeat = mask * fn1.astype(cd) + (one - mask) * fp1.astype(cd)
        bemb = mask * en1.astype(cd) + (one - mask) * ep1.astype(cd)
        y = (
            feat0.astype(cd) @ k_f0
            + emb0.astype(cd) @ k_e0
            + bfeat @ k_bf
            + bemb @ k_be
            + b.astype(cd)
        )
        return nn.elu(y)
