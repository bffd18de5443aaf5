"""IFRNet VFI pre-training step (reference train_vfi.py:176-249).

One jitted step: IFRNet forward with the middle frame as supervision
(Charbonnier L1 + ternary census + 0.01*geometry losses computed inside
models.ifrnet), grads, global-norm clip, optimizer update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
import flax.struct

from mono_vifi_tpu.models.ifrnet import IFRNet


@flax.struct.dataclass
class VFITrainState:
    step: jax.Array
    params: any
    opt_state: any


def create_vfi_state(cfg, rng, steps_per_epoch: int):
    from mono_vifi_tpu.training.optim import make_optimizer

    module = IFRNet(
        scale=cfg.vfi_scale,
        dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None,
    )
    img = jnp.zeros((1, cfg.height, cfg.width, 3), jnp.float32)
    embt = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    params = module.init(rng, img, img, embt, only_flow=True)["params"]
    tx = make_optimizer(cfg, steps_per_epoch)
    state = VFITrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )
    return module, tx, state


def make_vfi_train_step(module: IFRNet, tx: optax.GradientTransformation):
    def train_step(state: VFITrainState, batch):
        img0, img1, img2 = batch["img0"], batch["img1"], batch["img2"]
        embt = batch["embt"].reshape(-1, 1, 1, 1)

        def lf(params):
            out = module.apply({"params": params}, img0, img2, embt, imgt=img1)
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "psnr": -10.0
            * jnp.log10(jnp.mean((out["imgt_pred"] - img1) ** 2) + 1e-12),
            "grad_norm": optax.global_norm(grads),
        }
        aux = {
            "imgt_pred": out["imgt_pred"],
            "flow0": out["flow0"],
            "flow1": out["flow1"],
        }
        return (
            VFITrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
            aux,
        )

    return train_step
