"""Linear evaluation: frozen-backbone probe (reference `main_linear.py`).

A ResNet with head_type='reduce' (single fc) is initialized, the pretrained
encoder parameters are grafted in (the reference strips `module.encoder.`
prefixes, `main_linear.py:49-75`; here the pretrain checkpoint's `encoder`
subtree maps 1:1 onto the trunk), everything except `fc` is frozen, and the
probe trains with momentum SGD + cross entropy. BatchNorm runs in training
mode over the (global) batch like the reference's never-eval'd backbone."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import make_resnet
from ..train.lars import sgd
from ..train.state import TrainState


def build_linear_state(rng, arch: str, num_classes: int, image_size: int,
                       tx, dtype=jnp.float32) -> Tuple[object, TrainState]:
    model = make_resnet(arch, head_type="reduce", low_dim=num_classes,
                        dtype=dtype)
    im = jnp.zeros((2, image_size, image_size, 3), jnp.float32)
    variables = model.init(rng, im, True)
    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))
    state = TrainState(
        step=jnp.zeros([], jnp.int32), ema_k=jnp.zeros([], jnp.int32),
        params=params, batch_stats=batch_stats, opt_state=tx.init(params))
    return model, state


def load_pretrained_encoder(state: TrainState, pretrain_params: dict,
                            pretrain_stats: Optional[dict] = None
                            ) -> TrainState:
    """Graft the pretrain checkpoint's online-encoder subtree into the
    probe's trunk (everything but the fc head)."""
    enc = pretrain_params.get("encoder", pretrain_params)
    params = dict(state.params)
    for k, v in enc.items():
        if k in params and k != "fc":
            params[k] = jax.tree.map(jnp.asarray, v)
    new_stats = dict(state.batch_stats)
    if pretrain_stats:
        enc_stats = pretrain_stats.get("encoder", pretrain_stats)
        for k, v in enc_stats.items():
            if k in new_stats:
                new_stats[k] = jax.tree.map(jnp.asarray, v)
    return state.replace(params=params, batch_stats=new_stats)


def frozen_backbone_mask(params) -> dict:
    """True (frozen) for every subtree except the fc probe."""
    return {name: jax.tree.map(lambda _: name != "fc", sub)
            for name, sub in params.items()}


def make_linear_train_step(model, tx, lr_schedule, mesh=None, donate=True):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS

    def step_fn(state, batch):
        def loss_fn(p):
            variables = {"params": p, "batch_stats": state.batch_stats}
            logits, mut = model.apply(variables, batch["image"], True,
                                      mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]).mean()
            return loss, (logits, mut["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        acc1 = jnp.mean(jnp.argmax(logits, -1) == batch["label"]) * 100.0
        metrics = {"loss": loss, "acc1": acc1, "lr": lr_schedule(state.step)}
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt), metrics

    donate_args = (0,) if donate else ()
    if mesh is not None:
        rep = NamedSharding(mesh, P())
        shd = NamedSharding(mesh, P(DATA_AXIS))
        return jax.jit(step_fn, in_shardings=(rep, shd),
                       out_shardings=(rep, rep), donate_argnums=donate_args)
    return jax.jit(step_fn, donate_argnums=donate_args)


def make_linear_eval_step(model, mesh=None):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS

    def eval_fn(state, batch):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        logits = model.apply(variables, batch["image"], False)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["label"]).mean()
        top1 = jnp.mean(jnp.argmax(logits, -1) == batch["label"]) * 100.0
        k5 = min(5, logits.shape[-1])
        top5 = jnp.mean(jnp.any(
            jax.lax.top_k(logits, k5)[1] == batch["label"][:, None],
            axis=-1)) * 100.0
        return {"loss": loss, "acc1": top1, "acc5": top5}

    if mesh is not None:
        rep = NamedSharding(mesh, P())
        shd = NamedSharding(mesh, P(DATA_AXIS))
        return jax.jit(eval_fn, in_shardings=(rep, shd), out_shardings=rep)
    return jax.jit(eval_fn)


def linear_optimizer(lr_schedule, momentum: float = 0.9,
                     weight_decay: float = 0.0, params=None):
    """SGD over the fc head only (reference `main_linear.py:32-39`)."""
    mask = frozen_backbone_mask(params) if params is not None else None
    return sgd(lr_schedule, momentum=momentum, weight_decay=weight_decay,
               frozen_mask=mask)
