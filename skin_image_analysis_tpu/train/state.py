"""Train state: params + optimizer + step + RNG root, as one pytree.

Replaces the reference's mutable ``model`` / ``optimizer`` objects
(tone_bias_train.py:373-376) with a functional state threaded through a
jitted step. The optimizer factory mirrors the reference/HPO choices
(Adam / RMSprop / SGD, tone_bias_optuna.py:239-241; AdamW from
CNNTrial.py:99).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct
from flax.core import FrozenDict

from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
from skin_image_analysis_tpu.models.cnn import build_model


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Mutable collections for BatchNorm models (ResNet); None for the
    # stateless CNN family.
    batch_stats: Any = None

    def apply_gradients(self, grads: Any) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def copy_state(state: TrainState) -> TrainState:
    """A leaf-copied TrainState for warm-compile calls: the jitted steps
    donate their state argument, so warming on the real state would
    invalidate its buffers."""
    return jax.tree.map(
        lambda x: x.copy() if hasattr(x, "copy") else x, state
    )


def make_lr(cfg: OptimConfig):
    """Learning rate — a float, or an optax schedule when configured.

    ``lr_schedule="step"`` is the TPU-native StepLR equivalent the
    reference defines but comments out (tone_bias_train.py:377,:394-395):
    lr * gamma^(step // step_size), staircased. Sizes are optimizer steps.
    """
    base = cfg.learning_rate
    sched = None
    if cfg.lr_schedule in ("step", "exponential"):
        if cfg.lr_step_size < 1:
            # silently clamping to 1 would decay by gamma EVERY step —
            # lr collapses to ~0 within a few steps with no error
            raise ValueError(
                f"lr_schedule={cfg.lr_schedule!r} needs lr_step_size >= 1 "
                f"(got {cfg.lr_step_size}); pass --lr-step-size"
            )
        sched = optax.exponential_decay(
            base, cfg.lr_step_size, cfg.lr_gamma,
            staircase=cfg.lr_schedule == "step",
        )
    elif cfg.lr_schedule == "cosine":
        if cfg.lr_decay_steps < 1:
            raise ValueError(
                "lr_schedule='cosine' needs lr_decay_steps >= 1 "
                f"(got {cfg.lr_decay_steps}); pass --lr-decay-steps"
            )
        sched = optax.cosine_decay_schedule(base, cfg.lr_decay_steps)
    elif cfg.lr_schedule:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    if cfg.lr_warmup_steps:
        ramp = optax.linear_schedule(0.0, base, cfg.lr_warmup_steps)
        tail = sched if sched is not None else optax.constant_schedule(base)
        sched = optax.join_schedules([ramp, tail], [cfg.lr_warmup_steps])
    return sched if sched is not None else base


def _scale_by_adam_lowp(
    lr=None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=None,
    nu_dtype=None,
) -> optax.GradientTransformation:
    """scale_by_adam with independently narrowed moment storage.

    ``optax.adam(mu_dtype=...)`` casts only the first moment — the HLO
    dump of the production step showed the 100352x512 Dense's nu still
    f32 (two 205 MB tensors in the adam fusion, docs/PERF.md). Moment
    math runs in the gradient dtype (f32); only storage narrows. State
    is an ``optax.ScaleByAdamState`` so checkpoints keep their shape.

    Gated behind ``OptimConfig.nu_dtype`` because bf16 nu is a
    throughput/fidelity trade: once nu grows, the (1-b2)*g^2 increments
    fall below bf16 ulp and the second moment can freeze on very long
    runs. The bench uses it (short run, +~0.7% measured); production
    defaults keep nu f32.

    ``lr`` (float or optax schedule) is folded into the same update —
    emitting the final ``-lr * adam(g)`` delta here avoids a separate
    scale_by_learning_rate pass over the 205 MB update tensor.
    """
    jnp = jax.numpy

    def init(params):
        def zeros(dt):
            return lambda p: jnp.zeros_like(p, dtype=dt or p.dtype)

        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros(mu_dtype), params),
            nu=jax.tree.map(zeros(nu_dtype), params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        if lr is None:
            step_scale = 1.0
        elif callable(lr):
            step_scale = -lr(state.count)
        else:
            step_scale = -lr

        def one(g, m, v):
            gf = g.astype(jnp.float32)
            mf = b1 * m.astype(jnp.float32) + (1.0 - b1) * gf
            vf = b2 * v.astype(jnp.float32) + (1.0 - b2) * gf * gf
            upd = step_scale * (mf / bc1) / (jnp.sqrt(vf / bc2) + eps)
            return (upd.astype(g.dtype),
                    mf.astype(mu_dtype or g.dtype),
                    vf.astype(nu_dtype or g.dtype))

        flat_g, treedef = jax.tree.flatten(updates)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        out = [one(g, m, v) for g, m, v in zip(flat_g, flat_m, flat_v)]
        upds = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return upds, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    name = cfg.optimizer.lower()

    def _dt(s):
        return None if not s else {
            "bfloat16": jax.numpy.bfloat16,
            "float32": jax.numpy.float32,
        }[s]

    mu_dtype = _dt(cfg.moment_dtype)
    nu_dtype = _dt(cfg.nu_dtype)
    lr = make_lr(cfg)
    if (
        name != "adam"
        and nu_dtype is not None
        and nu_dtype != jax.numpy.float32
    ):
        # the both-moments-narrow path is only implemented for plain adam
        # (_scale_by_adam_lowp); silently returning f32-nu adamw would let
        # the user believe they enabled the documented bench mode
        raise ValueError(
            f"nu_dtype={cfg.nu_dtype!r} is only supported with "
            f"optimizer='adam' (got {cfg.optimizer!r}); use "
            "moment_dtype to narrow adamw's first moment"
        )
    if name == "adam":
        if nu_dtype is not None and nu_dtype != jax.numpy.float32:
            # both-moments-narrow + folded lr: the bench operating point
            # (docs/PERF.md third ladder); opt-in via OptimConfig.nu_dtype
            return _scale_by_adam_lowp(
                lr=lr, mu_dtype=mu_dtype or nu_dtype, nu_dtype=nu_dtype
            )
        # moment_dtype alone narrows only mu — optax semantics (nu's
        # (1-b2)*g^2 increments stay representable), and the opt_state
        # keeps optax.adam's chain structure for checkpoint compatibility
        return optax.adam(lr, mu_dtype=mu_dtype)
    if name == "adamw":
        return optax.adamw(
            lr, weight_decay=cfg.weight_decay, mu_dtype=mu_dtype
        )
    if name == "rmsprop":
        # torch.optim.RMSprop parity (tone_bias_optuna.py:239-241):
        # alpha=0.99 (optax defaults to 0.9) and eps OUTSIDE the sqrt
        # (g / (sqrt(v) + eps)); HPO trial rankings depend on it.
        return optax.rmsprop(lr, decay=0.99, eps=1e-8, eps_in_sqrt=False)
    if name == "sgd":
        if cfg.momentum:
            return optax.sgd(lr, momentum=cfg.momentum)
        return optax.sgd(lr)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def _freeze_labels(params: Any) -> Any:
    """Per-leaf 'trainable'/'frozen' labels for frozen-backbone transfer.

    The transfer families (resnet*/xception*) all end in a single
    top-level Dense head (GAP → Dropout → Dense); everything else is the
    backbone. Combined with the model's stop_gradient (zero backbone
    grads), optax.multi_transform + set_to_zero means frozen params get
    no updates at all — no weight-decay drift under adamw — and hold no
    optimizer moments (masked leaves are MaskedNode, saving the
    backbone's worth of adam state)."""
    head = {k for k in params if k.startswith("Dense_")}
    if not head:
        raise ValueError(
            "freeze_backbone needs a model with a top-level Dense head "
            f"(resnet*/xception*); got top-level params {sorted(params)}"
        )
    return {
        k: jax.tree.map(
            lambda _: "trainable" if k in head else "frozen", v
        )
        for k, v in params.items()
    }


def create_train_state(
    model_cfg: ModelConfig,
    optim_cfg: OptimConfig,
    rng: jax.Array,
    batch_size: int = 2,
) -> tuple[TrainState, Any]:
    """Init a model + optimizer; returns (state, model)."""
    model = build_model(model_cfg)
    params_rng, state_rng = jax.random.split(rng)
    dummy = jax.numpy.zeros(
        (batch_size, model_cfg.image_size, model_cfg.image_size,
         getattr(model_cfg, "in_channels", 3)),
        jax.numpy.float32,
    )
    variables = model.init({"params": params_rng}, dummy, train=False)
    if isinstance(variables, FrozenDict):
        variables = variables.unfreeze()
    params = variables["params"]
    tx = make_optimizer(optim_cfg)
    if getattr(model_cfg, "freeze_backbone", False):
        if not getattr(model, "freeze_backbone", False):
            # the registry builder for supported families threads the
            # flag onto the module; anything else silently training the
            # full net would misreport a "frozen" run
            raise ValueError(
                f"model {model_cfg.name!r} does not support "
                "freeze_backbone (resnet*/xception* only)"
            )
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()},
            _freeze_labels(params),
        )
    state = TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        opt_state=tx.init(params),
        rng=state_rng,
        apply_fn=model.apply,
        tx=tx,
        batch_stats=variables.get("batch_stats"),
    )
    return state, model
