"""Full-search-space parallel HPO: padded super-network populations.

The reference parallelizes its Optuna sweep as independent MPI ranks on a
supercomputer (README.md:54); its search space varies architecture widths,
depths, dropout, optimizer kind and lr (tone_bias_optuna.py:123-173,
:239-241). Trials with different tensor shapes cannot stack under ``vmap``
— the round-1 populations therefore only varied lr. This module removes
that restriction with **padded super-networks**:

- A *wave* fixes the architecture skeleton — (n_conv, n_linear,
  optimizer kind) — and runs K trials that vary every remaining
  dimension: per-layer widths, per-layer dropout rates, and lr.
- Every layer is padded to the search-space max width (256). A trial
  with width w occupies the first w channels; padded channels are
  initialized to zero and their gradients masked every step, which keeps
  the padded network *exactly* equivalent to the unpadded one
  (zero weights in → zero activations through ReLU/pool/dropout →
  zero gradient contributions out; masked updates keep them zero).
- Init matches the unpadded model: Xavier-normal with the *active* fan
  sizes (torch ``xavier_normal_`` semantics, tone_bias_model.py:136-137),
  not the padded fans.
- lr and dropout rates are traced per-trial scalars; the optimizer kind
  is static per wave (adam/rmsprop/sgd via lr-free optax transforms, the
  traced lr applied outside).

One wave = ONE XLA program (vmap over K, lax.scan over batches), and all
waves sharing a skeleton share the compiled program. K is capped by the
padded parameter footprint so the deepest/widest skeletons degrade
gracefully to smaller populations.
"""

from __future__ import annotations

import functools as _functools
import math
from dataclasses import dataclass
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.models.cnn import build_model

PAD_WIDTH = 256  # the search-space max width (tone_bias_optuna.py:133-169)


@dataclass(frozen=True)
class WaveSkeleton:
    """The static shape of one wave: everything that changes tensor
    shapes or control flow. ``pad_width`` is the width every layer pads
    to (the search-space max; 256 for the reference protocol — smaller
    values exist for budget sweeps/dry runs over narrowed spaces)."""

    n_conv: int          # extra k=3 conv blocks (reference n_conv_layers)
    n_linear: int        # linear blocks
    optimizer: str       # adam | rmsprop | sgd (static per wave)
    image_size: int = 224
    compute_dtype: str = "bfloat16"
    pad_width: int = PAD_WIDTH

    @property
    def conv_count(self) -> int:
        return 1 + self.n_conv

    def padded_model_config(self) -> ModelConfig:
        return ModelConfig(
            conv_features=(self.pad_width,) * self.conv_count,
            first_kernel=7,
            kernel=3,
            linear_features=(self.pad_width,) * self.n_linear,
            dropout=(0.5,) * self.n_linear,
            image_size=self.image_size,
            compute_dtype=self.compute_dtype,
        )

    def flatten_spatial(self) -> int:
        side = self.image_size
        for _ in range(self.conv_count):
            side //= 2
        return side * side

    def padded_param_bytes(self) -> int:
        """f32 parameter footprint of the padded network (for K capping)."""
        pad = self.pad_width
        total = 7 * 7 * 3 * pad + pad
        for _ in range(self.n_conv):
            total += 3 * 3 * pad * pad + pad
        fan_in = self.flatten_spatial() * pad
        for _ in range(self.n_linear):
            total += fan_in * pad + pad
            fan_in = pad
        total += fan_in * 2 + 2
        return total * 4


def activation_bytes(skel: WaveSkeleton, microbatch: int) -> int:
    """Peak transient activation footprint of ONE trial's forward+backward
    at the padded width, for a microbatch: the first conv's full-res
    output dominates (microbatch x image^2 x PAD x bf16), with ~3x
    headroom for the cotangent + fusion workspace."""
    first_conv = microbatch * skel.image_size ** 2 * skel.pad_width * 2
    return 3 * first_conv


def default_microbatch(skel: WaveSkeleton, batch_size: int) -> int:
    """Split each batch into exact-gradient microbatches when the padded
    activations at full batch would dwarf HBM (224^2 x 256-wide supernet
    is ~0.8 GB of conv0 output per 32-batch trial)."""
    if skel.image_size >= 128:
        return max(4, batch_size // 8)
    return batch_size


def max_population(
    skel: WaveSkeleton,
    batch_size: int = 32,
    microbatch: int | None = None,
    budget_bytes: int = 8 << 30,
) -> int:
    """Largest power-of-two K fitting the budget: params+grads+adam
    moments (~4x param bytes) plus the microbatch activation transient."""
    if microbatch is None:
        microbatch = default_microbatch(skel, batch_size)
    per_trial = 4 * skel.padded_param_bytes() + activation_bytes(
        skel, microbatch
    )
    k = max(1, budget_bytes // max(per_trial, 1))
    return 1 << min(int(math.log2(k)), 5)  # cap at 32 per wave


def _layer_specs(skel: WaveSkeleton):
    """Yields (path, kind) for every parameter-owning layer in call order:
    kind ∈ {conv, dense, head}."""
    for i in range(skel.conv_count):
        yield (f"ConvBlock_{i}", "Conv_0"), "conv", i
    for j in range(skel.n_linear):
        yield (f"MlpBlock_{j}", "Dense_0"), "dense", j
    yield ("Dense_0",), "head", 0


def _active_fans(skel: WaveSkeleton, kind: str, idx: int,
                 conv_w: jnp.ndarray, lin_w: jnp.ndarray):
    """(in_active, out_active) channel counts for one layer (traced)."""
    if kind == "conv":
        cin = jnp.int32(3) if idx == 0 else conv_w[idx - 1]
        return cin, conv_w[idx]
    if kind == "dense":
        if idx == 0:
            return skel.flatten_spatial() * conv_w[skel.conv_count - 1], lin_w[0]
        return lin_w[idx - 1], lin_w[idx]
    return lin_w[skel.n_linear - 1], jnp.int32(2)


def _feature_mask(width, pad: int) -> jnp.ndarray:
    """[pad] 0/1 mask of the first ``width`` channels (traced width)."""
    return (jnp.arange(pad) < width).astype(jnp.float32)


def _input_mask_dense0(skel: WaveSkeleton, conv_last_w) -> jnp.ndarray:
    """Flatten-layout input mask for MlpBlock_0: NHWC flatten orders
    features (h, w, c), so the channel mask tiles over spatial."""
    ch = _feature_mask(conv_last_w, skel.pad_width)
    return jnp.tile(ch, skel.flatten_spatial())


def trial_param_masks(skel: WaveSkeleton, conv_w: jnp.ndarray,
                      lin_w: jnp.ndarray) -> Any:
    """Multiplicative 0/1 masks shaped like the padded param tree for ONE
    trial's active widths (all traced — build inside jit/vmap)."""
    out: dict = {}
    for path, kind, idx in _layer_specs(skel):
        if kind == "conv":
            cin_active, cout_active = _active_fans(skel, kind, idx, conv_w, lin_w)
            cin_pad = 3 if idx == 0 else skel.pad_width
            in_m = _feature_mask(cin_active, cin_pad)
            out_m = _feature_mask(cout_active, skel.pad_width)
            kmask = in_m[None, None, :, None] * out_m[None, None, None, :]
            bmask = out_m
        elif kind == "dense":
            if idx == 0:
                in_m = _input_mask_dense0(skel, conv_w[skel.conv_count - 1])
            else:
                in_m = _feature_mask(lin_w[idx - 1], skel.pad_width)
            out_m = _feature_mask(lin_w[idx], skel.pad_width)
            kmask = in_m[:, None] * out_m[None, :]
            bmask = out_m
        else:  # head
            in_m = _feature_mask(lin_w[skel.n_linear - 1], skel.pad_width)
            kmask = in_m[:, None] * jnp.ones((1, 2), jnp.float32)
            bmask = jnp.ones((2,), jnp.float32)
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {"kernel": kmask, "bias": bmask}
    return out


def init_trial_params(skel: WaveSkeleton, key: jax.Array,
                      conv_w: jnp.ndarray, lin_w: jnp.ndarray) -> Any:
    """Padded params for one trial: Xavier-normal at the ACTIVE fans
    (reference init semantics) times the activity mask; biases zero."""
    out: dict = {}
    keys = jax.random.split(key, skel.conv_count + skel.n_linear + 1)
    for n, (path, kind, idx) in enumerate(_layer_specs(skel)):
        fin, fout = _active_fans(skel, kind, idx, conv_w, lin_w)
        if kind == "conv":
            cin_pad = 3 if idx == 0 else skel.pad_width
            shape = (7 if idx == 0 else 3,) * 2 + (cin_pad, skel.pad_width)
            receptive = shape[0] * shape[1]
            fan_in, fan_out = receptive * fin, receptive * fout
        elif kind == "dense":
            shape = (skel.flatten_spatial() * skel.pad_width if idx == 0
                     else skel.pad_width, skel.pad_width)
            fan_in, fan_out = fin, fout
        else:
            shape = (skel.pad_width, 2)
            fan_in, fan_out = fin, fout
        std = jnp.sqrt(2.0 / (fan_in + fan_out).astype(jnp.float32))
        kernel = jax.random.normal(keys[n], shape, jnp.float32) * std
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {
            "kernel": kernel,
            "bias": jnp.zeros((shape[-1],), jnp.float32),
        }
    masks = trial_param_masks(skel, conv_w, lin_w)
    return jax.tree.map(lambda p, m: p * m, out, masks)


def _scale_tx(optimizer: str) -> optax.GradientTransformation:
    """lr-free optimizer core; the traced per-trial lr is applied outside
    (reference optimizer choices, tone_bias_optuna.py:239-241)."""
    if optimizer == "adam":
        return optax.scale_by_adam()
    if optimizer == "rmsprop":
        # torch RMSprop defaults (alpha=0.99, eps outside the sqrt) —
        # same semantics as train.state.make_optimizer's rmsprop
        return optax.scale_by_rms(decay=0.99, eps=1e-8, eps_in_sqrt=False)
    if optimizer == "sgd":
        return optax.identity()
    raise ValueError(f"unknown optimizer {optimizer!r}")


@_functools.lru_cache(maxsize=None)
def _trial_kernels(skel: WaveSkeleton, k: int, microbatch: int,
                   n_micro: int):
    """Per-trial math shared by BOTH wave drivers (lockstep
    `_wave_programs` and rolling `_rolling_programs`): the padded model,
    the masked microbatched gradient step vmapped over K lanes, the
    vmapped init, and the single-trial eval. One definition means an
    optimizer-semantics fix (like the round-3 rmsprop parity change)
    cannot land in one driver and silently miss the other."""
    model = build_model(skel.padded_model_config())
    tx = _scale_tx(skel.optimizer)

    def to_f32(px):
        x = px.astype(jnp.float32)
        return x / 255.0 if px.dtype == jnp.uint8 else x

    def loss_fn(p, cw, lw, dr, pixels, labels, dkey):
        log_probs = model.apply(
            {"params": p}, to_f32(pixels), train=True,
            rngs={"dropout": dkey}, dropout_rates=dr,
        )
        picked = jnp.take_along_axis(log_probs, labels[:, None], -1)[:, 0]
        return -jnp.mean(picked)

    def one_trial_step(p, opt, cw, lw, dr, lr, pixels, labels, dkey):
        # exact-gradient microbatching: mean of per-microbatch mean-NLL
        # grads == full-batch grad; scan keeps one microbatch's padded
        # activations live at a time
        mpx = pixels.reshape(n_micro, microbatch, *pixels.shape[1:])
        mlb = labels.reshape(n_micro, microbatch)
        mkeys = jax.random.split(dkey, n_micro)

        def micro(acc, mb):
            px, lb, key = mb
            g = jax.grad(loss_fn)(p, cw, lw, dr, px, lb, key)
            return jax.tree.map(jnp.add, acc, g), None

        zero = jax.tree.map(jnp.zeros_like, p)
        grads, _ = jax.lax.scan(micro, zero, (mpx, mlb, mkeys))
        grads = jax.tree.map(lambda g: g / n_micro, grads)
        masks = trial_param_masks(skel, cw, lw)
        grads = jax.tree.map(lambda g, m: g * m, grads, masks)
        updates, opt = tx.update(grads, opt)
        p = jax.tree.map(
            lambda w, u, m: w - lr * u * m, p, updates, masks
        )
        return p, opt

    vstep = jax.vmap(
        one_trial_step, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0)
    )

    def init_one(key, cw, lw):
        params = init_trial_params(skel, key, cw, lw)
        return params, tx.init(params)

    init_wave = jax.jit(jax.vmap(init_one))

    def eval_one(p, pixels, labels):
        log_probs = model.apply({"params": p}, to_f32(pixels), train=False)
        return jnp.sum(jnp.argmax(log_probs, -1) == labels)

    return vstep, init_wave, eval_one


@_functools.lru_cache(maxsize=None)
def _wave_programs(skel: WaveSkeleton, k: int, microbatch: int,
                   n_micro: int):
    """The wave's compiled programs, cached per skeleton.

    Everything that varies between waves — pixel stacks, widths,
    dropouts, lrs, batch permutations — is an ARGUMENT, so waves sharing
    a skeleton reuse ONE jitted callable (jax.jit then re-specializes
    only when array shapes actually differ). Building fresh @jax.jit
    closures per wave (the round-2 first cut) recompiled every wave
    through the ~30-90 s remote-compile relay and baked the wave's
    sample into the program as constants."""
    vstep, init_wave, eval_one = _trial_kernels(skel, k, microbatch, n_micro)

    @_functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_epoch(params, opt_state, epoch_key, perms,
                    tb_px, tb_lb, cw, lw, dr, lr):
        n_batches = tb_px.shape[0]

        def body(carry, i):
            p, opt, key = carry
            key, sub = jax.random.split(key)
            dkeys = jax.random.split(sub, k)
            bidx = perms[:, i]
            pixels = tb_px[bidx]   # [K, B, ...]
            labels = tb_lb[bidx]
            p, opt = vstep(p, opt, cw, lw, dr, lr, pixels, labels, dkeys)
            return (p, opt, key), None

        (params, opt_state, _), _ = jax.lax.scan(
            body, (params, opt_state, epoch_key),
            jnp.arange(n_batches),
        )
        return params, opt_state

    veval = jax.vmap(eval_one, in_axes=(0, None, None))

    @jax.jit
    def valid_accuracy(params, vb_px, vb_lb):
        def body(total, batch):
            pixels, labels = batch
            return total + veval(params, pixels, labels), None

        total, _ = jax.lax.scan(
            body, jnp.zeros((k,), jnp.int32), (vb_px, vb_lb)
        )
        return total / (vb_lb.shape[0] * vb_lb.shape[1])

    return init_wave, train_epoch, valid_accuracy


@_functools.lru_cache(maxsize=None)
def _rolling_programs(skel: WaveSkeleton, k: int, microbatch: int,
                      n_micro: int):
    """Programs for the rolling-lane wave driver: like _wave_programs but
    batches GATHER from a whole-cohort device pool by per-trial index
    ([K, n_batches, B] int32) — each lane trains on its OWN sample (the
    reference's independent per-trial get_isic() resample,
    tone_bias_optuna.py:175-231) — plus a masked lane-merge program so a
    pruned/finished lane can be re-initialized with a freshly sampled
    trial WITHOUT recompiling (slot refill: pruning frees real compute,
    tone_bias_optuna.py:282-299)."""
    vstep, init_wave, eval_one = _trial_kernels(skel, k, microbatch, n_micro)

    @_functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_epoch(params, opt_state, epoch_key, tb_idx,
                    pool_px, pool_lb, cw, lw, dr, lr):
        n_batches = tb_idx.shape[1]

        def body(carry, i):
            p, opt, key = carry
            key, sub = jax.random.split(key)
            dkeys = jax.random.split(sub, k)
            bidx = tb_idx[:, i]              # [K, B] pool rows
            pixels = pool_px[bidx]           # [K, B, ...]
            labels = pool_lb[bidx]
            p, opt = vstep(p, opt, cw, lw, dr, lr, pixels, labels, dkeys)
            return (p, opt, key), None

        (params, opt_state, _), _ = jax.lax.scan(
            body, (params, opt_state, epoch_key),
            jnp.arange(n_batches),
        )
        return params, opt_state

    veval = jax.vmap(eval_one, in_axes=(0, 0, 0))

    @jax.jit
    def valid_accuracy(params, vb_idx, pool_px, pool_lb):
        n_vb = vb_idx.shape[1]

        def body(total, i):
            bidx = vb_idx[:, i]             # [K, mb]
            return total + veval(params, pool_px[bidx], pool_lb[bidx]), None

        total, _ = jax.lax.scan(
            body, jnp.zeros((k,), jnp.int32), jnp.arange(n_vb)
        )
        return total / (n_vb * vb_idx.shape[2])

    @_functools.partial(jax.jit, donate_argnums=(0, 1))
    def merge_lanes(params, opt_state, fresh_params, fresh_opt, mask):
        """Replace lanes where mask[k] with the fresh trial's state —
        the slot refill. All wave state has a leading K axis."""

        def pick(old, new):
            m = mask.reshape((k,) + (1,) * (old.ndim - 1))
            return jnp.where(m, new, old)

        return (
            jax.tree.map(pick, params, fresh_params),
            jax.tree.map(pick, opt_state, fresh_opt),
        )

    return init_wave, train_epoch, valid_accuracy, merge_lanes


def train_wave(
    skel: WaveSkeleton,
    conv_widths: np.ndarray,    # [K, conv_count] int
    linear_widths: np.ndarray,  # [K, n_linear] int
    dropouts: np.ndarray,       # [K, n_linear] float
    lrs: np.ndarray,            # [K] float
    train_pixels: np.ndarray,
    train_labels: np.ndarray,
    valid_pixels: np.ndarray,
    valid_labels: np.ndarray,
    epochs: int = 10,
    batch_size: int = 32,
    train_limit: int | None = None,
    valid_limit: int | None = None,
    seed: int = 0,
    microbatch: int | None = None,
    epoch_callback=None,
) -> dict[str, Any]:
    """Train one wave of K padded trials in lockstep; returns per-epoch
    validation accuracy [epochs, K].

    ``microbatch``: gradients are accumulated over exact microbatches of
    this size (scan) so the padded supernet's full-resolution conv
    activations never exist for the whole batch at once — identical
    gradients (the mean-NLL decomposes linearly), per-microbatch dropout
    masks."""
    k = len(lrs)
    conv_w = jnp.asarray(conv_widths, jnp.int32)
    lin_w = jnp.asarray(linear_widths, jnp.int32)
    drops = jnp.asarray(dropouts, jnp.float32)
    lr_arr = jnp.asarray(lrs, jnp.float32)

    rng = np.random.default_rng(seed)

    def stack(pixels, labels, limit, bsz):
        order = rng.permutation(len(labels))
        n_batches = len(labels) // bsz
        if limit is not None:
            n_batches = min(n_batches, max(limit // bsz, 1))
        idx = order[: n_batches * bsz].reshape(n_batches, bsz)
        return jnp.asarray(pixels[idx]), jnp.asarray(
            labels[idx].astype(np.int32))

    if microbatch is None:
        microbatch = default_microbatch(skel, batch_size)
    microbatch = min(microbatch, batch_size)
    while batch_size % microbatch:
        microbatch -= 1
    n_micro = batch_size // microbatch

    tb_px, tb_lb = stack(train_pixels, train_labels, train_limit, batch_size)
    # eval in microbatch-sized slices too: the padded supernet's forward
    # at full batch x K trials is the same OOM risk as training
    vb_px, vb_lb = stack(valid_pixels, valid_labels, valid_limit, microbatch)

    init_wave, train_epoch, valid_accuracy = _wave_programs(
        skel, k, microbatch, n_micro
    )
    keys = jax.random.split(jax.random.key(seed), k)
    params, opt_state = init_wave(keys, conv_w, lin_w)

    n_batches = tb_px.shape[0]
    root = jax.random.key(seed + 17)
    history = []
    for epoch in range(epochs):
        # per-trial batch ORDER: each trial walks the wave's batches in
        # its own permutation (a [K]-gather per step), restoring the
        # batch-order independence the reference's fully independent
        # trials had — the 300-row sample itself is wave-shared
        # (documented).
        perms = jnp.asarray(
            np.stack([rng.permutation(n_batches) for _ in range(k)]),
            jnp.int32,
        )
        params, opt_state = train_epoch(
            params, opt_state, jax.random.fold_in(root, epoch), perms,
            tb_px, tb_lb, conv_w, lin_w, drops, lr_arr,
        )
        history.append(np.asarray(valid_accuracy(params, vb_px, vb_lb)))
        if epoch_callback is not None and not epoch_callback(
            epoch, history[-1]
        ):
            # every trial in the wave pruned: stop the wave early (the
            # lockstep analogue of optuna's per-trial TrialPruned)
            break

    return {
        "accuracy_history": np.stack(history),  # [<=epochs, K]
        "final_accuracy": history[-1],
    }
