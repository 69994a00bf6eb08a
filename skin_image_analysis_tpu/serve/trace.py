"""Automatic quantization-graph capture: trace ANY registered model's
eval forward into the int8 graph IR.

Round-3 shipped int8 PTQ through hand-built per-family graph builders
(~100 LoC + a parity test per family), which meant every new model
family was a day of shadow-model work and the SE/swish families
(EfficientNet) were simply refused. This module replaces the builders
with a jaxpr walk: ``jax.make_jaxpr`` over the model's eval ``apply``
(forced to float32 compute and the stock conv+relu+pool lowering, so the
trace is the canonical math, not the TPU-tuned phase-packed form),
partially evaluated against the checkpoint weights.

Design decisions that keep the capture small and exact:

- **No BatchNorm folding.** Per-output-channel symmetric quantization is
  scale-invariant per channel: quantizing ``W`` and applying ``γ/σ`` in
  the f32 epilogue is bit-identical to quantizing ``W·γ/σ`` (the
  per-channel weight scale absorbs the factor). BN therefore rides as
  captured elementwise ops that XLA fuses into the conv epilogue —
  fidelity and performance match the folded form with none of the
  fold bookkeeping.
- **Batch-generic replay.** The jaxpr is traced at batch 1; every
  captured op is stored in a batch-agnostic form (shapes recorded as
  their post-batch tail; reductions/broadcasts assert they never touch
  dim 0), so one capture serves any batch size — the executors stay
  jit/vmap/export-compatible exactly like the hand-built IR was.
- **Quantization points are structural.** Contractions (conv/dense)
  quantize unless their input is spatially 1x1 (squeeze-excite internals
  — negligible FLOPs, and the sigmoid gate is the scheme's most
  outlier-sensitive consumer, so they ride f32 as TFLite does);
  activations (relu/relu6/swish — recognized from their jaxpr idioms)
  emit int8 at their own calibrated scale when they feed a quantized
  contraction through value-preserving ops (max-pool, reshape). This
  reproduces the hand-built builders' int8 tensor placement on every
  previously supported family and extends it to MBConv+SE.

The float executor (:func:`graph_forward`) replays the captured ops in
f32 — it is the calibration pass and the fidelity oracle, pinned equal
to the live model forward per family in tests/test_quantize.py. The
reference has no counterpart (its deployment story is unpickling the
torch module, tone_bias_model.py:305-338).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

# conv dimension numbers the capture accepts (flax NHWC / HWIO)
_NHWC_LHS = (0, 3, 1, 2)
_HWIO_RHS = (3, 2, 0, 1)
_NHWC_OUT = (0, 3, 1, 2)

#: primitives inlined by descending into their inner jaxpr
_INLINE_PRIMS = {
    "pjit", "jit", "custom_jvp_call", "custom_vjp_call",
    "custom_jvp_call_jaxpr", "custom_vjp_call_jaxpr", "closed_call",
    "remat", "checkpoint", "core_call", "xla_call",
}

#: elementwise primitive -> jnp replay (binary ops broadcast, so the
#: batch-1 trace generalizes to any batch)
_EW_BINARY = {
    "add": jnp.add, "sub": jnp.subtract, "mul": jnp.multiply,
    "div": jnp.divide, "max": jnp.maximum, "min": jnp.minimum,
    "pow": jnp.power, "atan2": jnp.arctan2,
}
_EW_UNARY = {
    "exp": jnp.exp, "log": jnp.log, "rsqrt": jax.lax.rsqrt,
    "sqrt": jnp.sqrt, "neg": jnp.negative, "abs": jnp.abs,
    "logistic": jax.nn.sigmoid, "tanh": jnp.tanh, "sign": jnp.sign,
    "floor": jnp.floor, "ceil": jnp.ceil, "round": jnp.round,
    "is_finite": jnp.isfinite, "erf": jax.lax.erf,
    "cbrt": jax.lax.cbrt, "log1p": jnp.log1p, "expm1": jnp.expm1,
}

# ---------------------------------------------------------------------------
# capture-time value model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _Sym:
    """A symbolic (input-dependent) tensor: index into the IR tensor
    list. ``shape`` is the trace-time shape (batch dim = 1)."""

    idx: int
    shape: tuple
    dtype: Any


@dataclass(frozen=True)
class _BCast:
    """Lazy broadcast_in_dim of a host constant — materializing BN
    vectors to full [1, H, W, C] arrays at capture would embed huge
    constants; the small base + mapping is kept instead."""

    base: np.ndarray
    shape: tuple
    dims: tuple

    def materialize(self) -> np.ndarray:
        out = self.base.reshape(
            [self.base.shape[self.dims.index(d)] if d in self.dims else 1
             for d in range(len(self.shape))]
        )
        return np.broadcast_to(out, self.shape)

    def broadcastable(self) -> np.ndarray:
        """The base reshaped with 1s at non-mapped dims — numpy/jnp
        broadcasting then generalizes over the batch dimension."""
        return self.base.reshape(
            [self.base.shape[self.dims.index(d)] if d in self.dims else 1
             for d in range(len(self.shape))]
        )


def _is_const(v) -> bool:
    return not isinstance(v, _Sym)


def _const_np(v) -> np.ndarray:
    if isinstance(v, _BCast):
        return v.materialize()
    return np.asarray(v)


def _scalar_const(v, value: float) -> bool:
    """True when ``v`` is a constant that is exactly the scalar
    ``value`` everywhere (relu/relu6 idiom detection)."""
    if isinstance(v, _Sym):
        return False
    if isinstance(v, _BCast):
        arr = v.base
    else:
        arr = np.asarray(v)
    return arr.size == 1 and float(arr.reshape(-1)[0]) == value


# ---------------------------------------------------------------------------
# constant-subgraph evaluation (numpy — never dispatches to a device)
# ---------------------------------------------------------------------------


def _np_eval(name: str, params: dict, args: list):
    a = [(_const_np(x)) for x in args]
    if name in _EW_BINARY:
        return np.asarray(getattr(np, {
            "add": "add", "sub": "subtract", "mul": "multiply",
            "div": "divide", "max": "maximum", "min": "minimum",
            "pow": "power", "atan2": "arctan2"}[name])(a[0], a[1]))
    table = {
        "exp": np.exp, "log": np.log, "sqrt": np.sqrt,
        "rsqrt": lambda x: 1.0 / np.sqrt(x), "neg": np.negative,
        "abs": np.abs, "logistic": lambda x: 1.0 / (1.0 + np.exp(-x)),
        "tanh": np.tanh, "floor": np.floor, "ceil": np.ceil,
        "sign": np.sign, "log1p": np.log1p, "expm1": np.expm1,
        "stop_gradient": lambda x: x, "copy": lambda x: x,
    }
    if name in table:
        return np.asarray(table[name](a[0]))
    if name == "convert_element_type":
        return a[0].astype(params["new_dtype"])
    if name == "reshape":
        return np.reshape(a[0], params["new_sizes"])
    if name == "transpose":
        return np.transpose(a[0], params["permutation"])
    if name == "squeeze":
        return np.squeeze(a[0], axis=tuple(params["dimensions"]))
    if name == "reduce_sum":
        return np.sum(a[0], axis=tuple(params["axes"]))
    if name == "reduce_max":
        return np.max(a[0], axis=tuple(params["axes"]))
    if name == "reduce_min":
        return np.min(a[0], axis=tuple(params["axes"]))
    if name == "integer_pow":
        return np.asarray(a[0] ** params["y"])
    if name == "concatenate":
        return np.concatenate(a, axis=params["dimension"])
    if name == "slice":
        idx = tuple(
            slice(s, l, st) for s, l, st in zip(
                params["start_indices"], params["limit_indices"],
                params["strides"] or (1,) * len(params["start_indices"]))
        )
        return a[0][idx]
    if name == "iota":
        return np.arange(params["shape"][params["dimension"]],
                         dtype=params["dtype"])
    raise NotImplementedError(
        f"quantization capture: constant subgraph uses primitive "
        f"{name!r} — add it to serve/trace._np_eval"
    )


# ---------------------------------------------------------------------------
# the IR
# ---------------------------------------------------------------------------


@dataclass
class Graph:
    """Captured eval-forward graph. ``ops[i]`` produces tensor ``i+1``
    (tensor 0 is the preprocessed model input); ``out`` is the tensor
    index of the model output (log-probs)."""

    ops: list = field(default_factory=list)
    out: int = 0


class _GraphBuilder:
    def __init__(self, in_shape, in_dtype):
        self.ops: list[dict] = []
        self.shapes: list[tuple] = [tuple(in_shape)]
        self.dtypes = [in_dtype]

    def emit(self, op: dict, shape, dtype) -> _Sym:
        self.ops.append(op)
        self.shapes.append(tuple(shape))
        self.dtypes.append(dtype)
        return _Sym(len(self.ops), tuple(shape), dtype)

    def producer(self, t: int) -> dict | None:
        return self.ops[t - 1] if t >= 1 else None


def _arg_ref(v):
    """Capture an op operand: symbolic tensors by index, constants in a
    batch-broadcastable host form."""
    if isinstance(v, _Sym):
        return ("t", v.idx)
    if isinstance(v, _BCast):
        return ("c", v.broadcastable())
    return ("c", np.asarray(v))


# ---------------------------------------------------------------------------
# the jaxpr walk
# ---------------------------------------------------------------------------


def _subjaxpr(eqn):
    for key in ("jaxpr", "call_jaxpr"):
        v = eqn.params.get(key)
        if v is not None:
            return v
    for v in eqn.params.values():  # pragma: no cover - future-proofing
        if hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
            return v
    raise NotImplementedError(
        f"cannot find inner jaxpr of {eqn.primitive.name}")


def _check_batch_free(name: str, dims, what: str):
    if 0 in tuple(dims):
        raise NotImplementedError(
            f"quantization capture: {name} touches the batch dimension "
            f"({what}={tuple(dims)}) — the batch-generic replay cannot "
            "represent it"
        )


class _Walker:
    def __init__(self, g: _GraphBuilder):
        self.g = g
        self.env: dict[Any, Any] = {}

    def read(self, v):
        if hasattr(v, "val"):  # Literal
            return np.asarray(v.val)
        return self.env[v]

    def run(self, jaxpr, invals, consts):
        for var, val in zip(jaxpr.constvars, consts):
            self.env[var] = np.asarray(val)
        for var, val in zip(jaxpr.invars, invals):
            self.env[var] = val
        for eqn in jaxpr.eqns:
            self.eqn(eqn)
        return [self.read(v) for v in jaxpr.outvars]

    def eqn(self, eqn):
        name = eqn.primitive.name
        if name in _INLINE_PRIMS:
            closed = _subjaxpr(eqn)
            invals = [self.read(v) for v in eqn.invars]
            inner = closed.jaxpr
            if len(inner.invars) != len(invals):
                # custom_jvp_call passes num_consts leading const args
                n = eqn.params.get("num_consts", 0)
                invals = invals[n:]
            outs = _Walker.run_inner(self, inner, invals, closed.consts)
            for var, val in zip(eqn.outvars, outs):
                self.env[var] = val
            return
        invals = [self.read(v) for v in eqn.invars]
        if all(_is_const(v) for v in invals):
            out = self.const_eqn(name, eqn.params, invals)
        else:
            out = self.sym_eqn(name, eqn, invals)
        if eqn.primitive.multiple_results:  # pragma: no cover
            raise NotImplementedError(
                f"multi-output primitive {name} on symbolic input")
        self.env[eqn.outvars[0]] = out

    def run_inner(self, jaxpr, invals, consts):
        saved = {}
        for var, val in zip(jaxpr.constvars, consts):
            saved[var] = self.env.get(var)
            self.env[var] = np.asarray(val)
        for var, val in zip(jaxpr.invars, invals):
            self.env[var] = val
        for eqn in jaxpr.eqns:
            self.eqn(eqn)
        return [self.read(v) for v in jaxpr.outvars]

    # -- constant-only equations -------------------------------------

    def const_eqn(self, name, params, invals):
        if name == "broadcast_in_dim":
            base = invals[0]
            if isinstance(base, _BCast):
                base = base.materialize()
            return _BCast(np.asarray(base), tuple(params["shape"]),
                          tuple(params["broadcast_dimensions"]))
        return _np_eval(name, params, invals)

    # -- symbolic equations ------------------------------------------

    def sym_eqn(self, name, eqn, invals):
        g = self.g
        out_aval = eqn.outvars[0].aval
        shape, dtype = tuple(out_aval.shape), out_aval.dtype
        params = eqn.params

        if name == "conv_general_dilated":
            lhs, rhs = invals
            if not isinstance(lhs, _Sym) or isinstance(rhs, _Sym):
                raise NotImplementedError(
                    "conv with symbolic kernel / constant input")
            dn = params["dimension_numbers"]
            if (tuple(dn.lhs_spec), tuple(dn.rhs_spec),
                    tuple(dn.out_spec)) != (_NHWC_LHS, _HWIO_RHS,
                                            _NHWC_OUT):
                raise NotImplementedError(
                    f"conv layout {dn} (expected NHWC/HWIO/NHWC)")
            if tuple(params["lhs_dilation"]) != (1, 1) or \
                    tuple(params["rhs_dilation"]) != (1, 1):
                raise NotImplementedError("dilated conv")
            if params.get("batch_group_count", 1) != 1:
                raise NotImplementedError("batch-grouped conv")
            kernel = _const_np(rhs).astype(np.float32)
            spatial = int(np.prod([lhs.shape[1], lhs.shape[2]]))
            return g.emit({
                "op": "conv", "in": lhs.idx, "kernel": kernel,
                "strides": tuple(params["window_strides"]),
                "padding": tuple(tuple(p) for p in params["padding"]),
                "groups": int(params["feature_group_count"]),
                # spatially-1x1 inputs are squeeze-excite internals:
                # negligible FLOPs feeding a sigmoid gate — ride f32
                "quantize": spatial > 1,
            }, shape, dtype)

        if name == "dot_general":
            lhs, rhs = invals
            if not isinstance(lhs, _Sym) or isinstance(rhs, _Sym):
                raise NotImplementedError(
                    "dot with symbolic rhs / constant lhs")
            (lc, rc), (lb, rb) = params["dimension_numbers"]
            if (tuple(lc), tuple(rc), tuple(lb), tuple(rb)) != (
                    (1,), (0,), (), ()) or len(lhs.shape) != 2:
                raise NotImplementedError(
                    f"dot_general dims {params['dimension_numbers']}")
            return g.emit({
                "op": "dense", "in": lhs.idx,
                "kernel": _const_np(rhs).astype(np.float32),
                "quantize": True,
            }, shape, dtype)

        if name == "reduce_window_max":
            (a,) = invals
            wd = tuple(params["window_dimensions"])
            ws = tuple(params["window_strides"])
            pad = tuple(tuple(p) for p in params["padding"])
            if wd[0] != 1 or wd[-1] != 1 or ws[0] != 1 or ws[-1] != 1:
                raise NotImplementedError(f"pool window {wd}")
            if tuple(params.get("base_dilation", (1,) * len(wd))) != \
                    (1,) * len(wd) or \
                    tuple(params.get("window_dilation",
                                     (1,) * len(wd))) != (1,) * len(wd):
                raise NotImplementedError("dilated pool")
            return g.emit({
                "op": "maxpool", "in": a.idx, "window": wd[1:-1],
                "strides": ws[1:-1], "padding": pad,
            }, shape, dtype)

        if name == "max":
            a, b = invals
            for s, c in ((a, b), (b, a)):
                if isinstance(s, _Sym) and _scalar_const(c, 0.0):
                    return g.emit({"op": "act", "kind": "relu",
                                   "in": s.idx}, shape, dtype)

        if name == "min":
            a, b = invals
            for s, c in ((a, b), (b, a)):
                if isinstance(s, _Sym) and _scalar_const(c, 6.0):
                    prod = g.producer(s.idx)
                    if (prod is not None and prod.get("op") == "act"
                            and prod.get("kind") == "relu"):
                        # min(relu(x), 6) — the relu6 idiom; the inner
                        # relu op stays behind as dead code (XLA DCE)
                        return g.emit({"op": "act", "kind": "relu6",
                                       "in": prod["in"]}, shape, dtype)

        if name == "mul":
            a, b = invals
            for x, gate in ((a, b), (b, a)):
                if isinstance(x, _Sym) and isinstance(gate, _Sym):
                    prod = self.g.producer(gate.idx)
                    if (prod is not None and prod.get("op") == "ew"
                            and prod.get("fn") == "logistic"
                            and prod["args"] == [("t", x.idx)]):
                        # x * sigmoid(x) — the swish/silu idiom
                        return g.emit({"op": "act", "kind": "swish",
                                       "in": x.idx}, shape, dtype)

        if name in _EW_BINARY:
            return g.emit({
                "op": "ew", "fn": name,
                "args": [_arg_ref(v) for v in invals],
            }, shape, dtype)

        if name in _EW_UNARY:
            return g.emit({
                "op": "ew", "fn": name, "args": [_arg_ref(invals[0])],
            }, shape, dtype)

        if name in ("stop_gradient", "copy"):
            return invals[0]  # alias — no op, no new tensor

        if name == "convert_element_type":
            (a,) = invals
            if np.dtype(params["new_dtype"]) == np.dtype(a.dtype):
                return a  # alias
            return g.emit({
                "op": "ew", "fn": "convert",
                "dtype": np.dtype(params["new_dtype"]).name,
                "args": [_arg_ref(a)],
            }, shape, dtype)

        if name in ("reduce_sum", "reduce_max", "reduce_min"):
            (a,) = invals
            axes = tuple(params["axes"])
            _check_batch_free(name, axes, "axes")
            return g.emit({
                "op": "reduce", "fn": name.split("_")[1], "in": a.idx,
                "axes": axes,
            }, shape, dtype)

        if name == "reshape":
            (a,) = invals
            new = tuple(params["new_sizes"])
            if a.shape[0] != new[0]:
                raise NotImplementedError(
                    f"reshape changes the batch dimension "
                    f"({a.shape} -> {new})")
            return g.emit({
                "op": "reshape", "in": a.idx, "tail": new[1:],
            }, shape, dtype)

        if name == "broadcast_in_dim":
            (a,) = invals
            dims = tuple(params["broadcast_dimensions"])
            tgt = tuple(params["shape"])
            if len(a.shape) == 0 or not dims or dims[0] != 0 or \
                    tgt[0] != a.shape[0]:
                raise NotImplementedError(
                    f"broadcast_in_dim {a.shape}->{tgt} dims {dims} "
                    "does not keep the batch in dim 0")
            return g.emit({
                "op": "broadcast", "in": a.idx, "tail": tgt[1:],
                "dims": dims,
            }, shape, dtype)

        if name == "transpose":
            (a,) = invals
            perm = tuple(params["permutation"])
            if perm[0] != 0:
                raise NotImplementedError(
                    f"transpose moves the batch dim ({perm})")
            return g.emit({
                "op": "transpose", "in": a.idx, "perm": perm,
            }, shape, dtype)

        if name == "squeeze":
            (a,) = invals
            dims = tuple(params["dimensions"])
            _check_batch_free(name, dims, "dimensions")
            return g.emit({
                "op": "squeeze", "in": a.idx, "dims": dims,
            }, shape, dtype)

        if name == "pad":
            a, val = invals
            if not isinstance(a, _Sym) or isinstance(val, _Sym):
                raise NotImplementedError("pad with symbolic pad value")
            cfg = tuple(tuple(c) for c in params["padding_config"])
            if cfg[0] != (0, 0, 0):
                raise NotImplementedError(f"pad touches batch: {cfg}")
            return g.emit({
                "op": "pad", "in": a.idx, "config": cfg[1:],
                "value": float(_const_np(val)),
            }, shape, dtype)

        raise NotImplementedError(
            f"quantization capture: primitive {name!r} on a symbolic "
            "tensor is not supported — add a handler to "
            "serve/trace._Walker.sym_eqn"
        )


# ---------------------------------------------------------------------------
# public capture entry
# ---------------------------------------------------------------------------


def trace_graph(model_cfg, params, batch_stats=None) -> Graph:
    """Capture the model's eval forward as the quantization graph IR.

    The model is rebuilt with ``compute_dtype=float32`` and the stock
    (unfused) pool lowering so the captured math is the canonical
    conv+relu+pool form (bit-equal to the production forward — the
    TPU-tuned lowerings are numerically equivalent reformulations,
    models/cnn.py)."""
    from skin_image_analysis_tpu.models.cnn import build_model

    if getattr(model_cfg, "in_channels", 3) != 3:
        raise ValueError("int8 quantization expects RGB-input models")
    cfg = replace(model_cfg, compute_dtype="float32", fused_pool=False,
                  pool_mode="stock", remat=False)
    model = build_model(cfg)
    size = int(model_cfg.image_size)
    spec = jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)
    if batch_stats is None:
        # structural pre-check (abstract init, no compute): BatchNorm
        # families cannot trace their eval forward without running stats
        shapes = jax.eval_shape(
            lambda x: model.init(jax.random.key(0), x, train=False),
            spec)
        if "batch_stats" in shapes:
            raise ValueError(
                f"{model_cfg.name} quantization needs batch_stats — "
                "pass the checkpoint's batch_stats collection")
    variables: dict[str, Any] = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    def fwd(x):
        return model.apply(variables, x, train=False)

    closed = jax.make_jaxpr(fwd)(spec)

    builder = _GraphBuilder(spec.shape, np.float32)
    walker = _Walker(builder)
    outs = walker.run(
        closed.jaxpr,
        [_Sym(0, spec.shape, np.float32)],
        closed.consts,
    )
    if len(outs) != 1 or not isinstance(outs[0], _Sym):
        raise NotImplementedError(
            "model forward must return one input-dependent array")
    return Graph(ops=builder.ops, out=outs[0].idx)


# ---------------------------------------------------------------------------
# float executor (calibration pass + fidelity oracle)
# ---------------------------------------------------------------------------


def _ew_apply(op, vals):
    fn = op["fn"]
    if fn == "convert":
        return vals[0].astype(op["dtype"])
    if len(vals) == 1:
        return _EW_UNARY[fn](vals[0])
    return _EW_BINARY[fn](vals[0], vals[1])


def run_op_float(op, get):
    """Replay one captured op in f32; ``get(idx)`` returns the f32
    value of tensor ``idx`` (the int8 executor passes a dequantizing
    getter for its f32-replayed ops)."""
    kind = op["op"]
    if kind == "conv":
        return jax.lax.conv_general_dilated(
            get(op["in"]), jnp.asarray(op["kernel"]), op["strides"],
            op["padding"], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=op["groups"],
        )
    if kind == "dense":
        return get(op["in"]) @ jnp.asarray(op["kernel"])
    if kind == "maxpool":
        return jax.lax.reduce_window(
            get(op["in"]), -jnp.inf, jax.lax.max,
            (1, *op["window"], 1), (1, *op["strides"], 1),
            op["padding"],
        )
    if kind == "act":
        return {"relu": jax.nn.relu, "relu6": jax.nn.relu6,
                "swish": jax.nn.silu}[op["kind"]](get(op["in"]))
    if kind == "ew":
        vals = [get(v) if tag == "t" else jnp.asarray(v)
                for tag, v in op["args"]]
        return _ew_apply(op, vals)
    if kind == "reduce":
        fn = {"sum": jnp.sum, "max": jnp.max, "min": jnp.min}[op["fn"]]
        return fn(get(op["in"]), axis=op["axes"])
    if kind == "reshape":
        a = get(op["in"])
        return a.reshape((a.shape[0],) + tuple(op["tail"]))
    if kind == "broadcast":
        a = get(op["in"])
        return jax.lax.broadcast_in_dim(
            a, (a.shape[0],) + tuple(op["tail"]), op["dims"])
    if kind == "transpose":
        return jnp.transpose(get(op["in"]), op["perm"])
    if kind == "squeeze":
        return jax.lax.squeeze(get(op["in"]), op["dims"])
    if kind == "pad":
        a = get(op["in"])
        return jax.lax.pad(a, jnp.asarray(op["value"], a.dtype),
                           ((0, 0, 0),) + tuple(op["config"]))
    raise ValueError(f"unknown op {kind!r}")  # pragma: no cover


def graph_forward(graph: Graph, x, taps: bool = False,
                  tap_quantile: float | None = None):
    """Replay the captured graph in f32 — the calibration pass
    (``taps=True`` additionally returns a per-tensor |·| statistic
    stacked as ONE device array, so calibration is a single XLA
    program) and the fidelity oracle, pinned equal to the live model
    forward in tests.

    ``tap_quantile`` switches the tap statistic from max|·| to the given
    quantile of |·| (in [0, 1], e.g. 0.999): percentile calibration
    clips activation outliers instead of letting a single hot value
    stretch every downstream scale (values beyond the scale saturate at
    ±127, which costs far less than halving everyone else's
    resolution)."""
    ts = [x.astype(jnp.float32)]
    for op in graph.ops:
        ts.append(run_op_float(op, ts.__getitem__))
    out = ts[graph.out]
    if not taps:
        return out
    if tap_quantile is None:
        stats = [jnp.max(jnp.abs(t.astype(jnp.float32))) for t in ts]
    else:
        q = float(tap_quantile)
        stats = [jnp.quantile(jnp.abs(t.astype(jnp.float32)).ravel(), q)
                 for t in ts]
    return out, jnp.stack(stats)
