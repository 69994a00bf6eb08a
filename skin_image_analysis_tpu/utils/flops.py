"""Analytic contraction-FLOPs from a traced forward — any model family.

``bench.py`` publishes MFU for the flagship from a hand-derived formula;
the transfer families (resnet50, xception, ...) need the same number
without one formula per family. This walks the jaxpr of the function
(``jax.make_jaxpr`` — tracing only, no device compile, so it is free
through the remote-compile relay) and sums the contraction FLOPs of
every ``dot_general`` and ``conv_general_dilated``, recursing into
nested jaxprs (pjit/remat/custom_jvp/scan — scan multiplied by its trip
count). Elementwise/pool/normalization work is deliberately NOT counted:
the result is the "useful matmul FLOPs" MFU numerator, matching
bench.py's convention and the standard MFU definition.

Training FLOPs ≈ 3x forward (activation- and weight-gradient matmuls),
the convention bench.py documents.
"""

from __future__ import annotations

import math
from typing import Any

import jax


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval          # [N, ...spatial..., C_out] order
    rhs = eqn.invars[1].aval           # kernel
    dn = eqn.params["dimension_numbers"]
    groups = int(eqn.params.get("feature_group_count", 1))
    batch_groups = int(eqn.params.get("batch_group_count", 1))
    # contraction per output element: prod(kernel spatial) * C_in/groups
    k_spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    c_in = rhs.shape[dn.rhs_spec[1]]   # already per-group in the kernel
    return 2.0 * out.size * k_spatial * c_in / max(batch_groups, 1)


def _dot_flops(eqn) -> float:
    lhs = eqn.invars[0].aval
    out = eqn.outvars[0].aval
    (lhs_c, _), _ = eqn.params["dimension_numbers"]
    k = math.prod(lhs.shape[d] for d in lhs_c)
    return 2.0 * out.size * k


def _walk(jaxpr, scale: float = 1.0) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            total += scale * _conv_flops(eqn)
        elif name == "dot_general":
            total += scale * _dot_flops(eqn)
        elif name == "scan":
            inner = eqn.params["jaxpr"].jaxpr
            total += _walk(inner, scale * eqn.params["length"])
        elif name == "while":
            # trip count is dynamic; count the body once (upper layers
            # should prefer scan for countable loops)
            total += _walk(eqn.params["body_jaxpr"].jaxpr, scale)
        elif name == "cond":
            branches = [_walk(b.jaxpr, scale)
                        for b in eqn.params["branches"]]
            total += max(branches) if branches else 0.0
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    total += _walk(getattr(sub, "jaxpr", sub), scale)
                    break
    return total


def contraction_flops(fn, *args: Any, **kwargs: Any) -> float:
    """Total dot/conv contraction FLOPs of one ``fn(*args)`` call.

    ``args`` may be concrete arrays or ``jax.ShapeDtypeStruct``s —
    only shapes matter (abstract trace; nothing runs on device)."""
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
    return _walk(jaxpr.jaxpr)


def forward_flops_per_img(model_cfg, batch_size: int = 8) -> float:
    """Forward contraction FLOPs per image for a registry model at its
    configured size (eval forward, train=False)."""
    import jax.numpy as jnp

    from skin_image_analysis_tpu.models import build_model

    model = build_model(model_cfg)
    x = jax.ShapeDtypeStruct(
        (batch_size, model_cfg.image_size, model_cfg.image_size,
         getattr(model_cfg, "in_channels", 3)),
        jnp.float32,
    )
    variables = jax.eval_shape(
        lambda key: model.init(key, jnp.zeros(
            (1, model_cfg.image_size, model_cfg.image_size,
             getattr(model_cfg, "in_channels", 3)), jnp.float32),
            train=False),
        jax.random.key(0),
    )

    def fwd(params, pixels):
        return model.apply(params, pixels, train=False)

    return contraction_flops(fwd, variables, x) / batch_size
