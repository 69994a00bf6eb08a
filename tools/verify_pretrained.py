#!/usr/bin/env python
"""Pretrained-ImageNet-weights verification harness.

The one piece of the transfer story that cannot be validated inside the
zero-egress build environment is the real downloaded WEIGHT VALUES
(CNNTrial.py:80 ``ResNet50_Weights.IMAGENET1K_V1``;
jgi_ham_2018_tf.ipynb cell 70 ``Xception(weights="imagenet")``). Both
converters are oracle-pinned end-to-end in CI against live re-
implementations (tests/test_weight_convert.py, tests/test_ham_xception
.py), so the residual risk is "does the actual checkpoint flow" — and
closing it outside the sandbox should be ONE command. This is that
command:

    # outside the sandbox (network or a local checkpoint file)
    python tools/verify_pretrained.py resnet50 --download
    python tools/verify_pretrained.py resnet50 --weights resnet50-0676ba61.pth
    python tools/verify_pretrained.py xception --weights \
        xception_weights_tf_dim_ordering_tf_kernels_notop.h5

    # inside CI (no network): the same pipeline over synthetic
    # torchvision-format checkpoints + a live random-weight Keras oracle
    python tools/verify_pretrained.py --offline

Each run converts the checkpoint through the PRODUCTION converter
(models/resnet.load_torchvision_weights / models/xception
.load_keras_xception_weights), forwards fixed seeded inputs through our
Flax model AND an independent oracle (torchvision if importable, else
the in-repo torch-functional forward; keras.applications for xception),
and writes a manifest: file sha256, per-layer checksums of the converted
tree, and the parity deltas. Exit 0 = parity within tolerance.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESNET50_URL = "https://download.pytorch.org/models/resnet50-0676ba61.pth"
XCEPTION_NOTOP_URL = (
    "https://storage.googleapis.com/tensorflow/keras-applications/"
    "xception/xception_weights_tf_dim_ordering_tf_kernels_notop.h5"
)

ATOL, RTOL = 5e-4, 1e-4


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _layer_checksums(variables) -> dict[str, str]:
    """Per-leaf sha256 (first 12 hex) of the CONVERTED tree — lets two
    sites confirm they loaded byte-identical weights without shipping
    them."""
    import flax

    out = {}
    for key, leaf in flax.traverse_util.flatten_dict(variables).items():
        arr = np.ascontiguousarray(np.asarray(leaf))
        out["/".join(key)] = hashlib.sha256(arr.tobytes()).hexdigest()[:12]
    return out


def _download(url: str, cache_dir: str) -> str:
    import urllib.request

    os.makedirs(cache_dir, exist_ok=True)
    dest = os.path.join(cache_dir, os.path.basename(url))
    if not os.path.exists(dest):
        print(f"downloading {url} -> {dest}")
        urllib.request.urlretrieve(url, dest)  # noqa: S310 - pinned URLs
    return dest


def _parity(ours: np.ndarray, theirs: np.ndarray) -> dict:
    return {
        "max_abs_delta": float(np.abs(ours - theirs).max()),
        "mean_abs_delta": float(np.abs(ours - theirs).mean()),
        "top1_agreement": float(
            (ours.argmax(-1) == theirs.argmax(-1)).mean()),
        "within_tolerance": bool(np.allclose(
            ours, theirs, rtol=RTOL, atol=ATOL)),
    }


# -- resnet50 (torchvision .pth) --------------------------------------------


def verify_resnet50(weights_path: str, size: int = 224) -> dict:
    import torch

    import jax
    import jax.numpy as jnp

    from skin_image_analysis_tpu.models.resnet import (
        load_torchvision_weights,
        resnet50,
    )

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    n_classes = int(sd["fc.weight"].shape[0]) if "fc.weight" in sd else 2

    model = resnet50(num_classes=n_classes, compute_dtype="float32")
    rng = np.random.default_rng(7)
    # standardized inputs (the network expects ImageNet-normalized
    # floats); synthetic-BN checkpoints compound activation scale over
    # 53 BN layers, so bounded inputs keep f32 parity meaningful
    x = rng.normal(0, 1, (2, size, size, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    variables = {k: dict(v) for k, v in variables.items()}
    converted = load_torchvision_weights(weights_path, variables)
    if "fc.weight" in sd:
        # the production converter skips fc (the transfer recipe re-heads
        # the model, CNNTrial.py:85-87); for VERIFICATION map it too so
        # the parity check covers full 1000-class logits
        converted["params"]["Dense_0"] = {
            "kernel": jnp.asarray(sd["fc.weight"].numpy().T),
            "bias": jnp.asarray(sd["fc.bias"].numpy()),
        }
    # TPU backends lower f32 convs to bf16 passes by default — pin
    # full precision so parity vs the f32 torch oracle is meaningful
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(
            model.apply(converted, jnp.asarray(x), train=False))

    oracle = "torchvision"
    try:
        import torch.nn.functional as F
        import torchvision

        tvm = torchvision.models.resnet50(num_classes=n_classes)
        tvm.load_state_dict(sd)
        tvm.eval()
        with torch.no_grad():
            theirs = F.log_softmax(
                tvm(torch.from_numpy(x.transpose(0, 3, 1, 2))), dim=1
            ).numpy()
    except ImportError:
        # in-repo independent torch-functional forward (the CI oracle
        # that pinned the converter, tests/test_weight_convert.py) —
        # returns log-probs directly
        from tests.test_weight_convert import _torch_resnet50_forward

        oracle = "torch-functional (tests/test_weight_convert.py)"
        with torch.no_grad():
            theirs = _torch_resnet50_forward(
                dict(sd), torch.from_numpy(x.transpose(0, 3, 1, 2)),
            ).numpy()

    return {
        "model": "resnet50",
        "weights_file": os.path.abspath(weights_path),
        "sha256": _sha256(weights_path),
        "oracle": oracle,
        "input": {"shape": list(x.shape), "seed": 7},
        "parity": _parity(ours, theirs),
        "layer_checksums": _layer_checksums(converted),
    }


# -- xception (keras legacy .h5) ---------------------------------------------


def verify_xception(weights_path: str, size: int = 96) -> dict:
    import jax
    import jax.numpy as jnp

    from skin_image_analysis_tpu.models.xception import (
        Xception,
        load_keras_xception_weights,
    )

    import keras  # oracle — baked into this env, standard outside

    model = Xception(num_classes=2, middle_blocks=8,
                     compute_dtype="float32")
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, (2, size, size, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    variables = {k: dict(v) for k, v in variables.items()}
    converted = load_keras_xception_weights(weights_path, variables)

    # shared random head on both sides: the notop checkpoint has no
    # classifier, and the transfer recipe re-heads anyway — parity is
    # checked on GAP(features) @ W + b through the full log-softmax
    w_head = rng.normal(0, 0.05, (2048, 2)).astype(np.float32)
    b_head = rng.normal(0, 0.05, 2).astype(np.float32)
    converted["params"]["Dense_0"] = {
        "kernel": jnp.asarray(w_head), "bias": jnp.asarray(b_head)}
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(
            model.apply(converted, jnp.asarray(x), train=False))

    kmodel = keras.applications.Xception(
        weights=None, include_top=False, input_shape=(size, size, 3))
    kmodel.load_weights(weights_path)
    feats = np.asarray(kmodel(x, training=False))
    logits = feats.mean(axis=(1, 2)) @ w_head + b_head
    theirs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    return {
        "model": "xception",
        "weights_file": os.path.abspath(weights_path),
        "sha256": _sha256(weights_path),
        "oracle": "keras.applications.Xception",
        "input": {"shape": list(x.shape), "seed": 11},
        "parity": _parity(ours, theirs),
        "layer_checksums": _layer_checksums(converted),
    }


# -- offline (CI) mode --------------------------------------------------------


def offline_resnet50(tmp_dir: str) -> dict:
    """The full file-based pipeline over a synthetic torchvision-format
    checkpoint (real zipfile .pth) — everything but the weight VALUES."""
    import torch

    from tests.test_weight_convert import _fake_torchvision_resnet50_sd

    rng = np.random.default_rng(7)  # the CI parity test's draw
    sd = _fake_torchvision_resnet50_sd(rng)  # already torch tensors
    path = os.path.join(tmp_dir, "resnet50_synthetic.pth")
    torch.save(sd, path)
    report = verify_resnet50(path, size=64)
    report["offline"] = True
    return report


def offline_xception(tmp_dir: str) -> dict:
    """Live random-weight keras.applications.Xception written in the
    legacy .h5 layout the downloadable files use, then the file-based
    pipeline (the CI twin of verifying a real notop checkpoint)."""
    import h5py
    import keras

    keras.utils.set_random_seed(5)
    kmodel = keras.applications.Xception(
        weights=None, include_top=False, input_shape=(96, 96, 3))
    path = os.path.join(tmp_dir, "xception_synthetic.h5")

    def weight_names(layer):
        if isinstance(layer, keras.layers.SeparableConv2D):
            return ["depthwise_kernel", "pointwise_kernel"]
        if isinstance(layer, keras.layers.BatchNormalization):
            return ["gamma", "beta", "moving_mean", "moving_variance"]
        if isinstance(layer, keras.layers.Conv2D):
            return ["kernel", "bias"][: 1 + int(layer.use_bias)]
        if isinstance(layer, keras.layers.Dense):
            return ["kernel", "bias"]
        raise TypeError(layer)

    with h5py.File(path, "w") as f:
        layer_names = []
        for layer in kmodel.layers:
            ws = layer.get_weights()
            if not ws:
                continue
            layer_names.append(layer.name)
            g = f.create_group(layer.name)
            names = weight_names(layer)
            g.attrs["weight_names"] = [
                f"{layer.name}/{n}:0".encode() for n in names]
            for n, w in zip(names, ws):
                g.create_dataset(f"{layer.name}/{n}:0", data=w)
        f.attrs["layer_names"] = [n.encode() for n in layer_names]

    report = verify_xception(path, size=96)
    report["offline"] = True
    return report


def main(argv: list[str]) -> int:
    offline = "--offline" in argv
    argv = [a for a in argv if a != "--offline"]
    weights = download = out = None
    models: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--weights":
            weights = argv[i + 1]; i += 2
        elif argv[i] == "--download":
            download = True; i += 1
        elif argv[i] == "--out":
            out = argv[i + 1]; i += 2
        else:
            models.append(argv[i]); i += 1

    reports: list[dict] = []
    if offline:
        import tempfile

        tmp = tempfile.mkdtemp(prefix="verify_pretrained_")
        reports.append(offline_resnet50(tmp))
        reports.append(offline_xception(tmp))
    else:
        if not models:
            print(__doc__)
            return 1
        for m in models:
            if m == "resnet50":
                path = weights or (download and _download(
                    RESNET50_URL, os.path.expanduser(
                        "~/.cache/sia_verify")))
                if not path:
                    raise SystemExit(
                        "resnet50 needs --weights <path.pth> or "
                        "--download")
                reports.append(verify_resnet50(path))
            elif m == "xception":
                path = weights or (download and _download(
                    XCEPTION_NOTOP_URL, os.path.expanduser(
                        "~/.cache/sia_verify")))
                if not path:
                    raise SystemExit(
                        "xception needs --weights <path.h5> or "
                        "--download")
                reports.append(verify_xception(path))
            else:
                raise SystemExit(f"unknown model {m!r} "
                                 "(resnet50 | xception)")

    ok = all(r["parity"]["within_tolerance"] for r in reports)
    for r in reports:
        p = r["parity"]
        print(f"{r['model']}: oracle={r['oracle']} "
              f"max|Δ|={p['max_abs_delta']:.2e} "
              f"top1_agree={p['top1_agreement']:.3f} "
              f"{'OK' if p['within_tolerance'] else 'MISMATCH'}")
    out = out or os.path.join(os.getcwd(), "verify_pretrained.json")
    with open(out, "w") as f:
        json.dump(reports, f, indent=1)
    print(f"manifest: {out}")
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
