"""torchvision → Flax ResNet weight conversion (models/resnet.py), using a
synthesized torchvision-format state_dict (torchvision itself is not
installed; the key/shape schema is what matters)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from skin_image_analysis_tpu.models.resnet import (  # noqa: E402
    load_torchvision_weights,
    resnet18,
)


def _fake_torchvision_resnet18_sd(rng):
    """Random state_dict with torchvision resnet18's exact keys/shapes."""
    sd = {}

    def conv(key, out_c, in_c, k):
        sd[key] = torch.tensor(
            rng.normal(0, 0.1, (out_c, in_c, k, k)).astype(np.float32)
        )

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.tensor(np.ones(c, np.float32))
        sd[f"{prefix}.bias"] = torch.tensor(np.zeros(c, np.float32))
        sd[f"{prefix}.running_mean"] = torch.tensor(
            rng.normal(0, 0.01, c).astype(np.float32)
        )
        sd[f"{prefix}.running_var"] = torch.tensor(np.ones(c, np.float32))
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    channels = [64, 128, 256, 512]
    in_c = 64
    for layer, c in enumerate(channels, start=1):
        for block in range(2):
            p = f"layer{layer}.{block}"
            conv(f"{p}.conv1.weight", c, in_c if block == 0 else c, 3)
            bn(f"{p}.bn1", c)
            conv(f"{p}.conv2.weight", c, c, 3)
            bn(f"{p}.bn2", c)
            if block == 0 and layer > 1:
                conv(f"{p}.downsample.0.weight", c, in_c, 1)
                bn(f"{p}.downsample.1", c)
        in_c = c
    sd["fc.weight"] = torch.tensor(rng.normal(0, 0.1, (1000, 512)).astype(np.float32))
    sd["fc.bias"] = torch.tensor(np.zeros(1000, np.float32))
    return sd


def test_convert_torchvision_resnet18(tmp_path):
    rng = np.random.default_rng(0)
    sd = _fake_torchvision_resnet18_sd(rng)
    path = str(tmp_path / "resnet18.pth")
    torch.save(sd, path)

    model = resnet18(compute_dtype="float32")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    variables = {k: dict(v) for k, v in variables.items()}

    converted = load_torchvision_weights(path, variables)

    # stem kernel: NCHW (O,I,H,W) → NHWC (H,W,I,O)
    want = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    got = np.asarray(converted["params"]["stem_conv"]["kernel"])
    np.testing.assert_array_equal(got, want)

    # a block conv + its bn stats moved across
    got_b = np.asarray(converted["params"]["BasicBlock_0"]["Conv_0"]["kernel"])
    want_b = np.transpose(sd["layer1.0.conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_array_equal(got_b, want_b)
    got_mean = np.asarray(converted["batch_stats"]["stem_bn"]["mean"])
    np.testing.assert_array_equal(got_mean, sd["bn1.running_mean"].numpy())

    # a downsample branch mapped
    got_ds = np.asarray(
        converted["params"]["BasicBlock_2"]["downsample_conv"]["kernel"]
    )
    want_ds = np.transpose(sd["layer2.0.downsample.0.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_array_equal(got_ds, want_ds)

    # converted model still runs
    out = model.apply(converted, x, train=False)
    assert out.shape == (1, 2)


def test_convert_rejects_block_mismatch(tmp_path):
    rng = np.random.default_rng(1)
    sd = _fake_torchvision_resnet18_sd(rng)
    # drop one block → count mismatch
    sd = {k: v for k, v in sd.items() if not k.startswith("layer4.1")}
    path = str(tmp_path / "bad.pth")
    torch.save(sd, path)
    model = resnet18(compute_dtype="float32")
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    with pytest.raises(ValueError, match="block count mismatch"):
        load_torchvision_weights(path, {k: dict(v) for k, v in variables.items()})


def _fake_torchvision_resnet50_sd(rng, num_classes=2):
    """Random state_dict with torchvision resnet50's exact keys/shapes
    (Bottleneck: conv1 1x1 / conv2 3x3 stride / conv3 1x1 x4, downsample
    on EVERY stage's first block — the reference backbone,
    CNNTrial.py:80). Random bn stats/scales so any mean/var/scale/bias
    mix-up in the converter changes the output."""
    sd = {}

    def conv(key, out_c, in_c, k):
        sd[key] = torch.tensor(
            rng.normal(0, 0.05, (out_c, in_c, k, k)).astype(np.float32)
        )

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.tensor(
            rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[f"{prefix}.bias"] = torch.tensor(
            rng.normal(0, 0.1, c).astype(np.float32))
        sd[f"{prefix}.running_mean"] = torch.tensor(
            rng.normal(0, 0.05, c).astype(np.float32))
        sd[f"{prefix}.running_var"] = torch.tensor(
            rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    in_c = 64
    for layer, n_blocks in enumerate((3, 4, 6, 3), start=1):
        w = 64 * 2 ** (layer - 1)
        for block in range(n_blocks):
            p = f"layer{layer}.{block}"
            conv(f"{p}.conv1.weight", w, in_c if block == 0 else 4 * w, 1)
            bn(f"{p}.bn1", w)
            conv(f"{p}.conv2.weight", w, w, 3)
            bn(f"{p}.bn2", w)
            conv(f"{p}.conv3.weight", 4 * w, w, 1)
            bn(f"{p}.bn3", 4 * w)
            if block == 0:
                conv(f"{p}.downsample.0.weight", 4 * w, in_c, 1)
                bn(f"{p}.downsample.1", 4 * w)
        in_c = 4 * w
    sd["fc.weight"] = torch.tensor(
        rng.normal(0, 0.05, (num_classes, 2048)).astype(np.float32))
    sd["fc.bias"] = torch.tensor(np.zeros(num_classes, np.float32))
    return sd


def _torch_resnet50_forward(sd, x):
    """torchvision resnet50 eval forward, hand-rolled from the state
    dict with torch.nn.functional (torchvision itself is not installed).
    The numerical oracle for the converter: same weights, independent
    implementation."""
    import torch.nn.functional as F

    def bn(t, p):
        return F.batch_norm(
            t, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
            sd[f"{p}.weight"], sd[f"{p}.bias"], training=False, eps=1e-5,
        )

    x = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    x = F.relu(bn(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for layer, n_blocks in enumerate((3, 4, 6, 3), start=1):
        for block in range(n_blocks):
            p = f"layer{layer}.{block}"
            stride = 2 if layer > 1 and block == 0 else 1
            identity = x
            y = F.relu(bn(F.conv2d(x, sd[f"{p}.conv1.weight"]), f"{p}.bn1"))
            y = F.relu(bn(
                F.conv2d(y, sd[f"{p}.conv2.weight"], stride=stride,
                         padding=1),
                f"{p}.bn2",
            ))
            y = bn(F.conv2d(y, sd[f"{p}.conv3.weight"]), f"{p}.bn3")
            if f"{p}.downsample.0.weight" in sd:
                identity = bn(
                    F.conv2d(x, sd[f"{p}.downsample.0.weight"],
                             stride=stride),
                    f"{p}.downsample.1",
                )
            x = F.relu(y + identity)
    x = x.mean(dim=(2, 3))
    x = F.linear(x, sd["fc.weight"], sd["fc.bias"])
    return F.log_softmax(x, dim=1)


def test_convert_resnet50_numerical_parity(tmp_path):
    """End-to-end transfer fidelity on the reference's actual backbone:
    a torchvision-resnet50-format .pth (real torch zipfile
    serialization) converts into the Flax model, and the Flax forward
    matches an independent torch-functional forward of the SAME weights
    — every key mapping, kernel transpose, bn-stat assignment, padding
    convention, and pooling semantic is numerically pinned. The only
    thing left untestable in this environment is the downloaded weight
    VALUES."""
    from skin_image_analysis_tpu.models.resnet import resnet50

    rng = np.random.default_rng(7)
    sd = _fake_torchvision_resnet50_sd(rng)
    path = str(tmp_path / "resnet50.pth")
    torch.save(sd, path)  # real torchvision .pth layout (zip + pickle)
    import zipfile
    assert zipfile.is_zipfile(path)  # not a legacy/plain-dict artifact

    model = resnet50(compute_dtype="float32")
    x_np = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    variables = model.init(
        jax.random.key(0), jnp.asarray(x_np), train=False
    )
    variables = {k: dict(v) for k, v in variables.items()}
    converted = load_torchvision_weights(path, variables)
    # the converter re-initializes the head (transfer recipe); wire the
    # fc weights in manually so the comparison covers the full network
    converted["params"]["Dense_0"] = {
        "kernel": jnp.asarray(sd["fc.weight"].numpy().T),
        "bias": jnp.asarray(sd["fc.bias"].numpy()),
    }

    ours = np.asarray(model.apply(converted, jnp.asarray(x_np), train=False))
    theirs = _torch_resnet50_forward(
        sd, torch.tensor(np.transpose(x_np, (0, 3, 1, 2)))
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=2e-4)
