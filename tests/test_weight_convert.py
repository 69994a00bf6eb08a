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
