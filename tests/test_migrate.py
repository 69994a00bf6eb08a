"""Importing the reference's whole-module ``session_model.pth`` pickles
(migrate/): safe unpickling (no code execution), architecture recovery,
numerical forward parity against the live torch module, and the
experiment-folder conversion CLI surface."""

import os
import pickle
import zipfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from skin_image_analysis_tpu.migrate import (  # noqa: E402
    TorchPickleError,
    import_reference_experiment,
    import_reference_model,
    load_pth,
    named_tensors,
)
from skin_image_analysis_tpu.models.cnn import build_model  # noqa: E402
from skin_image_analysis_tpu.train import checkpoint as ckpt_lib  # noqa: E402


class _ListModel(tnn.Module):
    """The reference's SkinCancerListModel shape (tone_bias_model.py:56-152)
    built from torch primitives — how a reference user's checkpoints look."""

    def __init__(self, conv_features=(4, 6, 8), first_kernel=7, kernel=3,
                 linear_features=(16, 8), dropouts=(0.3, 0.25),
                 image_size=32, num_classes=2, in_channels=3):
        super().__init__()
        layers = []
        prev = in_channels
        size = image_size
        for i, feats in enumerate(conv_features):
            k = first_kernel if i == 0 else kernel
            layers += [
                tnn.Conv2d(prev, feats, k, stride=1, padding="same"),
                tnn.ReLU(),
                tnn.MaxPool2d(2, 2),
            ]
            prev, size = feats, size // 2
        layers.append(tnn.Flatten())
        prev = prev * size * size
        for feats, p in zip(linear_features, dropouts):
            layers += [tnn.Linear(prev, feats), tnn.ReLU(), tnn.Dropout(p)]
            prev = feats
        layers += [tnn.Linear(prev, num_classes), tnn.LogSoftmax(dim=1)]
        self.layers = tnn.Sequential(*layers)
        self.class_names = ["benign", "malignant"]

    def forward(self, x):
        return self.layers(x)


class _LegacyModel(tnn.Module):
    """Attribute-style fixed-block variant (the reference's
    SkinCancerModel, tone_bias_model.py:155-299)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 4, 7, padding="same")
        self.act1 = tnn.ReLU()
        self.pool1 = tnn.MaxPool2d(2, 2)
        self.conv2 = tnn.Conv2d(4, 6, 3, padding="same")
        self.act2 = tnn.ReLU()
        self.pool2 = tnn.MaxPool2d(2, 2)
        self.flatten = tnn.Flatten()
        self.fc1 = tnn.Linear(6 * 8 * 8, 12)
        self.act3 = tnn.ReLU()
        self.drop1 = tnn.Dropout(0.5)
        self.fc2 = tnn.Linear(12, 2)
        self.head = tnn.LogSoftmax(dim=1)

    def forward(self, x):
        x = self.pool1(self.act1(self.conv1(x)))
        x = self.pool2(self.act2(self.conv2(x)))
        x = self.flatten(x)
        x = self.drop1(self.act3(self.fc1(x)))
        return self.head(self.fc2(x))


def _save_whole(model, path):
    torch.save(model, path)
    return path


def _forward_parity(pth_path, torch_model, image_size, in_channels=3,
                    atol=2e-5):
    cfg, params, class_names = import_reference_model(pth_path)
    # the importer pins float32 itself — parity is the default behavior
    assert cfg.compute_dtype == "float32"
    model = build_model(cfg)
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, image_size, image_size, in_channels)).astype(
        np.float32
    )
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), train=False)
    )
    torch_model.eval()
    with torch.no_grad():
        theirs = torch_model(
            torch.tensor(x.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=1e-4)
    return cfg, params, class_names


def test_list_model_forward_parity(tmp_path):
    m = _ListModel()
    pth = _save_whole(m, str(tmp_path / "session_model.pth"))
    cfg, params, class_names = _forward_parity(pth, m, 32)
    assert cfg.conv_features == (4, 6, 8)
    assert cfg.first_kernel == 7 and cfg.kernel == 3
    assert cfg.linear_features == (16, 8)
    assert cfg.dropout == (0.3, 0.25)
    assert cfg.num_classes == 2
    assert cfg.image_size == 32
    assert class_names == ["benign", "malignant"]


def test_list_model_single_linear_dropout(tmp_path):
    m = _ListModel(conv_features=(4,), first_kernel=5,
                   linear_features=(6,), dropouts=(0.4,), image_size=16)
    pth = _save_whole(m, str(tmp_path / "m.pth"))
    cfg, _, _ = _forward_parity(pth, m, 16)
    assert cfg.conv_features == (4,)
    assert cfg.first_kernel == 5
    assert cfg.linear_features == (6,)
    assert cfg.dropout == (0.4,)


def test_legacy_attribute_model(tmp_path):
    m = _LegacyModel()
    pth = _save_whole(m, str(tmp_path / "legacy.pth"))
    cfg, _, class_names = _forward_parity(pth, m, 32)
    assert cfg.conv_features == (4, 6)
    assert cfg.linear_features == (12,)
    assert cfg.dropout == (0.5,)
    # no class_names attribute on the pickle -> reference default
    assert class_names == ["benign", "malignant"]


def test_named_tensors_matches_state_dict(tmp_path):
    m = _ListModel()
    pth = _save_whole(m, str(tmp_path / "m.pth"))
    root = load_pth(pth)
    ours = named_tensors(root)
    theirs = {k: v.numpy() for k, v in m.state_dict().items()}
    assert set(ours) == set(theirs)
    for k in theirs:
        np.testing.assert_array_equal(ours[k], theirs[k])


def test_rejects_state_dict(tmp_path):
    m = _ListModel()
    pth = str(tmp_path / "sd.pth")
    torch.save(m.state_dict(), pth)
    with pytest.raises(TorchPickleError, match="state_dict"):
        import_reference_model(pth)


def test_rejects_non_zip(tmp_path):
    path = tmp_path / "junk.pth"
    path.write_bytes(b"not a checkpoint at all")
    with pytest.raises(TorchPickleError, match="zipfile"):
        load_pth(str(path))


def test_rejects_unsupported_family(tmp_path):
    m = tnn.Sequential(
        tnn.Conv2d(3, 4, 3, padding="same"),
        tnn.BatchNorm2d(4),
        tnn.Flatten(),
        tnn.Linear(4 * 8 * 8, 2),
    )
    pth = _save_whole(m, str(tmp_path / "bn.pth"))
    with pytest.raises(TorchPickleError, match="BatchNorm|parameterized"):
        import_reference_model(pth)


def test_malicious_pickle_does_not_execute(tmp_path):
    """A crafted .pth whose pickle tries to call os.system: the stub
    unpickler must neither import os nor execute anything."""
    marker = tmp_path / "pwned"

    class Evil:
        def __reduce__(self):
            import os as _os

            return (_os.system, (f"touch {marker}",))

    pth = tmp_path / "evil.pth"
    with zipfile.ZipFile(pth, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps(Evil()))
    root = load_pth(str(pth))  # loads inertly
    assert not marker.exists()
    # and the importer rejects it as not-a-model
    with pytest.raises(TorchPickleError):
        import_reference_model(str(pth))
    assert not marker.exists()
    assert getattr(type(root), "_pickle_name", "") == "system"


def test_import_experiment_folder(tmp_path):
    src = tmp_path / "balanced_2024-10-12_09-22-38"
    src.mkdir()
    m = _ListModel()
    _save_whole(m, str(src / "session_model.pth"))
    (src / "session_train.csv").write_text("isic_id\nISIC_0\n")
    (src / "session_test.csv").write_text("isic_id\nISIC_1\n")
    (src / "2024-10-12_09-22-38.json").write_text('{"epoch": 0}\n')

    out = tmp_path / "imported"
    summary = import_reference_experiment(str(src), str(out))
    assert summary["class_names"] == ["benign", "malignant"]
    assert sorted(summary["copied"]) == [
        "2024-10-12_09-22-38.json", "session_test.csv", "session_train.csv",
    ]

    # the converted artifact round-trips through our loader and matches
    # the torch forward
    cfg, loaded = ckpt_lib.load_model(
        str(out / ckpt_lib.MODEL_FILENAME)
    )
    params, batch_stats = ckpt_lib.split_variables(loaded)
    assert batch_stats is None
    # float32 travels in the saved artifact header
    assert cfg.compute_dtype == "float32"
    model = build_model(cfg)
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    m.eval()
    with torch.no_grad():
        theirs = m(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)

    import json

    train_cfg = json.loads((out / "train_config.json").read_text())
    assert train_cfg["class_names"] == ["benign", "malignant"]
    assert train_cfg["image_size"] == 32


def test_import_reference_cli(tmp_path, capsys):
    src = tmp_path / "ref"
    src.mkdir()
    _save_whole(_ListModel(), str(src / "session_model.pth"))
    out = tmp_path / "out"

    import cli.import_reference as cli_mod

    assert cli_mod.main([str(src), str(out)]) == 0
    assert (out / ckpt_lib.MODEL_FILENAME).exists()
    assert "imported ->" in capsys.readouterr().out

    # bad input: clean failure, no traceback
    bad = tmp_path / "bad.pth"
    bad.write_bytes(b"nope")
    assert cli_mod.main([str(bad), str(tmp_path / "out2")]) == 1


def test_hpo_winning_config_shape(tmp_path):
    """An HPO-produced architecture (tone_bias_optuna.py:96-110 shape:
    3 conv + 3 linear, arbitrary widths) imports too."""
    m = _ListModel(conv_features=(8, 5, 7), first_kernel=7, kernel=3,
                   linear_features=(11, 9, 6), dropouts=(0.47, 0.34, 0.27),
                   image_size=32)
    pth = _save_whole(m, str(tmp_path / "hpo.pth"))
    cfg, _, _ = _forward_parity(pth, m, 32)
    assert cfg.conv_features == (8, 5, 7)
    assert cfg.linear_features == (11, 9, 6)


def test_rebuild_tensor_bounds_checked():
    """Pickle-supplied size/stride/offset must be validated against the
    storage before as_strided — a corrupt/malicious file must raise, not
    read out-of-bounds process memory."""
    from skin_image_analysis_tpu.migrate.torch_pickle import (
        _rebuild_tensor_v2,
    )

    storage = np.arange(4, dtype=np.float32)
    # plain valid view still works
    out = _rebuild_tensor_v2(storage, 0, (2, 2), (2, 1))
    np.testing.assert_array_equal(out, [[0, 1], [2, 3]])
    # size overruns the storage
    with pytest.raises(TorchPickleError, match="exceeds storage"):
        _rebuild_tensor_v2(storage, 0, (10**6,), (1,))
    # huge stride overruns even with a small size
    with pytest.raises(TorchPickleError, match="exceeds storage"):
        _rebuild_tensor_v2(storage, 0, (2,), (10**6,))
    # negative strides/offsets walk backwards out of the buffer
    with pytest.raises(TorchPickleError, match="negative"):
        _rebuild_tensor_v2(storage, 0, (2,), (-1,))
    with pytest.raises(TorchPickleError, match="negative"):
        _rebuild_tensor_v2(storage, -1, (2,), (1,))
    # scalar offset past the end
    with pytest.raises(TorchPickleError, match="outside storage"):
        _rebuild_tensor_v2(storage, 4, (), ())
    # zero-size dims are legal and empty
    assert _rebuild_tensor_v2(storage, 0, (0, 2), (2, 1)).shape == (0, 2)


def test_named_modules_shared_and_cyclic():
    """Weight-tied (shared) modules yield once — the torch
    Module.named_modules memo contract — and a cycle a corrupt pickle
    could encode terminates instead of recursing forever."""
    from skin_image_analysis_tpu.migrate.torch_pickle import (
        Stub,
        named_modules,
    )

    class S(Stub):
        pass

    shared = S()
    shared.__dict__["_modules"] = {}
    root = S()
    root.__dict__["_modules"] = {"a": shared, "b": shared}
    names = [n for n, _ in named_modules(root)]
    assert names == ["", "a"]  # second reference deduped

    x, y = S(), S()
    x.__dict__["_modules"] = {"y": y}
    y.__dict__["_modules"] = {"x": x}  # cycle
    names = [n for n, _ in named_modules(x)]
    assert names == ["", "y"]
