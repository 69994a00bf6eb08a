"""Corrupt-artifact robustness for the model loader: truncations and
bit flips of a real session_model.msgpack must raise ValueError (one
normalized type — this is the serving entry point for on-disk files),
never raw struct/json/msgpack internals, and never hang or crash."""

import numpy as np
import pytest

import jax

from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
from skin_image_analysis_tpu.train import checkpoint as ckpt_lib
from skin_image_analysis_tpu.train.state import create_train_state


def test_fuzz_corrupt_model_artifacts(tmp_path):
    cfg = ModelConfig(
        conv_features=(4,), linear_features=(8,), dropout=(0.0,),
        image_size=16, compute_dtype="float32",
    )
    state, _ = create_train_state(
        cfg, OptimConfig(learning_rate=1e-3), jax.random.key(0),
        batch_size=2,
    )
    path = str(tmp_path / "m.msgpack")
    ckpt_lib.save_model(path, cfg, state.params, state.batch_stats)
    base = open(path, "rb").read()
    bad = str(tmp_path / "bad.msgpack")
    rng = np.random.default_rng(0)

    def attempt(data: bytes):
        with open(bad, "wb") as f:
            f.write(data)
        try:
            mc, loaded = ckpt_lib.load_model(bad)
            # a survivor must still be structurally usable
            ckpt_lib.split_variables(loaded)
            assert mc.image_size > 0
        except ValueError:
            pass  # the one allowed failure type

    # wrong magic → ValueError with the not-a-session_model message
    with pytest.raises(ValueError, match="not a session_model"):
        attempt_data = b"XXXX" + base[4:]
        with open(bad, "wb") as f:
            f.write(attempt_data)
        ckpt_lib.load_model(bad)

    # truncations at every prefix step (header region densely, body
    # sparsely — the body is megabytes of msgpack)
    for cut in list(range(0, 400, 7)) + list(
            range(400, len(base), max(1, len(base) // 64))):
        attempt(base[:cut])

    # single-byte corruptions across header + early body
    arr = np.frombuffer(base, np.uint8).copy()
    span = min(len(arr), 6000)
    for _ in range(300):
        i = int(rng.integers(0, span))
        old = arr[i]
        arr[i] = rng.integers(0, 256)
        attempt(arr.tobytes())
        arr[i] = old
