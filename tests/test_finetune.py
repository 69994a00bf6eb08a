"""Fine-tune warm start + cross-dataset eval (the HIBA-2022 config:
SURVEY.md BASELINE configs; jgi_hiba_2022 model lineage)."""

import os

import numpy as np

from skin_image_analysis_tpu.config import (
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from skin_image_analysis_tpu.train import checkpoint as ckpt_lib
from skin_image_analysis_tpu.train.loop import run_training


def _cfg(synth_root, tmp_path, **kw):
    return TrainConfig(
        epochs=1,
        results_dir=str(tmp_path / "results"),
        log_every_batches=0,
        data=DataConfig(
            root_dir=synth_root, image_size=32, canonical_size=40,
            batch_size=8, balance=False, decode_workers=2, prefetch_depth=0,
            seed=0,
        ),
        model=ModelConfig(
            conv_features=(8,), linear_features=(16,), dropout=(0.2,),
            image_size=32, compute_dtype="float32",
        ),
        optim=OptimConfig(learning_rate=1e-3),
        **kw,
    )


def test_finetune_warm_start(synth_root, tmp_path):
    import jax

    base_cfg = _cfg(synth_root, tmp_path)
    base_folder = run_training(base_cfg, verbose=False)
    base_model = os.path.join(base_folder, ckpt_lib.MODEL_FILENAME)
    _, base_params = ckpt_lib.load_model(base_model)

    ft_cfg = _cfg(synth_root, tmp_path, init_from=base_folder, seed=1)
    ft_folder = run_training(ft_cfg, verbose=False)
    assert ft_folder != base_folder
    # fine-tuned model exists and differs from the base (it trained)
    _, ft_params = ckpt_lib.load_model(
        os.path.join(ft_folder, ckpt_lib.MODEL_FILENAME)
    )
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(base_params), jax.tree.leaves(ft_params))
    )
    assert changed
    # architecture was inherited from the artifact
    import json

    with open(os.path.join(ft_folder, "train_config.json")) as f:
        saved = json.load(f)
    assert saved["init_from"] == base_folder


def test_cross_dataset_eval_cli(synth_root, tmp_path, capsys):
    """tone_bias_test --metadata evaluates a trained model against a
    different cohort's metadata."""
    import sys

    sys.path.insert(0, "/root/repo")
    from cli import tone_bias_test

    folder = run_training(_cfg(synth_root, tmp_path), verbose=False)
    rc = tone_bias_test.main(
        [synth_root, folder, "--metadata",
         os.path.join(synth_root, "metadata.csv")]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert '"auc"' in out and '"tone_di_results"' in out
