"""End-to-end training slice on the synthetic fixture: experiment store,
JSON-lines schema, resume semantics (reference flow: tone_bias_train.py
main, tone_bias_test.py analyse_predictions schema)."""

import json
import os

import pytest

from skin_image_analysis_tpu.config import (
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from skin_image_analysis_tpu.train.loop import run_training

DI_KEYS_SUBSET = {"accuracy", "di", "selection_rate_min", "selection_rate_maj",
                  "tp_min", "tn_maj", "f1"}


def _tiny_cfg(synth_root, tmp_path, epochs=1, **data_kw):
    data_defaults = dict(
        root_dir=synth_root,
        image_size=32,
        canonical_size=40,
        batch_size=8,
        balance=False,
        decode_workers=2,
        prefetch_depth=1,
        seed=0,
    )
    data_defaults.update(data_kw)
    return TrainConfig(
        epochs=epochs,
        results_dir=str(tmp_path / "results"),
        log_every_batches=0,
        seed=0,
        data=DataConfig(**data_defaults),
        model=ModelConfig(
            conv_features=(8, 16),
            linear_features=(16,),
            dropout=(0.2,),
            image_size=32,
            compute_dtype="float32",
        ),
        optim=OptimConfig(learning_rate=1e-3),
    )


@pytest.fixture(scope="module")
def trained(synth_root, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("exp")
    cfg = _tiny_cfg(synth_root, tmp, epochs=2)
    folder = run_training(cfg, verbose=False)
    return folder, cfg


def test_experiment_layout(trained):
    folder, _ = trained
    names = os.listdir(folder)
    assert "session_train.csv" in names
    assert "session_test.csv" in names
    assert "session_model.msgpack" in names
    assert any(n.endswith(".json") and n[0].isdigit() for n in names)
    assert os.path.basename(folder).startswith("imbalanced_")


def test_epoch_records_schema(trained):
    folder, cfg = trained
    json_files = [n for n in os.listdir(folder) if n.endswith(".json") and n[0].isdigit()]
    records = []
    for n in json_files:
        with open(os.path.join(folder, n)) as f:
            records += [json.loads(line) for line in f if line.strip()]
    assert len(records) == 2  # one per epoch
    for rec in records:
        for key in ("correct", "total", "accuracy", "dark", "light", "male",
                    "female", "tone_di_results", "gender_di_results",
                    "control_di_results", "avg_batch_loss", "train_accuracy",
                    "epoch", "auc"):
            assert key in rec, key
        assert DI_KEYS_SUBSET <= set(rec["tone_di_results"].keys())
        assert rec["total"] == rec["dark"] + rec["light"]
    assert [r["epoch"] for r in records] == [0, 1]


def test_resume_appends_new_results_file(trained, synth_root):
    folder, cfg = trained
    import dataclasses

    resumed_cfg = dataclasses.replace(cfg, epochs=1, experiment_dir=folder)
    out = run_training(resumed_cfg, verbose=False)
    assert out == folder
    json_files = [n for n in os.listdir(folder) if n.endswith(".json") and n[0].isdigit()]
    assert len(json_files) >= 2  # original + resumed results file
    # frozen splits unchanged
    import pandas as pd

    train_df = pd.read_csv(os.path.join(folder, "session_train.csv"), index_col=0)
    test_df = pd.read_csv(os.path.join(folder, "session_test.csv"), index_col=0)
    assert set(train_df["isic_id"]).isdisjoint(set(test_df["isic_id"]))


def test_balanced_run_folder_name(synth_root, tmp_path):
    cfg = _tiny_cfg(synth_root, tmp_path, epochs=1, balance=True)
    folder = run_training(cfg, verbose=False)
    assert os.path.basename(folder).startswith("balanced_")


def test_seeded_runs_reproduce(synth_root, tmp_path):
    """Same seed → identical epoch records (the reproducibility the
    unseeded reference cannot provide)."""
    import json

    def run(sub):
        cfg = _tiny_cfg(synth_root, tmp_path / sub, epochs=1)
        folder = run_training(cfg, verbose=False)
        json_files = [n for n in os.listdir(folder)
                      if n.endswith(".json") and n[0].isdigit()]
        with open(os.path.join(folder, json_files[0])) as f:
            return [json.loads(line) for line in f if line.strip()]

    a = run("a")
    b = run("b")
    for ra, rb in zip(a, b):
        for k in ("epoch_time_s", "eval_time_s"):  # wall times vary
            ra.pop(k), rb.pop(k)
        assert ra == rb


def test_checkpoint_every(synth_root, tmp_path):
    import dataclasses

    cfg = dataclasses.replace(
        _tiny_cfg(synth_root, tmp_path, epochs=2), checkpoint_every=1
    )
    folder = run_training(cfg, verbose=False)
    assert os.path.isdir(os.path.join(folder, "checkpoint"))


def test_streaming_ingest_run(synth_root, tmp_path):
    """The archive-scale streaming path produces the same record schema
    through the full loop."""
    import dataclasses
    import json

    cfg = _tiny_cfg(synth_root, tmp_path, epochs=1)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, streaming=True, chunk_size=16)
    )
    folder = run_training(cfg, verbose=False)
    json_files = [n for n in os.listdir(folder)
                  if n.endswith(".json") and n[0].isdigit()]
    with open(os.path.join(folder, json_files[0])) as f:
        [rec] = [json.loads(line) for line in f if line.strip()]
    assert rec["total"] > 0
    assert "tone_di_results" in rec and "auc" in rec


def test_checkpoint_best(synth_root, tmp_path):
    import dataclasses

    cfg = dataclasses.replace(
        _tiny_cfg(synth_root, tmp_path, epochs=2), checkpoint_best=True
    )
    folder = run_training(cfg, verbose=False)
    assert os.path.exists(os.path.join(folder, "session_model_best.msgpack"))


def test_keep_best_eval_metric_and_early_stop(synth_root, tmp_path):
    """best_metric='accuracy' keeps the best-EVAL-epoch weights (the
    legacy notebook's best-val pattern, tone_bias_torch.py:943-1014)
    and early_stop_patience halts a diverging run: lr=5.0 destroys the
    model after epoch 1, so accuracy never improves again — the run
    must stop early, the progress marker must record the TRUE epoch
    count, and the best checkpoint must outscore the final one."""
    import dataclasses

    import numpy as np

    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib
    from skin_image_analysis_tpu.train.loop import completed_epochs

    cfg = dataclasses.replace(
        _tiny_cfg(synth_root, tmp_path, epochs=8),
        checkpoint_best=True,
        best_metric="accuracy",
        early_stop_patience=2,
        optim=OptimConfig(learning_rate=5.0),  # diverges immediately
    )
    folder = run_training(cfg, verbose=False)
    done = completed_epochs(folder)
    assert done < 8  # early stop fired
    # the per-epoch records stop at the same point
    json_files = [n for n in os.listdir(folder)
                  if n.endswith(".json") and n[0].isdigit()]
    with open(os.path.join(folder, json_files[0])) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    assert len(recs) == done
    accs = [r["accuracy"] for r in recs]
    best_path = os.path.join(folder, "session_model_best.msgpack")
    assert os.path.exists(best_path)

    # best checkpoint reproduces the best epoch's accuracy; the final
    # model reproduces the (worse) last epoch's
    from skin_image_analysis_tpu.data import LesionTable
    from skin_image_analysis_tpu.data.loader import HostImageStore
    from skin_image_analysis_tpu.models.cnn import build_model

    import jax.numpy as jnp
    import pandas as pd

    from skin_image_analysis_tpu.ops.preprocess import make_preprocess_fn

    test_df = pd.read_csv(os.path.join(folder, "session_test.csv"),
                          index_col=0)
    table = LesionTable(test_df, synth_root)
    store = HostImageStore(table, canonical_size=40)  # the run's arena
    pre = make_preprocess_fn(32, train=False)  # the run's eval preprocess

    def acc_of(path):
        mcfg, loaded = ckpt_lib.load_model(path)
        params, _ = ckpt_lib.split_variables(loaded)
        model = build_model(mcfg)
        x = pre(jnp.asarray(store.images), None)
        logp = model.apply({"params": params}, x, train=False)
        return float((np.asarray(logp).argmax(-1) == table.labels).mean())

    best_acc = acc_of(best_path)
    final_acc = acc_of(os.path.join(folder, "session_model.msgpack"))
    assert best_acc == pytest.approx(max(accs), abs=1e-6)
    assert final_acc == pytest.approx(accs[-1], abs=1e-6)
    assert best_acc >= final_acc

    # RESUME must not let a worse epoch overwrite the best checkpoint:
    # best_value is seeded from the folder's prior epoch records
    before = open(best_path, "rb").read()
    resume_cfg = dataclasses.replace(
        cfg, epochs=1, experiment_dir=folder, early_stop_patience=0)
    run_training(resume_cfg, verbose=False)
    if acc_of(os.path.join(folder, "session_model.msgpack")) < best_acc:
        assert open(best_path, "rb").read() == before


def test_auto_class_weights_imbalanced(synth_root, tmp_path):
    """BASELINE config 2: imbalanced sampling + class-weighted loss."""
    import dataclasses

    from skin_image_analysis_tpu.config import OptimConfig

    cfg = _tiny_cfg(synth_root, tmp_path, epochs=1)
    cfg = dataclasses.replace(
        cfg,
        optim=OptimConfig(learning_rate=1e-3, auto_class_weights=True),
    )
    folder = run_training(cfg, verbose=False)
    assert os.path.exists(os.path.join(folder, "session_model.msgpack"))


def test_pallas_planar_pipeline_run(synth_root, tmp_path):
    """The production input path — planar arenas + the Pallas fused
    preprocess (interpreter on CPU) — through the full training loop,
    on the 8-virtual-device mesh with the replicated-arena gather."""
    import dataclasses
    import json

    cfg = _tiny_cfg(synth_root, tmp_path, epochs=1,
                    augment=True, pallas_preprocess="on")
    folder = run_training(cfg, verbose=False)
    json_files = [n for n in os.listdir(folder)
                  if n.endswith(".json") and n[0].isdigit()]
    with open(os.path.join(folder, json_files[0])) as f:
        [rec] = [json.loads(line) for line in f if line.strip()]
    assert rec["total"] > 0 and "auc" in rec


def test_single_device_early_arena_commit(synth_root, tmp_path, monkeypatch):
    """On one device the uint8 arenas ship from the decode thread (the
    link transfer overlaps decode + compiles); training results must be
    identical to the post-join commit path."""
    import jax

    real = jax.devices()

    monkeypatch.setattr(jax, "devices", lambda *a: real[:1])
    # threshold 0: the tiny arena must still take the early-commit path
    # (production gates it to >=1 GB where the fence compile pays off)
    cfg = _tiny_cfg(synth_root, tmp_path, epochs=1, early_commit_min_bytes=0)
    folder = run_training(cfg, verbose=False)
    names = os.listdir(folder)
    assert "session_model.msgpack" in names
    json_files = [n for n in names if n.endswith(".json") and n[0].isdigit()]
    with open(os.path.join(folder, json_files[0])) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    assert len(recs) == 1 and 0 <= recs[0]["accuracy"] <= 1


def test_resume_follows_artifact_image_size(trained, synth_root, tmp_path):
    """Resuming a folder whose model artifact was trained at a different
    image size must follow the checkpoint (the flatten Dense is
    size-locked) — found driving an imported 96px reference checkpoint
    with the default 224 data config."""
    folder, cfg = trained
    import dataclasses

    resumed_cfg = dataclasses.replace(
        cfg,
        epochs=1,
        experiment_dir=folder,
        data=dataclasses.replace(cfg.data, image_size=16),  # wrong on purpose
    )
    out = run_training(resumed_cfg, verbose=False)
    assert out == folder  # trained through without a shape error


def test_explain_cli_bench_flag(trained, synth_root, capsys):
    """cli/tone_bias_explain.py --bench: one JSON timing line + the
    triptychs still written (the hardware perf row's vehicle)."""
    from skin_image_analysis_tpu.cli.tone_bias_explain import main

    folder, _cfg = trained
    rc = main([synth_root, folder, "--method", "saliency",
               "--n-images", "2", "--bench"])
    assert rc == 0
    out = capsys.readouterr().out
    bench_lines = [json.loads(l) for l in out.splitlines()
                   if l.startswith("{")]
    assert len(bench_lines) == 1
    rec = bench_lines[0]
    assert rec["method"] == "saliency" and rec["n_images"] == 2
    assert rec["img_per_min"] > 0 and rec["s_per_batch"] > 0
    pngs = [l for l in out.splitlines() if l.startswith("wrote ")]
    assert len(pngs) == 2
    assert os.path.exists(pngs[0].split(" ", 1)[1])


def test_arena_commit_oom_falls_back_to_host_batches(
        synth_root, tmp_path, monkeypatch, capsys):
    """RESOURCE_EXHAUSTED on the device-arena commit degrades that
    split to host-resident batches instead of crashing (measured: the
    1024² flagship's state leaves no HBM for the test arena)."""
    from skin_image_analysis_tpu.data import loader as loader_mod

    def boom(self, sharding=None):
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error (fake)")

    monkeypatch.setattr(loader_mod.HostImageStore, "to_device", boom)
    cfg = _tiny_cfg(synth_root, tmp_path)
    folder = run_training(cfg, verbose=True)
    out = capsys.readouterr().out
    assert "falling back to host-resident batches" in out
    assert os.path.exists(os.path.join(folder, "session_model.msgpack"))
