"""End-to-end tests on the synthetic fixture: CLI -> trainer -> evaluator ->
checkpoint -> resume, with a Nano model variant to keep CPU compiles cheap."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from swinvox_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def fixture_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_e2e")
    cfg = generate_dataset(str(root), n_samples_per_split=(4, 2, 2), n_views=3)
    # Nano variant + cheap settings for CPU
    cfg.NETWORK.COMPUTE_DTYPE = "float32"
    cfg.NETWORK.USE_PALLAS_WINDOW_ATTENTION = False
    cfg.NETWORK.USE_SWIN_T_MULTI_STAGE = False
    cfg.NETWORK.SWIN_T_STAGES = (3,)
    cfg.NETWORK.USE_CROSS_VIEW_ATTENTION = False
    cfg.NETWORK.SWIN_DEPTHS = (1, 1, 1, 1)
    cfg.NETWORK.RESNET_STAGE_DEPTHS = (1, 1, 1)
    cfg.CONST.BATCH_SIZE = 2
    cfg.CONST.N_VIEWS_RENDERING = 2
    cfg.CONST.NUM_WORKER = 2
    cfg.TRAIN.NUM_EPOCHS = 1
    cfg.TRAIN.SAVE_FREQ = 1
    return cfg


def test_train_eval_checkpoint_resume(fixture_cfg, tmp_path):
    import copy

    from swinvox_tpu.train.trainer import test_net, train_net

    cfg = copy.deepcopy(fixture_cfg)
    cfg.DIR.OUT_PATH = str(tmp_path / "out")

    best_iou = train_net(cfg)
    assert best_iou >= 0.0

    # a checkpoint must exist (SAVE_FREQ=1 or new-best)
    run_dirs = os.listdir(cfg.DIR.OUT_PATH)
    assert len(run_dirs) == 1
    ckpt_dir = os.path.join(cfg.DIR.OUT_PATH, run_dirs[0], "checkpoints")
    ckpts = os.listdir(ckpt_dir)
    assert "checkpoint-best.ckpt" in ckpts

    # metrics were logged
    logs = os.path.join(cfg.DIR.OUT_PATH, run_dirs[0], "logs")
    with open(os.path.join(logs, "train.jsonl")) as f:
        tags = {json.loads(line)["tag"] for line in f}
    assert "EncoderDecoder/BatchLoss" in tags

    # standalone test path with the checkpoint
    cfg2 = copy.deepcopy(cfg)
    cfg2.CONST.WEIGHTS = os.path.join(ckpt_dir, "checkpoint-best.ckpt")
    iou = test_net(cfg2)
    assert 0.0 <= iou <= 1.0

    # resume training from the checkpoint (epoch bookkeeping restored)
    cfg3 = copy.deepcopy(cfg)
    cfg3.CONST.WEIGHTS = os.path.join(ckpt_dir, "checkpoint-best.ckpt")
    cfg3.TRAIN.RESUME_TRAIN = True
    cfg3.TRAIN.NUM_EPOCHS = 1  # epoch 0 already done -> no more epochs
    best2 = train_net(cfg3)
    assert best2 >= -1.0


def test_checkpoint_roundtrip_exact(fixture_cfg, tmp_path):
    import jax
    import jax.numpy as jnp

    from swinvox_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from swinvox_tpu.train.state import create_train_state

    cfg = fixture_cfg
    model, state, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, epoch_idx=3, best_iou=0.55, best_epoch=2)

    # perturb, then restore into the perturbed template
    perturbed = state.replace(
        params=jax.tree.map(lambda x: x + 1.0, state.params)
    )
    restored, meta = load_checkpoint(path, perturbed)
    assert meta == {"epoch_idx": 3, "best_iou": 0.55, "best_epoch": 2}
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params,
        state.params,
    )


def test_params_only_export_and_load(fixture_cfg, tmp_path):
    """Deployment artifact: weights-only export (~half the size of the
    training checkpoint, matching the reference's 320 MB params-only
    artifact, README.md:30) loads back through load_checkpoint."""
    import jax

    from swinvox_tpu.train.checkpoint import (
        export_params_only,
        load_checkpoint,
        save_checkpoint,
        save_params_only,
    )
    from swinvox_tpu.train.state import create_train_state

    cfg = fixture_cfg
    model, state, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    full = str(tmp_path / "full.ckpt")
    slim = str(tmp_path / "slim.ckpt")
    save_checkpoint(full, state, epoch_idx=1, best_iou=0.5, best_epoch=1)
    save_params_only(slim, state)
    # params-only drops the Adam moments: noticeably smaller
    assert os.path.getsize(slim) < 0.75 * os.path.getsize(full)

    perturbed = state.replace(
        params=jax.tree.map(lambda x: x + 1.0, state.params)
    )
    restored, meta = load_checkpoint(slim, perturbed)
    assert meta.get("format") == "params-only"
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params,
        state.params,
    )
    # optimizer state untouched by a params-only load
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.opt_states,
        perturbed.opt_states,
    )

    # file->file conversion from an existing full checkpoint is identical
    slim2 = str(tmp_path / "slim2.ckpt")
    export_params_only(full, slim2)
    restored2, _ = load_checkpoint(slim2, perturbed)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored2.params,
        state.params,
    )


def test_cli_config_plumbing(fixture_cfg, tmp_path):
    from swinvox_tpu.cli.runner import build_config, get_args_from_command_line

    args = get_args_from_command_line(
        [
            "--batch-size", "16",
            "--epoch", "7",
            "--n-views", "4",
            "--out", str(tmp_path),
            "--set", "NETWORK.USE_MERGER=false",
            "--set", "TRAIN.GAMMA=0.5",
        ]
    )
    cfg = build_config(args)
    assert cfg.CONST.BATCH_SIZE == 16
    assert cfg.TRAIN.NUM_EPOCHS == 7
    assert cfg.CONST.N_VIEWS_RENDERING == 4
    assert cfg.NETWORK.USE_MERGER is False
    assert cfg.TRAIN.GAMMA == 0.5

    # --weights without --test flips RESUME_TRAIN (reference runner.py:68-71)
    args2 = get_args_from_command_line(["--weights", "/tmp/w.ckpt"])
    cfg2 = build_config(args2)
    assert cfg2.TRAIN.RESUME_TRAIN is True
    args3 = get_args_from_command_line(["--test", "--weights", "/tmp/w.ckpt"])
    cfg3 = build_config(args3)
    assert cfg3.TRAIN.RESUME_TRAIN is False


def test_tuner_prunes_and_reports(tmp_path):
    """Tuner protocol with a stub objective (no real training)."""
    from swinvox_tpu.config import default_config
    from swinvox_tpu.train.tune import tune

    cfg = default_config()
    cfg.DIR.OUT_PATH = str(tmp_path)

    calls = []

    def fake_objective(trial_cfg, n_epochs, report):
        calls.append(trial_cfg.CONST.BATCH_SIZE)
        best = -1.0
        for epoch in range(n_epochs):
            iou = 0.1 * (1 + epoch) * (1.0 if trial_cfg.CONST.BATCH_SIZE == 64 else 0.4)
            best = max(best, iou)
            if report(epoch, iou):
                break
        return best

    result = tune(cfg, n_trials=4, n_epochs=3, objective=fake_objective, seed=1)
    assert len(result["trials"]) == 4
    assert result["best_value"] > 0
    assert os.path.exists(os.path.join(str(tmp_path), "config_best.json"))
    states = {t["state"] for t in result["trials"]}
    assert "COMPLETE" in states


def test_tpe_sampler_concentrates(tmp_path):
    """The native TPE sampler (the reference study's optuna default)
    must beat uniform sampling on a smooth 1-D objective and learn a
    categorical preference."""
    from swinvox_tpu.train.tune import TPESampler, Trial, tune

    # ---- continuous: maximize -(x - 0.3)^2 ------------------------------
    space = {"X": (0.0, 1.0, "uniform")}
    sampler = TPESampler(seed=0, n_startup=4)
    trials = []
    for i in range(30):
        p = sampler.sample(space, trials)
        t = Trial(number=i, params=p)
        t.values = [-((p["X"] - 0.3) ** 2)]
        t.state = "COMPLETE"
        trials.append(t)
    best = max(trials, key=lambda t: t.best_value)
    assert abs(best.params["X"] - 0.3) < 0.1
    late = [t.params["X"] for t in trials[-10:]]
    early = [t.params["X"] for t in trials[:4]]  # the random startups
    mean_dist = lambda xs: sum(abs(x - 0.3) for x in xs) / len(xs)  # noqa
    assert mean_dist(late) < mean_dist(early)

    # ---- categorical: the study converges on the better batch size ------
    from swinvox_tpu.config import default_config

    cfg = default_config()
    cfg.DIR.OUT_PATH = str(tmp_path)

    def fake_objective(trial_cfg, n_epochs, report):
        iou = 0.8 if trial_cfg.CONST.BATCH_SIZE == 64 else 0.2
        report(0, iou)
        return iou

    result = tune(
        cfg, n_trials=10, n_epochs=1, objective=fake_objective, seed=0,
        sampler="tpe",
    )
    assert result["best_params"]["CONST.BATCH_SIZE"] == 64
    late_picks = [t["params"]["CONST.BATCH_SIZE"]
                  for t in result["trials"][-5:]]
    assert late_picks.count(64) >= 3


def test_lr_finder(fixture_cfg, tmp_path):
    import copy

    from swinvox_tpu.train.lr_finder import find_lr, suggest_lr

    cfg = copy.deepcopy(fixture_cfg)
    cfg.DIR.OUT_PATH = str(tmp_path)
    cfg.LR_FINDER.NUM_BATCHES_TO_TEST = 8
    lr = find_lr(cfg)
    assert cfg.LR_FINDER.START_LR <= lr <= cfg.LR_FINDER.END_LR
    assert os.path.exists(tmp_path / "lr_finder.png")

    # suggestion logic: steepest descent before the minimum (central
    # differences put the steepest gradient at index 3: (0.3-0.9)/1.0)
    lrs = [10.0 ** (-7 + i * 0.5) for i in range(10)]
    losses = [1.0, 0.95, 0.9, 0.7, 0.3, 0.25, 0.24, 0.5, 2.0, 9.0]
    s = suggest_lr(lrs, losses)
    assert s in (lrs[3], lrs[4])


def test_train_with_device_augment(fixture_cfg, tmp_path):
    """train_net end to end with TRAIN.DEVICE_AUGMENT: the loader ships
    raw renders + params and the jitted on-device augmentation feeds the
    step (trainer.py _augment_jit)."""
    import copy

    from swinvox_tpu.train.trainer import train_net

    cfg = copy.deepcopy(fixture_cfg)
    cfg.DIR.OUT_PATH = str(tmp_path / "out_devaug")
    cfg.TRAIN.DEVICE_AUGMENT = True
    best_iou = train_net(cfg)
    assert best_iou >= 0.0
