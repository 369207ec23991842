"""End-to-end integration: train a few iterations on synthetic data across the
8-device CPU mesh, checkpoint, restore, and evaluate through the test CLI
machinery (the reference's train->ckpt->test cycle, SURVEY.md §3)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("clips")
    rng = np.random.default_rng(0)
    lr_root, gt_root = root / "lr", root / "gt"
    for seq in ["seq_0", "seq_1"]:
        (lr_root / seq).mkdir(parents=True)
        (gt_root / seq).mkdir(parents=True)
        for i in range(8):
            lr = rng.integers(0, 255, (16, 20, 3), dtype=np.uint8)
            gt = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
            Image.fromarray(lr).save(lr_root / seq / f"{i:08d}.png")
            Image.fromarray(gt).save(gt_root / seq / f"{i:08d}.png")
    return str(lr_root), str(gt_root)


@pytest.mark.slow
def test_train_then_eval_cycle(synthetic_dataset, tmp_path):
    lr_root, gt_root = synthetic_dataset
    work_dir = str(tmp_path / "work")

    import train as train_cli

    train_cli.main([
        "--preset", "fcvsr_s_redsLD_QP37",
        "--lr-root", lr_root, "--gt-root", gt_root,
        "--work-dir", work_dir, "--total-iters", "3", "--batch-size", "8",
        "--lr-patch", "12",
    ])
    ckpt_dir = os.path.join(work_dir, "fcvsr_s_redsLD_QP37", "ckpt")
    assert os.path.isdir(ckpt_dir)

    import test as test_cli

    save_dir = str(tmp_path / "out")
    test_cli.main([
        "--preset", "fcvsr_s_redsLD_QP37",
        "--lr-root", lr_root, "--gt-root", gt_root,
        "--checkpoint", ckpt_dir, "--save-dir", save_dir,
        "--seqs", "seq_0",
    ])
    pngs = os.listdir(os.path.join(save_dir, "seq_0"))
    assert len(pngs) == 8


def test_config_presets_roundtrip():
    from fcvsr_tpu.utils.config import ExperimentConfig, PRESET_NAMES, preset

    assert len(PRESET_NAMES) == 36  # 24 FCVSR + 7 FTVSR + 5 GAN-family
    for name in ["fcvsr_redsLD_QP37", "fcvsr_s_cvcpLD_QP22", "fcvsr_vimeoLD_QP27"]:
        cfg = preset(name)
        back = ExperimentConfig.from_json(cfg.to_json())
        assert back.name == cfg.name
        assert back.train.lr == cfg.train.lr
        assert back.data.qp == cfg.data.qp
    cvcp = preset("fcvsr_cvcpLD_QP22")
    assert cvcp.model.in_channels == 1
    assert cvcp.train.loss == "charbonnier_sum"
    assert cvcp.train.lr == 0.5e-5
    reds = preset("fcvsr_redsLD_QP37")
    assert reds.model.in_channels == 3
    assert reds.train.schedule == "cosine_restart"


@pytest.mark.slow
def test_ftvsr_preset_trains_one_iter(tmp_path):
    """The FTVSR presets must actually train (sequence-GT path): tiny model
    via --config override, two optimizer iterations through the CLI.
    Needs >=64px frames (SpyNet pyramid)."""
    from PIL import Image

    rng = np.random.default_rng(3)
    lr_root = str(tmp_path / "lr")
    gt_root = str(tmp_path / "gt")
    for seq in ["seq_0"]:
        os.makedirs(os.path.join(lr_root, seq))
        os.makedirs(os.path.join(gt_root, seq))
        for i in range(6):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
                os.path.join(lr_root, seq, f"{i:08d}.png"))
            Image.fromarray(rng.integers(0, 255, (256, 256, 3),
                                         np.uint8)).save(
                os.path.join(gt_root, seq, f"{i:08d}.png"))

    from fcvsr_tpu.utils.config import preset

    cfg = preset("ftvsr_cvcpLD_QP37")
    cfg.model.n_feats = 8
    cfg.model.num_blocks = 2
    cfg.model.num_frames = 5
    cfg.data.batch_size = 8
    cfg.data.lr_patch = 64
    cfg.train.total_iters = 2
    cfg.train.log_interval = 1
    cfg_path = tmp_path / "ftvsr_tiny.json"
    cfg_path.write_text(cfg.to_json())

    import train as train_cli

    train_cli.main([
        "--config", str(cfg_path),
        "--lr-root", lr_root, "--gt-root", gt_root,
        "--work-dir", str(tmp_path / "work"),
    ])
    assert os.path.isdir(os.path.join(tmp_path, "work", cfg.name, "ckpt"))


def _make_pair_tree(root, n_frames, lr_hw, gt_hw, seed=5):
    from PIL import Image

    rng = np.random.default_rng(seed)
    lr_root, gt_root = os.path.join(root, "lr"), os.path.join(root, "gt")
    for seq in ["seq_0"]:
        os.makedirs(os.path.join(lr_root, seq))
        os.makedirs(os.path.join(gt_root, seq))
        for i in range(n_frames):
            Image.fromarray(rng.integers(0, 255, lr_hw + (3,),
                                         np.uint8)).save(
                os.path.join(lr_root, seq, f"{i:08d}.png"))
            Image.fromarray(rng.integers(0, 255, gt_hw + (3,),
                                         np.uint8)).save(
                os.path.join(gt_root, seq, f"{i:08d}.png"))
    return lr_root, gt_root


@pytest.mark.slow
def test_realbasicvsr_preset_trains(tmp_path):
    """RealBasicVSR CLI path: GT-only data, on-the-fly second-order
    degradations, GANRestorer two-optimizer step (VERDICT r2 item 5)."""
    np.random.seed(0)  # the degradation chain uses the global stream
    # SpyNet's 6-level pyramid needs >=32px LQ patches
    _, gt_root = _make_pair_tree(str(tmp_path), 6, (64, 64), (256, 256))

    from fcvsr_tpu.utils.config import preset

    cfg = preset("realbasicvsr_reds")
    cfg.model.n_feats = 8
    cfg.model.num_blocks = 1
    cfg.model.num_frames = 3
    cfg.data.gt_root = gt_root
    cfg.data.batch_size = 1
    cfg.data.lr_patch = 64
    cfg.train.total_iters = 2
    cfg.train.log_interval = 1
    cfg.train.ckpt_interval = 2
    cfg.work_dir = str(tmp_path / "work")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    import train as train_cli

    train_cli.main(["--config", cfg_path])
    assert os.path.isdir(os.path.join(cfg.work_dir, cfg.name, "ckpt"))


@pytest.mark.slow
def test_realbasicvsr_wogan_preset_trains(tmp_path):
    """The generator-only (wogan pre-training) stage: no discriminator."""
    # the degradation chain draws from the GLOBAL np.random stream
    # (reference parity: mmcv transforms do the same) — seed it so the
    # smoke is reproducible
    np.random.seed(0)
    _, gt_root = _make_pair_tree(str(tmp_path), 6, (64, 64), (256, 256))

    from fcvsr_tpu.utils.config import preset

    cfg = preset("realbasicvsr_wogan_reds")
    cfg.model.n_feats = 8
    cfg.model.num_blocks = 1
    cfg.model.num_frames = 3
    cfg.data.gt_root = gt_root
    cfg.data.batch_size = 1
    cfg.data.lr_patch = 64
    cfg.train.total_iters = 2
    cfg.train.log_interval = 1
    cfg.train.ckpt_interval = 2
    cfg.work_dir = str(tmp_path / "work")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    import train as train_cli

    train_cli.main(["--config", cfg_path])
    assert os.path.isdir(os.path.join(cfg.work_dir, cfg.name, "ckpt"))


@pytest.mark.slow
def test_glean_preset_trains(tmp_path):
    """GLEAN CLI path: StyleGAN2 generator+discriminator two-optimizer."""
    lr_root, gt_root = _make_pair_tree(str(tmp_path), 3, (8, 8), (32, 32))

    from fcvsr_tpu.utils.config import preset

    cfg = preset("glean_cat_8x")
    cfg.model.in_size = 8
    cfg.model.out_size = 32
    cfg.model.n_feats = 8
    cfg.model.num_blocks = 1
    cfg.model.num_frames = 1
    cfg.data.lr_root = lr_root
    cfg.data.gt_root = gt_root
    cfg.data.batch_size = 1
    cfg.data.lr_patch = 8
    cfg.train.total_iters = 2
    cfg.train.log_interval = 1
    cfg.train.ckpt_interval = 2
    cfg.work_dir = str(tmp_path / "work")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    import train as train_cli

    train_cli.main(["--config", cfg_path])
    assert os.path.isdir(os.path.join(cfg.work_dir, cfg.name, "ckpt"))


@pytest.mark.slow
def test_dic_preset_trains(tmp_path):
    """DIC CLI path: feedback hourglass, multi-step pixel losses (+LightCNN
    adversary for the gan variant)."""
    lr_root, gt_root = _make_pair_tree(str(tmp_path), 3, (16, 16), (128, 128))

    from fcvsr_tpu.utils.config import preset

    cfg = preset("dic_celeba")
    cfg.model.n_feats = 8
    cfg.model.num_blocks = 2
    cfg.model.num_steps = 2
    cfg.model.num_frames = 1
    cfg.data.lr_root = lr_root
    cfg.data.gt_root = gt_root
    cfg.data.batch_size = 1
    cfg.train.total_iters = 2
    cfg.train.log_interval = 1
    cfg.train.ckpt_interval = 2
    cfg.work_dir = str(tmp_path / "work")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    import train as train_cli

    train_cli.main(["--config", cfg_path])
    assert os.path.isdir(os.path.join(cfg.work_dir, cfg.name, "ckpt"))


@pytest.mark.slow
def test_warm_start_and_explicit_resume(synthetic_dataset, tmp_path):
    """load_from = params-only warm start (iter 0, fresh optimizer);
    resume_from = full state from an explicit dir (reference
    apis/train.py:233-236 / CVSR_train warm-start semantics)."""
    lr_root, gt_root = synthetic_dataset
    work_a = str(tmp_path / "a")

    import train as train_cli

    common = ["--preset", "fcvsr_s_redsLD_QP37", "--lr-root", lr_root,
              "--gt-root", gt_root, "--total-iters", "2",
              "--batch-size", "8", "--lr-patch", "12"]
    train_cli.main(common + ["--work-dir", work_a])
    ckpt_a = os.path.join(work_a, "fcvsr_s_redsLD_QP37", "ckpt")

    # warm start into a fresh work dir: runs iters 0..2 again (params-only)
    work_b = str(tmp_path / "b")
    train_cli.main(common + ["--work-dir", work_b, "--load-from", ckpt_a])
    assert os.path.isdir(os.path.join(work_b, "fcvsr_s_redsLD_QP37", "ckpt"))

    # explicit resume: start == saved iters -> no new work, completes
    work_c = str(tmp_path / "c")
    train_cli.main(common + ["--work-dir", work_c, "--resume-from", ckpt_a])
    assert os.path.isdir(os.path.join(work_c, "fcvsr_s_redsLD_QP37", "ckpt"))


@pytest.mark.slow
def test_train_fast_flag_uses_pallas_kernels(synthetic_dataset, tmp_path):
    """`train.py --fast` routes FCVSR training through the fused Pallas
    IAC (interpret mode on CPU) with the fused adjoint kernels
    (set_iac_bwd('fused') — measured 24.5 vs 28.9 ms/step exact on TPU):
    at --lr-patch 16 the MGAA IAC runs at 16 rows, which satisfies the
    fused kernel's tiling contract, so this exercises the real
    kernel-under-grad path."""
    lr_root, gt_root = synthetic_dataset
    work_dir = str(tmp_path / "work")

    import train as train_cli

    train_cli.main([
        "--preset", "fcvsr_s_redsLD_QP37",
        "--lr-root", lr_root, "--gt-root", gt_root,
        "--work-dir", work_dir, "--total-iters", "2", "--batch-size", "8",
        "--lr-patch", "16", "--fast",
    ])
    assert os.path.isdir(
        os.path.join(work_dir, "fcvsr_s_redsLD_QP37", "ckpt"))


@pytest.mark.slow
def test_eval_fast_flag_deployment_path(synthetic_dataset, tmp_path):
    """`test.py --fast` composes the full deployment flag set (pallas IAC +
    batch_mgaa + rows_bf16 SCNet + bf16/folded tail + bf16 IAC chain +
    bf16 spectral head) end-to-end through the eval CLI (interpret-mode
    kernels on CPU; 16-row frames satisfy the fused tiling contract)."""
    lr_root, gt_root = synthetic_dataset

    import test as test_cli

    save_dir = str(tmp_path / "out_fast")
    test_cli.main([
        "--preset", "fcvsr_s_redsLD_QP37",
        "--lr-root", lr_root, "--gt-root", gt_root,
        "--save-dir", save_dir, "--seqs", "seq_0", "--fast",
    ])
    pngs = os.listdir(os.path.join(save_dir, "seq_0"))
    assert len(pngs) == 8
