"""Training entry point (config-driven).

Replaces both reference training harnesses with one CLI (SURVEY.md §3.1/3.3):

    python train.py --preset fcvsr_redsLD_QP37 --lr-root ... --gt-root ...
    python train.py --config my_config.json

Runs the compiled data-parallel train step over all available devices,
checkpoints via orbax at the configured interval, evaluates PSNR/SSIM on a
held-out clip, and logs to CSV + stdout (the reference's TensorBoard/CSV/
TextLoggerHook trio, SURVEY.md §5).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

import numpy as np


def build_model(cfg):
    from fcvsr_tpu.models import FCVSRNet

    if cfg.model.name == "fcvsr":
        return FCVSRNet(n_feats=cfg.model.n_feats, in_channels=cfg.model.in_channels)
    if cfg.model.name == "fcvsr_s":
        return FCVSRNet.small(in_channels=cfg.model.in_channels,
                              n_feats=cfg.model.n_feats)
    if cfg.model.name == "ftvsr":
        from fcvsr_tpu.models.ftvsr import FTVSRNet

        kw = {"mid_channels": cfg.model.n_feats}
        if cfg.model.num_blocks:
            kw["num_blocks"] = cfg.model.num_blocks
        return FTVSRNet(**kw)
    if cfg.model.name == "ttvsr":
        from fcvsr_tpu.models.ftvsr import TTVSRNet

        kw = {"mid_channels": cfg.model.n_feats}
        if cfg.model.num_blocks:
            kw["num_blocks"] = cfg.model.num_blocks
        return TTVSRNet(**kw)
    raise ValueError(f"unknown model {cfg.model.name}")


def build_schedule(cfg):
    from fcvsr_tpu.train import cosine_restart, linear_decay, multistep

    t = cfg.train
    if t.schedule == "cosine_restart":
        return cosine_restart(t.lr, [t.total_iters], [1.0], t.min_lr)
    if t.schedule == "multistep":
        return multistep(t.lr, t.milestones, t.gamma)
    if t.schedule == "linear":
        return linear_decay(t.lr, t.total_iters)
    raise ValueError(t.schedule)


def build_dataset(cfg):
    from fcvsr_tpu.data import ClipFolderDataset, Vimeo90KDataset

    d = cfg.data
    gray = cfg.model.in_channels == 1
    if d.dataset == "vimeo" and d.meta_file:
        return Vimeo90KDataset(d.lr_root, d.gt_root, d.meta_file)
    return ClipFolderDataset(lr_root=d.lr_root, gt_root=d.gt_root,
                             window=cfg.model.num_frames, grayscale=gray,
                             padding=d.window_padding)


def sample_batch(rng, dataset, cfg):
    """FCVSR-style models: (B,T,C,H,W) windows + centre-frame GT.
    Recurrent models (ftvsr/ttvsr): per-frame GT sequences."""
    sequence_gt = cfg.model.name in ("ftvsr", "ttvsr")
    lrs, gts = [], []
    for _ in range(cfg.data.batch_size):
        if sequence_gt:
            lr, gt = dataset.sample_train_sequence(rng, cfg.data.lr_patch)
            gts.append(np.transpose(gt, (0, 3, 1, 2)))   # (T,C,4H,4W)
        elif hasattr(dataset, "sample_train_window"):
            lr, gt = dataset.sample_train_window(rng, cfg.data.lr_patch)
            gts.append(np.transpose(gt, (2, 0, 1)))      # (C,4H,4W)
        else:
            lr, gt = dataset.sample_train(rng, cfg.data.lr_patch)
            gts.append(np.transpose(gt, (2, 0, 1)))
        lrs.append(np.transpose(lr, (0, 3, 1, 2)))       # (T,C,H,W)
    return np.stack(lrs), np.stack(gts)


def main(argv=None):
    parser = argparse.ArgumentParser(description="fcvsr_tpu training")
    parser.add_argument("--preset", type=str, default="")
    parser.add_argument("--config", type=str, default="")
    parser.add_argument("--lr-root", type=str, default="")
    parser.add_argument("--gt-root", type=str, default="")
    parser.add_argument("--meta-file", type=str, default="")
    parser.add_argument("--work-dir", type=str, default="")
    parser.add_argument("--total-iters", type=int, default=0)
    parser.add_argument("--batch-size", type=int, default=0)
    parser.add_argument("--lr-patch", type=int, default=0)
    parser.add_argument("--val-lr-root", type=str, default="",
                        help="periodic eval sequence dir (LR)")
    parser.add_argument("--val-gt-root", type=str, default="")
    # multi-host launch (replaces the reference dist_train.sh / init_dist;
    # see docs/MULTIHOST.md for the per-host invocation recipe)
    parser.add_argument("--multihost", action="store_true",
                        help="initialise jax.distributed before training")
    parser.add_argument("--coordinator", type=str, default="",
                        help="coordinator address host:port (process 0)")
    parser.add_argument("--num-processes", type=int, default=0)
    parser.add_argument("--process-id", type=int, default=-1)
    args = parser.parse_args(argv)

    if args.multihost:
        from fcvsr_tpu.parallel.dist import initialize_multihost

        initialize_multihost(
            coordinator_address=args.coordinator or None,
            num_processes=args.num_processes or None,
            process_id=args.process_id if args.process_id >= 0 else None)

    from fcvsr_tpu.utils.config import ExperimentConfig, preset

    if args.config:
        cfg = ExperimentConfig.from_json(open(args.config).read())
    elif args.preset:
        cfg = preset(args.preset)
    else:
        parser.error("need --preset or --config")
    if args.lr_root:
        cfg.data.lr_root = args.lr_root
    if args.gt_root:
        cfg.data.gt_root = args.gt_root
    if args.meta_file:
        cfg.data.meta_file = args.meta_file
    if args.work_dir:
        cfg.work_dir = args.work_dir
    if args.total_iters:
        cfg.train.total_iters = args.total_iters
    if args.batch_size:
        cfg.data.batch_size = args.batch_size
    if args.lr_patch:
        cfg.data.lr_patch = args.lr_patch

    import jax
    import jax.numpy as jnp

    from fcvsr_tpu.parallel import make_mesh, replicate, shard_batch
    from fcvsr_tpu.train import create_train_state, make_train_step
    from fcvsr_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    work_dir = os.path.join(cfg.work_dir, cfg.name)
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    model = build_model(cfg)
    dataset = build_dataset(cfg)
    schedule = build_schedule(cfg)
    # per-host data stream: distinct sampling stream per process (the
    # DistributedSampler equivalent); params stay host-identical because
    # create_train_state uses the shared cfg seed.
    import jax as _jax

    rng = np.random.default_rng(cfg.train.seed + _jax.process_index())

    mesh = make_mesh()
    n_dev = len(jax.devices())
    if cfg.data.batch_size % n_dev:
        cfg.data.batch_size = max(n_dev, cfg.data.batch_size // n_dev * n_dev)
        print(f"[train] batch rounded to {cfg.data.batch_size} for {n_dev} devices")
    if jax.process_count() > 1:
        # cfg.data.batch_size is the GLOBAL batch; each host samples its
        # local share and shard_batch assembles the global array.
        cfg.data.batch_size //= jax.process_count()

    lr0, gt0 = sample_batch(rng, dataset, cfg)
    state = create_train_state(model, jax.random.PRNGKey(cfg.train.seed),
                               jnp.asarray(lr0[:1]), schedule,
                               betas=cfg.train.betas, use_ema=cfg.train.use_ema)
    ckpt_dir = os.path.join(work_dir, "ckpt")
    state, start = restore_checkpoint(ckpt_dir, state)
    state = replicate(state, mesh)
    train_step = make_train_step(model, cfg.train.loss, mesh=mesh)

    log_path = os.path.join(work_dir, "train_log.csv")
    log_f = open(log_path, "a", newline="")
    logger = csv.writer(log_f)

    def run_eval(it):
        """Periodic PSNR eval over the first validation sequence (the
        EvalIterHook equivalent, SURVEY.md §2.7)."""
        if not (args.val_lr_root and args.val_gt_root):
            return
        from fcvsr_tpu.data import ClipFolderDataset
        from fcvsr_tpu.metrics import calculate_psnr

        ds = ClipFolderDataset(lr_root=args.val_lr_root,
                               gt_root=args.val_gt_root,
                               window=cfg.model.num_frames,
                               grayscale=cfg.model.in_channels == 1)
        import jax.numpy as jnp

        fwd = jax.jit(lambda p, v: model.apply(p, v))
        sequence_out = cfg.model.name in ("ftvsr", "ttvsr")
        psnrs = []
        for i, window, gt in ds.iter_test_windows(ds.sequences[0]):
            x = jnp.asarray(np.transpose(
                window.astype(np.float32) / 255.0, (0, 3, 1, 2))[None])
            sr = np.asarray(fwd(state.params, x))[0]
            if sequence_out:  # recurrent models return the whole window
                sr = sr[sr.shape[0] // 2]
            sr255 = np.clip(np.transpose(sr, (1, 2, 0)) * 255, 0, 255)
            psnrs.append(calculate_psnr(sr255, gt.astype(np.float32)))
            if i >= 7:
                break
        print(f"[eval] iter {it} PSNR {np.mean(psnrs):.4f}", flush=True)
        logger.writerow([it, "eval_psnr", float(np.mean(psnrs))])
        log_f.flush()

    t0 = time.time()
    for it in range(start, cfg.train.total_iters):
        lr_b, gt_b = sample_batch(rng, dataset, cfg)
        batch = shard_batch({"lr": lr_b, "gt": gt_b}, mesh)
        state, metrics = train_step(state, batch["lr"], batch["gt"])
        if (it + 1) % cfg.train.log_interval == 0:
            loss = float(np.asarray(metrics["loss"]))
            dt = time.time() - t0
            print(f"iter {it+1}/{cfg.train.total_iters} loss {loss:.5f} "
                  f"({cfg.train.log_interval / dt:.2f} it/s)", flush=True)
            logger.writerow([it + 1, loss, dt])
            log_f.flush()
            t0 = time.time()
        if (it + 1) % cfg.train.ckpt_interval == 0:
            save_checkpoint(ckpt_dir, it + 1, state)
        if (it + 1) % cfg.train.eval_interval == 0:
            run_eval(it + 1)
    save_checkpoint(ckpt_dir, cfg.train.total_iters, state)
    print("training complete")


if __name__ == "__main__":
    main()
