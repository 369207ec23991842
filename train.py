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
    if cfg.model.name == "realbasicvsr":
        from fcvsr_tpu.models.real_basicvsr import RealBasicVSRNet

        kw = {"mid_channels": cfg.model.n_feats}
        if cfg.model.num_blocks:
            kw["num_propagation_blocks"] = cfg.model.num_blocks
            kw["num_cleaning_blocks"] = cfg.model.num_blocks
        return RealBasicVSRNet(**kw)
    if cfg.model.name == "glean":
        from fcvsr_tpu.models.glean import GLEANStyleGANv2

        return GLEANStyleGANv2(
            in_size=cfg.model.in_size or 32,
            out_size=cfg.model.out_size or 256,
            rrdb_channels=cfg.model.n_feats,
            num_rrdbs=cfg.model.num_blocks or 23)
    if cfg.model.name == "dic":
        from fcvsr_tpu.models.dic import DICNet

        kw = {"mid_channels": cfg.model.n_feats,
              "hg_num_keypoints": cfg.model.hg_num_keypoints}
        if cfg.model.num_steps:
            kw["num_steps"] = cfg.model.num_steps
        if cfg.model.num_blocks:
            kw["num_blocks"] = cfg.model.num_blocks
        return DICNet(**kw)
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


def _build_discriminator(cfg):
    """Discriminator module + its NHWC input builder for the GAN families."""
    if cfg.gan.disc == "none":
        return None
    if cfg.gan.disc == "unet_sn":
        from fcvsr_tpu.models.discriminators import \
            UNetDiscriminatorWithSpectralNorm

        return UNetDiscriminatorWithSpectralNorm(
            mid_channels=max(cfg.model.n_feats, 8))
    if cfg.gan.disc == "stylegan2":
        from fcvsr_tpu.models.stylegan2 import StyleGAN2Discriminator

        return StyleGAN2Discriminator(in_size=cfg.model.out_size or 256)
    if cfg.gan.disc == "lightcnn":
        from fcvsr_tpu.models.discriminators import LightCNN

        return LightCNN()
    raise ValueError(f"unknown discriminator {cfg.gan.disc}")


def run_gan_training(cfg, args):
    """Two-optimizer adversarial training for realbasicvsr / glean / dic
    (mmedit restorers/real_basicvsr.py:76-200, glean.py:1-83, dic.py:94-131).

    Single-device by design: the GAN recipes train with small global batches
    and their alternating-update state is a plain tuple; DP sharding of this
    path is future work (the pixel-loss families cover the mesh path)."""
    import jax
    import jax.numpy as jnp
    import optax

    from fcvsr_tpu.data import ClipFolderDataset
    from fcvsr_tpu.models.gan_restorer import GANRestorer

    work_dir = os.path.join(cfg.work_dir, cfg.name)
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    rng = np.random.default_rng(cfg.train.seed)
    gen = build_model(cfg)
    disc = _build_discriminator(cfg)
    is_video = cfg.model.name == "realbasicvsr"
    is_dic = cfg.model.name == "dic"
    if is_dic:
        scale = 8
    elif cfg.model.name == "glean":
        scale = (cfg.model.out_size or 256) // (cfg.model.in_size or 32)
    else:
        scale = 4

    # ---- data ----
    if cfg.data.degradations:
        # LQ synthesized from GT sequences by the second-order chain
        from fcvsr_tpu.data.degradations import (
            degrade_sequence, realbasicvsr_degradation_chain)

        chain = realbasicvsr_degradation_chain()
        gt_ds = ClipFolderDataset(lr_root=cfg.data.gt_root,
                                  gt_root=cfg.data.gt_root,
                                  window=cfg.model.num_frames, scale=1)

        def sample(rng):
            lqs, gts = [], []
            for _ in range(cfg.data.batch_size):
                gt, _ = gt_ds.sample_train_sequence(
                    rng, 4 * cfg.data.lr_patch)
                lq = degrade_sequence(chain, gt, 4)
                lqs.append(np.transpose(lq, (0, 3, 1, 2)))
                gts.append(np.transpose(gt, (0, 3, 1, 2)))
            return np.stack(lqs), np.stack(gts)
    else:
        ds = ClipFolderDataset(lr_root=cfg.data.lr_root,
                               gt_root=cfg.data.gt_root,
                               window=cfg.model.num_frames, scale=scale)

        def sample(rng):
            lqs, gts = [], []
            for _ in range(cfg.data.batch_size):
                if is_video:
                    lq, gt = ds.sample_train_sequence(rng, cfg.data.lr_patch)
                    lqs.append(np.transpose(lq, (0, 3, 1, 2)))
                    gts.append(np.transpose(gt, (0, 3, 1, 2)))
                else:  # image families: centre frame only
                    lq, gt = ds.sample_train_window(rng, cfg.data.lr_patch)
                    lqs.append(np.transpose(lq[lq.shape[0] // 2], (2, 0, 1)))
                    gts.append(np.transpose(gt, (2, 0, 1)))
            return np.stack(lqs), np.stack(gts)

    lq0, gt0 = sample(rng)
    g_params = gen.init(jax.random.PRNGKey(cfg.train.seed),
                        jnp.asarray(lq0[:1]))
    d_params = None
    if disc is not None:
        d_shape = (1,) + tuple(gt0.shape[-2:]) + (gt0.shape[-3],) \
            if not is_video else (1, gt0.shape[-2], gt0.shape[-1], 3)
        d_params = disc.init(jax.random.PRNGKey(cfg.train.seed + 1),
                             jnp.zeros(d_shape, jnp.float32))

    g_tx = optax.adam(cfg.train.lr, b1=cfg.train.betas[0],
                      b2=cfg.train.betas[1])
    d_tx = optax.adam(cfg.gan.disc_lr, b1=cfg.train.betas[0],
                      b2=cfg.train.betas[1])

    if is_dic:
        # DIC multi-step supervision; landmark (align) loss needs annotation
        # data the folder datasets don't carry — pixel steps only here, the
        # aligned variant is exercised in tests/test_zoo_new.py::dic_losses.
        def generator_loss(gp, dp, lq, gt):
            sr_list, _ = gen.apply(gp, lq)
            logs = {}
            total = 0.0
            for k, sr in enumerate(sr_list):  # dic_losses pixel terms
                lp = jnp.abs(sr - gt).mean() * cfg.gan.pixel_loss_weight
                logs[f"loss_pixel_v{k}"] = lp
                total += lp
            if disc is not None:
                from fcvsr_tpu.train.gan_losses import gan_loss

                fake = disc.apply(dp, jnp.transpose(
                    sr_list[-1], (0, 2, 3, 1)))
                lg = gan_loss(fake, True, cfg.gan.gan_type,
                              loss_weight=cfg.gan.gan_loss_weight)
                total += lg
                logs["loss_gan"] = lg
            return total, (logs,
                           jax.lax.stop_gradient(jnp.transpose(
                               sr_list[-1], (0, 2, 3, 1))))

        rest = GANRestorer(
            generator_apply=lambda p, x: gen.apply(p, x),
            disc_apply=(lambda p, x: disc.apply(p, x)) if disc else None,
            gan_type=cfg.gan.gan_type)
        rest.generator_loss = generator_loss
    else:
        cleaning = cfg.gan.cleaning_loss_weight if is_video else 0.0

        def g_apply(p, x):
            if is_video and cleaning > 0:
                return gen.apply(p, x, return_lqs=True)
            return gen.apply(p, x)

        rest = GANRestorer(
            generator_apply=g_apply,
            disc_apply=(lambda p, x: disc.apply(p, x)) if disc else None,
            gan_type=cfg.gan.gan_type,
            gan_loss_weight=cfg.gan.gan_loss_weight,
            pixel_loss_weight=cfg.gan.pixel_loss_weight,
            cleaning_loss_weight=cleaning,
            disc_steps=cfg.gan.disc_steps,
            disc_init_steps=cfg.gan.disc_init_steps,
            relativistic=cfg.gan.relativistic)

    step = rest.make_train_step(g_tx, d_tx)
    state = (g_params, d_params, g_tx.init(g_params),
             d_tx.init(d_params) if d_params is not None else None,
             jnp.int32(0))

    from fcvsr_tpu.utils.checkpoint import (restore_gan_checkpoint,
                                            save_gan_checkpoint)

    ckpt_dir = os.path.join(work_dir, "ckpt")
    state, start = restore_gan_checkpoint(ckpt_dir, state)
    log_f = open(os.path.join(work_dir, "train_log.csv"), "a", newline="")
    logger = csv.writer(log_f)
    tb = _make_tb(work_dir, getattr(args, "tensorboard", False))
    t0 = time.time()
    for it in range(start, cfg.train.total_iters):
        lq_b, gt_b = sample(rng)
        state, logs = step(state, jnp.asarray(lq_b), jnp.asarray(gt_b))
        if (it + 1) % cfg.train.log_interval == 0:
            msg = " ".join(f"{k} {float(np.asarray(v)):.5f}"
                           for k, v in sorted(logs.items()))
            print(f"iter {it+1}/{cfg.train.total_iters} {msg}", flush=True)
            logger.writerow([it + 1] + [float(np.asarray(v))
                                        for _, v in sorted(logs.items())])
            log_f.flush()
            if tb is not None:
                for k, v in sorted(logs.items()):
                    tb.add_scalar(f"train/{k}", float(np.asarray(v)), it + 1)
        if (it + 1) % cfg.train.ckpt_interval == 0 or \
                (it + 1) == cfg.train.total_iters:
            save_gan_checkpoint(ckpt_dir, it + 1, state)
    print(f"training complete ({time.time() - t0:.1f}s)")


def _make_tb(work_dir: str, enabled: bool):
    """Optional TensorBoard scalars (reference parity: CVSR_train logs TB
    via SummaryWriter, train_LD_freqCVSR_22.py:227,258,278-279).  Gated on
    the flag + import so the CSV log remains the canonical record."""
    if not enabled:
        return None
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        print("[tb] torch.utils.tensorboard unavailable; skipping")
        return None
    return SummaryWriter(os.path.join(work_dir, "tb"))


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
    parser.add_argument("--load-from", type=str, default="",
                        help="params-only warm start (ckpt dir or torch "
                             ".npz)")
    parser.add_argument("--resume-from", type=str, default="",
                        help="full-state resume from an explicit ckpt dir")
    # multi-host launch (replaces the reference dist_train.sh / init_dist;
    # see docs/MULTIHOST.md for the per-host invocation recipe)
    parser.add_argument("--fast", action="store_true",
                        help="train through the fused Pallas kernels, "
                             "both directions.  DCN families (EDVR/"
                             "BasicVSR++/TDAN/IconVSR): set_dcn_impl("
                             "'pallas') + set_dcn_bwd('fused').  FCVSR: "
                             "warp_impl='pallas' + set_iac_bwd('fused') "
                             "— the fused IAC chain adjoint kernels "
                             "(measured 24.5 vs 28.9 ms/step exact, S "
                             "64px b2 on TPU; fused fwd + gather VJP "
                             "was 30.8).  Gradients match the exact VJP "
                             "on the same primal to fp accumulation "
                             "(~3e-4); the fused primal itself is "
                             "fp-different from the gather forward.  "
                             "Use --warp-impl gather to keep the exact "
                             "warp under --fast")
    parser.add_argument("--warp-impl", type=str, default="",
                        choices=["", "gather", "pallas"],
                        help="override FCVSR warp_impl for training "
                             "(fused kernels are grad-legal via their "
                             "custom VJPs; gradients stay exact-path)")
    parser.add_argument("--tensorboard", action="store_true",
                        help="also log scalars to <work_dir>/tb "
                             "(reference SummaryWriter parity)")
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
    if args.load_from:
        cfg.train.load_from = args.load_from
    if args.resume_from:
        cfg.train.resume_from = args.resume_from

    if args.fast:
        from fcvsr_tpu.ops.dcn import set_dcn_bwd, set_dcn_impl

        set_dcn_impl("pallas")
        # fused adjoint kernel for the backward too (ops/pallas_dcn.py::
        # _bwd_kernel) — without it grad-mode pays pallas_fwd + gather_fwd
        # + gather_bwd and the gather backward dominates the step
        set_dcn_bwd("fused")

    if cfg.model.name in ("realbasicvsr", "glean", "dic"):
        run_gan_training(cfg, args)
        return

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
    warp_impl = args.warp_impl
    if not warp_impl and args.fast and cfg.model.name in ("fcvsr", "fcvsr_s"):
        warp_impl = "pallas"  # fused IAC + fused adjoints (see --fast help)
    if warp_impl and cfg.model.name in ("fcvsr", "fcvsr_s"):
        import dataclasses as _dc

        # batch_mgaa stays off: it is an eval-harness batching
        model = _dc.replace(model, warp_impl=warp_impl)
        if warp_impl == "pallas":
            from fcvsr_tpu.ops.sac import set_iac_bwd

            # fused adjoint kernels for the chain backward too — without
            # this the custom VJP re-runs the gather forward and loses
            # (30.8 vs 28.9 ms/step exact; fused bwd wins at 24.5)
            set_iac_bwd("fused")
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
    # reference resume semantics (apis/train.py:233-236 + CVSR_train
    # warm-start train_LD_freqCVSR_22.py:291):
    #   load_from   — params-only warm start (fresh optimizer, iter 0);
    #                 .npz = reference torch state_dict via the converter
    #   resume_from — full state from an explicit checkpoint dir
    #   otherwise   — auto-resume from the work dir
    if cfg.train.load_from:
        if cfg.train.load_from.endswith(".npz"):
            from fcvsr_tpu.utils.torch_import import convert_torch_state_dict

            tsd = dict(np.load(cfg.train.load_from))
            state = state.replace(
                params=convert_torch_state_dict(tsd, state.params))
        else:
            warm, _ = restore_checkpoint(cfg.train.load_from, state)
            state = state.replace(params=warm.params)
        start = 0
    elif cfg.train.resume_from:
        state, start = restore_checkpoint(cfg.train.resume_from, state)
    else:
        state, start = restore_checkpoint(ckpt_dir, state)
    state = replicate(state, mesh)
    train_step = make_train_step(model, cfg.train.loss, mesh=mesh)

    log_path = os.path.join(work_dir, "train_log.csv")
    log_f = open(log_path, "a", newline="")
    logger = csv.writer(log_f)
    tb = _make_tb(work_dir, args.tensorboard)

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
        if tb is not None:
            tb.add_scalar("eval/psnr", float(np.mean(psnrs)), it)

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
            if tb is not None:
                tb.add_scalar("train/loss", loss, it + 1)
                tb.add_scalar("train/iters_per_sec",
                              cfg.train.log_interval / dt, it + 1)
            t0 = time.time()
        if (it + 1) % cfg.train.ckpt_interval == 0:
            save_checkpoint(ckpt_dir, it + 1, state)
        if (it + 1) % cfg.train.eval_interval == 0:
            run_eval(it + 1)
    save_checkpoint(ckpt_dir, cfg.train.total_iters, state)
    print("training complete")


if __name__ == "__main__":
    main()
