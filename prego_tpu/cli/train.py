"""Recognition train/eval entry point.

Parity surface: step_recognition/main.py —

  train:  python -m prego_tpu.cli.train --config configs/miniroad_assembly101-O.yaml
  eval:   python -m prego_tpu.cli.train --config ... --eval path/to/best.ckpt

Behavior kept from the reference: YAML + CLI merge (CLI wins), set_seed(20),
per-epoch window resampling (main.py:100), best-checkpoint save on mAP
improvement and best_{mAP}.ckpt rename at the end (main.py:103-115), and on
--eval the per-frame prediction JSON export in the reference's schema
(default path output_miniRoad/output_miniROAD.json, eval.py:60-64 — kept as
the default, made configurable). Fixed, not kept: the broken FPS timer
(eval.py:35-36,77) and the hardcoded cuda device (main.py:33).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time
from typing import List, Optional

import jax
import numpy as np

from prego_tpu.checkpoint import load_params, save_checkpoint
from prego_tpu.core import RecognitionConfig, create_outdir, get_logger, set_seed
from prego_tpu.data import WindowSampler, load_dataset_info, load_feature_store
import prego_tpu.models  # noqa: F401 — populates the MODELS registry
from prego_tpu.train import (
    Evaluator,
    build_optimizer,
    make_train_step,
    train_one_epoch,
    warmup_cosine_schedule,
)


def main(argv: Optional[List[str]] = None) -> float:
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(add_help=True)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument(
        "--resume", type=str, default=None,
        help="checkpoint to resume training from (params+opt_state+epoch)",
    )
    args, overrides = parser.parse_known_args(argv)
    cfg = RecognitionConfig.from_yaml(args.config, overrides)

    root_key = set_seed(cfg.seed)
    info = load_dataset_info(cfg.video_list_path, cfg.data_name)

    identifier = (
        f"{cfg.model}_{cfg.data_name}_{cfg.feature_pretrained}_flow{not cfg.no_flow}"
    )
    result_path = create_outdir(osp.join(cfg.output_path, identifier))
    logger = get_logger(result_path)
    logger.info(str(cfg.to_dict()))
    logger.info(f"devices: {jax.devices()}")

    common = dict(
        root_path=cfg.root_path,
        rgb_type=cfg.rgb_type,
        flow_type=cfg.flow_type,
        annotation_type=cfg.annotation_type,
        num_classes=cfg.num_classes,
        window_size=cfg.window_size,
        logger=logger,
    )
    data_backend = cfg.get("data_backend", "numpy")
    if data_backend == "native":
        from prego_tpu.data.native_loader import NativeRecognitionData
        from prego_tpu.native import build_native_library, native_available

        if not (native_available() or build_native_library()):
            raise SystemExit(
                "data_backend=native requires libprego_native.so "
                "(make -C prego_tpu/native)"
            )
        nc = {k: v for k, v in common.items()}
        test_store = NativeRecognitionData(
            root_path=nc.pop("root_path"), vids=info.test_session_set,
            training=False, **nc,
        )
    else:
        test_store = load_feature_store(
            vids=info.test_session_set, training=False, **common
        )
    from prego_tpu.core.registry import MODELS

    model = MODELS.get(cfg.model)(cfg)
    # task dispatch mirrors the reference's build_trainer/build_eval
    # registries (trainer/{train_builder,eval_builder}.py)
    if cfg.task == "ANTICIPATION":
        from prego_tpu.train.evaluator import AntEvaluator

        evaluator = AntEvaluator(cfg, info.class_index, logger=logger)
    else:
        evaluator = Evaluator(cfg, info.class_index, logger=logger)

    if cfg.eval is not None:
        params = load_params(cfg.eval)
        if cfg.task == "ANTICIPATION":
            mAP, _ = evaluator(model, params, test_store)
        else:
            export = osp.join(cfg.eval_output_dir, cfg.eval_output_name)
            mAP, _ = evaluator(model, params, test_store, export_json=export)
            logger.info(f"per-frame predictions exported to {export}")
        logger.info(f"{cfg.task} result: {mAP * 100:.2f} m{cfg.metric}")
        return mAP

    if data_backend == "native":
        from prego_tpu.data.native_loader import (
            NativeRecognitionData,
            NativeWindowSampler,
        )

        native_common = {k: v for k, v in common.items()}
        train_data = NativeRecognitionData(
            root_path=native_common.pop("root_path"),
            vids=info.train_session_set,
            training=True,
            **native_common,
        )
        train_store = train_data  # exposes flow_is_zero like FeatureStore
        sampler = NativeWindowSampler(train_data, cfg.window_size, cfg.stride)
        if cfg.task == "ANTICIPATION":
            raise SystemExit("ANTICIPATION training uses the numpy data backend")
    else:
        train_store = load_feature_store(
            vids=info.train_session_set, training=True, **common
        )
        if cfg.task == "ANTICIPATION":
            from prego_tpu.data.windowing import AnticipationWindowSampler

            sampler = AnticipationWindowSampler(
                train_store, cfg.window_size, cfg.stride, cfg.anticipation_length
            )
        else:
            sampler = WindowSampler(train_store, cfg.window_size, cfg.stride)
    np_rng = np.random.default_rng(cfg.seed)
    sampler.resample(np_rng)

    schedule = (
        warmup_cosine_schedule(
            cfg.lr, cfg.num_epoch * sampler.num_batches(cfg.batch_size)
        )
        if cfg.lr_scheduler
        else None
    )
    optimizer = build_optimizer(cfg, schedule)
    params = model.init(root_key)
    opt_state = optimizer.init(params)
    start_epoch = 1
    rng = jax.random.fold_in(root_key, 1)
    if args.resume:
        from prego_tpu.checkpoint import load_checkpoint

        ckpt = load_checkpoint(args.resume)
        params = ckpt["params"]
        if ckpt["opt_state"] is not None:
            opt_state = jax.tree.unflatten(
                jax.tree.structure(opt_state), jax.tree.leaves(ckpt["opt_state"])
            )
        start_epoch = int(ckpt["epoch"]) + 1
        if ckpt["rng"] is not None:
            rng = jax.numpy.asarray(ckpt["rng"])
        logger.info(f"resumed from {args.resume} at epoch {start_epoch}")
    if cfg.task == "ANTICIPATION":
        from prego_tpu.train.trainer import make_ant_train_step

        train_step = make_ant_train_step(
            model, optimizer, flow_is_zero=train_store.flow_is_zero, bf16=cfg.amp
        )
    else:
        train_step = make_train_step(
            model, optimizer, flow_is_zero=train_store.flow_is_zero, bf16=cfg.amp,
            gru_backend=cfg.get("train_gru_backend", "scan"),
            logger=logger,
        )

    n_params = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))
    logger.info(f"Dataset: {cfg.data_name},  Model: {cfg.model}")
    logger.info(
        f"lr:{cfg.lr} | Weight Decay:{cfg.weight_decay} | Window Size:{cfg.window_size} "
        f"| Batch Size:{cfg.batch_size}"
    )
    logger.info(
        f"Total epoch:{cfg.num_epoch} | Total Params:{n_params / 1e6:.1f} M "
        f"| Optimizer: {cfg.optimizer}"
    )
    logger.info(f"Output Path:{result_path}")

    writer = None
    if cfg.tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(osp.join(result_path, "runs"))
        except Exception as e:  # tensorboard optional
            logger.info(f"tensorboard unavailable: {e}")

    best_mAP, best_epoch = 0.0, 0
    ckpt_path = osp.join(result_path, "ckpts", "best.ckpt")
    for epoch in range(start_epoch, cfg.num_epoch + 1):
        t0 = time.perf_counter()
        if cfg.task == "ANTICIPATION":
            from prego_tpu.train.trainer import ant_train_one_epoch as epoch_fn
        else:
            epoch_fn = train_one_epoch
        params, opt_state, rng, epoch_loss = epoch_fn(
            sampler, model, train_step, params, opt_state, rng,
            cfg.batch_size, epoch, np_rng=np_rng, logger=logger, writer=writer,
        )
        sampler.resample(np_rng)  # redraw window offsets (main.py:100)
        mAP, _ = evaluator(model, params, test_store)
        if writer is not None:
            writer.add_scalar("Eval mAP", mAP, epoch)
        logger.info(
            f"Epoch {epoch} mAP: {mAP * 100:.2f} | loss {epoch_loss:.4f} "
            f"| {time.perf_counter() - t0:.1f}s"
        )
        if mAP > best_mAP:
            best_mAP, best_epoch = mAP, epoch
            save_checkpoint(ckpt_path, params, opt_state, epoch, rng)
            logger.info(
                f"Checkpoint Saved at {ckpt_path} | Best mAP: {best_mAP * 100:.2f} "
                f"at epoch {best_epoch}"
            )

    if osp.exists(ckpt_path):
        os.rename(
            ckpt_path,
            osp.join(result_path, "ckpts", f"best_{best_mAP * 100:.2f}.ckpt"),
        )
    return best_mAP


if __name__ == "__main__":
    main()
