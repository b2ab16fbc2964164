#!/usr/bin/env python
"""Trainer CLI.

Parity surface: reference ``train.py`` — ``--cfg_file configs/nerf/lego.yaml``
trains (epoch loop with checkpoint/eval cadence), ``--test`` evaluates.
Works for both the nerf task and the img_fit task (dispatch on cfg.task).
"""
import sys


def main(argv=None):
    from nerf_tpu.config import parse_args

    cfg, args = parse_args(argv)
    if cfg.get("fix_random", False) or args.det:
        cfg.seed = 42

    if args.test:
        from run import run_evaluate

        return run_evaluate(cfg)

    if cfg.task == "img_fit":
        from nerf_tpu.train.img_fit_loop import train_img_fit

        train_img_fit(cfg)
    else:
        from nerf_tpu.train.loop import train

        train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
