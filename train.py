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

    # Reference parity: torch.autograd.set_detect_anomaly(True) is always
    # on there (train.py:23). The jax analog re-runs failing programs
    # eagerly to locate the NaN-producing op — opt-in only (too slow to
    # leave on); the always-on guard is check_finite_stats in the loop.
    if cfg.get("detect_anomaly", False):
        import jax

        jax.config.update("jax_debug_nans", True)

    if args.test:
        from run import run_evaluate

        return run_evaluate(cfg)

    if cfg.task == "img_fit":
        from nerf_tpu.train.img_fit_loop import train_img_fit

        return train_img_fit(cfg)

    from nerf_tpu.train.loop import train

    # failure recovery: the reference's story is "restart with resume=True"
    # (SURVEY.md §5); --auto_restart folds that into the trainer itself.
    max_restarts = int(cfg.get("auto_restart", 0))
    attempt = 0
    while True:
        try:
            return train(cfg)
        except KeyboardInterrupt:
            raise
        except Exception as e:
            attempt += 1
            if attempt > max_restarts:
                raise
            import traceback

            traceback.print_exc()
            print(f"[auto_restart] attempt {attempt}/{max_restarts}: "
                  f"resuming from latest checkpoint after {type(e).__name__}")
            cfg.resume = True


if __name__ == "__main__":
    main(sys.argv[1:])
