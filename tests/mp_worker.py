"""Multi-process training worker (launched by tests/test_multiprocess.py).

Each process runs THIS same script — the SPMD contract
(parallel/multihost.py): same program, same data order, per-process batch
slices, jax.distributed wiring the processes into one 8-device runtime
(2 processes x 4 virtual CPU devices). Process 0 writes final params +
history to --out for the parent to compare against a single-process run.

Args: --pid N --procs N --port P --out FILE [--epochs E] [--mesh d,m]
      [--ckpt DIR] [--crash-epoch K]

--crash-epoch K: SIGKILL self at the end of epoch K (after that epoch's
checkpoint save) — the chaos-test hook (SURVEY §5 failure detection;
recovery model is restart-from-checkpoint, there is no elastic shrink in
SPMD).
"""

import argparse
import os
import signal
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--port", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--mesh", default="4,2")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--crash-epoch", type=int, default=None)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import numpy as np

    from sparkfm_tpu.config import FMConfig, SGDConfig
    from sparkfm_tpu.data import synth
    from sparkfm_tpu.parallel import multihost as MH
    from sparkfm_tpu.training.trainer import train_sgd

    MH.initialize(f"localhost:{args.port}", args.procs, args.pid)
    assert jax.process_count() == args.procs, jax.process_count()

    # identical dataset on every process (same seed -> same batches; each
    # process then keeps only its slice via process_batch_slice)
    ds = synth.synth_movielens(num_users=40, num_items=60,
                               num_examples=1280, seed=0)
    cfg = FMConfig(num_features=ds.num_features, num_factors=4,
                   reg_w=0.01, reg_v=0.02, seed=0)
    sgd_cfg = SGDConfig(batch_size=128, learning_rate=0.1,
                        optimizer="adagrad", epochs=args.epochs,
                        shuffle_each_epoch=True)
    d, m = (int(x) for x in args.mesh.split(","))
    mesh = MH.global_mesh(d, m)

    hooks = []
    if args.crash_epoch is not None:
        def chaos(epoch, state, rec,
                  _k=args.crash_epoch, _p=args.pid):
            if epoch == _k and _p == 1:
                # abrupt: no cleanup, no checkpoint flush beyond this epoch
                os.kill(os.getpid(), signal.SIGKILL)
        hooks.append(chaos)

    res = train_sgd(cfg, sgd_cfg, ds, eval_ds=ds, eval_every=1,
                    key=jax.random.PRNGKey(0), mesh=mesh, hooks=hooks,
                    checkpoint_dir=args.ckpt, checkpoint_every=1,
                    resume=True)

    if args.pid == 0:
        np.savez(args.out,
                 w0=np.asarray(res.params.w0),
                 w=np.asarray(res.params.w),
                 v=np.asarray(res.params.v),
                 loss=np.asarray([r["train_loss"] for r in res.history]),
                 rmse=np.asarray([r.get("eval_rmse", np.nan)
                                  for r in res.history]),
                 epochs=np.asarray([r["epoch"] for r in res.history]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
