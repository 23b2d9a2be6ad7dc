"""Phase-level timing of the REAL trainer loop (follow-up to exp_e2e_gap:
with the wire codec, h2d_only fell 446->94 ms/batch yet e2e_epoch2 stayed
~14 plots/s vs device_preput 61 — find the missing ~900 ms/batch).

Times, per batch of the actual Trainer._train_epoch equivalent:
  q_wait    blocking time in loader.epoch() next() (host pipeline + put)
  dispatch  time inside runner.train() (arg prep + jit dispatch; on the
            axon tunnel this includes the RPC send)
  track     time inside the every-10th-batch tracker fetch (D2H RTTs)
  sync      end-of-epoch block (fetch final loss)

Run ON THE REAL TPU:  python docs/experiments/round3/exp_e2e_trace.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import numpy as np

import scripts.bench_protocol  # noqa: F401  (shared compile cache)
import jax

BS = int(os.environ.get("DPCR_BENCH_BS", 16))


def main():
    import tempfile

    from dpcr_agb_tpu.config import load_config
    from dpcr_agb_tpu.training.trainer import Trainer
    tmp = tempfile.mkdtemp(prefix="e2e_trace_")
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "..", "..", "conf"),
        "config",
        ["task=instance", "models=instance/minkowski_baseline",
         "model_name=SENet14", "data=instance/synthetic/reg",
         "data.transform_type=sparse_xy", "data.synthetic_plots=256",
         f"data.dataroot={tmp}/data", "training=nfi/minkowski",
         "training.epochs=3", f"training.batch_size={BS}",
         "training.num_workers=4", "eval_frequency=10",
         f"run_dir={tmp}/run"])
    t = Trainer(cfg)
    loader = t.loaders["train"]

    for epoch in (0, 1, 2):      # epoch 0 pays compiles; 1-2 are steady
        q_wait = []
        dispatch = []
        track = []
        t_ep = time.perf_counter()
        it = loader.epoch(epoch)
        while True:
            t0 = time.perf_counter()
            batch = next(it, None)
            t1 = time.perf_counter()
            if batch is None:
                break
            q_wait.append(t1 - t0)
            t.state, out = t.runner.train(t.state, batch)
            t2 = time.perf_counter()
            dispatch.append(t2 - t1)
            if (len(dispatch) - 1) % 10 == 0:
                t._track(batch, out)
                track.append(time.perf_counter() - t2)
        t3 = time.perf_counter()
        loss = float(out["loss"])
        t4 = time.perf_counter()
        nb = len(dispatch)
        dur = t4 - t_ep
        print(f"epoch {epoch}: {nb} batches {dur:.1f}s "
              f"({nb * BS / dur:.2f} plots/s) loss={loss:.4f}", flush=True)
        for name, xs in (("q_wait", q_wait), ("dispatch", dispatch),
                         ("track", track)):
            if xs:
                xs_ms = np.array(xs) * 1e3
                print(f"  {name:9s} sum {xs_ms.sum():8.1f} ms  "
                      f"mean {xs_ms.mean():7.1f}  p50 "
                      f"{np.percentile(xs_ms, 50):7.1f}  max "
                      f"{xs_ms.max():7.1f}  (n={len(xs)})", flush=True)
        print(f"  final sync {1e3 * (t4 - t3):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
