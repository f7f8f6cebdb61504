"""Streaming inference CLI: raw .dat event file → detections, fully fused on
device (the deployment form of the encode→detect pipeline that bench.py
measures; resurrects the reference's dormant online path as a tool).

Per 10 ms window: slice events, update the TAF queue (MXU scatter), leaky
transform + resize, AED forward, decode + NMS — one jitted step. Detections
stream to stdout and optionally to a summarise-style .npz.

Usage:
  python tools/stream_infer.py -event_file seq_td.dat -dataset gen1 \
      [-checkpoint log/exp/checkpoints/best_epoch] [-out dets.npz] \
      [-max_windows 500] [-seq_nms]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from generate_common import GEOMETRY
from frlw_evd_tpu.events import PSEELoader  # noqa: E402

BIN_US = 10_000
K = 8
# per-window host->device upload; 16k events/10ms covers GEN1 peak rates.
# NB: on this dev box the TPU is behind an RPC tunnel, so per-window
# round-trips dominate batch-1 latency; colocated hosts (or the batched
# pipeline in bench.py) do not pay this.
MAX_EVENTS = 16384


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-event_file", required=True)
    parser.add_argument("-dataset", default="gen1")
    parser.add_argument("-checkpoint", default=None,
                        help="best_epoch checkpoint dir (random init if absent)")
    parser.add_argument("-out", default=None)
    parser.add_argument("-max_windows", type=int, default=200)
    parser.add_argument("-conf", type=float, default=0.3)
    parser.add_argument("-seq_nms", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from frlw_evd_tpu.encode.streaming import taf_stream_step
    from frlw_evd_tpu.encode.taf import leaky_transform
    from frlw_evd_tpu.models import build_detector
    from frlw_evd_tpu.models.detector import eval_decode
    from frlw_evd_tpu.models.postprocess import (
        finalize_detections,
        postprocess_batch,
    )
    from frlw_evd_tpu.models.seq_nms import SeqNMSState

    geo = GEOMETRY[args.dataset]
    sensor_hw = (geo["shape"] if args.dataset.startswith("gen1")
                 else geo["target_shape"])
    input_hw = geo["target_shape"]
    nc = 2 if args.dataset.startswith("gen1") else 7
    h, w = sensor_hw

    model = build_detector(nc, family="aed", stem="bfm")
    sample = jnp.zeros((1, input_hw[0], input_hw[1], 2 * K), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), sample, False)
    if args.checkpoint:
        import optax

        from frlw_evd_tpu.train.checkpoints import load_checkpoint
        from frlw_evd_tpu.train.trainer import TrainState

        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=optax.adam(1e-3).init(variables["params"]),
                           tx=optax.adam(1e-3), apply_fn=model.apply)
        state, _, _ = load_checkpoint(args.checkpoint, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def window_step(state, xytp, n_valid):
        state = taf_stream_step(state, xytp, n_valid)
        vol = state[0][..., ::-1]
        vol = jnp.swapaxes(vol, 2, 3).reshape(h, w, 2 * K)
        vol = leaky_transform(vol) / 255.0
        if input_hw != (h, w):
            # nearest resize as two single-axis takes (a 2D-index gather is
            # ~8x slower on TPU at these grid sizes)
            ys = (jnp.arange(input_hw[0]) * (h / input_hw[0])).astype(jnp.int32)
            xs = (jnp.arange(input_hw[1]) * (w / input_hw[1])).astype(jnp.int32)
            vol = jnp.take(jnp.take(vol, ys, axis=0), xs, axis=1)
        net_in = vol[None]
        outs = model.apply(variables, net_in, False)
        decoded = eval_decode(outs, (8, 16, 32))
        return state, postprocess_batch(decoded, conf_threshold=args.conf,
                                        max_detections=100)

    loader = PSEELoader(args.event_file)
    state = jnp.full((1, h, w, 2, K), -6000.0, jnp.float32)
    seq = SeqNMSState() if args.seq_nms else None
    rw = input_hw[1] / w if not args.dataset.startswith("gen1") else 1.0

    all_dets, all_ts = [], []
    t_wall = time.time()
    for win_idx in range(args.max_windows):
        if loader.done:
            break
        events = loader.load_delta_t(BIN_US)
        t_end = int(loader.current_time)
        xytp = np.zeros((MAX_EVENTS, 4), np.float32)
        n = min(len(events), MAX_EVENTS)
        if n:
            t_field = "ts" if "ts" in events.dtype.names else "t"
            sel = events[len(events) - n:]
            xytp[:n, 0] = sel["x"]
            xytp[:n, 1] = sel["y"]
            xytp[:n, 2] = (sel[t_field] - (t_end - BIN_US)) / BIN_US
            xytp[:n, 3] = sel["p"]
            if not args.dataset.startswith("gen1"):
                xytp[:n, 0] *= input_hw[1] / geo["shape"][1]
                xytp[:n, 1] *= input_hw[0] / geo["shape"][0]
        state, (dets, keep) = window_step(
            state, jnp.asarray(xytp)[None], jnp.asarray([n], jnp.int32))
        out = finalize_detections(dets, keep)[0]
        if seq is not None:
            out = seq.link(out)
        if out.shape[0] and out[0, 5] > 0:
            for row in out:
                print(f"t={t_end} box=({row[0]:.1f},{row[1]:.1f},"
                      f"{row[2]:.1f},{row[3]:.1f}) cls={int(row[4])} "
                      f"score={row[5]:.3f}")
        all_dets.append(out)
        all_ts.append(t_end)
    elapsed = time.time() - t_wall
    n_windows = len(all_ts)
    print(f"# {n_windows} windows in {elapsed:.2f}s "
          f"({n_windows / max(elapsed, 1e-9):.1f} windows/s, batch 1)")

    if args.out:
        np.savez(args.out,
                 dts=np.concatenate([np.concatenate(
                     [np.full((len(d), 1), t), d], axis=1)
                     for d, t in zip(all_dets, all_ts)]) if all_dets else
                 np.zeros((0, 7)),
                 file_names=[os.path.basename(args.event_file)] * sum(
                     len(d) for d in all_dets))
        print("saved", args.out)


if __name__ == "__main__":
    main()
