"""Checkpoint dress rehearsal: raw `.dat` + bbox `.npy` (+ optional released
`.pth`) → TAF encode → checkpoint import → eval → Prophesee COCO mAP, in ONE
command.

This is the end-to-end path a user runs to reproduce a released FRLW-EvD
checkpoint's mAP on this framework (reference flow: generate_taf.py offline
encode, then test.py → core/exp.py:262-350 eval). The TAF encode replicates
the reference's per-annotation window logic bit-for-bit (count-bounded
backward seek, bin alignment, resume-from-previous-timestamp —
generate_taf.py:160-203) via the numpy oracle, so the volumes fed to the
network equal the reference's disk blobs.

Usage:
  python tools/dress_rehearsal.py -raw_dir events/ -label_dir labels/ \
      -dataset gen1 [-checkpoint AED_TAF_K8_GEN1.pth] [-split test] \
      [-bins 8] [-max_streams 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from generate_common import GEOMETRY, iter_streams  # noqa: E402

from frlw_evd_tpu.encode import oracle  # noqa: E402
from frlw_evd_tpu.events import PSEELoader  # noqa: E402
from frlw_evd_tpu.events.npy_codec import load_bboxes  # noqa: E402

CLASSES = {"gen1": ("car", "pedestrian"),
           "gen4": ("pedestrian", "two wheeler", "car", "truck", "bus",
                    "traffic sign", "traffic light")}
MIN_EVENT_COUNT = 50_000_000


def encode_stream_taf(event_path, ann_times, sensor_hw, target_hw, bin_us, K):
    """Per-annotation TAF volumes with the reference resume logic.

    Yields (t_ann, volume (2K, Ht, Wt) uint8-rounded float in blob channel
    order: newest bin first, c = 2*age + p)."""
    loader = PSEELoader(event_path)
    events_window = bin_us * K
    h, w = sensor_hw
    state = None
    time_upperbound = -1e16
    count_upperbound = -1

    for t_ann in ann_times:
        end_time = int(t_ann)
        end_count = loader.seek_time(end_time)
        if end_count is None:
            continue
        start_count = max(end_count - MIN_EVENT_COUNT, 0)
        loader.seek_event(start_count)
        start_time = int(loader.current_time)
        if (end_time - start_time) < events_window:
            start_time = end_time - events_window
        else:
            start_time = end_time - round(
                (end_time - start_time - events_window) / bin_us
            ) * bin_us - events_window

        if start_time > time_upperbound:
            start_count = loader.seek_time(start_time)
            if start_count is None or start_time < 0:
                start_count = 0
            state = oracle.taf_init_state((h, w), K)
        else:
            start_count = count_upperbound
            start_time = int(time_upperbound)
            end_time = round((end_time - start_time) / bin_us) * bin_us \
                + start_time
            if end_time > loader.total_time():
                end_time = int(loader.total_time())
            end_count = loader.seek_time(end_time)

        loader.seek_event(start_count)
        ev = loader.load_n_events(int(end_count - start_count))
        xytp = np.stack([ev["x"], ev["y"], ev["ts"], ev["p"]],
                        axis=-1).astype(np.float32)

        volume, state = oracle.taf_window(xytp, (h, w), start_time, end_time,
                                          bin_us, state)
        b_new, b_old = oracle.taf_blob(volume, K, target_hw=target_hw)
        time_upperbound = end_time
        count_upperbound = end_count
        yield t_ann, np.concatenate([b_new, b_old], axis=0)


def iter_blob_windows(blob_root, split, stream, ann_times, K, target_hw):
    """Read precomputed TAF blobs in the reference's on-disk layout
    (target_dir/taf/<split>/bins{K/2}|bins{K}/<stream>_<t>.npy raw uint8,
    reference data/dataset.py:294-307 / generate_taf.py:231-235). Yields
    (t_ann, (2K, Ht, Wt) uint8) — drop-in for encode_stream_taf the moment
    a dataset + blob archive appears."""
    h, w = target_hw
    half = K // 2
    for t_ann in ann_times:
        p_new = os.path.join(blob_root, split, f"bins{half}",
                             f"{stream}_{t_ann}.npy")
        p_old = os.path.join(blob_root, split, f"bins{K}",
                             f"{stream}_{t_ann}.npy")
        if not (os.path.exists(p_new) and os.path.exists(p_old)):
            continue
        b_new = np.fromfile(p_new, np.uint8).reshape(half * 2, h, w)
        b_old = np.fromfile(p_old, np.uint8).reshape((K - half) * 2, h, w)
        yield t_ann, np.concatenate([b_new, b_old], axis=0)


def iter_label_streams(label_dir, split):
    """Stream enumeration from labels only (blob mode needs no raw events)."""
    root = os.path.join(label_dir, split)
    if not os.path.isdir(root):
        return
    for f in sorted(os.listdir(root)):
        if f.endswith("_bbox.npy"):
            name = f[:-len("_bbox.npy")]
            yield name, None, os.path.join(root, f)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-raw_dir", default=None,
                        help="raw .dat tree (omit with -blob_dir)")
    parser.add_argument("-label_dir", required=True)
    parser.add_argument("-blob_dir", default=None,
                        help="precomputed TAF blob tree in the reference "
                             "layout (<dir>/<split>/bins4,bins8/...); skips "
                             "the encode stage")
    parser.add_argument("-dataset", default="gen1", choices=("gen1", "gen4"))
    parser.add_argument("-checkpoint", default=None,
                        help=".pth (torch import) or Orbax checkpoint dir")
    parser.add_argument("-split", default="test")
    parser.add_argument("-bins", type=int, default=8)
    parser.add_argument("-infer_time", type=int, default=10_000)
    parser.add_argument("-max_streams", type=int, default=0)
    parser.add_argument("-eval_filter", default=None,
                        choices=("gen1", "gen4", "kitti", "none"),
                        help="override the box-size filter (mini fixtures "
                             "need 'none': gen1 drops diag<30)")
    parser.add_argument("-sensor_hw", default=None,
                        help="override 'H,W' (e.g. mini fixtures)")
    parser.add_argument("-input_hw", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from frlw_evd_tpu.evaluate.evaluator import Evaluator
    from frlw_evd_tpu.models import build_detector
    from frlw_evd_tpu.models.detector import eval_decode
    from frlw_evd_tpu.models.postprocess import (finalize_detections,
                                                 postprocess_batch)

    geom = GEOMETRY[args.dataset]
    sensor_hw = tuple(int(v) for v in args.sensor_hw.split(",")) \
        if args.sensor_hw else geom["shape"]
    input_hw = tuple(int(v) for v in args.input_hw.split(",")) \
        if args.input_hw else geom["target_shape"]
    classes = CLASSES[args.dataset]
    K = args.bins

    model = build_detector(len(classes), family="aed", stem="bfm")
    sample = jnp.zeros((1, input_hw[0], input_hw[1], 2 * K), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), sample, False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    if args.checkpoint and args.checkpoint.endswith(".pth"):
        from frlw_evd_tpu.train.checkpoints import import_torch_checkpoint

        params, batch_stats, report = import_torch_checkpoint(
            args.checkpoint, params, batch_stats)
        print(f"imported {report['loaded']} tensors from {args.checkpoint}; "
              f"unmatched: {len(report['unmatched'])}")
    elif args.checkpoint:
        from frlw_evd_tpu.train.checkpoints import load_checkpoint
        from frlw_evd_tpu.train.trainer import create_train_state
        import optax

        state = create_train_state(model, jax.random.key(0), sample,
                                   optax.adam(1e-4))
        state, _, _ = load_checkpoint(args.checkpoint, state)
        params, batch_stats = state.params, state.batch_stats
    else:
        print("NOTE: random init (no -checkpoint) — mAP will be ~0; this "
              "exercises the pipeline only")

    @jax.jit
    def forward(vol):
        outs = model.apply({"params": params, "batch_stats": batch_stats},
                           vol, False)
        decoded = eval_decode([o.astype(jnp.float32) for o in outs],
                              (8, 16, 32))
        return postprocess_batch(decoded, max_detections=100)

    evaluator = Evaluator(classes, 1, args.infer_time,
                          sensor_hw[1], sensor_hw[0],
                          input_hw[1], input_hw[0], dataset=args.dataset)
    if args.eval_filter == "none":
        from frlw_evd_tpu.evaluate.box_filtering import filter_boxes

        evaluator.filter_boxes = lambda b: filter_boxes(b, 0, 0, 0, 0)
    elif args.eval_filter:
        from frlw_evd_tpu.evaluate import box_filtering as _bf

        evaluator.filter_boxes = {"gen1": _bf.filter_boxes_gen1,
                                  "gen4": _bf.filter_boxes_large,
                                  "kitti": _bf.filter_boxes_kitti
                                  }[args.eval_filter]

    if args.raw_dir is None and args.blob_dir is None:
        parser.error("need -raw_dir (encode) or -blob_dir (precomputed)")

    n_streams = 0
    n_windows = 0
    streams = (iter_label_streams(args.label_dir, args.split)
               if args.blob_dir else
               iter_streams(args.raw_dir, args.label_dir, args.split))
    for stream, event_path, bbox_path in streams:
        if args.max_streams and n_streams >= args.max_streams:
            break
        n_streams += 1
        boxes = load_bboxes(bbox_path)
        ann_times = np.unique(boxes["t"])
        rh = input_hw[0] / sensor_hw[0]
        rw = input_hw[1] / sensor_hw[1]
        windows = (iter_blob_windows(args.blob_dir, args.split, stream,
                                     ann_times, K, input_hw)
                   if args.blob_dir else
                   encode_stream_taf(event_path, ann_times, sensor_hw,
                                     input_hw, args.infer_time, K))
        for t_ann, blob in windows:
            vol = jnp.asarray(blob.astype(np.float32) / 255.0
                              ).transpose(1, 2, 0)[None]
            t0 = time.time()
            dets, keep = forward(vol)
            dets = finalize_detections(np.asarray(dets), np.asarray(keep))
            infer = time.time() - t0
            rows = boxes[boxes["t"] == t_ann]
            # eval label rows: (cx, cy, w, h, cls, t, track, conf) at input res
            gt = np.zeros((len(rows), 8), np.float64)
            gt[:, 0] = (rows["x"] + rows["w"] / 2) * rw
            gt[:, 1] = (rows["y"] + rows["h"] / 2) * rh
            gt[:, 2] = rows["w"] * rw
            gt[:, 3] = rows["h"] * rh
            gt[:, 4] = rows["class_id"]
            gt[:, 5] = rows["t"]
            gt[:, 6] = rows["track_id"]
            gt[:, 7] = rows["class_confidence"]
            evaluator.add_result([dets[0]], [t_ann], [gt], [stream],
                                 infer, 0.0)
            n_windows += 1

    if n_windows == 0:
        print("no evaluable windows found", file=sys.stderr)
        sys.exit(1)
    stats = evaluator.evaluate()
    print(json.dumps({"metric": f"{args.dataset}_dress_rehearsal_mAP",
                      "value": round(float(stats[0]), 4),
                      "windows": n_windows, "streams": n_streams,
                      "stats": [round(float(s), 4) for s in stats]}))


if __name__ == "__main__":
    main()
