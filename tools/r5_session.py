"""Round-5 warm-process chip measurement session.

Round 4 lost ~13 of 18 planned measurement rows to session mechanics: one
fresh python process per config paid a 5-12 min cold XLA compile through the
single-core remote-compile tunnel, timeouts killed processes mid-compile,
and the `tee` pipe masked the failures as rc=0 (VERDICT r4 weak #2). This
driver fixes all three by construction:

  * ONE python process runs the whole matrix — the backend initialises once
    and every re-used program (fences, shared stages) compiles once;
  * every completed row is appended to log/round5/results.jsonl IMMEDIATELY
    (fsync'd), so a crash or budget stop banks all prior rows;
  * a failed row records its exception and the session moves on — there is
    no rc to mask, and a row with no metric line cannot be mistaken for a
    success (absent from results.jsonl means it did not complete).

Usage:
  python tools/r5_session.py --set gen1        # encoder sweep + train levers
  python tools/r5_session.py --set gen4        # the riskier 1 Mpx configs
  python tools/r5_session.py --only enc_sae,train_gen1_p64
  python tools/r5_session.py --budget 7200     # stop starting rows after 2 h

Rows measure through bench.run_config (the same code path the end-of-round
driver runs), so a banked row and a driver row are the same number.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax_cache_env  # noqa: E402,F401  (before jax)

RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "log", "round5", "results.jsonl")


def bank(row: dict) -> None:
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
        f.flush()
        os.fsync(f.fileno())


def bench_row(name: str, **overrides):
    """Returns a thunk running bench.run_config with CLI-equivalent args."""
    def run():
        import bench

        argv = []
        for k, v in overrides.items():
            if isinstance(v, bool):
                if v:
                    argv.append(f"--{k}")
            else:
                argv += [f"--{k}", str(v)]
        args = bench.make_parser().parse_args(argv)
        return bench.run_config(args)

    return run


def profile_row(config: str, quick: bool = False, extra=()):
    """tools/train_profile.py decomposition, in-process; its per-variant
    lines go to the session log and the full-step rows are banked."""
    def run():
        import contextlib
        import io

        from tools import train_profile

        argv = (["train_profile", "--config", config]
                + (["--quick"] if quick else []) + list(extra))
        old = sys.argv
        buf = io.StringIO()

        class Tee(io.TextIOBase):
            def write(self, s):
                buf.write(s)
                sys.stderr.write(s)
                return len(s)

        try:
            sys.argv = argv
            with contextlib.redirect_stdout(Tee()):
                train_profile.main()
        finally:
            sys.argv = old
        return {"metric": f"train_profile_{config}", "value": None,
                "unit": "decomposition", "lines": buf.getvalue().splitlines()}

    return run


def enc_profile_row():
    """tools/enc_profile.py SAE decomposition, in-process."""
    def run():
        from tools import enc_profile

        return enc_profile.main()

    return run


# The round-5 matrix, priority-ordered per VERDICT r4 "Next round: do this".
# est = rough wall estimate (s) incl. compile, used only for budget skips.
MATRIX = {
    "gen1": [
        # 1. encoder sweep completion (VERDICT #4) — SAE rides the new
        #    segment-last sorted path this round; EV + frame never measured
        ("enc_sae",   900, bench_row("enc_sae", config="gen1_sae")),
        ("enc_ev",    900, bench_row("enc_ev", config="gen1_ev")),
        ("enc_frame", 900, bench_row("enc_frame", config="gen1_frame")),
        ("enc_eci",   600, bench_row("enc_eci", config="gen1_eci")),
        # 2. the training-lever decomposition (VERDICT #1 — the round-3/4
        #    #1 ask): canonical vs p64 x threefry vs rbg + fwd-only +
        #    assignment + dropout, all in this one process
        ("train_profile_gen1", 3600, profile_row("gen1")),
        # 3. lever combos the profiler does not cover
        ("train_gen1_mh", 1200, bench_row(
            "train_gen1_mh", config="gen1_train", p64=True, rng="rbg",
            merged_head=True)),
        ("train_gen1_b128", 1200, bench_row(
            "train_gen1_b128", config="gen1_train", p64=True, rng="rbg",
            batch=128, remat=True, remat_policy="dots")),
        # 4. inference re-validation + the queued A/Bs (VERDICT #5)
        ("gen1_taf",     900, bench_row("gen1_taf", config="gen1_taf")),
        ("gen1_nms_seq", 900, bench_row("gen1_nms_seq", config="gen1_taf",
                                        nms="sequential")),
        ("gen1_int8",    900, bench_row("gen1_int8", config="gen1_taf",
                                        dtype="int8")),
        ("gen1_skewed",  900, bench_row("gen1_skewed", config="gen1_taf",
                                        events="skewed")),
        # 5. batch-1 serving latency + int8 variant (VERDICT #6)
        ("latency_gen1",      900, bench_row("latency_gen1",
                                             config="gen1_latency")),
        ("latency_gen1_int8", 900, bench_row("latency_gen1_int8",
                                             config="gen1_latency",
                                             dtype="int8")),
    ],
    # follow-up set: rows whose code changed after the first gen1 session
    # launched (the running session imported the old module)
    "gen1b": [
        ("enc_sae_v2", 900, bench_row("enc_sae_v2", config="gen1_sae")),
        ("latency_gen1_breakdown", 900, bench_row(
            "latency_gen1_breakdown", config="gen1_latency", profile=True)),
        ("enc_sae_skewed", 600, bench_row("enc_sae_skewed",
                                          config="gen1_sae",
                                          events="skewed")),
        # profile follow-ups: the r5 profile showed canonical-stem + rbg is
        # the winner (746.4 w/s) and p64/merged-head HURT training — A/B
        # the remaining levers on the canonical stem
        ("train_gen1_rbg_mh", 1200, bench_row(
            "train_gen1_rbg_mh", config="gen1_train", rng="rbg",
            merged_head=True)),
        ("train_gen1_rbg_dots", 1200, bench_row(
            "train_gen1_rbg_dots", config="gen1_train", rng="rbg",
            remat=True, remat_policy="dots")),
        ("train_gen1_rbg_b128", 1200, bench_row(
            "train_gen1_rbg_b128", config="gen1_train", rng="rbg",
            batch=128)),
        # stem-vs-rest split of the step cost (no variant re-timing)
        ("train_profile_stages", 1200, profile_row(
            "gen1", extra=("--skip_variants", "--stages"))),
    ],
    # third wave: rows unlocked by post-gen1b code changes — the
    # segment-last SAE (the 323.8 w/s row was the superseded cumsum+gather
    # path), the merged-head x int8 composition, the bf16-stored-input fix
    # that lets gen4 batch 32 fit (round-4's OOM was bench harness HBM, not
    # the step), and the batch-256 gen1 push toward MFU >= 10%
    "gen1c": [
        ("enc_sae_v2", 900, bench_row("enc_sae_v2", config="gen1_sae")),
        ("enc_sae_skewed", 600, bench_row("enc_sae_skewed",
                                          config="gen1_sae",
                                          events="skewed")),
        ("gen1_int8_mh", 900, bench_row("gen1_int8_mh", config="gen1_taf",
                                        dtype="int8", merged_head=True)),
        ("train_gen4_b32", 2400, bench_row(
            "train_gen4_b32", config="gen4_train", batch=32, p64=True)),
        ("train_gen1_rbg_b256", 1800, bench_row(
            "train_gen1_rbg_b256", config="gen1_train", rng="rbg",
            batch=256)),
        ("latency_gen1_int8_mh", 900, bench_row(
            "latency_gen1_int8_mh", config="gen1_latency", dtype="int8",
            merged_head=True)),
    ],
    # fourth wave: the enc_profile.py decomposition showed the SAE/EV bench
    # numbers were WARMUP ARTIFACTS (the carried-state jit variant compiled
    # inside the timed loop — actual SAE compute is 16.8 ms/batch = ~7600
    # w/s where the loop reported 231 ms); re-measure all carried-state
    # encoder rows with the double-warmup fix, A/B the sorted scatter on the
    # full gen1 pipeline (profiled ~2x the dense one-hot at GEN1 grid), and
    # retry the two OOM rows (bench input cap + post-failure gc)
    "gen1d": [
        ("enc_profile_sae", 1800, enc_profile_row()),
        ("enc_sae_v3", 900, bench_row("enc_sae_v3", config="gen1_sae")),
        ("enc_sae_skewed_v3", 600, bench_row("enc_sae_skewed_v3",
                                             config="gen1_sae",
                                             events="skewed")),
        ("enc_ev_v2", 900, bench_row("enc_ev_v2", config="gen1_ev")),
        ("gen1_taf_sorted", 900, bench_row("gen1_taf_sorted",
                                           config="gen1_taf_dense",
                                           scatter="sorted")),
        ("train_gen4_b48", 2400, bench_row(
            "train_gen4_b48", config="gen4_train", batch=48, p64=True)),
        ("train_gen1_rbg_b256", 2400, bench_row(
            "train_gen1_rbg_b256", config="gen1_train", rng="rbg",
            batch=256)),
        ("latency_gen1_int8_mh", 900, bench_row(
            "latency_gen1_int8_mh", config="gen1_latency", dtype="int8",
            merged_head=True)),
    ],
    # fifth wave: remaining unmeasured A/Bs — the patchified gen1 input
    # path (config existed since r2, never captured), the gen1 per-stage
    # breakdown, gen4 batch scaling past 128, and skewed-stream rows for
    # the three encoders that only have uniform numbers
    "gen1e": [
        ("gen1_taf_p64", 900, bench_row("gen1_taf_p64",
                                        config="gen1_taf_p64")),
        ("gen1_profile", 900, bench_row("gen1_profile",
                                        config="gen1_taf_dense",
                                        fused="off", profile=True)),
        ("gen4_b256", 1800, bench_row("gen4_b256", config="gen4_taf",
                                      batch=256)),
        ("enc_eci_skewed", 600, bench_row("enc_eci_skewed",
                                          config="gen1_eci",
                                          events="skewed")),
        ("enc_ev_skewed", 600, bench_row("enc_ev_skewed", config="gen1_ev",
                                         events="skewed")),
        ("enc_frame_skewed", 600, bench_row("enc_frame_skewed",
                                            config="gen1_frame",
                                            events="skewed")),
    ],
    # sixth wave. The gen1e stage split (encode 31.9 ms / detect 22.5 ms)
    # shows ENCODE dominates the gen1 step, and the sorted histogram lost
    # its fused A/B only to program-level layout interactions — try it in
    # the split pipeline, alone and composed with int8 detect. The skewed
    # encoder rows re-run first (they died as OOM-cascade after gen4_b256's
    # 21 GB batch-256 state — risky rows go LAST from now on).
    "gen1f": [
        ("enc_eci_skewed", 600, bench_row("enc_eci_skewed",
                                          config="gen1_eci",
                                          events="skewed")),
        ("enc_ev_skewed", 600, bench_row("enc_ev_skewed", config="gen1_ev",
                                         events="skewed")),
        ("enc_frame_skewed", 600, bench_row("enc_frame_skewed",
                                            config="gen1_frame",
                                            events="skewed")),
        ("gen1_sorted_split", 900, bench_row(
            "gen1_sorted_split", config="gen1_taf_dense", fused="off",
            scatter="sorted")),
        ("gen1_sorted_split_int8", 900, bench_row(
            "gen1_sorted_split_int8", config="gen1_taf_dense", fused="off",
            scatter="sorted", dtype="int8")),
        ("gen1_split_int8_profile", 900, bench_row(
            "gen1_split_int8_profile", config="gen1_taf_dense", fused="off",
            dtype="int8", profile=True)),
    ],
    # seventh wave: the gen1 ENCODE attack. gen1f showed encode+transform
    # (31.4 ms) is ~63% of the gen1 step; these A/B the gen4 encode
    # formulations at GEN1 geometry — packed state + pallas banded scatter
    # (XLA update) and the folded fused Pallas update+leaky kernel — plus
    # the skewed-volume train row (the VERDICT r4 #8 fix has no measured
    # row yet). Profile rows print per-stage times into the session log.
    "gen1g": [
        ("gen1_kernel_profile", 1200, bench_row(
            "gen1_kernel_profile", config="gen1_taf_kernel", profile=True)),
        ("gen1_packed_profile", 1200, bench_row(
            "gen1_packed_profile", config="gen1_taf_packed", profile=True)),
        ("gen1_packed_mxu", 900, bench_row(
            "gen1_packed_mxu", config="gen1_taf_packed", scatter="mxu")),
        ("gen1_kernel_int8", 900, bench_row(
            "gen1_kernel_int8", config="gen1_taf_kernel", dtype="int8")),
        ("train_gen1_skewed", 1200, bench_row(
            "train_gen1_skewed", config="gen1_train", batch=128, rng="rbg",
            events="skewed")),
    ],
    # eighth wave: consolidation on the new fused-kernel flagship default —
    # its skew row (the dense default's "no cliff" row doesn't transfer
    # automatically), its batch-scaling curve (dense peaked at 128), the
    # kernel-formulation batch-1 latency (fewer HBM passes should shave the
    # device leg), the batch-192 train point between the 128 peak and the
    # 256 droop, and the `.at[].max` SAE on skewed streams (O(E) serial
    # scatter vs the sorted path's clustered-run penalty). OOM-risky
    # batch-256 row last.
    "gen1h": [
        ("gen1_kernel_skewed", 900, bench_row(
            "gen1_kernel_skewed", config="gen1_taf", events="skewed")),
        ("latency_gen1_kernel", 900, bench_row(
            "latency_gen1_kernel", config="gen1_latency_kernel")),
        ("latency_gen1_kernel_int8", 900, bench_row(
            "latency_gen1_kernel_int8", config="gen1_latency_kernel",
            dtype="int8")),
        ("enc_sae_max", 600, bench_row(
            "enc_sae_max", config="gen1_sae_max")),
        ("enc_sae_skewed_max", 600, bench_row(
            "enc_sae_skewed_max", config="gen1_sae_max", events="skewed")),
        ("gen1_kernel_b192", 900, bench_row(
            "gen1_kernel_b192", config="gen1_taf", batch=192)),
        ("train_gen1_rbg_b192", 1200, bench_row(
            "train_gen1_rbg_b192", config="gen1_train", rng="rbg",
            batch=192)),
        ("gen1_kernel_b256", 900, bench_row(
            "gen1_kernel_b256", config="gen1_taf", batch=256)),
    ],
    "gen4": [
        # gen4 training bf16 at batch 16 (VERDICT #3 — the number two
        # outages ate). The step is mixed-precision by construction.
        ("train_gen4_b16", 2400, bench_row(
            "train_gen4_b16", config="gen4_train", batch=16, p64=True,
            rng="rbg")),
        ("gen4_taf",    1200, bench_row("gen4_taf", config="gen4_taf")),
        ("gen4_int8",   1200, bench_row("gen4_int8", config="gen4_taf",
                                        dtype="int8")),
        ("gen4_skewed", 1200, bench_row("gen4_skewed", config="gen4_taf",
                                        events="skewed")),
        ("latency_gen4", 900, bench_row("latency_gen4",
                                        config="gen4_latency")),
        ("train_profile_gen4", 2400, profile_row("gen4", quick=True)),
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", default="gen1", choices=sorted(MATRIX))
    ap.add_argument("--only", default="",
                    help="comma-separated row names to run (subset)")
    ap.add_argument("--budget", type=int, default=0,
                    help="wall seconds; stop STARTING rows when the next "
                         "row's estimate would exceed it (0 = no limit)")
    args = ap.parse_args()

    rows = MATRIX[args.set]
    if args.only:
        keep = set(args.only.split(","))
        rows = [r for r in rows if r[0] in keep]
        missing = keep - {r[0] for r in rows}
        if missing:
            ap.error(f"unknown rows: {sorted(missing)}")

    print(f"=== r5 session: set={args.set} rows={[r[0] for r in rows]} "
          f"({time.strftime('%H:%M:%S', time.gmtime())}Z)", flush=True)

    import bench

    bench._require_devices()
    t_session = time.time()
    done = failed = skipped = 0
    for name, est, thunk in rows:
        elapsed = time.time() - t_session
        if args.budget and elapsed + est > args.budget:
            print(f"--- {name}: SKIPPED (budget: {elapsed:.0f}s elapsed "
                  f"+ {est}s est > {args.budget}s)", flush=True)
            bank({"row": name, "status": "skipped_budget",
                  "elapsed_s": round(elapsed, 1)})
            skipped += 1
            continue
        print(f"--- {name}: start "
              f"({time.strftime('%H:%M:%S', time.gmtime())}Z)", flush=True)
        t0 = time.time()
        try:
            result = thunk()
            result = dict(result or {})
            result.update(row=name, status="ok",
                          wall_s=round(time.time() - t0, 1))
            bank(result)
            done += 1
            print(f"--- {name}: ok in {result['wall_s']}s -> "
                  f"{result.get('metric')}={result.get('value')}",
                  flush=True)
        except BaseException as e:  # incl. SystemExit; keep the session alive
            if isinstance(e, KeyboardInterrupt):
                raise
            tb = traceback.format_exc()
            print(f"--- {name}: FAILED in {time.time() - t0:.1f}s\n{tb}",
                  flush=True)
            bank({"row": name, "status": "failed", "error": repr(e),
                  "wall_s": round(time.time() - t0, 1)})
            failed += 1
            # After an OOM the device arrays referenced by the exception's
            # frames (and jitted-program donees) linger until GC; the
            # gen1c session's latency_gen1_int8_mh failed instantly with
            # RESOURCE_EXHAUSTED right after the b256 OOM for exactly this
            # reason. Drop the traceback, collect, and give the runtime a
            # beat to release HBM before the next row.
            del tb, e
            import gc

            gc.collect()
            time.sleep(2)
    print(f"=== r5 session done: {done} ok, {failed} failed, "
          f"{skipped} skipped, {time.time() - t_session:.0f}s total",
          flush=True)


if __name__ == "__main__":
    main()
