"""Parallel MuPoTs TS1..TS20 sweep: one process per sequence, pinned
round-robin to TPU chips.

The per-sequence optimizations are independent (reference runs them as
a sequential shell loop, script/predict_mupots_full.sh); on a v5e-8
host the sweep is embarrassingly parallel across chips — this is the
DCN-level parallelism tier of the scaling story (SURVEY §2.3
"multi-process orchestration"), complementing the frame-axis SPMD
inside each sequence (parallel/spmd.py) which is the right tool when
ONE long sequence must finish fast.

Each worker process gets `TPU_VISIBLE_DEVICES=<chip>` so JAX in that
process sees exactly one chip (the standard single-host pinning
convention); with `--platform cpu` the sweep runs CPU workers instead
(used by the tests and useful for smoke runs).

Usage:
    python script/predict_mupots_sweep.py \
        --configs_yml configs/predict_mupots.yml \
        --output_path ./output/mupots \
        --workers 8 [--ts 1,2,5] [--retries 1]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_commands(ts_ids, configs_yml, output_path, extra_args=()):
    """One predict_mupots invocation per TS id."""
    return [
        [sys.executable, "-m", "mhmocap_tpu.predict_mupots",
         "--configs_yml", configs_yml, "--ts_id", str(ts),
         "--output_path", output_path, *extra_args]
        for ts in ts_ids
    ]


def worker_env(slot: int, platform: str = "tpu") -> dict:
    """Environment for a worker pinned to device `slot`."""
    env = dict(os.environ)
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        # CPU workers must not load the remote-TPU PJRT plugin: it
        # would race the real workers for the tunnel, and its
        # sitecustomize costs ~2 s of every python startup
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p)
    else:
        # single-host chip pinning: the process sees one chip only
        env["TPU_VISIBLE_DEVICES"] = str(slot)
        env.setdefault("TPU_PROCESS_BOUNDS", "1,1,1")
        env.setdefault("TPU_CHIPS_PER_PROCESS_BOUNDS", "1,1,1")
        # the orchestrating process may run CPU-only (tunnel-outage
        # hygiene, synthetic_e2e_sweep.py) — its forcing must not
        # leak into the TPU workers
        env.pop("JAX_PLATFORMS", None)
    # all workers share one compilation cache: TS sequences bucket to
    # the same padded shapes, so later workers hit the earlier
    # workers' compiles. CPU workers get the host-fingerprinted CPU
    # cache (stale cross-host CPU AOT entries SIGABRT on load,
    # mhmocap_tpu/cache.py).
    if platform == "cpu":
        if REPO not in sys.path:
            sys.path.insert(0, REPO)
        from mhmocap_tpu.cache import cpu_cache_dir
        env["JAX_COMPILATION_CACHE_DIR"] = cpu_cache_dir(REPO)
    else:
        # OVERRIDE (not setdefault): a CPU-only orchestrator's
        # host-fingerprinted cache dir must not leak into TPU workers
        env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
            REPO, ".jax_cache")
    return env


def run_sweep(cmds, workers: int, platform: str = "tpu",
              log_dir: str | None = None, retries: int = 0,
              labels=None, job_timeout: float | None = None):
    """Run `cmds` over `workers` pinned slots; returns
    {label: returncode}. A failed command is retried up to `retries`
    times on the same slot before being recorded as failed. A job
    exceeding `job_timeout` seconds is killed and recorded/retried as
    rc=124 (the remote TPU tunnel has measured indefinite hangs; an
    unbounded worker turns an outage into a stuck sweep)."""
    labels = labels or [f"job{i}" for i in range(len(cmds))]
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
    queue = list(zip(labels, cmds))
    results = {}
    lock = threading.Lock()

    def pump(slot):
        while True:
            with lock:
                if not queue:
                    return
                label, cmd = queue.pop(0)
            env = worker_env(slot, platform)
            for attempt in range(retries + 1):
                t0 = time.time()
                log_f = None
                if log_dir:
                    log_f = open(os.path.join(log_dir, f"{label}.log"),
                                 "ab")
                try:
                    try:
                        rc = subprocess.run(
                            cmd, cwd=REPO, env=env, stdout=log_f,
                            stderr=subprocess.STDOUT if log_f else None,
                            timeout=job_timeout,
                        ).returncode
                    except subprocess.TimeoutExpired:
                        rc = 124
                finally:
                    if log_f:
                        log_f.close()
                dt = time.time() - t0
                print(f"[slot {slot}] {label}: rc={rc} ({dt:.0f}s, "
                      f"attempt {attempt + 1})", flush=True)
                if rc == 0:
                    break
            with lock:
                results[label] = rc

    threads = [threading.Thread(target=pump, args=(s,))
               for s in range(workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs_yml",
                    default="configs/predict_mupots.yml")
    ap.add_argument("--output_path", default="./output/mupots")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--ts", default=",".join(str(i)
                                             for i in range(1, 21)))
    ap.add_argument("--platform", default="tpu",
                    choices=["tpu", "cpu"])
    ap.add_argument("--retries", type=int, default=1)
    ap.add_argument("--log_dir", default=None,
                    help="per-TS log files (default: stream to stdout)")
    args, extra = ap.parse_known_args()

    ts_ids = [int(t) for t in args.ts.split(",") if t]
    cmds = build_commands(ts_ids, args.configs_yml, args.output_path,
                          extra)
    labels = [f"TS{t}" for t in ts_ids]
    t0 = time.time()
    results = run_sweep(cmds, min(args.workers, len(cmds)),
                        platform=args.platform, log_dir=args.log_dir,
                        retries=args.retries, labels=labels)
    failed = {k: v for k, v in results.items() if v != 0}
    print(f"sweep: {len(results) - len(failed)}/{len(results)} ok in "
          f"{time.time() - t0:.0f}s"
          + (f"; FAILED: {sorted(failed)}" if failed else ""))
    audit_windows(args.output_path, ts_ids)
    sys.exit(1 if failed else 0)


def audit_windows(output_path: str, ts_ids):
    """Post-run audit: surface each sequence's raster window and
    residual supervision clip rate from the stage-1 artifacts (the
    window guard otherwise reports only via stdout at init)."""
    import pickle
    for ts in ts_ids:
        pkl = os.path.join(output_path, f"TS{ts}", "optvar_stage1.pkl")
        if not os.path.exists(pkl):
            continue
        with open(pkl, "rb") as f:
            ov = pickle.load(f)
        win = ov.get("raster_window")
        clip = ov.get("window_clip_rate")
        if win is not None:
            flag = " !" if (clip or 0) > 0 else ""
            print(f"TS{ts}: raster_window={win} "
                  f"clip_rate={100 * (clip or 0):.2f}%{flag}")


if __name__ == "__main__":
    main()
