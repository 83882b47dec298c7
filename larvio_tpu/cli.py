"""Command-line entry point, mirroring the reference's non-ROS app.

Reference usage (ref:app/larvioMain.cpp, SURVEY.md §3.1):
    larvio <config.yaml> <euroc_dir> [output]

Ours:
    python -m larvio_tpu.cli run <config.yaml|-> <euroc_dir> [--out traj.txt]
        [--max-frames N] [--eval] [--profile DIR] [--checkpoint PATH]
    python -m larvio_tpu.cli sim [--duration S] [--out traj.txt] [--eval]
        (no-dataset mode: synthetic rendered sequence through the same path)

The trajectory is written in the reference's TUM-style format
``t x y z qx qy qz qw`` (compatibility contract, BASELINE.json:5).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _prefetch(frame_iter, depth: int = 8, workers: int = 2, timers=None):
    """Decode-ahead: run the frame iterator (PNG decode, IMU bucketing) in a
    background thread so host I/O overlaps the device step (SURVEY.md §3.1
    rebuild note). A frame whose "image" value is a zero-arg callable (lazy
    decode, data/euroc.py frames(lazy=True)) is resolved on a small thread
    pool — cv2.imread releases the GIL, so ``workers`` PNG decodes really run
    concurrently. Exceptions propagate to the consumer. ``timers`` (optional
    dict) accumulates the consumer-visible stall time under "decode"."""
    import queue
    import threading
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    END = object()
    pool = ThreadPoolExecutor(max_workers=max(workers, 1)) if workers else None

    def worker():
        try:
            for x in frame_iter:
                if pool is not None and callable(x.get("image")):
                    x = dict(x, image=pool.submit(x["image"]))
                q.put(x)
            q.put(END)
        except BaseException as e:  # re-raised on the consuming side
            q.put(("__prefetch_error__", e))

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            t0 = _time.perf_counter()
            x = q.get()
            if x is END:
                return
            if isinstance(x, tuple) and len(x) == 2 and x[0] == "__prefetch_error__":
                raise x[1]
            img = x.get("image")
            if hasattr(img, "result"):  # future from the decode pool
                x = dict(x, image=img.result())
            elif callable(img):  # lazy but no pool
                x = dict(x, image=img())
            if timers is not None:
                timers["decode"] += _time.perf_counter() - t0
            yield x
    finally:
        if pool is not None:
            pool.shutdown(wait=False)


def _run_streaming(cfg, frame_iter, profile_dir=None, checkpoint=None,
                   init_mode="auto", chunk: int = 1, resume=None,
                   budget: bool = False, live=None, live_every: int = 40):
    """Host loop: jitted pipeline steps over a frame stream (streaming mode).

    init_mode: "static" keeps only the on-device static initializer;
    "auto"/"dynamic" additionally run the host-side FlexibleInitializer
    (VINS-style SfM + alignment) and inject its result for in-motion starts.

    chunk: frames per device dispatch. 1 = live semantics (one call per
    frame). K>1 batches K frames into one on-device ``lax.scan`` call after
    initialization — amortizes per-call dispatch latency (decisive when the
    device sits behind a network tunnel) at the cost of K frames of output
    latency; for offline dataset processing that trade is free.
    """
    import jax
    import jax.numpy as jnp

    timers = {"decode": 0.0, "stack": 0.0, "upload": 0.0, "dispatch": 0.0,
              "compute": 0.0}
    frame_iter = _prefetch(frame_iter, timers=timers)

    from functools import partial

    from larvio_tpu.models.propagation import ImuBatch
    from larvio_tpu.pipeline import (
        FrameInput,
        init_pipeline_state,
        jit_pipeline_step,
        pipeline_step,
    )

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def run_chunk(cfg, ps, frames):
        return jax.lax.scan(lambda c, f: pipeline_step(cfg, c, f), ps, frames)

    def to_frame(fr):
        return FrameInput(
            image=jnp.asarray(fr["image"]),
            imu=ImuBatch(
                t=jnp.asarray(fr["imu_t"]),
                w=jnp.asarray(fr["imu_w"]),
                a=jnp.asarray(fr["imu_a"]),
                valid=jnp.asarray(fr["imu_valid"]),
            ),
            t=jnp.asarray(fr["t_img"]),
        )

    def stack_chunk(frs):
        # stack on HOST numpy, then ONE async device_put per leaf: the upload
        # of chunk k+1 overlaps the device compute of chunk k (double
        # buffering — dispatch never waits on a host->device copy itself)
        import numpy as _np

        host = FrameInput(
            image=_np.stack([_np.asarray(f["image"]) for f in frs]),
            imu=ImuBatch(
                t=_np.stack([f["imu_t"] for f in frs]),
                w=_np.stack([f["imu_w"] for f in frs]),
                a=_np.stack([f["imu_a"] for f in frs]),
                valid=_np.stack([f["imu_valid"] for f in frs]),
            ),
            t=_np.stack([f["t_img"] for f in frs]),
        )
        return jax.device_put(host)

    ps = init_pipeline_state(cfg)
    initialized = False
    if resume:
        # restore the FULL pipeline carry (tracker incl. prev_pyr + filter +
        # init accumulator) saved by --checkpoint: the continued run is then
        # step-for-step identical to an uninterrupted one (SURVEY.md §5
        # checkpoint/resume; pinned by tests/test_data_utils.py resume test)
        from larvio_tpu.utils.checkpoint import restore_state

        ps = restore_state(resume, ps)
        initialized = bool(ps.vio.filter.initialized)
        print(f"resumed from {resume} (t={float(ps.vio.filter.time):.2f}s, "
              f"initialized={initialized})")
    flex = None
    if init_mode in ("auto", "dynamic") and not initialized:
        from larvio_tpu.init import FlexibleInitializer

        flex = FlexibleInitializer(cfg, window=15, min_parallax=0.12)
    outs_all = []  # per-frame StepOutput pytrees (device arrays)
    t_start = None
    n = 0
    n_chunks = 0
    pending = []
    # --live: the reference's Pangolin live-view analogue — refresh a PNG of
    # the trajectory-so-far (+ a one-line status) every `live_every` frames.
    # Rendering is host-side and infrequent; only the outputs accumulated
    # since the last refresh are pulled off-device.
    live_hist = []  # np (k,3) position chunks already converted
    live_n_done = 0  # index into outs_all already converted
    live_next = live_every

    def _live_refresh():
        nonlocal live_n_done
        new = outs_all[live_n_done:]
        live_n_done = len(outs_all)
        for o in new:
            pi = np.asarray(o.p)
            ii = np.asarray(o.initialized).astype(bool)
            live_hist.append(pi[ii.reshape(pi.shape[0])]
                             if pi.ndim == 2 else pi[None][ii[None]])
        ph = np.concatenate([h for h in live_hist if h.size], axis=0) \
            if any(h.size for h in live_hist) else np.zeros((0, 3))
        if ph.shape[0] >= 2:
            from larvio_tpu.data.visualize import plot_run

            plot_run(live, np.arange(ph.shape[0], dtype=np.float64), ph,
                     title=f"larvio_tpu live (frame {n})")
        rate = (f" {(n - n_timed0) / (time.perf_counter() - t_start):.1f} fps"
                if t_start else "")
        pos = ph[-1] if ph.shape[0] else (float("nan"),) * 3
        print(f"live: frame {n} t={n / 20.0:.1f}s "
              f"p=({pos[0]:+.2f},{pos[1]:+.2f},{pos[2]:+.2f}){rate}",
              flush=True)
    prof = None
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
        prof = profile_dir
    try:
        for fr in frame_iter:
            if initialized and chunk > 1:
                pending.append(fr)
                if len(pending) == chunk:
                    t0 = time.perf_counter()
                    if isinstance(pending[0]["image"], np.ndarray):
                        frames = stack_chunk(pending)  # host stack + async upload
                    else:  # images already on device (sim render path)
                        frames = jax.tree.map(
                            lambda *xs: jnp.stack(xs), *[to_frame(f) for f in pending]
                        )
                    t1 = time.perf_counter()
                    timers["stack"] += t1 - t0
                    if budget:
                        jax.block_until_ready(frames)
                        t1b = time.perf_counter()
                        timers["upload"] += t1b - t1
                        t1 = t1b
                    first_chunk = n_chunks == 0
                    ps, outs = run_chunk(cfg, ps, frames)
                    t2 = time.perf_counter()
                    timers["dispatch"] += t2 - t1
                    if budget:
                        jax.block_until_ready(outs.p)
                        timers["compute"] += time.perf_counter() - t2
                    n_chunks += 1
                    outs_all.append(outs)
                    n += len(pending)
                    pending = []
                    if live and n >= live_next:
                        _live_refresh()
                        live_next = n + live_every
                    if first_chunk:
                        # the chunk executable compiles on this call — restart
                        # the fps clock so the number reports steady state
                        # (the per-frame path excludes its compile the same way)
                        jax.block_until_ready(outs.p)
                        t_start = time.perf_counter()
                        n_timed0 = n
                        for k in timers:
                            timers[k] = 0.0  # budget reports steady state too
                continue
            t0 = time.perf_counter()
            frame = to_frame(fr)
            t1 = time.perf_counter()
            timers["stack"] += t1 - t0
            if budget:
                jax.block_until_ready(frame)
                t1b = time.perf_counter()
                timers["upload"] += t1b - t1
                t1 = t1b
            ps, out = jit_pipeline_step(cfg, ps, frame)
            t2 = time.perf_counter()
            timers["dispatch"] += t2 - t1
            if budget:
                jax.block_until_ready(out.p)
                timers["compute"] += time.perf_counter() - t2
            outs_all.append(jax.tree.map(lambda a: a[None], out))
            n += 1
            if live and n >= live_next:
                _live_refresh()
                live_next = n + live_every
            if flex is not None and not bool(out.initialized):
                # feed the host initializer from the tracker's current table
                tr = ps.tracker
                flex.push(
                    fr["t_img"], np.asarray(tr.ids), np.asarray(tr.uv_norm),
                    np.asarray(tr.valid), fr["imu_t"], fr["imu_w"], fr["imu_a"],
                    fr["imu_valid"],
                )
                res = flex.try_init()
                if res is not None and res.mode == "dynamic":
                    from larvio_tpu.init.flexible import inject_init_result

                    ps = ps.replace(vio=inject_init_result(cfg, ps.vio, res))
                    print(f"dynamic initialization at t={res.time:.2f}s "
                          f"(|v|={np.linalg.norm(res.v):.2f} m/s)")
                    flex = None
            elif flex is not None:
                flex = None  # on-device static init won the race
            if not initialized:
                # device readback (a full tunnel RTT) only while converging:
                # the flag is monotone (initializer.py: `initialized | do_init`,
                # never cleared by online reset), so once true the live loop
                # stops blocking entirely — per-frame dispatches pipeline and
                # the wire RTT is hidden, not paid per frame
                initialized = bool(out.initialized)
            if t_start is None:
                jax.block_until_ready(out.p)
                t_start = time.perf_counter()
                n_timed0 = n
                for k in timers:
                    timers[k] = 0.0  # budget reports steady state (as chunked)
        # drain the partial tail chunk per-frame
        for fr in pending:
            ps, out = jit_pipeline_step(cfg, ps, to_frame(fr))
            outs_all.append(jax.tree.map(lambda a: a[None], out))
            n += 1
        jax.block_until_ready(outs_all[-1].p)
    finally:
        if prof:
            jax.profiler.stop_trace()
    wall = time.perf_counter() - t_start if t_start else 0.0
    fps = (n - n_timed0) / wall if wall > 0 else 0.0
    if budget and wall > 0:
        nf = max(n - n_timed0, 1)
        parts = {k: 1e3 * v / nf for k, v in timers.items()}
        acc = sum(parts.values())
        # per-frame budget breakdown (VERDICT r2 #1): decode = consumer-visible
        # stall waiting on the prefetch/decode pool; stack = host chunk
        # assembly; upload = host->device copy; dispatch = enqueue round-trip;
        # compute = device execution (budget mode blocks per chunk, so the
        # numbers are un-overlapped worst-case components)
        print(
            "budget ms/frame: "
            + " ".join(f"{k}={parts[k]:.2f}" for k in
                       ("decode", "stack", "upload", "dispatch", "compute"))
            + f" | accounted={acc:.2f} wall={1e3 * wall / nf:.2f}"
        )

    outs = jax.tree.map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0), *outs_all
    )
    t, p, q, init = outs.t, outs.p, outs.q, outs.initialized.astype(bool)
    stats = {
        "tracks": outs.n_tracks.astype(int),
        "clones": outs.n_clones.astype(int),
        "updated": outs.n_updated.astype(int),
        "zupt": outs.stationary.astype(bool),
        "resets": outs.did_reset.astype(bool),
    }
    if checkpoint:
        from larvio_tpu.utils.checkpoint import save_state

        save_state(checkpoint, ps)
    return t, p, q, init, stats, fps, ps


def _tee_last(frame_iter, sink: dict):
    """Pass frames through, remembering the last one (for the plot overlay)."""
    for fr in frame_iter:
        sink["frame"] = fr
        yield fr


def _write_plot(args, cfg, t, p, init, stats, ps, gt=None, last_frame=None):
    from larvio_tpu.data.visualize import plot_run

    kw = {}
    if last_frame:
        img = last_frame["frame"]["image"]
        if callable(img):  # lazy-decode frame (euroc.frames(lazy=True))
            img = img()
        kw["frame"] = np.asarray(img)
        kw["frame_pts"] = np.asarray(ps.tracker.pos)
        kw["frame_valid"] = np.asarray(ps.tracker.valid)
    m = init
    plot_run(
        args.plot, t[m], p[m],
        gt_p=gt[m] if gt is not None else None,
        stats={k: v[m] for k, v in stats.items()},
        title=f"larvio_tpu ({args.cmd})", **kw,
    )
    print(f"plot -> {args.plot}")


def cmd_run(args):
    from larvio_tpu.config import VioConfig, load_yaml
    from larvio_tpu.data.euroc import EurocSequence
    from larvio_tpu.data.trajectory import write_tum

    cfg = VioConfig() if args.config == "-" else load_yaml(args.config)
    seq = EurocSequence(args.dataset)
    last_frame = {}
    # lazy decode: the prefetcher resolves images on a thread pool
    frames = seq.frames(cfg, max_frames=args.max_frames, lazy=True)
    if args.plot:
        frames = _tee_last(frames, last_frame)
    t, p, q, init, stats, fps, ps = _run_streaming(
        cfg,
        frames,
        profile_dir=args.profile,
        checkpoint=args.checkpoint,
        init_mode=args.init,
        chunk=args.chunk,
        resume=args.resume,
        budget=args.budget,
        live=args.live,
        live_every=args.live_every,
    )
    m = init
    write_tum(args.out, t[m], p[m], q[m])
    if args.metrics:
        # structured per-frame observability (SURVEY.md §5: the reference only
        # prints to stdout; we persist the estimator's health counters)
        with open(args.metrics, "w") as f:
            f.write("t,initialized,tracks,clones,updated,zupt,reset\n")
            for i in range(len(t)):
                f.write(
                    f"{t[i]:.6f},{int(init[i])},{stats['tracks'][i]},"
                    f"{stats['clones'][i]},{stats['updated'][i]},"
                    f"{int(stats['zupt'][i])},{int(stats['resets'][i])}\n"
                )
        print(f"metrics -> {args.metrics}")
    print(f"frames={len(t)} fps={fps:.1f} tracks~{stats['tracks'][m].mean():.0f} "
          f"zupt={int(stats['zupt'].sum())} resets={int(stats['resets'].sum())}")
    print(f"trajectory -> {args.out}")
    gt_full = None
    if args.eval and seq.gt is not None:
        from larvio_tpu.data.evaluate import ate_rmse

        gt = seq.ground_truth_at(t[m])
        print(f"ATE RMSE vs ground truth: {ate_rmse(p[m], gt):.4f} m")
    if args.plot:
        if seq.gt is not None:
            gt_full = seq.ground_truth_at(t)
        _write_plot(args, cfg, t, p, init, stats, ps, gt=gt_full,
                    last_frame=last_frame)
    return 0


def cmd_sim(args):
    from larvio_tpu.config import VioConfig
    from larvio_tpu.data.evaluate import ate_rmse
    from larvio_tpu.data.render import Renderer
    from larvio_tpu.data.sim import SimConfig, Simulator
    from larvio_tpu.data.trajectory import write_tum

    cfg = VioConfig()
    sim = Simulator(SimConfig(duration=args.duration), cfg)
    data = sim.generate()
    rend = Renderer(cfg, np.asarray(sim.landmarks))
    R_ci, t_ci = np.asarray(sim.R_ci), np.asarray(sim.t_ci)

    def frame_iter():
        import jax.numpy as jnp

        for k, t in enumerate(data["t_img"]):
            p_w, R_wi = sim.pose(np.asarray(t))
            img = rend.render(
                jnp.asarray((R_ci @ R_wi).T, jnp.float32),
                jnp.asarray(p_w + R_wi.T @ (-R_ci.T @ t_ci), jnp.float32),
            )
            yield {
                "image": img,
                "imu_t": data["imu_t"][k],
                "imu_w": data["imu_w"][k],
                "imu_a": data["imu_a"][k],
                "imu_valid": data["imu_valid"][k],
                "t_img": data["t_img"][k],
            }

    last_frame = {}
    frames = frame_iter()
    if args.plot:
        frames = _tee_last(frames, last_frame)
    t, p, q, init, stats, fps, ps = _run_streaming(cfg, frames, profile_dir=args.profile)
    write_tum(args.out, t[init], p[init], q[init])
    print(f"frames={len(t)} fps={fps:.1f} tracks~{stats['tracks'][init].mean():.0f}")
    if args.eval:
        print(f"ATE RMSE: {ate_rmse(p[init], data['gt_p'][init]):.4f} m")
    if args.plot:
        _write_plot(args, cfg, t, p, init, stats, ps, gt=data["gt_p"],
                    last_frame=last_frame)
    return 0


def cmd_export(args):
    from larvio_tpu.config import VioConfig
    from larvio_tpu.data.export_euroc import export_sim_euroc
    from larvio_tpu.data.sim import SimConfig

    sc = SimConfig(
        duration=args.duration,
        static_lead_in=0.0 if args.moving_start else 2.0,
        seed=args.seed,
    )
    n = export_sim_euroc(args.out_dir, VioConfig(), sc)
    print(f"{n} frames -> {args.out_dir} (EuRoC ASL layout)")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="larvio_tpu", description=__doc__)
    ap.add_argument(
        "--debug-nans", action="store_true",
        help="sanitizer mode (SURVEY.md §5): jax_debug_nans raises at the "
             "first op producing NaN/Inf with a traceback into the pipeline "
             "stage (named_scope regions), instead of the runtime containment "
             "path absorbing it; much slower — debugging only",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    rp = sub.add_parser("run", help="run a EuRoC-format sequence")
    rp.add_argument("config", help="reference-style YAML config, or '-' for defaults")
    rp.add_argument("dataset", help="EuRoC sequence dir (containing mav0/)")
    rp.add_argument("--out", default="trajectory.txt")
    rp.add_argument("--max-frames", type=int, default=None)
    rp.add_argument("--eval", action="store_true", help="ATE vs ground truth")
    rp.add_argument("--profile", default=None, help="dump a jax profiler trace here")
    rp.add_argument("--checkpoint", default=None, help="save final filter state")
    rp.add_argument("--resume", default=None,
                    help="restore tracker+filter state saved by --checkpoint "
                         "and continue (the run proceeds as if uninterrupted)")
    rp.add_argument("--init", default="auto", choices=["auto", "static", "dynamic"],
                    help="initialization: on-device static only, or host dynamic too")
    rp.add_argument("--metrics", default=None,
                    help="write per-frame metrics CSV (tracks, clones, updates, zupt, resets)")
    rp.add_argument("--plot", default=None,
                    help="write a run-summary PNG (trajectory, error, health, feature overlay)")
    rp.add_argument("--budget", action="store_true",
                    help="report a per-frame budget breakdown (decode / stack "
                         "/ upload / dispatch / compute); blocks per chunk, so "
                         "fps in this mode is the un-overlapped worst case")
    rp.add_argument("--chunk", type=int, default=1,
                    help="frames per device dispatch (K>1: on-device scan per "
                         "chunk — amortizes dispatch latency for offline runs)")
    rp.add_argument("--live", default=None,
                    help="live view (reference Pangolin analogue): refresh a "
                         "PNG of the trajectory-so-far at this path during "
                         "the run, with a one-line status per refresh")
    rp.add_argument("--live-every", type=int, default=40,
                    help="frames between --live refreshes (default 40 = 2 s)")
    rp.set_defaults(fn=cmd_run)

    sp = sub.add_parser("sim", help="synthetic rendered sequence (no dataset needed)")
    sp.add_argument("--duration", type=float, default=20.0)
    sp.add_argument("--out", default="trajectory.txt")
    sp.add_argument("--eval", action="store_true")
    sp.add_argument("--profile", default=None)
    sp.add_argument("--plot", default=None,
                    help="write a run-summary PNG (trajectory, error, health, feature overlay)")
    sp.set_defaults(fn=cmd_sim)

    ep = sub.add_parser(
        "export-sim", help="write a simulated sequence as a EuRoC-format dataset"
    )
    ep.add_argument("out_dir")
    ep.add_argument("--duration", type=float, default=20.0)
    ep.add_argument("--moving-start", action="store_true",
                    help="no static lead-in (exercises the dynamic initializer)")
    ep.add_argument("--seed", type=int, default=0)
    ep.set_defaults(fn=cmd_export)

    args = ap.parse_args(argv)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
