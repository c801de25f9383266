#!/usr/bin/env python
"""Benchmarks on the real chip. Default (no args): the headline 256x256
denoise inference throughput — prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"} where vs_baseline is relative to
the driver's 500 img/s/chip north star (BASELINE.json), preceded by a
fused-vs-XLA numerics gate (compiled Mosaic, not interpret mode — CI runs
the kernels on CPU only, so hardware numerics are asserted here).

Other modes (one JSON line each, recorded in BENCH_SUITE.json):

    python bench.py train    # BASELINE config #4: training-step throughput
    python bench.py tiled    # BASELINE config #3: 1024^2 stride-128 tiled
    python bench.py scaled   # BASELINE config #5: EMB 180 / WIN 16 / 512^2
    python bench.py latency  # batch-1 256^2 forward latency (serving SLA)
    python bench.py all      # headline + the above

Timing method (all modes): host-side per-call timing lies through the
remote-execution tunnel, so each bench runs N repetitions inside/behind one
dispatch and differences two values of N — fixed host overheads cancel.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NORTH_STAR = 500.0  # images/sec/chip (BASELINE.json)

# Persistent compilation cache: every large compile through the remote
# tunnel is a 3-6 min RPC; with the cache, repeat invocations (the driver
# runs bench.py every round) deserialize the executable in <1 s. Verified
# working through the axon backend (0.94 s -> 0.017 s across processes).
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _emit(metric, value, unit, baseline=None):
    line = {"metric": metric, "value": round(value, 2), "unit": unit,
            "vs_baseline": round(value / baseline, 4) if baseline else None}
    print(json.dumps(line))
    return line


def _build(cfg, backend, seed=0):
    from flax import nnx

    from sunet_tf_tpu.models.sunet import build_model

    cfg = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="bfloat16",
                                            attention_backend=backend))
    model = build_model(cfg, seed=seed)
    graphdef, params = nnx.split(model, nnx.Param)
    return cfg, model, graphdef, params


def _forward_chain(graphdef, params, x, n1=4, n2=16, reps=3):
    """img/s via the fori_loop chain-difference method.

    DYNAMIC trip count: n_iters is a traced int32, so both chain lengths
    share ONE compile (a static n would pay two multi-minute remote
    compiles for the same module)."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    @jax.jit
    def chain(p, x, n_iters):
        def body(_, x):
            y = nnx.merge(graphdef, p)(x)
            # Scalar coupling serializes iterations without letting XLA
            # dead-code-eliminate the model. Reduce the lane dim (3
            # channels) FIRST: a direct mean over (B, H, W, 3) runs the
            # big reduction at 3/128 lane occupancy and was costing
            # 1.7 ms/iter (3.9%) of pure measurement artifact.
            return x * 0.999 + 0.001 * jnp.mean(jnp.sum(y, axis=-1))

        return jnp.sum(jax.lax.fori_loop(0, n_iters, body, x))

    def timed(n, reps):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(params, x, jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best

    timed(n1, 1)
    timed(n2, 1)
    dt = (timed(n2, reps) - timed(n1, reps)) / (n2 - n1)
    return x.shape[0] / dt if dt > 0 else 0.0, dt


def numerics_gate(tol=5e-3):
    """Fused-kernel vs XLA forward allclose ON HARDWARE (compiled Mosaic).
    Hard-fails the bench if the paths diverge — kernel regressions on the
    chip cannot hide behind the CPU-interpret test suite. Runs AFTER the
    headline JSON line is printed (driver-budget rule: optional work never
    delays the scoreable line) at batch 1 — the kernels are batch-griddded,
    so batch 1 exercises every code path the batched forward does."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from sunet_tf_tpu.config import Config

    x = jax.random.uniform(jax.random.key(1), (1, 256, 256, 3), jnp.float32)
    outs = {}
    for backend in ("pallas", "xla"):
        cfg, model, graphdef, params = _build(Config(), backend)
        fwd = jax.jit(lambda p, x: nnx.merge(graphdef, p)(x))
        outs[backend] = np.asarray(fwd(params, x), dtype=np.float64)
    diff = float(np.mean(np.abs(outs["pallas"] - outs["xla"])))
    print(f"# numerics gate: pallas-vs-xla mean|diff| = {diff:.2e} "
          f"(tol {tol})", file=sys.stderr)
    if not np.isfinite(diff) or diff > tol:
        print(json.dumps({"metric": "numerics_gate", "value": diff,
                          "unit": "mean_abs_diff", "vs_baseline": None}))
        sys.exit(1)


def bench_headline():
    import jax
    import jax.numpy as jnp

    from sunet_tf_tpu.config import Config

    cfg, model, graphdef, params = _build(Config(), "pallas")
    gflop = model.flops() / 1e9
    best = 0.0
    # Single batch 128 by default: the sweeps showed throughput is
    # monotonic in batch and FLAT from b64 (855.1) to b128 (860.8), so a
    # sweep only spends driver wall-clock. BENCH_BATCHES overrides.
    for b in (int(v) for v in os.environ.get("BENCH_BATCHES", "128").split(",")):
        x = jax.random.uniform(jax.random.key(0), (b, 256, 256, 3), jnp.float32)
        ips, dt = _forward_chain(graphdef, params, x)
        print(f"# batch {b}: {ips:.1f} img/s ({dt*1e3:.2f} ms/iter, "
              f"{ips * gflop / 1e3:.1f} TFLOP/s)", file=sys.stderr)
        best = max(best, ips)
    return _emit("denoise_256_images_per_sec_per_chip", best, "img/s/chip",
                 NORTH_STAR)


def bench_train(batch=None):
    """BASELINE config #4: full denoise train step (on-device AWGN + aug,
    Charbonnier, backward, Adam) — the reference hot loop train.py:320-344.

    Chains K whole train steps inside ONE jit (fori_loop with a DYNAMIC
    trip count — one compile) and differences two K values. The previous
    per-step python loop measured 71.6 ms/step where the device module
    actually runs 107.9 ms (xprof): block_until_ready is lazy through the
    remote-execution tunnel, so per-step dispatch timing UNDER-counts and
    inflated train numbers by ~40% (also the source of the phantom
    "batch-32 regression": chained + profiled timing both show b32 at
    parity-or-better per image)."""
    import functools as _ft

    import jax
    import jax.numpy as jnp

    from sunet_tf_tpu.config import Config
    from sunet_tf_tpu.train.loop import build_steps, make_optimizer

    # 16,32: train throughput is monotonic to b32 (204.8/217.2) and FLAT
    # beyond — b64 measured 216.0 img/s (296.2 ms/step), so the sweep
    # stops at 32.
    batches = ([batch] if batch else
               [int(v) for v in
                os.environ.get("BENCH_TRAIN_BATCHES", "16,32").split(",")])
    results = {}
    base = Config()
    base = base.replace(swinunet=base.swinunet.__class__(
        **{**base.swinunet.__dict__, "out_chans": 3}))
    # pallas: best over the batch sweep (same policy as the headline);
    # xla: first batch only (the comparison footnote, one compile)
    plans = [("pallas", b) for b in batches] + [("xla", batches[0])]
    for backend, batch in plans:
        cfg, model, graphdef, params = _build(base, backend)
        tx = make_optimizer(cfg, steps_per_epoch=100)
        opt_state = tx.init(params)
        fns = build_steps(cfg, graphdef, tx, task="denoise", sigma=50.0)
        rngb = np.random.default_rng(0)
        # Device-resident batch: the real Trainer overlaps H2D with
        # compute via Prefetcher(put=shard_batch), so steady-state
        # training sees the compute number, not compute+transfer.
        b = {"input": jnp.asarray(rngb.integers(
                 0, 255, (batch, 256, 256, 3), dtype=np.uint8)),
             "target": jnp.asarray(rngb.integers(
                 0, 255, (batch, 256, 256, 3), dtype=np.uint8))}
        rng = jax.random.key(0)

        @_ft.partial(jax.jit, donate_argnums=(0, 1))
        def chain(params, opt_state, b, k):
            def body(i, carry):
                p, o = carry
                p, o, _, _ = fns.train_step(p, o, b, rng,
                                            i.astype(jnp.uint32), {})
                return (p, o)

            return jax.lax.fori_loop(0, k, body, (params, opt_state))

        state = [params, opt_state]

        def timed(k, reps):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                state[0], state[1] = chain(state[0], state[1], b,
                                           jnp.int32(k))
                # Real D2H of one element: block_until_ready can return
                # lazily through the remote-execution tunnel (measured: a
                # warm process read 66.5 ms/step where standalone
                # processes and xprof both say 78; the other bench modes
                # already sync via float(chain(...)) and never drifted).
                leaf = jax.tree.leaves(state[0])[0]
                np.asarray(leaf[(0,) * leaf.ndim])
                best = min(best, time.perf_counter() - t0)
            return best

        timed(2, 1)
        timed(8, 1)
        dt = (timed(8, 3) - timed(2, 3)) / 6
        results[backend] = max(results.get(backend, 0.0), batch / dt)
        print(f"# train {backend} batch {batch}: {batch/dt:.1f} img/s "
              f"({dt*1e3:.1f} ms/step)", file=sys.stderr)
    line = _emit("train_256_images_per_sec_per_chip", results["pallas"],
                 "img/s/chip", results["xla"])
    line["xla_img_per_sec"] = round(results["xla"], 2)
    return line


def bench_tiled():
    """BASELINE config #3: 1024^2 denoise via stride-128 overlap tiling
    (reference demo_any_resolution.py:45-52,116-139 workload, batched).

    Chains n whole tiled programs inside ONE jit (fori_loop) and
    differences two chain lengths — the same method as every other mode.
    The previous per-call loop paid one tunnel dispatch + D2H sync per
    image (~50 ms of RTT), which mismeasured the device throughput."""
    import functools as _ft

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from sunet_tf_tpu.config import Config
    from sunet_tf_tpu.infer.tiled import tiled_inference

    cfg, model, graphdef, params = _build(Config(), "pallas")
    model_fn = lambda p, t: nnx.merge(graphdef, p)(t)
    img = jax.random.uniform(jax.random.key(0), (1, 1024, 1024, 3), jnp.float32)

    @jax.jit
    def chain(p, img, n_iters):
        def body(_, im):
            out = tiled_inference(model_fn, im, p, kernel=256,
                                  stride=128, tile_batch=64)
            # Lane-dim-first reduction: see _forward_chain — a direct
            # mean over (1, 1024, 1024, 3) runs at 3/128 lane occupancy
            # (~27 ms/img of measurement artifact at this size).
            return im * 0.999 + 0.001 * jnp.mean(jnp.sum(out, axis=-1))

        return jnp.sum(jax.lax.fori_loop(0, n_iters, body, img))

    def timed(n, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(params, img, jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best

    timed(1, reps=1)
    timed(5, reps=1)
    dt = (timed(5) - timed(1)) / 4
    ips = 1.0 / dt
    print(f"# tiled 1024^2 stride 128: {dt*1e3:.1f} ms/img "
          f"({ips:.2f} img/s, 49 tiles/img)", file=sys.stderr)
    return _emit("tiled_1024_stride128_images_per_sec_per_chip", ips, "img/s/chip")


def bench_scaled():
    """BASELINE config #5: scaled SUNet (EMB_DIM 180, WIN 16, 512^2)."""
    import jax
    import jax.numpy as jnp

    from sunet_tf_tpu.config import scaled_config

    cfg, model, graphdef, params = _build(scaled_config(), "pallas")
    gflop = model.flops() / 1e9
    b = int(os.environ.get("BENCH_SCALED_BATCH", "8"))
    x = jax.random.uniform(jax.random.key(0), (b, 512, 512, 3), jnp.float32)
    ips, dt = _forward_chain(graphdef, params, x, n1=2, n2=8)
    print(f"# scaled 512^2 batch {b}: {ips:.1f} img/s ({dt*1e3:.1f} ms/iter, "
          f"{ips * gflop / 1e3:.1f} TFLOP/s)", file=sys.stderr)
    return _emit("scaled_emb180_win16_512_images_per_sec_per_chip", ips,
                 "img/s/chip")


def bench_latency():
    """Batch-1 256^2 forward latency — the serving-SLA counterpart of the
    batched-throughput headline (reference demo.py:70-77 runs exactly this
    shape per image). Chain-timed like every other mode, so the number is
    pure device time per image, excluding host dispatch."""
    import jax
    import jax.numpy as jnp

    from sunet_tf_tpu.config import Config

    cfg, model, graphdef, params = _build(Config(), "pallas")
    x = jax.random.uniform(jax.random.key(0), (1, 256, 256, 3), jnp.float32)
    ips, dt = _forward_chain(graphdef, params, x, n1=8, n2=32)
    print(f"# batch 1: {dt*1e3:.2f} ms/img ({ips:.1f} img/s)",
          file=sys.stderr)
    return _emit("latency_256_batch1_ms_per_image", dt * 1e3, "ms")


def main():
    _enable_compile_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if mode == "headline":
        # JSON line FIRST (the driver's scoreable output), gate after —
        # a gate failure still exits non-zero so regressions can't hide.
        bench_headline()
        numerics_gate()
        return
    lines = []
    if mode == "all":
        lines.append(bench_headline())
    if mode in ("train", "all"):
        lines.append(bench_train())
    if mode in ("tiled", "all"):
        lines.append(bench_tiled())
    if mode in ("scaled", "all"):
        lines.append(bench_scaled())
    if mode in ("latency", "all"):
        lines.append(bench_latency())
    if mode == "all":
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_SUITE.json"), "w") as f:
            json.dump(lines, f, indent=1)
        numerics_gate()


if __name__ == "__main__":
    main()
