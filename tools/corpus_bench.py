#!/usr/bin/env python
"""Mixed-size tiled-corpus throughput: serial per-image vs run_corpus.

The reference's arbitrary-resolution demo loops images one at a time
(demo_any_resolution.py:111-146); TiledRunner.run_corpus batches
same-canvas-bucket images so small canvases reach the model's batched
throughput. This measures both on a 20-image synthetic mixed-size corpus
(round-4 done-gate: corpus >= 1.5x serial).

Timing: wall-clock from dispatch to full numpy materialization of every
output — np.asarray forces the real D2H, so the remote tunnel's lazy
block_until_ready cannot under-count. The whole corpus takes seconds, so
fixed RTT overheads amortize.

Usage: PYTHONPATH=/root/.axon_site python tools/corpus_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    from bench import _build
    from sunet_tf_tpu.config import Config
    from sunet_tf_tpu.infer.tiled import TiledRunner

    cfg, model, graphdef, params = _build(Config(), "pallas")
    model_fn = lambda p, t: nnx.merge(graphdef, p)(t)
    runner = TiledRunner(model_fn, params, kernel=256, stride=128,
                         tile_batch=64)

    r = np.random.default_rng(0)
    sizes = ([(256, 256)] * 8 + [(200, 180)] * 4 + [(300, 280)] * 4
             + [(500, 400)] * 4)
    images = [jnp.asarray(r.random((h, w, 3)), jnp.float32)
              for h, w in sizes]

    def serial():
        return [np.asarray(runner(im[None])) for im in images]

    def corpus():
        return [np.asarray(o) for o in runner.run_corpus(images)]

    # warm both code paths (compiles cached per canvas bucket)
    serial()
    corpus()

    def timed(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = fn()
            best = min(best, time.perf_counter() - t0)
        return best, outs

    t_serial, o_s = timed(serial)
    t_corpus, o_c = timed(corpus)
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(o_s, o_c))
    n = len(images)
    print(f"serial : {t_serial:.3f}s  ({n / t_serial:.2f} img/s)")
    print(f"corpus : {t_corpus:.3f}s  ({n / t_corpus:.2f} img/s)")
    print(f"speedup: {t_serial / t_corpus:.2f}x   max|diff|={worst:.2e}")


if __name__ == "__main__":
    main()
