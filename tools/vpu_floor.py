"""v5e VPU-rate microbench: close the 'stage-0 VPU floor' question.

Method: a Pallas program holds (ROWS, LANES) fp32 tiles in VMEM and
applies an elementwise op T times in a fori_loop (carry-dependent, so
Mosaic cannot fold it). The kernel is chained n times inside ONE jit
(output feeds input) and two chain lengths are differenced — the repo's
standard timing method (host-side per-call timing lies through the
tunnel). Ops:

  - fma:   y = y * a + b              (1 canonical VPU op)
  - exp:   y = exp(-y) * 0.5 + 0.25   (bounded; 1 transcendental + fma)
  - tanh:  y = tanh(y) * 0.9 + 0.05   (the GELU inner transcendental)
  - gelu:  full tanh-form GELU chain

The stage-0 fused block kernel's measured pass rates are ~195 Gelem/s
(exp pass incl. bf16 write) and ~175 Gelem/s (GELU over (M,4C)). If the
fma rate here is similar, passes are issue/bandwidth-bound and the kernel
is at the hardware floor; if fma is many x faster, the transcendentals
are the floor and pass-count work is done.

MEASURED (v5e, 2026-08-19, T=2048, chain-diff n=16/2):

    fma  :  440.3 Gelem/s   (9.754 ms/call)
    exp  :  345.1 Gelem/s   (12.444 ms/call)
    tanh :  371.0 Gelem/s   (11.577 ms/call)
    gelu :  168.6 Gelem/s   (25.478 ms/call)

CONCLUSION (closes the round-3 'stage-0 VPU floor' candidate): the
kernel's GELU pass (~175 G) is AT the pure-ALU tanh-GELU rate (169 G) —
memory traffic hides entirely under the ALU chain; nothing to save
without changing the function (the degree-15 poly variant was slower:
serial Horner latency). The exp pass (~195 G) sits at ~57% of pure-ALU
exp (345 G) — the gap is exactly the one VMEM fp32 read + bf16 write
the pass must do, because exact rowmax softmax needs the full score row
before exp (a reduce->transform dependency no fusion can break; flash
rescaling adds passes at N=64). Ceiling if the write were free:
~0.15 ms/block of the 1.15 ms stage-0 block — not reachable exactly.
Stage-0 is at its hardware floor for the required pass structure.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 512, 512     # 1 MB fp32 tile, VMEM-resident
GRID = 8
T = 2048                   # in-kernel op repetitions


def _body(op, t_ref, x_ref, o_ref):
    def step(_, y):
        if op == "fma":
            return y * 0.999 + 0.001
        if op == "exp":
            return jnp.exp(-y) * 0.5 + 0.25
        if op == "tanh":
            return jnp.tanh(y) * 0.9 + 0.05
        if op == "gelu":
            return jax.nn.gelu(y, approximate=True) * 0.9 + 0.05
        raise ValueError(op)

    o_ref[...] = jax.lax.fori_loop(0, t_ref[0], step, x_ref[...])


def rate(op):
    f = pl.pallas_call(
        functools.partial(_body, op),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((ROWS, LANES), lambda i, t: (i, 0))],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i, t: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((GRID * ROWS, LANES), jnp.float32),
    )
    x = jax.random.uniform(jax.random.key(0), (GRID * ROWS, LANES),
                           jnp.float32)
    tt = jnp.array([T], jnp.int32)

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain(tt, x, n):
        return jnp.sum(jax.lax.fori_loop(0, n, lambda _, y: f(tt, y), x))

    def timed(n, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(tt, x, n))   # D2H forces completion (tunnel-safe)
            best = min(best, time.perf_counter() - t0)
        return best

    timed(2, reps=1)
    timed(16, reps=1)
    dt = (timed(16) - timed(2)) / 14          # s per kernel call
    elems = GRID * ROWS * LANES * T
    return elems / dt / 1e9, dt


if __name__ == "__main__":
    for op in ("fma", "exp", "tanh", "gelu"):
        r, dt = rate(op)
        print(f"{op:5s}: {r:8.1f} Gelem/s  ({dt*1e3:.3f} ms/call, T={T})")
