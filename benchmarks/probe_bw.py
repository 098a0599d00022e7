#!/usr/bin/env python3
"""Raw HBM bandwidth / MXU-rate probes for the bench chip.

Establishes the speed-of-light envelope the aggregation kernels are
designed against: XLA elementwise streaming bandwidth, Pallas streaming
bandwidth vs tile size, and dense-matmul TFLOP/s.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.probe_ops import timed
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=131072)
    ap.add_argument("--d", type=int, default=128)
    args = ap.parse_args()
    e, d = args.e, args.d

    rng = np.random.default_rng(0)
    msgs = rng.standard_normal((e, d)).astype(np.float32)

    def report(name, sec, bytes_moved=None, flops=None):
        extra = ""
        if bytes_moved:
            extra += f" {bytes_moved/sec/1e9:8.1f} GB/s"
        if flops:
            extra += f" {flops/sec/1e12:8.2f} TFLOP/s"
        print(f"{name:44s} {sec*1e6:9.1f} us {extra}")

    # XLA elementwise copy (x*2): 2 * E * D * 4 bytes
    t = timed(lambda x: x * 2.0, (msgs,))
    report("XLA x*2 f32", t, bytes_moved=2 * e * d * 4)

    bf = msgs.astype(jnp.bfloat16)
    t = timed(lambda x: x * 2.0, (bf,))
    report("XLA x*2 bf16", t, bytes_moved=2 * e * d * 2)

    # Pallas passthrough at larger tiles
    def passthrough(tile):
        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0

        return pl.pallas_call(
            kern,
            grid=(e // tile,),
            in_specs=[pl.BlockSpec((tile, d), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, d), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((e, d), jnp.float32),
        )

    for tile in (1024, 2048, 4096):
        if e % tile:
            continue
        t = timed(lambda m, k=passthrough(tile): k(m), (msgs,))
        report(f"pallas passthrough tile={tile} ({e//tile} st)", t,
               bytes_moved=2 * e * d * 4)

    # MXU: square matmuls
    for n in (1024, 2048, 4096):
        a = rng.standard_normal((n, n)).astype(np.float32)
        b = rng.standard_normal((n, n)).astype(np.float32)
        t = timed(lambda a, b=jnp.asarray(b): a @ b, (a,))
        report(f"matmul f32 {n}x{n}", t, flops=2 * n**3)
        abf = a.astype(jnp.bfloat16)
        bbf = jnp.asarray(b).astype(jnp.bfloat16)
        t = timed(lambda a, b=bbf: a @ b, (abf,))
        report(f"matmul bf16 {n}x{n}", t, flops=2 * n**3)


if __name__ == "__main__":
    main()
