"""Probe the Mosaic toolchain for int16 vector-arithmetic support.

Round 2 found ANY int16 vector arithmetic (max/sub, roll,
cast-in-where) crashes the remote Mosaic compiler with HTTP 500, while
int16 copy/select/bitcast compile.  The dp_dtype="i16" kernel path
(2x elementwise throughput) stays interpret-only until this probe goes
green.  Re-run each round; ops are probed one by one in subprocesses so
a compiler crash doesn't kill the sweep.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_i16.py
"""

import os
import subprocess
import sys

PROBES = {
    "i16_max": "jnp.maximum(x, y)",
    "i16_sub": "x - y",
    "i16_add": "x + y",
    "i16_roll": "pltpu.roll(x, shift=1, axis=1)",
    "i16_select": "jnp.where(x > 0, x, y)",
    "i16_cast_from_i32": "(x.astype(jnp.int32) + 1).astype(jnp.int16)",
    "i16_cmp_to_sel_i16": "jnp.where(x > y, jnp.int16(1), jnp.int16(0)) + x",
}

CHILD = r"""
import sys
import jax
import jax.numpy as jnp
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

expr = sys.argv[1]

def kernel(x_ref, y_ref, o_ref):
    x = x_ref[:]
    y = y_ref[:]
    o_ref[:] = eval(expr)

x = jnp.ones((16, 128), jnp.int16)
y = jnp.ones((16, 128), jnp.int16) * 2
out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int16),
)(x, y)
jax.block_until_ready(out)
print("COMPILED-AND-RAN", out.sum())
"""


def main():
    env = dict(os.environ)
    ok = 0
    for name, expr in PROBES.items():
        r = subprocess.run(
            [sys.executable, "-c", CHILD, expr],
            env=env, capture_output=True, text=True, timeout=600,
        )
        good = r.returncode == 0 and "COMPILED-AND-RAN" in r.stdout
        ok += good
        tail = (r.stderr.strip().splitlines() or [""])[-1][:120]
        print(f"{name:22s} {'OK' if good else 'CRASH'}  {'' if good else tail}",
              flush=True)
    print(f"{ok}/{len(PROBES)} int16 ops compile", flush=True)


if __name__ == "__main__":
    main()
