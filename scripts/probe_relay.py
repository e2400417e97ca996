#!/usr/bin/env python
"""Probe the tunneled single-chip runtime's transfer/readiness semantics.

Reproduces the two measurements that shaped the round-5 e2e pipeline
(BASELINE.md "End-to-end, rebuilt for the relay's actual semantics"):

1. H2D transfers overlap device compute: a 32 MB upload issued while a
   ~4 s on-device burn runs completes inside the burn at no cost to
   either.
2. A PENDING buffer's readiness is only observable at full-queue drains:
   with two burns queued, the first burn's output reports ready at its
   own completion only if nothing was dispatched after it before the
   check; anything dispatched later pushes the observation to the full
   drain.  Fetches of already-observed buffers stay fast at any time.
"""

import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@jax.jit
def burn(a, s):
    def body(c, _):
        c = c @ a
        c = c / jnp.max(jnp.abs(c)) + s
        return c, ()

    out, _ = jax.lax.scan(body, a, None, length=5000)
    return out


def main():
    a = jnp.asarray(np.random.rand(4096, 4096).astype(np.float32))
    float(np.asarray(burn(a, 0.0)[0, 0]))  # compile + warm

    t0 = time.time()
    r = burn(a, 1e-9)
    float(np.asarray(r[0, 0]))
    t_burn = time.time() - t0
    print(f"burn alone: {t_burn:.2f}s", flush=True)

    x = np.random.rand(16, 1000, 500).astype(np.float32)
    t0 = time.time()
    d = jnp.asarray(x)
    float(np.asarray(d[0, 0, 0]))
    t_up = time.time() - t0
    print(f"32MB upload alone: {t_up:.2f}s", flush=True)

    # (1) overlap: upload during burn.
    x2 = np.random.rand(16, 1000, 500).astype(np.float32)
    t0 = time.time()
    r = burn(a, 2e-9)
    d2 = jnp.asarray(x2)
    float(np.asarray(d2[0, 0, 0]))
    t_mid = time.time() - t0
    float(np.asarray(r[0, 0]))
    t_tot = time.time() - t0
    print(
        f"upload-during-burn: upload done at {t_mid:.2f}s, burn+upload "
        f"total {t_tot:.2f}s vs serial {t_burn + t_up:.2f}s", flush=True
    )

    # (2) readiness granularity: two queued burns.
    t0 = time.time()
    r1 = burn(a, 3e-9)
    r2 = burn(a, 4e-9)
    t_r1 = t_r2 = None
    while t_r2 is None and time.time() - t0 < 60:
        if t_r1 is None and r1.is_ready():
            t_r1 = time.time() - t0
        if r2.is_ready():
            t_r2 = time.time() - t0
        time.sleep(0.05)
    print(f"queued burns: r1 ready at {t_r1:.2f}s, r2 at {t_r2:.2f}s",
          flush=True)

    # Dispatch AFTER r3's completion-window passes unobserved: readiness
    # of r3 is then only reported once r4 drains.
    t0 = time.time()
    r3 = burn(a, 5e-9)
    time.sleep(t_burn + 0.5)  # r3 computed, but never observed
    r4 = burn(a, 6e-9)
    t1 = time.time()
    while not r3.is_ready() and time.time() - t1 < 60:
        time.sleep(0.05)
    print(
        f"r3 (computed before r4's dispatch, unobserved) reported ready "
        f"{time.time() - t1:.2f}s after r4's dispatch "
        f"(burn is {t_burn:.2f}s; ~0 = per-buffer readiness, ~burn = "
        f"drain-granularity readiness)", flush=True
    )
    float(np.asarray(r4[0, 0]))


if __name__ == "__main__":
    main()
