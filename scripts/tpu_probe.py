"""Axon tunnel liveness probe: run ONE tiny device program and fetch a
scalar.  Exit 0 iff a real TPU executed it (the r3/r4 outages hang at
device enumeration, so a bounded `timeout` around this probe is the
canary — see scripts/tpu_watch.sh).

    timeout 300 python scripts/tpu_probe.py
"""
import sys
import time


def main() -> int:
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    backend = jax.default_backend()
    print(f"backend={backend} after {time.time() - t0:.1f}s",
          flush=True)
    if backend != "tpu":
        return 1
    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    s = int(jnp.sum(x))
    print(f"probe ok sum={s} in {time.time() - t0:.1f}s", flush=True)
    return 0 if s == 8 * 128 * (8 * 128 - 1) // 2 else 1


if __name__ == "__main__":
    sys.exit(main())
