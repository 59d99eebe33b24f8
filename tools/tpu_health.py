#!/usr/bin/env python
"""TPU runtime health probe that cannot wedge the caller.

Device discovery and device ops block indefinitely when the TPU runtime is
down (tethered-relay outages observed at 40 min-2 h+), and a wedged claim is
only cleared by killing the process that issued it. So the probe runs in a
child process with a hard deadline and reports:

    exit 0  healthy — prints claim latency and a tiny device-op round-trip
    exit 1  unresponsive within the deadline (runtime outage / claim lag)
    exit 2  probe errored (no TPU platform, backend exception, ...)

Usage:  python tools/tpu_health.py [deadline_seconds=120]
"""

import os
import subprocess
import sys
import time

_CHILD_CODE = r"""
import time, sys
t0 = time.time()
import jax
devices = jax.devices()
t_claim = time.time() - t0
import jax.numpy as jnp
t1 = time.time()
x = jnp.ones((256, 256))
val = float(jnp.sum(x * 2.0))  # forces a real device round-trip on axon
t_op = time.time() - t1
assert val == 2.0 * 256 * 256, val
print(f"claim={t_claim:.1f}s op={t_op*1e3:.0f}ms devices={devices}", flush=True)
"""


def main():
    deadline = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD_CODE], timeout=deadline,
            capture_output=True, text=True, env=dict(os.environ))
    except subprocess.TimeoutExpired:
        print(f"TPU UNRESPONSIVE: no device claim + round-trip within "
              f"{deadline:.0f}s (runtime outage or claim lag)", flush=True)
        return 1
    if proc.returncode != 0:
        print(f"TPU PROBE ERROR (rc={proc.returncode}):\n{proc.stderr.strip()[-2000:]}",
              flush=True)
        return 2
    print(f"TPU HEALTHY ({time.time() - t0:.1f}s total): {proc.stdout.strip()}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
