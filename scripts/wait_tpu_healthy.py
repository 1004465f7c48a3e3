"""Block until the TPU worker answers a tiny dispatch quickly.

After a worker crash ("TPU worker process crashed or restarted") the chip
recovers by itself, but the NEXT process can land mid-recovery: its first
dispatch then takes minutes or hits the still-crashed worker (observed
2026-08-21 during the round-5 blend bisect — a probe stage started 4 min
after a crash saw a 261 s handshake and then a residual crash, poisoning
the bisect signal). Probe in fresh subprocesses until the handshake is
fast, so each bisect/capacity stage starts against a healthy worker.

Usage: python scripts/wait_tpu_healthy.py [max_wait_s]   (default 1200)
Exit 0 when healthy, 1 on timeout.
"""

import os
import subprocess
import sys
import time

PROBE = r"""
import time, sys
t0 = time.time()
import jax, jax.numpy as jnp
v = float(jnp.float32(1.0) + jnp.float32(2.0))
print(f"{time.time() - t0:.1f}")
"""


def main():
    max_wait = float(sys.argv[1]) if len(sys.argv) > 1 else 1200.0
    t_start = time.time()
    attempt = 0
    while time.time() - t_start < max_wait:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", PROBE], capture_output=True,
                text=True, timeout=120,
            )
            if out.returncode == 0:
                dt = float(out.stdout.strip().splitlines()[-1])
                print(f"[wait_tpu] attempt {attempt}: handshake {dt:.1f}s",
                      flush=True)
                if dt < 20.0:
                    return 0
            else:
                tail = (out.stderr or "").strip().splitlines()[-1:] or ["?"]
                print(f"[wait_tpu] attempt {attempt}: probe failed: {tail[0]}",
                      flush=True)
        except subprocess.TimeoutExpired:
            print(f"[wait_tpu] attempt {attempt}: probe timed out (120s)",
                  flush=True)
        time.sleep(30.0)
    print(f"[wait_tpu] NOT healthy after {max_wait:.0f}s", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
