"""One clean TPU liveness probe: device init + tiny matmul, bounded.

Exits 0 and prints "TPU_UP <secs>" iff the axon backend initializes and a
256x256 bf16 matmul round-trips a scalar within the alarm budget. Uses
SIGALRM (not an external SIGKILL) so a hung relay connection is abandoned
via a normal exception unwind — killed-mid-flight clients are one of the
documented ways the relayed chip wedges for ~1h (CLAUDE.md).

Usage: python scripts/tpu_probe.py [budget_seconds=240]
"""
import signal
import sys
import time


def main() -> int:
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 240

    def on_alarm(signum, frame):
        raise TimeoutError(f"probe exceeded {budget}s")

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(budget)
    t0 = time.time()
    try:
        import numpy as np
        import jax
        import jax.numpy as jnp

        devs = jax.devices()
        x = jnp.ones((256, 256), jnp.bfloat16)
        v = float(np.asarray((x @ x).ravel()[0]))
        signal.alarm(0)
        print(f"TPU_UP {time.time()-t0:.1f}s devices={devs} v={v}", flush=True)
        return 0
    except Exception as e:  # noqa: BLE001 — any failure means "down"
        signal.alarm(0)
        print(f"TPU_DOWN {time.time()-t0:.1f}s {type(e).__name__}: {e}",
              flush=True)
        return 1


if __name__ == "__main__":
    sys.exit(main())
