"""Quick axon-tunnel health probe.

The tunnel goes down for extended stretches (CLAUDE.md: backend init hangs,
then "UNAVAILABLE" errors). This probe bounds the check: run it under
``timeout`` (backend init on a HEALTHY tunnel completes in ~10-30 s):

    timeout 90 python tools/tpu_health.py && echo up || echo down

Exit 0 with a "TPU OK" line when a tiny program round-trips a value; any
hang is the caller's timeout's problem (a hung init cannot be interrupted
from inside the process).
"""

import sys
import time


def main() -> int:
    t0 = time.time()
    try:
        import jax
        import jax.numpy as jnp

        devs = jax.devices()
        v = float(jnp.sum(jnp.ones((8, 8)) * 2))  # value fetch = real sync
        assert v == 128.0, v
        print(f"TPU OK {devs} ({time.time() - t0:.1f}s)")
        return 0
    except Exception as e:  # noqa: BLE001 — report any failure mode
        print(f"TPU DOWN: {type(e).__name__}: {str(e)[:300]}")
        return 1


if __name__ == "__main__":
    sys.exit(main())
