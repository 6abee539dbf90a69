#!/usr/bin/env python
"""Hardware kernel-parity gate (VERDICT r2 #7).

Runs every Pallas kernel against its XLA reference on the current
backend (TPU when the tunnel is up) and exits nonzero on any failure.
With the persistent compile cache warm this completes in well under
60 s; run it before trusting any kernel change:

    python scripts/tpu_verify.py            # TPU (or whatever is live)
    JAX_PLATFORMS=cpu python scripts/tpu_verify.py --cpu
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    from disinfect_slam_tpu.utils.cache import enable as _cache

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # after the platform pin, so --cpu entries land in the CPU cache dir
    _cache()

    from disinfect_slam_tpu.utils.kernel_verify import verify_all

    t0 = time.perf_counter()
    print(f"[tpu_verify] backend={jax.default_backend()}", file=sys.stderr)
    ok = verify_all(verbose=True)
    print(
        f"[tpu_verify] {'ALL PASS' if ok else 'FAILURES'} "
        f"in {time.perf_counter() - t0:.1f} s",
        file=sys.stderr,
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
