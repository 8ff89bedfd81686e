#!/usr/bin/env python
"""Isolate the per-UPLOAD host-buffer leak on the tunneled TPU backend.

Found while soaking `annonet_serve` on the v5e (docs/SERVING.md, round
4): server RSS grows linearly ~1 MB/s under 26 req/s load on CPU-clean
code. This probe separates the three transfer directions on a trivial
jitted program; measured on the axon-tunnel dev box:

  no-readback   (device-resident input, no download): +2.6 MB / 2000 it
  upload-only   (fresh host->device each iter):      +380 MB / 2000 it
                (~190 KB/iter == the upload's size)
  download-only (resident input, download each iter):  +3.3 MB / 2000 it
  CPU backend, same upload loop:                       +7 MB / 2000 it

Verdict: the tunnel PJRT client leaks each host->device transfer's
host-side staging buffer; downloads and dispatch are clean, the CPU
client is clean, and no annonet_tpu code holds the memory (the serve
soak's growth matches request-image upload bytes). Mitigation is
operational: watch `annonet_process_rss_mb` (/metrics) on long-running
servers behind such transports. Real TPU-VM PJRT clients do not show
this (nothing to stage across a network).

Usage: timeout 600 python scripts/probe_upload_leak.py [mode]
  mode: upload-only (default) | download-only | no-readback
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    raise RuntimeError("VmRSS not found")


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "upload-only"
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return (x.astype(jnp.float32) * 1.5 + 1.0).astype(jnp.uint8)

    img_np = np.random.default_rng(0).integers(
        0, 256, size=(96, 128, 16), dtype=np.uint8
    )
    img_dev = jnp.asarray(img_np)
    _ = np.asarray(f(img_dev))  # compile
    print(f"backend={jax.default_backend()} mode={mode} "
          f"rss after compile {rss_mb():.1f} MB", flush=True)
    base = rss_mb()
    for i in range(1, 2001):
        if mode == "no-readback":
            y = f(img_dev)
            if i % 500 == 0:
                _ = float(y[0, 0, 0].astype(jnp.float32))
        elif mode == "upload-only":
            y = f(img_np)
            if i % 500 == 0:
                _ = float(y[0, 0, 0].astype(jnp.float32))
        elif mode == "download-only":
            _ = np.asarray(f(img_dev))
        else:
            raise SystemExit(f"unknown mode {mode}")
        if i % 500 == 0:
            print(f"iter {i}: rss {rss_mb():.1f} MB (+{rss_mb() - base:.1f})",
                  flush=True)


if __name__ == "__main__":
    main()
