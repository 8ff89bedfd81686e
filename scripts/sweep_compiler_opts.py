"""Sweep per-program TPU compiler options on the composed int8 inference path.

Uses the ANNONET_TPU_COMPILER_OPTIONS hook (utils/compile_opts.py): options
ride each compile via the AOT path, so one process can A/B several settings
against the SAME device-resident image with the honest chained-scalar-sync
timing (CLAUDE.md). A setting whose flag the backend rejects is recorded as
failed and the sweep continues.

Run alone on the TPU (never two TPU processes at once).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from annonet_tpu.infer.core import TiledInferer
from annonet_tpu.infer.tiling import TilingParameters
from annonet_tpu.models.segnet import (
    SegNetConfig,
    fold_batchnorm,
    init_state,
    required_input_dimension,
)

SIZE = 4096
ITERS = 5
PASSES = 3

SETTINGS = [
    ("baseline", ""),
    ("vmem8192", "xla_tpu_scoped_vmem_limit_kib=8192"),
    ("baseline2", ""),
]
# order-control run: a repeated baseline at the END distinguishes a real
# flag effect from in-process / tunnel drift


def main() -> None:
    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    rp = fold_batchnorm(params, bn_stats, config)
    overlap = required_input_dimension(config)
    tiling = TilingParameters(1024, 1024, overlap, overlap)

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8)
    )
    float(jnp.max(image).astype(jnp.int32))
    mpx = SIZE * SIZE * ITERS / 1e6

    results = []
    for name, opts in SETTINGS:
        if opts:
            os.environ["ANNONET_TPU_COMPILER_OPTIONS"] = opts
        else:
            os.environ.pop("ANNONET_TPU_COMPILER_OPTIONS", None)
        inferer = TiledInferer(rp, config, tiling, quantize="int8")
        try:
            t0 = time.monotonic()
            # call 1: bf16 program + int8 calibration; call 2: compiles the
            # int8 program — both must precede the timed passes
            labels, _ = inferer.infer_arrays(image, device_output=True)
            float(jnp.max(labels).astype(jnp.int32))
            labels, _ = inferer.infer_arrays(image, device_output=True)
            float(jnp.max(labels).astype(jnp.int32))
            compile_s = time.monotonic() - t0
        except Exception as e:
            print(f"{name}: COMPILE FAILED: {str(e)[:160]}", flush=True)
            continue
        trivial = jax.jit(lambda a: a[0, 0].astype(jnp.int32))
        float(trivial(labels))
        t0 = time.monotonic()
        for _ in range(3):
            float(trivial(labels))
        rtt = (time.monotonic() - t0) / 3
        rates = []
        for _ in range(PASSES):
            t0 = time.monotonic()
            for _ in range(ITERS):
                labels, _ = inferer.infer_arrays(image, device_output=True)
            float(jnp.max(labels).astype(jnp.int32))
            rates.append(mpx / max(1e-9, time.monotonic() - t0 - rtt))
        med = sorted(rates)[len(rates) // 2]
        print(
            f"{name}: {med:.1f} Mpx/s (passes {['%.1f' % r for r in rates]}, "
            f"compile {compile_s:.0f}s)  opts='{opts}'",
            flush=True,
        )
        results.append((name, med))
    print("RESULTS:", results, flush=True)


if __name__ == "__main__":
    main()
