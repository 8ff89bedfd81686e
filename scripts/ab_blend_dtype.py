"""A/B: f32 vs bf16 blend epilogue on the composed int8 inference program.

Interleaved passes (A B A B ...) in ONE process so tunnel/chip drift hits
both arms equally (the ±5% run-to-run envelope, DESIGN.md §14). Also
counts on-device label disagreements between the two arms.

Run alone on the TPU.
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
ROUNDS = 4


def main() -> None:
    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    rp = fold_batchnorm(params, bn_stats, config)
    overlap = required_input_dimension(config)
    tiling = TilingParameters(1024, 1024, overlap, overlap)

    inferers = {
        "f32": TiledInferer(
            rp, config, tiling, quantize="int8", blend_dtype="float32"
        ),
        "bf16": TiledInferer(
            rp, config, tiling, quantize="int8", blend_dtype="bfloat16"
        ),
    }

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8)
    )
    float(jnp.max(image).astype(jnp.int32))
    mpx = SIZE * SIZE * ITERS / 1e6

    outs = {}
    for name, inf in inferers.items():
        for _ in range(2):  # bf16 calib program + int8 program
            labels, _ = inf.infer_arrays(image, device_output=True)
            float(jnp.max(labels).astype(jnp.int32))
        outs[name] = labels
    mism = int(jnp.sum(outs["f32"] != outs["bf16"]))
    print(f"label disagreement f32-vs-bf16 blend: {mism} px "
          f"({mism / SIZE / SIZE:.5%})", flush=True)

    trivial = jax.jit(lambda a: a[0, 0].astype(jnp.int32))
    float(trivial(outs["f32"]))
    t0 = time.monotonic()
    for _ in range(3):
        float(trivial(outs["f32"]))
    rtt = (time.monotonic() - t0) / 3

    rates = {"f32": [], "bf16": []}
    for _r in range(ROUNDS):
        for name, inf in inferers.items():
            t0 = time.monotonic()
            for _ in range(ITERS):
                labels, _ = inf.infer_arrays(image, device_output=True)
            float(jnp.max(labels).astype(jnp.int32))
            rates[name].append(
                mpx / max(1e-9, time.monotonic() - t0 - rtt)
            )
    for name, rs in rates.items():
        med = sorted(rs)[len(rs) // 2]
        print(f"{name}: median {med:.1f} Mpx/s  "
              f"({['%.1f' % r for r in rs]})", flush=True)


if __name__ == "__main__":
    main()
