"""HISTORICAL RECORD of the reverted head lane-padding A/B (DESIGN §16).

This script measured commit 24c3147's lane-padded int8 head against a
padded-weights+fused-slice arm and read "+17.7%" — while the device
timeline showed the padded head REGRESSED the shipped program (27.0 ->
30.4 ms/image). The experiment was reverted (commit 0461135); it stays
in-tree as the record of WHY interleaved A/Bs need the real shipped
program as their baseline arm. It feature-detects the reverted
`head_padded_output` kwarg and refuses to run against current code —
check out 24c3147 to reproduce the (misleading) numbers.
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
from annonet_tpu.models import quantized_runtime
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
    import inspect

    if "head_padded_output" not in inspect.signature(
        quantized_runtime.apply_folded_int8
    ).parameters:
        print(__doc__)
        print("head_padded_output was reverted (commit 0461135); this "
              "record-only script needs commit 24c3147 to run.")
        return

    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    rp = fold_batchnorm(params, bn_stats, config)
    overlap = required_input_dimension(config)
    tiling = TilingParameters(1024, 1024, overlap, overlap)

    inferers = {
        "pad24": TiledInferer(rp, config, tiling, quantize="int8"),
        "pad128": TiledInferer(rp, config, tiling, quantize="int8"),
    }

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8)
    )
    float(jnp.max(image).astype(jnp.int32))
    mpx = SIZE * SIZE * ITERS / 1e6

    real_apply = quantized_runtime.apply_folded_int8

    def apply_unpadded(*args, **kwargs):
        kwargs["head_padded_output"] = False
        return real_apply(*args, **kwargs)

    outs = {}
    for name, inf in inferers.items():
        quantized_runtime.apply_folded_int8 = (
            apply_unpadded if name == "pad24" else real_apply
        )
        for _ in range(2):  # bf16 calib program + int8 program
            labels, _ = inf.infer_arrays(image, device_output=True)
            float(jnp.max(labels).astype(jnp.int32))
        outs[name] = labels
    quantized_runtime.apply_folded_int8 = real_apply
    mism = int(jnp.sum(outs["pad24"] != outs["pad128"]))
    print(f"label disagreement pad24-vs-pad128: {mism} px", flush=True)

    trivial = jax.jit(lambda a: a[0, 0].astype(jnp.int32))
    float(trivial(outs["pad24"]))
    t0 = time.monotonic()
    for _ in range(3):
        float(trivial(outs["pad24"]))
    rtt = (time.monotonic() - t0) / 3

    rates = {"pad24": [], "pad128": []}
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
