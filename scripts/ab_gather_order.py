"""A/B: tile-gather axis order (leading vs sublane) on the composed
int8 inference program.

The leading-axis stack costs copy.140 (1.94 ms/image at 4096², 8.7% —
scripts/analyze_int8_hlo.py): a relayout that interleaves the 16 tiles
into the conv emitter's batch-in-sublanes layout. The "sublane" order
stacks with the tile axis second-minor + a transpose XLA can keep as a
relabel. Interleaved passes (A B A B ...) in ONE process; counts
on-device label disagreements.

Run alone on the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from annonet_tpu.cli.common import apply_platform_env

apply_platform_env()

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

SIZE = int(os.environ.get("AB_SIZE", "4096"))
TILE = int(os.environ.get("AB_TILE", "1088"))
MODE = os.environ.get("AB_MODE", "int8")
ITERS = 5
ROUNDS = 4


def main() -> None:
    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    rp = fold_batchnorm(params, bn_stats, config)
    overlap = required_input_dimension(config)
    tiling = TilingParameters(TILE, TILE, overlap, overlap)
    quant = "int8" if MODE == "int8" else None

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8)
    )
    float(jnp.max(image).astype(jnp.int32))
    mpx = SIZE * SIZE * ITERS / 1e6

    # the knob is read at trace time: set it around each arm's warm-up
    # (programs cache per inferer, so each arm keeps its own program)
    inferers = {}
    outs = {}
    for name, env in (("leading", ""), ("sublane", "sublane")):
        os.environ["ANNONET_TPU_GATHER_ORDER"] = env
        inf = TiledInferer(rp, config, tiling, quantize=quant)
        for _ in range(2):  # calib program + int8 program
            labels, _ = inf.infer_arrays(image, device_output=True)
            float(jnp.max(labels).astype(jnp.int32))
        inferers[name] = inf
        outs[name] = labels
    mism = int(jnp.sum(outs["leading"] != outs["sublane"]))
    print(f"label disagreement leading-vs-sublane: {mism} px "
          f"({mism / SIZE / SIZE:.5%})", flush=True)

    trivial = jax.jit(lambda a: a[0, 0].astype(jnp.int32))
    float(trivial(outs["leading"]))
    t0 = time.monotonic()
    for _ in range(3):
        float(trivial(outs["leading"]))
    rtt = (time.monotonic() - t0) / 3

    rates = {k: [] for k in inferers}
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
