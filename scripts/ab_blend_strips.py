"""A/B: flat DUS-chain vs per-row-strip blend accumulate (int8 path).

The flat chain serializes tile_count dynamic-update-slices into one
zero-initialized canvas (~1.3 ms/image at 4096² per
scripts/analyze_int8_hlo.py). Strips build one accumulator per tile ROW
(independent chains of depth count_x) and join them with ONE
sublane-aligned concat whose only arithmetic is the strip-overlap bands.

NOT bit-identical: the strip pre-sums regroup the float adds in
y-overlap bands ((a1+a2)+(b1+b2) vs (((a1+a2)+b1)+b2)) — measured
26/16.8M px flipped at 4096² bf16. Measured rate (round 3, seventh
session): a WASH, 774.9 strips vs 778.2 flat — XLA already overlaps the
DUS chain with the conv stream. The flat chain ships;
ANNONET_TPU_BLEND_STRIPS=1 re-measures (docs/DESIGN.md §26).

Run alone on the TPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from annonet_tpu.cli.common import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from ab_util import run_interleaved_ab
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


def main() -> None:
    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    rp = fold_batchnorm(params, bn_stats, config)
    overlap = required_input_dimension(config)
    tiling = TilingParameters(TILE, TILE, overlap, overlap)

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8)
    )
    float(jnp.max(image).astype(jnp.int32))

    run_interleaved_ab(
        lambda: TiledInferer(rp, config, tiling, quantize="int8"),
        [
            ("flat-chain", {"ANNONET_TPU_BLEND_STRIPS": "0"}),
            ("strips", {"ANNONET_TPU_BLEND_STRIPS": "1"}),
        ],
        image,
    )


if __name__ == "__main__":
    main()
