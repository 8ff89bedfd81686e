"""A/B: tile-gather axis order (leading vs sublane) on the composed
int8 inference program.

The leading-axis stack costs a ~1.9 ms/image relayout at 4096²
(copy.140 in scripts/analyze_int8_hlo.py): the int8 conv emitters want
the tile batch second-minor ("batch in sublanes"). The "sublane" order
stacks with the tile axis second-minor + a transpose XLA could keep as
a relabel.

Measured (round 3, seventh session): NEGATIVE — 732 sublane vs 743
leading; XLA does not relabel the transpose, it moves the same relayout
into the stack. The leading order ships; ANNONET_TPU_GATHER_ORDER=
sublane re-measures on future toolchains (docs/DESIGN.md §26).

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
MODE = os.environ.get("AB_MODE", "int8")


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

    run_interleaved_ab(
        lambda: TiledInferer(rp, config, tiling, quantize=quant),
        [
            ("leading", {"ANNONET_TPU_GATHER_ORDER": None}),
            ("sublane", {"ANNONET_TPU_GATHER_ORDER": "sublane"}),
        ],
        image,
    )


if __name__ == "__main__":
    main()
