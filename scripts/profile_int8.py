import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, numpy as np, jax.numpy as jnp
from annonet_tpu.infer.core import TiledInferer
from annonet_tpu.infer.tiling import TilingParameters
from annonet_tpu.models.segnet import (SegNetConfig, fold_batchnorm, init_state, required_input_dimension)

config = SegNetConfig(class_count=3, level_count=3, base_width=16)
params, bn_stats = init_state(jax.random.PRNGKey(0), config)
rp = fold_batchnorm(params, bn_stats, config)
overlap = required_input_dimension(config)
tiling = TilingParameters(1024, 1024, overlap, overlap)
rng = np.random.default_rng(0)
SIZE = 4096
image = jnp.asarray(rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8))
float(jnp.max(image).astype(jnp.int32))

mode = sys.argv[1] if len(sys.argv) > 1 else "int8"
inf = TiledInferer(rp, config, tiling, quantize="int8" if mode == "int8" else None)
labels, _ = inf.infer_arrays(image, device_output=True)
float(jnp.max(labels).astype(jnp.int32))

with jax.profiler.trace("/tmp/int8_trace"):
    for _ in range(3):
        labels, _ = inf.infer_arrays(image, device_output=True)
    float(jnp.max(labels).astype(jnp.int32))
print("trace done")
