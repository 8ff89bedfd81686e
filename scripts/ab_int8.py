import time, jax, numpy as np, jax.numpy as jnp
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from annonet_tpu.infer.core import TiledInferer
from annonet_tpu.infer.tiling import TilingParameters
from annonet_tpu.models.segnet import (SegNetConfig, fold_batchnorm, init_state, required_input_dimension)

config = SegNetConfig(class_count=3, level_count=3, base_width=16)
params, bn_stats = init_state(jax.random.PRNGKey(0), config)
rp = fold_batchnorm(params, bn_stats, config)
overlap = required_input_dimension(config)
tiling = TilingParameters(1024, 1024, overlap, overlap)
rng = np.random.default_rng(0)
SIZE, ITERS = 4096, 5
image = jnp.asarray(rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8))
float(jnp.max(image).astype(jnp.int32))

def sync(a): return float(jnp.max(a).astype(jnp.int32))

for name, kw in [("bf16", {}), ("int8", {"quantize": "int8"})]:
    inf = TiledInferer(rp, config, tiling, **kw)
    labels, _ = inf.infer_arrays(image, device_output=True)
    sync(labels)
    trivial = jax.jit(lambda a: a[0, 0].astype(jnp.int32))
    float(trivial(labels))
    t0 = time.monotonic()
    for _ in range(3): float(trivial(labels))
    rtt = (time.monotonic() - t0) / 3
    mpx = SIZE * SIZE * ITERS / 1e6
    vals = []
    for _ in range(3):
        t0 = time.monotonic()
        for _ in range(ITERS):
            labels, _ = inf.infer_arrays(image, device_output=True)
        sync(labels)
        vals.append(mpx / max(1e-9, time.monotonic() - t0 - rtt))
    print(f"{name}: {sorted(vals)[1]:.1f} Mpx/s (passes: {[round(v,1) for v in vals]})", flush=True)
