"""Per-fusion truth for the headline int8 program: HLO shapes x trace times.

Compiles the composed 4096-image int8 tiled-inference program, reads back
its optimized/scheduled HLO (works through the axon remote compile), runs
a profiler trace, and joins: for every device op, its time per image, and
for convolution fusions the logical FLOPs -> achieved TOP/s. This replaces
guessing which clamp_convert_fusion.N is which layer.

Run alone on the TPU.
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_util import load_device_ops

# force the AOT path so the compiled executable is reachable for as_text();
# latency-hiding-scheduler=false is the backend default -> same program
os.environ["ANNONET_TPU_COMPILER_OPTIONS"] = (
    "xla_tpu_enable_latency_hiding_scheduler=false"
)

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

SIZE = int(os.environ.get("ANALYZE_SIZE", "4096"))
TILE = int(os.environ.get("ANALYZE_TILE", "1024"))
TRACE_DIR = f"/tmp/int8_trace_r3_{SIZE}_{TILE}"


def main() -> None:
    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    rp = fold_batchnorm(params, bn_stats, config)
    overlap = required_input_dimension(config)
    tiling = TilingParameters(TILE, TILE, overlap, overlap)
    inferer = TiledInferer(rp, config, tiling, quantize="int8")

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8)
    )
    float(jnp.max(image).astype(jnp.int32))

    # warm: bf16+calibration, then the int8 program
    for _ in range(2):
        labels, _ = inferer.infer_arrays(image, device_output=True)
        float(jnp.max(labels).astype(jnp.int32))

    # ---- HLO of the int8 program --------------------------------------
    hlo_texts = []
    for fn in inferer._compiled.values():
        compiled = getattr(fn, "_compiled", None)
        if isinstance(compiled, dict):
            for exe in compiled.values():
                try:
                    hlo_texts.append(exe.as_text())
                except Exception as e:
                    print("as_text failed:", str(e)[:120], flush=True)
    print(f"programs captured: {len(hlo_texts)}", flush=True)
    # the int8 program is the one with s8 convolutions
    hlo = ""
    for t in hlo_texts:
        if re.search(r"convolution\(", t) and "s8[" in t:
            hlo = t if len(t) > len(hlo) else hlo
    with open("/tmp/int8_program.hlo", "w") as f:
        f.write(hlo)
    print(f"int8 HLO: {len(hlo)} bytes -> /tmp/int8_program.hlo", flush=True)

    # map: fusion/instruction name -> conv shapes + flops
    conv_info = {}
    current_fusion = None
    for line in hlo.splitlines():
        m = re.match(r"%(\S+) \(", line)
        if m:
            current_fusion = m.group(1).split(".par")[0]
        m = re.search(
            r"convolution\(", line
        )
        if m and current_fusion:
            shapes = re.findall(r"(s8|bf16|s32|f32)\[([0-9,]+)\]", line)
            dims = re.search(r"dim_labels=(\S+?)[,}]", line)
            window = re.search(r"window={(.*?)}", line)
            if len(shapes) >= 2:
                out_sh = [int(x) for x in shapes[0][1].split(",")]
                # operands appear after the output in HLO text order
                in_sh = [int(x) for x in shapes[1][1].split(",")]
                k_sh = [int(x) for x in shapes[2][1].split(",")] if len(shapes) > 2 else []
                conv_info.setdefault(current_fusion, []).append(
                    dict(out=out_sh, in_=in_sh, k=k_sh,
                         dtype=shapes[1][0],
                         window=window.group(1) if window else "",
                         labels=dims.group(1) if dims else "")
                )
    # ---- trace --------------------------------------------------------
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            labels, _ = inferer.infer_arrays(image, device_output=True)
        float(jnp.max(labels).astype(jnp.int32))

    ops, whole = load_device_ops(TRACE_DIR, 3)

    print("\n== per-image device ops (3 iters/trace) ==", flush=True)
    for wms in whole.values():
        print(f"  [whole program] {wms:8.2f} ms")
    total = 0.0
    for ms, name in ops:
        total += ms
        info = conv_info.get(name) or conv_info.get(name.split(".")[0])
        note = ""
        if info:
            flops = 0
            for c in info:
                ksp = c["k"]
                if len(ksp) == 4 and len(c["out"]) == 4:
                    # NHWC out x HWIO kernel (or as labeled)
                    n, h, w, co = c["out"]
                    flops += 2 * n * h * w * co * ksp[0] * ksp[1] * ksp[2]
            tops = flops / (ms * 1e-3) / 1e12 if ms else 0
            note = (
                f"  CONV {['x'.join(map(str, c['k'])) for c in info]}"
                f" out={info[0]['out']} {info[0]['dtype']}"
                f" {flops/1e9:.0f} GFLOP -> {tops:.0f} TOP/s"
            )
        if ms > 0.05:
            print(f"  {ms:8.2f} ms  {name[:60]:60s}{note}", flush=True)
    print(f"  {total:8.2f} ms  == SUM", flush=True)


if __name__ == "__main__":
    main()
