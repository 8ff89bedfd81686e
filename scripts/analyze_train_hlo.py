"""Per-fusion truth for the fused train step: HLO shapes x trace times.

The §16 lesson generalized: instead of inferring the training step's
bottlenecks from ablations (DESIGN.md §9 did forward/grad/full slices),
compile the shipped fused step AOT, read the scheduled HLO, trace 3 real
steps, and join — every device op with its per-step time, and for conv
fusions the logical FLOPs -> achieved TFLOP/s (bf16 peak 197) so fwd /
dgrad / wgrad convs are attributable individually.

Run alone on the TPU:  python -u scripts/analyze_train_hlo.py
"""

import argparse
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_util import load_device_ops

TRACE_DIR = "/tmp/train_trace_r3"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--dim", type=int, default=192)
    parser.add_argument("--level-count", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from annonet_tpu.data.crop import CropOptions
    from annonet_tpu.models.segnet import SegNetConfig, init_state
    from annonet_tpu.train.trainer import (
        TrainerConfig,
        make_fused_train_step,
    )

    config = SegNetConfig(
        class_count=3, level_count=args.level_count, base_width=16
    )
    co = CropOptions(
        dim=args.dim,
        allow_flip_left_right=True,
        allow_flip_upside_down=True,
        multiplicative_brightness_change_probability=0.5,
        noise_level_stddev=2.0,
        allow_random_color_offset=True,
    )
    B, D = args.batch, args.dim
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    velocity = jax.tree_util.tree_map(jnp.zeros_like, params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, size=(B, D, D, 3), dtype=np.uint8)
    )
    labels = jnp.asarray(
        rng.integers(0, 3, size=(B, D, D)).astype(np.uint16)
    )
    lr = jnp.float32(0.1)
    m = jnp.float32(0.99)
    key = jax.random.PRNGKey(1)
    float(jnp.max(images).astype(jnp.int32))

    step_fn = make_fused_train_step(config, TrainerConfig(), co)
    lowered = jax.jit(step_fn).lower(
        params, bn_stats, velocity, lr, m, key, images, labels
    )
    compiled = lowered.compile()
    hlo = compiled.as_text()
    with open("/tmp/train_program.hlo", "w") as f:
        f.write(hlo)
    print(f"HLO: {len(hlo)} bytes -> /tmp/train_program.hlo", flush=True)

    # computation name -> its convolution lines
    comp_convs = {}
    cur = None
    for line in hlo.splitlines():
        mm = re.match(r"%(\S+?) \(", line)
        if mm:
            cur = mm.group(1)
        if "convolution(" in line and cur:
            comp_convs.setdefault(cur, []).append(line.strip())
    # fusion instruction name -> computation
    inst_comp = {}
    for line in hlo.splitlines():
        mm = re.match(
            r"\s*%([\w.\-]+) = \S+ fusion\(.*calls=%([\w.\-]+)", line
        )
        if mm:
            inst_comp[mm.group(1)] = mm.group(2)

    def conv_note(inst):
        comp = inst_comp.get(inst)
        lines = comp_convs.get(comp) or comp_convs.get(inst)
        if not lines:
            return None
        notes = []
        for cl in lines:
            shapes = re.findall(r"(s8|bf16|s32|f32|u8)\[([0-9,]+)\]", cl)
            win = re.search(r"window=\{(.*?)\}", cl)
            dl = re.search(r"dim_labels=(\S+?)[ ,]", cl)
            if len(shapes) < 3:
                continue
            out = [int(x) for x in shapes[0][1].split(",")]
            ker = [int(x) for x in shapes[2][1].split(",")]
            flops = 0
            if len(ker) == 4 and len(out) >= 4:
                flops = 2 * math.prod(out) * ker[0] * ker[1] * ker[2]
            notes.append(
                dict(out=f"{shapes[0][0]}{out}",
                     ker=f"{shapes[2][0]}{ker}",
                     win=(win.group(1) if win else ""),
                     labels=(dl.group(1) if dl else ""),
                     gflop=flops / 1e9)
            )
        return notes

    # warm + trace
    state = (params, bn_stats, velocity)
    out = compiled(*state, lr, m, key, images, labels)
    state = out[:3]
    jax.block_until_ready(out[3])
    float(out[3])
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            out = compiled(*state, lr, m, key, images, labels)
            state = out[:3]
        float(out[3])

    ops, whole = load_device_ops(TRACE_DIR, 3)

    print(f"\n== per-step device ops (batch {B}, {D}^2, 3 steps/trace) ==",
          flush=True)
    for wms in whole.values():
        print(f"  [whole program] {wms:8.2f} ms")
    total = 0.0
    for ms, name in ops:
        total += ms
        if ms < 0.05:
            continue
        notes = conv_note(name)
        suffix = ""
        if notes:
            gflop = sum(n["gflop"] for n in notes)
            tflops = gflop / max(ms, 1e-9)  # GFLOP/ms == TFLOP/s
            n0 = notes[0]
            suffix = (f"  CONV x{len(notes)} ker={n0['ker']} "
                      f"out={n0['out']} {n0['labels']} win[{n0['win'][:40]}]"
                      f" {gflop:.0f} GFLOP -> {tflops:.0f} TFLOP/s")
        print(f"  {ms:8.2f} ms  {name[:52]:52s}{suffix}", flush=True)
    print(f"  {total:8.2f} ms  == SUM", flush=True)


if __name__ == "__main__":
    main()
