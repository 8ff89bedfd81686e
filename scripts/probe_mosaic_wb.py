"""WB sweep: where is the Mosaic tap-GEMM speed cliff?

probe_mosaic_int8.py measured the s1 kernel at 292 TOP/s on WB=128 but
45-66 on the shipped plan's WB=109 (XLA: ~182 at both). This sweeps the
folded width WB over sublane-tile-aligned and unaligned values to find
which alignment actually buys the rate (int8 sublane tile = 32 rows;
lane tile = 128), for both the s1 and the (gather-fixed) s2 kernels.
The answer picks the tile plan a Mosaic-enabled inferer should use:
per-image cost = kernel_rate(WB) x plan_work(WB), where plan_work for a
4096 canvas / overlap 62 is n_tiles * tile_w (computed below).

Run alone on the TPU:  python -u scripts/probe_mosaic_wb.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_util import load_device_ops

CANVAS = 4096
OVERLAP = 62
N, H, C = 25, 872, 128
WBS = (92, 96, 104, 109, 112, 128)


def plan_work(wb: int) -> float:
    """Relative x-dim work of a 4096-canvas plan built from tiles of
    width 8*wb: n_tiles * tile_w normalized to the shipped 5x872."""
    tile_w = 8 * wb
    if tile_w >= CANVAS:
        n = 1
    else:
        span = CANVAS - OVERLAP
        n = -(-span // (tile_w - OVERLAP))
    return n * tile_w / (5 * 872)


def trace_ms(fn_compiled, args, tag):
    import jax

    out = fn_compiled(*args)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/mosaic_wb_{tag}"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = fn_compiled(*args)
        jax.block_until_ready(out)
        float(jax.numpy.max(out[0, 0, 0].astype(jax.numpy.int32)))
    ops, _whole = load_device_ops(trace_dir, 3)
    return sum(m for m, _ in ops), ops


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from annonet_tpu.ops.int8_conv_mosaic import (
        build_tap_gemms,
        build_tap_gemms_s2,
        qconv3x3_s1_requant,
        qconv3x3_s2_requant,
    )

    _DN = ("NHWC", "HWIO", "NHWC")
    rng = np.random.default_rng(0)

    def xla_s1(x_q, w_q, scale, offset):
        acc = lax.conv_general_dilated(
            x_q, w_q, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
        f = acc.astype(jnp.float32) * scale + offset
        return jnp.clip(f, 0.0, 127.0).astype(jnp.int8)

    def xla_s2(x_q, w_q, scale, offset):
        acc = lax.conv_general_dilated(
            x_q, w_q, (2, 1), [(0, 1), (0, 1)], dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
        f = acc.astype(jnp.float32) * scale + offset
        return jnp.clip(f, 0.0, 127.0).astype(jnp.int8)

    w_q_np = rng.integers(-127, 128, size=(3, 3, C, C), dtype=np.int8)
    w2_np = rng.integers(-127, 128, size=(3, 2, C, C), dtype=np.int8)
    scale = jnp.asarray(rng.random(C, dtype=np.float32) * 1e-3 + 1e-5)
    offset = jnp.asarray(rng.random(C, dtype=np.float32) + 0.5)
    wl, wc_, wr = (jnp.asarray(t) for t in build_tap_gemms(w_q_np))
    w0, w1 = (jnp.asarray(t) for t in build_tap_gemms_s2(w2_np))
    w_q = jnp.asarray(w_q_np)
    w2 = jnp.asarray(w2_np)

    results = {}
    print(f"{'WB':>4} {'work':>6} | {'xla_s1':>7} {'mos_s1':>7} "
          f"{'mosf_s1':>7} | {'xla_s2':>7} {'mos_s2':>7}   (ms; "
          f"lower work-adjusted wins)", flush=True)
    for wb in WBS:
        x_q = jnp.asarray(
            rng.integers(0, 128, size=(N, H, wb, C), dtype=np.int8)
        )
        jax.block_until_ready(x_q)
        row = {"work": round(plan_work(wb), 4)}

        c = jax.jit(xla_s1).lower(x_q, w_q, scale, offset).compile()
        row["xla_s1"], _ = trace_ms(c, (x_q, w_q, scale, offset),
                                    f"xs1_{wb}")
        for flat in (False, True):
            try:
                c = qconv3x3_s1_requant.lower(
                    x_q, wl, wc_, wr, scale, offset, rows=8, flatten=flat,
                ).compile()
                ms, _ = trace_ms(c, (x_q, wl, wc_, wr, scale, offset),
                                 f"ms1{'f' if flat else ''}_{wb}")
            except Exception as e:
                print(f"  s1 wb={wb} flat={flat} FAILED: {e}", flush=True)
                ms = float("nan")
            row["mosf_s1" if flat else "mos_s1"] = ms

        c = jax.jit(xla_s2).lower(x_q, w2, scale, offset).compile()
        row["xla_s2"], _ = trace_ms(c, (x_q, w2, scale, offset),
                                    f"xs2_{wb}")
        try:
            c = qconv3x3_s2_requant.lower(
                x_q, w0, w1, scale, offset, rows=4,
            ).compile()
            ms, _ = trace_ms(c, (x_q, w0, w1, scale, offset), f"ms2_{wb}")
        except Exception as e:
            print(f"  s2 wb={wb} FAILED: {e}", flush=True)
            ms = float("nan")
        row["mos_s2"] = ms

        results[wb] = row
        print(f"{wb:>4} {row['work']:>6} | {row['xla_s1']:>7.3f} "
              f"{row['mos_s1']:>7.3f} {row['mosf_s1']:>7.3f} | "
              f"{row['xla_s2']:>7.3f} {row['mos_s2']:>7.3f}", flush=True)

    # Work-adjusted winner: measured ms already scales with WB (the tile
    # width), so a plan built from WB-wide tiles costs
    # ms(WB) * n_tiles_x(WB) / 5 per image (the micro batch N=25 stands
    # for the shipped 5x5 grid; tile rows are WB-independent).
    def n_tiles_x(wb):
        tile_w = 8 * wb
        return 1 if tile_w >= CANVAS else -(-(CANVAS - OVERLAP)
                                            // (tile_w - OVERLAP))

    best = None
    for wb, row in results.items():
        for k in ("xla_s1", "mos_s1", "mosf_s1"):
            adj = row[k] * n_tiles_x(wb) / 5
            if adj == adj and (best is None or adj < best[2]):
                best = (wb, k, adj)
    print(f"best per-image s1 cost: WB={best[0]} {best[1]} "
          f"adj={best[2]:.3f} ms (shipped xla@109 = "
          f"{results[109]['xla_s1']:.3f})", flush=True)
    print(json.dumps(
        {"metric": "mosaic_wb_sweep",
         **{f"wb{wb}_{k}": (round(v, 4) if v == v else None)
            for wb, row in results.items() for k, v in row.items()}}
    ))


if __name__ == "__main__":
    main()
