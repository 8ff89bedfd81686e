"""Micro-benchmark: Mosaic int8 qs1 conv+requant vs XLA's, device timeline.

Shapes: the hot folded stride-1 layer [25, 872, 109, 128] (DESIGN.md
par.15: XLA runs it at ~212-262 TOP/s of 394 peak), plus a synthetic
WB=128 variant to separate the 109->128 sublane-padding cost from the
kernel's own efficiency.

Method (the par.16 arbiter): compile AOT, trace 3 executions per program,
report whole-program device-timeline ms and achieved TOP/s.

Run alone on the TPU:  python -u scripts/probe_mosaic_int8.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_util import load_device_ops


def trace_ms(fn_compiled, args, tag):
    import jax

    out = fn_compiled(*args)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/mosaic_int8_{tag}"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = fn_compiled(*args)
        jax.block_until_ready(out)
        # scalar sync so the trace captures completed device work
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
        qconv3x3_s1_requant,
    )

    _DN = ("NHWC", "HWIO", "NHWC")
    rng = np.random.default_rng(0)

    def xla_qconv(x_q, w_q, scale, offset):
        acc = lax.conv_general_dilated(
            x_q, w_q, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
        f = acc.astype(jnp.float32) * scale + offset
        return jnp.clip(f, 0.0, 127.0).astype(jnp.int8)

    results = {}
    for tag, shape in (
        ("hot109", (25, 872, 109, 128)),
        ("wb128", (25, 872, 128, 128)),
    ):
        n, h, wb, c = shape
        x_q = jnp.asarray(
            rng.integers(0, 128, size=shape, dtype=np.int8)
        )
        w_q_np = rng.integers(-127, 128, size=(3, 3, c, c), dtype=np.int8)
        w_q = jnp.asarray(w_q_np)
        scale = jnp.asarray(rng.random(c, dtype=np.float32) * 1e-3 + 1e-5)
        offset = jnp.asarray(rng.random(c, dtype=np.float32) + 0.5)
        jax.block_until_ready(x_q)
        flops = 2 * n * h * wb * c * c * 9

        xla_c = jax.jit(xla_qconv).lower(x_q, w_q, scale, offset).compile()
        ms, ops = trace_ms(xla_c, (x_q, w_q, scale, offset), f"xla_{tag}")
        print(f"\n== XLA {tag}: {ms:.3f} ms, "
              f"{flops / ms / 1e9:.0f} TOP/s ==", flush=True)
        for m, op in ops[:6]:
            print(f"  {m:8.3f} ms  {op[:64]}", flush=True)
        results[f"xla_{tag}"] = ms

        wl, wc_, wr = build_tap_gemms(w_q_np)
        wl, wc_, wr = jnp.asarray(wl), jnp.asarray(wc_), jnp.asarray(wr)
        for rows, flatten in ((8, False), (8, True), (109, False)):
            if h % rows:
                continue
            try:
                mos_c = qconv3x3_s1_requant.lower(
                    x_q, wl, wc_, wr, scale, offset, rows=rows,
                    flatten=flatten,
                ).compile()
                ms, ops = trace_ms(
                    mos_c, (x_q, wl, wc_, wr, scale, offset),
                    f"mos{rows}{'f' if flatten else ''}_{tag}",
                )
            except Exception as e:  # compile/runtime failure is a result
                print(f"mosaic rows={rows} flatten={flatten} {tag} "
                      f"FAILED: {e}", flush=True)
                continue
            name = f"mosaic{rows}{'_flat' if flatten else ''}_{tag}"
            print(f"== Mosaic rows={rows} flatten={flatten} {tag}: "
                  f"{ms:.3f} ms, {flops / ms / 1e9:.0f} TOP/s ==",
                  flush=True)
            for m, op in ops[:6]:
                print(f"  {m:8.3f} ms  {op[:64]}", flush=True)
            results[name] = ms

    # stride-2 layer (enc downsample: H halves, folded channels stay 128)
    from annonet_tpu.ops.int8_conv_mosaic import (
        build_tap_gemms_s2,
        qconv3x3_s2_requant,
    )

    for tag, shape in (("s2_hot109", (25, 872, 109, 128)),):
        n, h, wb, c = shape
        x_q = jnp.asarray(rng.integers(0, 128, size=shape, dtype=np.int8))
        w_q_np = rng.integers(-127, 128, size=(3, 2, c, c), dtype=np.int8)
        w_q = jnp.asarray(w_q_np)
        scale = jnp.asarray(rng.random(c, dtype=np.float32) * 1e-3 + 1e-5)
        offset = jnp.asarray(rng.random(c, dtype=np.float32) + 0.5)
        jax.block_until_ready(x_q)
        flops = 2 * n * (h // 2) * wb * c * c * 6

        def xla_qconv_s2(x_q, w_q, scale, offset):
            acc = lax.conv_general_dilated(
                x_q, w_q, (2, 1), [(0, 1), (0, 1)], dimension_numbers=_DN,
                preferred_element_type=jnp.int32,
            )
            f = acc.astype(jnp.float32) * scale + offset
            return jnp.clip(f, 0.0, 127.0).astype(jnp.int8)

        xla_c = jax.jit(xla_qconv_s2).lower(x_q, w_q, scale, offset).compile()
        ms, ops = trace_ms(xla_c, (x_q, w_q, scale, offset), f"xla_{tag}")
        print(f"\n== XLA {tag}: {ms:.3f} ms, "
              f"{flops / ms / 1e9:.0f} TOP/s ==", flush=True)
        results[f"xla_{tag}"] = ms
        w0, w1 = build_tap_gemms_s2(w_q_np)
        w0, w1 = jnp.asarray(w0), jnp.asarray(w1)
        for rows in (4, 109):
            if (h // 2) % rows:
                continue
            try:
                mos_c = qconv3x3_s2_requant.lower(
                    x_q, w0, w1, scale, offset, rows=rows
                ).compile()
                ms, ops = trace_ms(
                    mos_c, (x_q, w0, w1, scale, offset), f"mos{rows}_{tag}"
                )
            except Exception as e:
                print(f"mosaic s2 rows={rows} FAILED: {e}", flush=True)
                continue
            print(f"== Mosaic s2 rows={rows}: {ms:.3f} ms, "
                  f"{flops / ms / 1e9:.0f} TOP/s ==", flush=True)
            results[f"mosaic{rows}_{tag}"] = ms

    # up layer: bf16 conv_transpose (shipped) vs int8 GEMM kernel
    from annonet_tpu.ops.int8_conv_mosaic import qup_requant

    for tag, shape in (("up_hot109", (25, 436, 109, 128)),):
        n, h, wb, c = shape
        x_q = jnp.asarray(rng.integers(0, 128, size=shape, dtype=np.int8))
        w = rng.standard_normal((2, 1, c, c)).astype(np.float32) * 0.05
        s_in = rng.random(c, dtype=np.float32) * 1e-2
        inv = rng.random(c, dtype=np.float32) * 100
        offset = rng.random(c, dtype=np.float32) + 0.5
        jax.block_until_ready(x_q)
        flops = 2 * n * h * wb * c * c * 2

        def xla_up(x_q, w, s_in, inv, offset):
            xf = x_q.astype(jnp.bfloat16) * s_in.astype(jnp.bfloat16)
            out = lax.conv_transpose(
                xf, w.astype(jnp.bfloat16), strides=(2, 1),
                padding="SAME", dimension_numbers=_DN,
            )
            f = out.astype(jnp.float32) * inv + offset
            return jnp.clip(f, 0.0, 127.0).astype(jnp.int8)

        args = tuple(jnp.asarray(v) for v in (w, s_in, inv, offset))
        xla_c = jax.jit(xla_up).lower(x_q, *args).compile()
        ms, ops = trace_ms(xla_c, (x_q,) + args, f"xla_{tag}")
        print(f"\n== XLA bf16 {tag}: {ms:.3f} ms ==", flush=True)
        for m, op in ops[:6]:
            print(f"  {m:8.3f} ms  {op[:64]}", flush=True)
        results[f"xla_{tag}"] = ms

        from annonet_tpu.ops.int8_conv_mosaic import quantize_up_entry

        a_t, b_t, scale_q, off_q = jax.jit(quantize_up_entry)(args)
        for rows in (4, 109):
            if h % rows:
                continue
            try:
                mos_c = qup_requant.lower(
                    x_q, a_t, b_t, scale_q, off_q, rows=rows
                ).compile()
                ms, ops = trace_ms(
                    mos_c, (x_q, a_t, b_t, scale_q, off_q),
                    f"mup{rows}_{tag}",
                )
            except Exception as e:
                print(f"mosaic up rows={rows} FAILED: {e}", flush=True)
                continue
            print(f"== Mosaic up rows={rows}: {ms:.3f} ms, "
                  f"{flops / ms / 1e9:.0f} TOP/s ==", flush=True)
            results[f"mup{rows}_{tag}"] = ms

    # float (bf16) s1 layer: the tap-GEMM kernel vs XLA's folded conv
    from annonet_tpu.ops.int8_conv_mosaic import fconv3x3_s1_bias_relu

    for tag, shape in (("f16_hot109", (25, 872, 109, 128)),):
        n, h, wb, c = shape
        x = jnp.asarray(
            rng.standard_normal(shape).astype(np.float32)
        ).astype(jnp.bfloat16)
        w_np = (rng.standard_normal((3, 3, c, c)) * 0.05).astype(np.float32)
        bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
        jax.block_until_ready(x)
        flops = 2 * n * h * wb * c * c * 9

        def xla_fconv(x, w, bias):
            out = lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=_DN,
            )
            return jnp.maximum(out + bias, 0.0).astype(x.dtype)

        w_dev = jnp.asarray(w_np)
        xla_c = jax.jit(xla_fconv).lower(x, w_dev, bias).compile()
        ms, ops = trace_ms(xla_c, (x, w_dev, bias), f"xla_{tag}")
        print(f"\n== XLA bf16 {tag}: {ms:.3f} ms, "
              f"{flops / ms / 1e9:.0f} TFLOP/s ==", flush=True)
        results[f"xla_{tag}"] = ms
        taps = [jnp.asarray(w_np[:, t].reshape(3 * c, c)).astype(jnp.bfloat16)
                for t in range(3)]
        for rows in (8,):
            try:
                mos_c = fconv3x3_s1_bias_relu.lower(
                    x, taps[0], taps[1], taps[2], bias, rows=rows
                ).compile()
                ms, ops = trace_ms(
                    mos_c, (x, taps[0], taps[1], taps[2], bias),
                    f"mf{rows}_{tag}",
                )
            except Exception as e:
                print(f"mosaic f16 rows={rows} FAILED: {e}", flush=True)
                continue
            print(f"== Mosaic bf16 rows={rows}: {ms:.3f} ms, "
                  f"{flops / ms / 1e9:.0f} TFLOP/s ==", flush=True)
            for m, op in ops[:6]:
                print(f"  {m:8.3f} ms  {op[:64]}", flush=True)
            results[f"mf{rows}_{tag}"] = ms

    print(json.dumps({"metric": "mosaic_int8_qs1",
                      **{k: round(v, 3) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
