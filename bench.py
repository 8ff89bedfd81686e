"""Benchmark: tiled-inference throughput (Mpx/s/chip) on the flagship net,
plus secondary framework metrics.

Output format (one JSON object per line):
  line 1 (HEADLINE, the driver contract): {"metric":
    "tiled_inference_throughput", "value": N, "unit": "Mpx/s/chip",
    "vs_baseline": N} — the int8 tiled-inference rate at 4096², measured
    against the driver-set north star of 200 Mpx/s/chip (BASELINE.json
    "north_star"; the reference publishes no numbers of its own —
    BASELINE.md).
  subsequent lines (secondary metrics, same shape, so a training-perf
  regression is visible in the round-over-round BENCH_r* capture instead
  of living only in docs):
    tiled_inference_throughput_f32 — the exact bf16/f32 float arm
    train_step_crops_per_s         — the fused pool train step at the
                                     pinned batch/dim (DESIGN.md §17)
    loader_crops_per_s             — host CropPipeline feed rate
  ``--headline-only`` suppresses the secondary lines.

The scenario mirrors the reference's headline loop (annonet_infer per image,
annonet_infer_main.cpp:466-480): a large RGB image is tiled, every tile is
forwarded, the per-class outputs are overlap-blended and argmaxed into a
label map on device.

Timing methodology (required on this dev harness, where the chip sits
behind a tunnel): jax.block_until_ready does NOT actually block on the
axon platform and bulk downloads crawl at ~1 MB/s, so neither
block-until-ready loops nor full-label readbacks measure the chip. Instead
N iterations are enqueued back-to-back (they serialize on the single
device) and ONE tiny scalar that depends on the final label map is read
back; the separately-measured scalar round-trip latency is subtracted.
Calibration: the same scheme reproduces ~187 TFLOP/s on an 8192^3 bf16
matmul chain (v5e peak ~197), so the subtraction is sound.
"""

from __future__ import annotations

import argparse
import json
import time


BASELINE_MPX_PER_S = 200.0


def _wait_for_device(wait_s: float) -> None:
    """Wait out transient device-runtime wedges before touching jax in THIS
    process: the dev tunnel can stall every transfer for tens of minutes
    (CLAUDE.md), and a bench that hangs or dies on a wedge loses the
    round's headline metric. The probe runs in a SUBPROCESS — a stuck
    in-process probe thread would hold jax's init lock and block every
    retry, whereas a fresh process sees the recovered tunnel cleanly."""
    import os
    import subprocess
    import sys

    deadline = time.monotonic() + wait_s
    probe_code = (
        "from annonet_tpu.cli.common import apply_platform_env, "
        "device_probe\n"
        "apply_platform_env()\n"
        "device_probe(timeout_s=55, on_timeout='raise')\n"
    )
    # the child must resolve annonet_tpu the same way this script does
    # (script dir on sys.path), not via its cwd
    probe_env = dict(os.environ)
    probe_env["PYTHONPATH"] = os.pathsep.join(
        p for p in (
            os.path.dirname(os.path.abspath(__file__)),
            probe_env.get("PYTHONPATH"),
        ) if p
    )
    while True:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", probe_code], timeout=120,
                capture_output=True, text=True, env=probe_env,
            )
            ok = proc.returncode == 0
            # only an actual probe timeout means "wedged runtime"; any
            # other failure (import error, misconfiguration) must surface
            # immediately, not masquerade as a wedge for 30 minutes
            if not ok and "did not complete within" not in (
                proc.stderr + proc.stdout
            ):
                print(proc.stderr or proc.stdout, file=sys.stderr,
                      flush=True)
                print("bench: device probe failed with a non-wedge error; "
                      "aborting", file=sys.stderr, flush=True)
                raise SystemExit(1)
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            return
        if time.monotonic() > deadline:
            print(
                "bench: device runtime unreachable/wedged for "
                f"{wait_s:g} s; giving up (ANNONET_TPU_BENCH_WAIT_S "
                "adjusts the patience)", file=sys.stderr, flush=True,
            )
            raise SystemExit(1)
        print("bench: device probe failed (wedged runtime?); retrying...",
              file=sys.stderr, flush=True)
        time.sleep(30.0)


def _measure_rtt(labels) -> float:
    """The scalar-readback round trip, to subtract from chained timings."""
    import jax
    import jax.numpy as jnp

    trivial = jax.jit(lambda a: a[0, 0].astype(jnp.int32))
    float(trivial(labels))
    t0 = time.monotonic()
    for _ in range(3):
        float(trivial(labels))
    return (time.monotonic() - t0) / 3


def measure_tiled_inference(inferer, image, image_size: int, iters: int,
                            passes: int) -> float:
    """Median Mpx/s over ``passes`` chained-dispatch measurement passes."""
    import jax.numpy as jnp

    def sync_scalar(arr) -> float:
        return float(jnp.max(arr).astype(jnp.int32))

    # warm-up (compile), like the reference's excluded first image
    labels, _ = inferer.infer_arrays(image, device_output=True)
    sync_scalar(labels)
    rtt = _measure_rtt(labels)

    megapixels = image_size * image_size * iters / 1e6
    results = []
    for _ in range(max(1, passes)):
        t0 = time.monotonic()
        for _ in range(iters):
            labels, _ = inferer.infer_arrays(image, device_output=True)
        sync_scalar(labels)
        elapsed = max(1e-9, time.monotonic() - t0 - rtt)
        assert labels.shape[0] >= image.shape[0]
        results.append(megapixels / elapsed)

    # median over passes: robust to one slow pass (tunnel hiccup, host GC)
    return sorted(results)[len(results) // 2]


def measure_train_step(batch: int, dim: int, iters: int) -> dict:
    """The fused pool train step (the CLI's hot path: gather from the HBM
    pool + augment + weighting + fwd/bwd + SGD in ONE XLA program) at the
    pinned flagship configuration — 6.2k crops/s on v5e at batch 128 /
    dim 192 (DESIGN.md §17). Same scalar-sync discipline as inference;
    keys pre-split so the timed loop is exactly one dispatch per step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from annonet_tpu.data.crop import CropOptions
    from annonet_tpu.models.segnet import SegNetConfig, init_state
    from annonet_tpu.train.trainer import (
        TrainerConfig,
        make_fused_pool_step,
    )

    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    crop_options = CropOptions(
        dim=dim,
        allow_flip_left_right=True,
        allow_flip_upside_down=True,
        multiplicative_brightness_change_probability=0.5,
        noise_level_stddev=2.0,
        allow_random_color_offset=True,
    )
    step = jax.jit(
        make_fused_pool_step(config, TrainerConfig(), crop_options, dim)
    )

    rng = np.random.default_rng(0)
    image_size = 2 * dim
    n_pool = 4
    pool_images = jnp.asarray(rng.integers(
        0, 256, size=(n_pool, image_size, image_size, 3), dtype=np.uint8
    ))
    pool_labels = jnp.asarray(rng.integers(
        0, 3, size=(n_pool, image_size, image_size)
    ).astype(np.uint16))
    # packed [5, B] int32 decision rows: slot, y0, x0, valid_h, valid_w
    packed = jnp.asarray(np.stack([
        rng.integers(0, n_pool, size=batch).astype(np.int32),
        rng.integers(-8, image_size - dim + 8, size=batch).astype(np.int32),
        rng.integers(-8, image_size - dim + 8, size=batch).astype(np.int32),
        np.full(batch, image_size, np.int32),
        np.full(batch, image_size, np.int32),
    ]))

    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    velocity = jax.tree_util.tree_map(jnp.zeros_like, params)
    lr = jnp.float32(0.1)
    momentum = jnp.float32(0.99)
    key = jax.random.PRNGKey(1)

    # warm-up/compile
    params, bn_stats, velocity, loss = step(
        params, bn_stats, velocity, lr, momentum, key,
        pool_images, pool_labels, packed,
    )
    float(loss)
    rtt = _measure_rtt(jnp.reshape(loss, (1, 1)))

    # PRE-SPLIT keys: a host-side jax.random.split inside the timed loop
    # is one extra ~30-40 ms round trip PER ITERATION on the tunneled dev
    # box (docs/ROUND3.md measurement discipline)
    subs = list(jax.random.split(key, iters))
    float(jnp.max(jnp.stack(subs)).astype(jnp.float32))  # finish uploads
    t0 = time.monotonic()
    for i in range(iters):
        params, bn_stats, velocity, loss = step(
            params, bn_stats, velocity, lr, momentum, subs[i],
            pool_images, pool_labels, packed,
        )
    final_loss = float(loss)
    elapsed = max(1e-9, time.monotonic() - t0 - rtt)
    per_step = elapsed / iters
    return {
        "crops_per_s": batch / per_step,
        "ms_per_step": per_step * 1000,
        "batch": batch,
        "dim": dim,
        "final_loss": final_loss,
    }


def measure_loader(dim: int, crops: int, threads: int = 2) -> dict:
    """Host CropPipeline feed rate in crops/s (synthetic dataset, real PNG
    decode, real crop extraction) — must outrun the device step's
    consumption for the CLI loop to be device-bound."""
    import pathlib
    import tempfile

    import numpy as np

    from annonet_tpu.classes import (
        anno_classes_to_json,
        default_anno_classes,
        parse_anno_classes,
    )
    from annonet_tpu.data.crop import CropOptions
    from annonet_tpu.data.dataset import find_image_files
    from annonet_tpu.data.pipeline import CropPipeline

    anno_classes = parse_anno_classes(
        anno_classes_to_json(default_anno_classes())
    )
    with tempfile.TemporaryDirectory() as td:
        from PIL import Image

        root = pathlib.Path(td)
        rng = np.random.default_rng(0)
        size = 1024
        palette = np.array([c.rgba_label for c in anno_classes], np.uint8)
        for i in range(6):
            img = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
            labels = rng.integers(0, 3, size=(size, size)).astype(np.int32)
            Image.fromarray(img).save(root / f"img{i}.png")
            Image.fromarray(palette[labels], mode="RGBA").save(
                root / f"img{i}.png_mask.png"
            )
        files = find_image_files(str(root), True, verbose=False)
        options = CropOptions(
            dim=dim, allow_flip_left_right=True, allow_flip_upside_down=True
        )
        batch = 64
        with CropPipeline(
            files, anno_classes, options, thread_count=threads, seed=0
        ) as pipe:
            pipe.next_minibatch(batch, warn=None)  # warm the cache
            t0 = time.monotonic()
            produced = 0
            while produced < crops:
                images, labels = pipe.next_minibatch(batch, warn=None)
                produced += images.shape[0]
            elapsed = max(1e-9, time.monotonic() - t0)
    return {
        "crops_per_s": produced / elapsed,
        "dim": dim,
        "threads": threads,
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--image-size", type=int, default=4096)
    parser.add_argument(
        "--tile-size", type=int, default=None,
        help="max tile dimension (default: auto — 1088 on TPU, the "
             "measured plan optimum giving 1072-px tiles at 4096^2, "
             "+12%% int8 / +28%% bf16 over the old 1024 default; "
             "docs/DESIGN.md)",
    )
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument(
        "--passes", type=int, default=3,
        help="independent measurement passes; the MEDIAN is reported "
             "(run-to-run tunnel/chip noise made single-pass numbers "
             "under-report by ~20%% in round 1)",
    )
    parser.add_argument(
        "--quick", action="store_true",
        help="small sizes for CPU smoke-testing",
    )
    parser.add_argument(
        "--plan-autotune", action="store_true",
        help="measured tile-plan selection: also compile the neighbouring "
             "grid counts at warm-up and bench with the fastest "
             "(infer/core.py::_autotune_for)",
    )
    parser.add_argument(
        "--quantize", choices=["none", "int8"], default="int8",
        help="int8 (default) runs the conv stack on the 2x-rate int8 MXU "
             "path — measured 523 vs 362 Mpx/s/chip, with accuracy above "
             "the pinned parity floors (tests/test_end_to_end.py); 'none' "
             "measures the exact bf16 float path",
    )
    parser.add_argument(
        "--headline-only", action="store_true",
        help="print only the headline tiled-inference line (skip the "
             "f32 arm, the train step, and the loader metrics)",
    )
    args = parser.parse_args()
    if args.quick:
        args.image_size = min(args.image_size, 512)
        args.tile_size = min(args.tile_size or 1024, 256)
        args.iters = min(args.iters, 2)
        args.passes = min(args.passes, 2)

    from annonet_tpu.cli.common import apply_platform_env, default_tile_max

    apply_platform_env()  # ANNONET_TPU_PLATFORM=cpu pins the backend
    # (the axon plugin silently overrides JAX_PLATFORMS — CLAUDE.md)

    import os

    _wait_for_device(float(os.environ.get("ANNONET_TPU_BENCH_WAIT_S",
                                          "1800")))

    if args.tile_size is None:
        args.tile_size = default_tile_max()

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

    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    runtime_params = fold_batchnorm(params, bn_stats, config)

    overlap = required_input_dimension(config)
    tiling = TilingParameters(
        max_tile_width=args.tile_size,
        max_tile_height=args.tile_size,
        overlap_x=overlap,
        overlap_y=overlap,
    )

    rng = np.random.default_rng(0)
    image = rng.integers(
        0, 256, size=(args.image_size, args.image_size, 3), dtype=np.uint8
    )
    # upload once and iterate on the device-resident image: the harness
    # tunnel's ~30 MB/s upload path would otherwise dominate (production
    # hosts feed TPUs at PCIe rates, and the CLI pipeline overlaps uploads
    # with compute)
    image = jnp.asarray(image)
    float(jnp.max(image).astype(jnp.int32))  # force the upload to finish

    def make_inferer(quantize):
        return TiledInferer(
            runtime_params, config, tiling,
            quantize=quantize, plan_autotune=args.plan_autotune,
        )

    headline_quant = None if args.quantize == "none" else args.quantize
    mpx_per_s = measure_tiled_inference(
        make_inferer(headline_quant), image, args.image_size,
        args.iters, args.passes,
    )

    def emit(metric, value, unit, **extra):
        print(json.dumps({
            "metric": metric,
            "value": round(value, 3),
            "unit": unit,
            "vs_baseline": round(value / BASELINE_MPX_PER_S, 4)
            if unit == "Mpx/s/chip" else None,
            **extra,
        }), flush=True)

    # the HEADLINE line — first, the driver contract
    emit("tiled_inference_throughput", mpx_per_s, "Mpx/s/chip")

    if args.headline_only:
        return

    # secondary metrics: failures here must never cost the headline
    # (already printed), but are real errors worth surfacing
    import sys
    import traceback

    try:
        if headline_quant is not None:
            f32 = measure_tiled_inference(
                make_inferer(None), image, args.image_size,
                args.iters, max(1, args.passes - 1),
            )
            emit("tiled_inference_throughput_f32", f32, "Mpx/s/chip")
    except Exception:  # noqa: BLE001
        traceback.print_exc(file=sys.stderr)

    try:
        t = measure_train_step(
            batch=32 if args.quick else 128,
            dim=64 if args.quick else 192,
            iters=3 if args.quick else 10,
        )
        print(json.dumps({
            "metric": "train_step_crops_per_s",
            "value": round(t["crops_per_s"], 1),
            "unit": "crops/s/chip",
            "ms_per_step": round(t["ms_per_step"], 2),
            "batch": t["batch"],
            "dim": t["dim"],
        }), flush=True)
    except Exception:  # noqa: BLE001
        traceback.print_exc(file=sys.stderr)

    try:
        ld = measure_loader(
            dim=64 if args.quick else 192,
            crops=128 if args.quick else 1024,
        )
        print(json.dumps({
            "metric": "loader_crops_per_s",
            "value": round(ld["crops_per_s"], 1),
            "unit": "crops/s/host",
            "dim": ld["dim"],
            "threads": ld["threads"],
        }), flush=True)
    except Exception:  # noqa: BLE001
        traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
