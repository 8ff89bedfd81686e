#!/usr/bin/env python
"""Hardware plateau run: `annonet_train` to its NATURAL min-LR stop.

The reference's primary control loop — plateau detection -> LR shrink ->
stop when LR < min (annonet_train_main.cpp:569-577) — exercised
end-to-end on the real device with NO --max-total-steps, on the
detection-graded benchmark set (annonet_tpu/data/synthetic.py), with a
mid-run stop/resume through the sync file:

  phase A: train --max-total-steps 120 (writes the sync checkpoint);
  phase B: train with NO step cap -> must print "resumed from ... at
           step 120", then shrink the LR on plateaus until the min-LR
           stop;
  phase C: annonet_infer on the clean eval split with the benchmark's
           gains + detection levels + --report-json; region recalls are
           compared against PARITY_TARGETS.json's pinned floors.

Emits ONE summary JSON line and leaves the full --metrics-jsonl
trajectory + report in --workdir for the record (docs/ROUND4.md).

Run ALONE on the TPU (CLAUDE.md tunnel rules):
  timeout 1800 python -u scripts/run_hw_plateau.py
"""

import argparse
import json
import os
import pathlib
import shutil
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# the recommended detection-regime configuration (round-5 recipe,
# scripts/measure_detection.py BENCH + docs/ROUND5.md): width-32 net,
# lr 0.02, plateau window 120 (0.06 * 2000), photometric augmentation
TRAIN_FLAGS = [
    "-b", "8",
    "--level-count", "2",
    "--net-width-scaler", "2.0",
    # crop 64 like the CPU benchmark recipe (required dim 30 * 2.14 -> 64)
    "--input-dimension-multiplier", "2.14",
    "--initial-learning-rate", "0.02",
    "--min-learning-rate", "2e-4",
    "-t", "0.06",  # plateau window 120, matching the CPU bench recipe
    "--ignore-large-nonzero-regions-by-area", "8.0",
    "-u", "-l",
    "-n", "2.0",
    "--multiplicative-brightness-change-probability", "0.5",
    "-o",
    "--seed", "0",
    "--data-loader-thread-count", "2",
    "--save-interval", "100000",
]


def wait_for_device(wait_s: float = 1800.0) -> None:
    """Wait out transient tunnel wedges before starting (same discipline
    as bench.py: probe in a SUBPROCESS so a stuck probe never poisons
    this process's backend init)."""
    probe_code = (
        "from annonet_tpu.cli.common import apply_platform_env, "
        "device_probe\n"
        "apply_platform_env()\n"
        "device_probe(timeout_s=55, on_timeout='raise')\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    deadline = time.monotonic() + wait_s
    while True:
        try:
            ok = subprocess.run(
                [sys.executable, "-c", probe_code], timeout=120,
                capture_output=True, env=env,
            ).returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            return
        if time.monotonic() > deadline:
            raise SystemExit("device runtime wedged; giving up")
        print("device probe failed (wedged runtime?); retrying...",
              flush=True)
        time.sleep(60.0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/annonet_hw_plateau")
    ap.add_argument("--train-images", type=int, default=10)
    ap.add_argument("--eval-images", type=int, default=6)
    ap.add_argument("--phase-a-steps", type=int, default=120)
    ap.add_argument("--resume-phase-c", action="store_true",
                    help="Skip training: score the workdir's existing "
                         "artifact (for a run whose phase C alone was "
                         "lost to a tunnel wedge; phases A/B's metrics "
                         "files feed the summary as usual)")
    args = ap.parse_args()

    wait_for_device()

    from annonet_tpu.data.synthetic import write_detection_dataset

    wd = pathlib.Path(args.workdir)
    if not args.resume_phase_c:
        if wd.exists():
            shutil.rmtree(wd)
        (wd / "train").mkdir(parents=True)
        write_detection_dataset(
            wd / "train", n_images=args.train_images, size=256, seed=0,
            defect_count=5, oversize_images=3,
        )
        write_detection_dataset(
            wd / "eval", n_images=args.eval_images, size=256, seed=1000,
            defect_count=5, oversize_images=0,
        )

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    out = wd / "annonet.dnn"
    sync = wd / "sync.dat"
    summary = {}

    def train(phase, extra, attempts=4):
        jsonl = wd / f"metrics_{phase}.jsonl"
        cmd = [
            sys.executable, "-m", "annonet_tpu.cli.train",
            str(wd / "train"), *TRAIN_FLAGS,
            "--output", str(out), "--sync-file", str(sync),
            "--metrics-jsonl", str(jsonl), *extra,
        ]
        # the probe-timeout bump + retry loop exist for FLAPPING tunnels
        # (observed: a wait_for_device probe succeeds, the phase's own
        # startup probe stalls 2 min later). A phase that dies AT its
        # startup probe did no training, so retrying is safe; any other
        # failure still asserts.
        env_phase = dict(env)
        env_phase["ANNONET_TPU_DEVICE_PROBE_TIMEOUT"] = "300"
        for attempt in range(attempts):
            t0 = time.monotonic()
            proc = subprocess.run(
                cmd, env=env_phase, cwd=wd, capture_output=True, text=True,
                timeout=1800,
            )
            wall = time.monotonic() - t0
            (wd / f"log_{phase}.txt").write_text(proc.stdout + proc.stderr)
            if (
                proc.returncode != 0
                and "device probe did not complete" in proc.stdout
                and attempt + 1 < attempts
            ):
                print(f"phase {phase}: startup probe hit a wedged tunnel; "
                      "waiting it out and retrying...", flush=True)
                wait_for_device()
                continue
            break
        assert proc.returncode == 0, (
            f"phase {phase} rc={proc.returncode}:\n{proc.stdout[-3000:]}"
            f"\n{proc.stderr[-2000:]}"
        )
        events = [json.loads(line) for line in jsonl.read_text().splitlines()]
        return proc.stdout, wall, events

    # ---- phase A: capped run writes the checkpoint
    if args.resume_phase_c:
        # training already ran; reconstruct from the recorded artifacts
        assert out.exists() and (wd / "metrics_b.jsonl").exists()
        stdout_b = (wd / "log_b.txt").read_text()
        events_b = [
            json.loads(line)
            for line in (wd / "metrics_b.jsonl").read_text().splitlines()
        ]
        b_done = [e for e in events_b if e.get("event") == "done"]
        # device wall from the recorded events (subprocess walls lost)
        wall_a = -1.0
        wall_b = b_done[-1]["wall_seconds"] if b_done else -1.0
    else:
        stdout_a, wall_a, _ = train(
            "a", ["--max-total-steps", str(args.phase_a_steps)]
        )
        assert sync.exists()

        # ---- phase B: NO step cap -> resume + natural min-LR stop
        stdout_b, wall_b, events_b = train("b", [])
    assert f"at step {args.phase_a_steps}" in stdout_b, stdout_b[-2000:]
    assert "resumed from" in stdout_b
    shrinks = [e for e in events_b if e.get("event") == "learning_rate_shrink"]
    dones = [e for e in events_b if e.get("event") == "done"]
    final_lr = shrinks[-1]["learning_rate"] if shrinks else None
    summary.update({
        "phase_a_steps": args.phase_a_steps,
        "phase_a_wall_s": round(wall_a, 1),
        "phase_b_wall_s": round(wall_b, 1),
        "resumed": True,
        # ABSOLUTE final step from the done event — the same numbering
        # the lr_shrinks carry (cli/train.py emits absolute steps), so
        # total_steps >= every shrink step by construction
        "total_steps": dones[-1]["steps"] if dones else None,
        "phase_b_steps": dones[-1]["steps_this_run"] if dones else None,
        "lr_shrinks": [
            {"step": e["step"], "learning_rate": e["learning_rate"]}
            for e in shrinks
        ],
        "stopped_below_min_lr": bool(
            final_lr is not None and final_lr < 2e-4
        ),
    })

    # ---- phase C: score the artifact on the clean eval split
    report = wd / "report.json"
    cmd = [
        sys.executable, "-m", "annonet_tpu.cli.infer",
        str(wd / "eval"), "--model", str(out),
        "-g", "1:0.5", "-g", "2:0.5", "-d", "1:1.5", "-d", "2:2.0",
        "--report-json", str(report),
    ]
    env_c = dict(env)
    env_c["ANNONET_TPU_DEVICE_PROBE_TIMEOUT"] = "300"
    for attempt in range(4):
        proc = subprocess.run(
            cmd, env=env_c, cwd=wd, capture_output=True, text=True,
            timeout=1800,
        )
        (wd / "log_infer.txt").write_text(proc.stdout + proc.stderr)
        if (
            proc.returncode != 0
            and "device probe did not complete" in proc.stdout
            and attempt < 3
        ):
            print("phase C: startup probe hit a wedged tunnel; waiting it "
                  "out and retrying...", flush=True)
            wait_for_device()
            continue
        break
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    rep = json.loads(report.read_text())
    region = rep["confusion_per_region"]
    recalls = [c["recall"] for c in region["classes"]]
    summary["region_recall"] = recalls
    summary["pixel_accuracy"] = rep["confusion_per_pixel"]["accuracy"]

    targets = json.loads((REPO / "PARITY_TARGETS.json").read_text())
    floors = targets.get("detection_benchmark", {}).get(
        "pinned_region_recall_floor"
    )
    if floors:
        summary["region_recall_floors"] = floors
        summary["passes_floors"] = all(
            r is not None and r >= f for r, f in zip(recalls, floors)
        )
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
