"""End-to-end run-level determinism: two same-seed CLI runs match exactly.

Round-5 background: cross-checking the r5c/r5d chip trails exposed that
rounds 1-5 never replicated same-seed runs — the prefetch threads raced
both the output queue (batch order) and the shared augmentation RNG (item
content).  The torch reference's DataLoader preserves index order across
workers and seeds them deterministically (/root/reference/data_loader.py:
28-31 builds a torch DataLoader, whose workers re-emit in index order), so
*its* same-seed runs replicate — a real parity gap.  The fix
(order-preserving reorder buffer + (seed, salt, epoch, index)-keyed
augmentation draws, data/drawkey.py) is pinned at the data-stream level by
test_pipeline_determinism.py.  THIS test pins the full run level: the real
threaded DataPipeline (num_workers=2) -> fused jitted train step ->
optimizer -> EMA -> MetricWriter, run twice, compared row-for-row on every
logged metric.

Both runs share one interpreter (the in-process `main()` pattern of
test_sampler_checkpoint.py): conftest pins the CPU backend — a bare
subprocess would land on the real TPU because sitecustomize registers the
axon plugin before env vars can win — and XLA:CPU executables are
deterministic within a process, so any row difference is host-side
ordering/RNG nondeterminism by construction.  No global mutable state can
hide between runs: the fix's whole point is that draws are keyed, not
stateful.
"""

import json
import os

import yaml


def _smoke_cfg(max_iter):
    return {
        "dataset": "CelebA", "max_iter": max_iter, "batch_size": 8,
        "image_size": 32, "crop_size": 40, "compute_dtype": "float32",
        "log_iter": 1, "image_display_iter": 1000, "image_save_iter": 1000,
        "snapshot_save_iter": 1000, "display_size": 4,
        "attr_path": "/nonexistent", "pretrained_embed": None,
        "num_workers": 2, "seed": 1234,
        "gen": {"dim": 8, "mlp_dim": 16, "style_downsample": 3,
                "content_downsample": 2, "n_res": 2, "embed_dim": 12,
                "hidden_size": 12, "num_layers": 2},
        "dis": {"dim": 8, "n_layer": 3, "num_scales": 2, "image_size": 32},
    }


def _run(cfg_path, out_dir):
    from dwcgan_tpu.cli.train import main
    main(["--config", str(cfg_path), "--output_path", str(out_dir),
          "--procedural_data", "--procedural_size", "64"])
    name = os.path.splitext(os.path.basename(str(cfg_path)))[0]
    rows = []
    with open(os.path.join(str(out_dir), "logs", name, "metrics.jsonl")) as f:
        for line in f:
            rows.append(json.loads(line))
    return rows


def test_two_same_seed_runs_identical(tmp_path):
    cfg_path = tmp_path / "det_smoke.yaml"
    cfg_path.write_text(yaml.safe_dump(_smoke_cfg(max_iter=12)))
    rows_a = _run(cfg_path, tmp_path / "a")
    rows_b = _run(cfg_path, tmp_path / "b")
    assert len(rows_a) == len(rows_b) == 12
    # wall-clock keys are the only permitted difference
    skip = {"time", "steps_per_sec", "images_per_sec"}
    for ra, rb in zip(rows_a, rows_b):
        assert ra.keys() == rb.keys()
        for k in ra:
            if k in skip:
                continue
            assert ra[k] == rb[k], (
                f"step {ra['step']}: metric {k!r} differs between same-seed "
                f"runs ({ra[k]} vs {rb[k]}) — host-side nondeterminism")
