"""Observability utilities: metric writer, image grids, HTML gallery, timer."""

import json
import os

import numpy as np

from dwcgan_tpu.utils.html import write_html_gallery
from dwcgan_tpu.utils.images import make_grid, save_image_grid
from dwcgan_tpu.utils.logging import MetricWriter
from dwcgan_tpu.utils.timer import StepTimer, Timer


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path))
    w.write(10, {"loss_gen_total": 1.5, "lr": 1e-4})
    w.write(20, {"loss_gen_total": 1.2, "lr": 1e-4})
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["step"] == 10 and lines[0]["loss_gen_total"] == 1.5
    assert lines[1]["step"] == 20


def test_make_grid_layout():
    rows = [np.full((4, 8, 8, 3), v, np.float32) for v in (-1.0, 0.0, 1.0)]
    grid = make_grid(rows, num_cols=4)
    assert grid.shape == (3 * 8, 4 * 8, 3)
    assert grid.dtype == np.uint8
    # min-max normalized: first row black, last white
    assert grid[0, 0, 0] == 0 and grid[-1, -1, -1] == 255


def test_save_image_grid(tmp_path):
    rows = [np.random.default_rng(0).uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)]
    path = str(tmp_path / "g.png")
    save_image_grid(rows, 2, path)
    assert os.path.exists(path)


def test_html_gallery(tmp_path):
    path = str(tmp_path / "index.html")
    write_html_gallery(path, iterations=20000, image_save_iter=10000)
    html = open(path).read()
    assert "train_current.jpg" in html
    assert "test_00020000.jpg" in html and "test_00010000.jpg" in html
    assert 'http-equiv="refresh"' in html


def test_timers():
    with Timer(msg="") as t:
        sum(range(1000))
    assert t.elapsed is not None and t.elapsed >= 0
    st = StepTimer()
    st.lap()
    assert st.lap() >= 0.0


def test_compile_cache_disabled_on_cpu(monkeypatch):
    """XLA:CPU persistent-cache reloads corrupt executables (PERF.md); the
    cache must stay OFF whenever the CPU backend is selected — and also when
    no platform is selected at all (JAX would silently fall back to CPU on
    an accelerator-less host; ADVICE r2)."""
    import jax

    from dwcgan_tpu.utils import compile_cache as cc

    # this test session runs on the forced-CPU backend (conftest)
    assert not cc._accelerator_backend_selected()
    before = jax.config.jax_compilation_cache_dir
    cc.enable()
    assert jax.config.jax_compilation_cache_dir == before  # no-op on CPU

    # platform unset => unsafe (possible CPU fallback) => stays off
    assert not cc._platforms_are_accelerator(None)
    assert not cc._platforms_are_accelerator("")
    assert not cc._platforms_are_accelerator("cpu")
    assert not cc._platforms_are_accelerator("cpu,tpu")
    # explicit accelerator => cache allowed
    assert cc._platforms_are_accelerator("tpu")
    assert cc._platforms_are_accelerator("axon")

    # fingerprint is stable and path-safe
    fp = cc._machine_fingerprint()
    assert fp == cc._machine_fingerprint()
    assert len(fp) == 12 and fp.isalnum()
