"""bench.py executes end to end on CPU at smoke scale — both paths.

The driver records BENCH_r{N}.json by running ``python bench.py`` on the
real chip; a syntax/shape regression there would silently cost the round's
headline. These tests execute main() in-process (tiny BENCH_SMOKE config,
8 fake CPU devices) for the per-step form and the compiled device-loop
form (the default, BENCH.md r4c) and assert a well-formed JSON report.
"""

import importlib
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_bench(monkeypatch, capsys, **env):
    for k, v in env.items():
        monkeypatch.setenv(k, str(v))
    import bench

    importlib.reload(bench)  # module-level knobs (BENCH_BATCH, ...) re-read env
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "dalle_coco_train_tokens_per_sec_per_chip"
    assert rec["value"] > 0
    assert rec["unit"] == "tokens/sec/chip"
    assert {"vs_baseline", "tflops_per_sec_chip", "mfu_pct"} <= rec.keys()
    return rec


def test_bench_smoke_per_step(monkeypatch, capsys):
    _run_bench(
        monkeypatch, capsys, BENCH_SMOKE=1, BENCH_BATCH=2, BENCH_DEVICE_LOOP=0
    )


def test_bench_smoke_device_loop_default(monkeypatch, capsys):
    # device loop is the DEFAULT path (BENCH_DEVICE_LOOP unset -> K=100);
    # use a small K here so the smoke run stays fast, same code path
    _run_bench(
        monkeypatch,
        capsys,
        BENCH_SMOKE=1,
        BENCH_BATCH=2,
        BENCH_DEVICE_LOOP=3,
        BENCH_DEVICE_LOOP_CALLS=1,
    )


@pytest.mark.slow
def test_bench_profile_forces_per_step(monkeypatch, tmp_path, capsys):
    # BENCH_PROFILE must take the per-step form (2-step trace granularity)
    # even though the device loop is the default
    rec = _run_bench(
        monkeypatch,
        capsys,
        BENCH_SMOKE=1,
        BENCH_BATCH=2,
        BENCH_PROFILE=str(tmp_path / "trace"),
    )
    assert rec["value"] > 0
    assert any((tmp_path / "trace").rglob("*")), "profiler trace not written"
