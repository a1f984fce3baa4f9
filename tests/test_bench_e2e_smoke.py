"""bench_e2e_step.py executes end to end on CPU at smoke scale — all
three input modes.

The real-trainer e2e numbers in BENCH.md's r5 table come from this
harness on the chip; a shape/config regression in any of its arms
(f32 images, uint8 images, pre-tokenized) would silently invalidate the
round's corroboration numbers. These run main() in-process against the
dalle_smoke config with BENCH_STEPS trimmed, asserting a well-formed
JSON report per mode.
"""

import importlib
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run(monkeypatch, capsys, **env):
    monkeypatch.setenv("BENCH_E2E_CONFIG", "dalle_smoke")
    monkeypatch.setenv("BENCH_E2E_BATCH", "2")
    for k, v in env.items():
        monkeypatch.setenv(k, str(v))
    import bench_e2e_step

    importlib.reload(bench_e2e_step)  # module-level knobs re-read env
    monkeypatch.setattr(bench_e2e_step, "WARMUP_STEPS", 1)
    monkeypatch.setattr(bench_e2e_step, "BENCH_STEPS", 2)
    bench_e2e_step.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["value"] > 0
    assert rec["unit"] == "tokens/sec/chip"
    return rec


@pytest.mark.slow
def test_e2e_smoke_images_f32(monkeypatch, capsys):
    rec = _run(monkeypatch, capsys)
    assert rec["metric"] == "dalle_smoke_e2e_trainer_step_tokens_per_sec_per_chip"


@pytest.mark.slow
def test_e2e_smoke_images_u8(monkeypatch, capsys):
    rec = _run(monkeypatch, capsys, BENCH_E2E_U8=1)
    assert rec["metric"] == "dalle_smoke_u8_e2e_trainer_step_tokens_per_sec_per_chip"


@pytest.mark.slow
def test_e2e_smoke_tokens(monkeypatch, capsys):
    rec = _run(monkeypatch, capsys, BENCH_E2E_TOKENS=1)
    assert rec["metric"] == "dalle_smoke_tokens_e2e_trainer_step_tokens_per_sec_per_chip"


@pytest.mark.slow
def test_e2e_smoke_device_loop(monkeypatch, capsys):
    rec = _run(monkeypatch, capsys, BENCH_E2E_TOKENS=1, BENCH_E2E_ITERATIONS=2,
               BENCH_E2E_CALLS=1)
    assert rec["metric"] == "dalle_smoke_tokens_e2e_trainer_step_tokens_per_sec_per_chip"
