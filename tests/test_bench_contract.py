"""bench.py JSON contract smoke test.

The driver scores the round from bench.py's single JSON stdout line; a
regression there (exception, missing key, malformed JSON) is worse than
any perf bug.  Run the real main() end-to-end on the CPU backend at a
reduced frame/iteration count and pin the contract.
"""

import json
import os
import sys

import pytest


def test_bench_json_contract(monkeypatch, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    # JAX_PLATFORMS=cpu short-circuits the (dead-tunnel) probe; the
    # conftest already pinned the cpu backend via jax.config
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("DSTPU_BENCH_FRAMES", "4")
    monkeypatch.setenv("DSTPU_BENCH_RAYCAST", "0")
    monkeypatch.setenv("DSTPU_BENCH_SEG_ITERS", "2")
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert out, "bench printed nothing to stdout"
    payload = json.loads(out[-1])

    # the driver contract
    assert payload["metric"] == "tsdf_fusion_fps"
    assert payload["unit"] == "frames/s"
    assert payload["value"] > 0
    # value is rounded to 2 decimals and vs_baseline to 3, so the two
    # roundings can disagree by up to half an ULP of EACH: 0.005/60
    # from the value rounding + 0.0005 from the ratio rounding
    # (ADVICE r3: the halved value term could flake on a worst-case
    # pair of opposite-direction roundings)
    assert payload["vs_baseline"] == pytest.approx(
        payload["value"] / 60.0, abs=0.005 / 60 + 0.0005
    )
    # self-description fields (a CPU run must say so)
    assert payload["platform"] == "cpu"
    assert "img" in payload and "voxel_m" in payload
    assert "dataset" in payload
    # online metrics: number or null, never absent
    assert "online_fps" in payload
    assert "online_fps_fast" in payload
    if payload["online_fps"] is not None:
        assert payload["online_fps"] > 0
