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
    monkeypatch.setenv("DSTPU_BENCH_STEREO_ITERS", "1")
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
    # stereo latency line (VERDICT r3 #6): number or null, never absent
    assert "stereo_ms" in payload
    if payload["stereo_ms"] is not None:
        assert payload["stereo_ms"] > 0


def test_tum_autodetect(tmp_path, monkeypatch):
    """bench prefers a real TUM-layout sequence when one is present
    (VERDICT r3 #9): load_tum_frames finds DSTPU_TUM_DIR, associates
    rgb/depth/groundtruth by nearest timestamp, and returns bench frame
    tuples; absent a sequence it returns None (covered by the orbit
    replay tests)."""
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    from disinfect_slam_tpu.io.png_io import write_image

    h, w = 480, 640
    rng = np.random.default_rng(3)
    seq = tmp_path / "rgbd_dataset_freiburg1_test"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(12):
        t = 1305031102.0 + 0.033 * i
        rgb = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        depth = (rng.uniform(0.5, 3.0, (h, w)) * 5000).astype(np.uint16)
        write_image(str(seq / "rgb" / f"{t:.6f}.png"), rgb)
        write_image(str(seq / "depth" / f"{t:.6f}.png"), depth)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t + 0.004:.6f} depth/{t:.6f}.png")
        gt_lines.append(f"{t + 0.002:.6f} {0.01 * i:.4f} 0 0 0 0 0 1")
    (seq / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (seq / "depth.txt").write_text("# d\n" + "\n".join(depth_lines) + "\n")
    (seq / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines) + "\n")

    monkeypatch.setenv("DSTPU_TUM_DIR", str(seq))
    out = bench.load_tum_frames(10, w, h)
    assert out is not None
    frames, name = out
    assert name == "rgbd_dataset_freiburg1_test"
    assert len(frames) == 10
    pose, rgb, depth, ht, lt = frames[0]
    assert pose.shape == (4, 4) and depth.shape == (h, w)
    assert float(depth.max()) <= 3.01 and float(depth.min()) >= 0.49
    # translation moves along x per the groundtruth (cam_T_world inverse)
    assert abs(frames[5][0][0, 3] - (-0.05)) < 1e-4

    # wrong shape -> rejected, fail-open
    out2 = bench.load_tum_frames(10, 320, 240)
    assert out2 is None
