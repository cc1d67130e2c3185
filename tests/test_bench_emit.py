"""bench.py stdout-headline contract (VERDICT r4 #1).

The driver captures only the last 2000 characters of bench.py's stdout, so
the ONE headline JSON line must fit a 2000-char tail whole. Round 3 lost its
number to rc=124, round 4 to a 12.8 KB line truncating mid-string — these
tests pin the compact emitter against both the committed snapshot and a
pathologically bloated payload.
"""

import json
import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench_mod():
    import bench  # imports jax; conftest pins CPU

    return bench


def _assert_tail_parseable(line: str, cap: int):
    assert len(line) <= cap
    parsed = json.loads(line)
    # the driver's capture: last 2000 chars of stdout ending in this line —
    # the line must survive the truncation WHOLE (round 4's 12.8 KB line
    # did not), i.e. the tail's last line is the complete JSON line
    tail = ("x" * 3000 + "\n" + line)[-2000:]
    assert json.loads(tail.splitlines()[-1]) == parsed
    return parsed


def test_compact_payload_fits_tail_on_committed_snapshot(bench_mod):
    path = os.path.join(HERE, "artifacts", "bench_last_validated.json")
    payload = json.load(open(path))
    line = bench_mod._compact_payload(payload)
    parsed = _assert_tail_parseable(line, bench_mod._STDOUT_CAP)
    assert parsed["metric"] == payload["metric"]
    assert parsed["value"] == payload["value"]
    assert parsed["unit"] == payload["unit"]
    d = parsed["detail"]
    assert d["bpp"] == payload["detail"]["bpp"]
    assert d["full_detail"] == "BENCH_SELF.json"


def test_compact_payload_caps_pathological_detail(bench_mod):
    """Even a payload whose every summarized field is huge must emit under
    the cap (the drop loop sheds keys before ever exceeding it)."""
    blob = {"assumptions": "y" * 5000}
    payload = {
        "metric": "stem_1080p_p_frame_encode_decode",
        "value": 1.0, "unit": "frames/s/chip", "vs_baseline": 0.03,
        "detail": {
            "bpp": 0.1,
            "per_batch_fps": {str(i): float(i) for i in range(200)},
            "device_only": {"fps": 1.0, "ms_per_frame": 2.0,
                            "dtype": "bf16", "junk": blob},
            "res_pipelined_full_stack": {
                "tile": [1, 4], "fps_tunnel_measured": 1.0,
                "pcie_projection_full_stack": {"fps": 30.0, **blob},
            },
            "res_pipelined_4stream_measured": {
                "fps_tunnel_measured": 4.0, "fps_pcie_projection": 40.0,
                "fps_pcie_projection_trained_rate": 33.0,
                "streams": 4, "frames": 8, **blob,
            },
            "trained_weights": {"bpp": 0.5, "psnr_p_frames": 31.0, **blob},
            "per_batch_720p": {str(b): {"fps": 1.0 * b, **blob}
                               for b in (4, 8, 16)},
            "carried_sections": ["a"] * 50,
            "headline_stale": "z" * 4000,
        },
    }
    line = bench_mod._compact_payload(payload)
    parsed = _assert_tail_parseable(line, bench_mod._STDOUT_CAP)
    # long stale markers are truncated, not dropped
    assert parsed["detail"]["headline_stale"].startswith("zzz")
    assert len(parsed["detail"]["headline_stale"]) <= 180


def test_compact_payload_empty_detail(bench_mod):
    line = bench_mod._compact_payload({
        "metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0,
        "detail": {},
    })
    parsed = _assert_tail_parseable(line, bench_mod._STDOUT_CAP)
    assert parsed["value"] == 0.0
