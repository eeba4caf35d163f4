"""The bench stdout line must parse from its own 2000-char TAIL.

The round driver captures only the LAST 2000 characters of stdout; the
single-line JSON blobs of rounds 1-3 all exceeded 2KB and were recorded as
``"parsed": null`` (BENCH_r01..r03.json) no matter which end the compact
fields sat on.  bench.build_result_line now guarantees a short line by
construction — this test pins that contract with a full 14-stage synthetic
result and a partial (missing-mandatory) one.

Runs bench.py's builder in a subprocess because importing bench configures
the persistent compilation cache, which the test process should not inherit.
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CODE = """
import json
import bench

row = {"naive_us": 140580.64, "fused_us": 5561.61, "speedup": 25.284951,
       "compile_s": 9.32, "measure_s": 26.5, "bytes_mb": 1140.85,
       "floor_us": 1392.98, "pct_sol": 25.05}
details = {k: dict(row) for k in bench._ALL_STAGES}
for k in ("padding_ops", "actor_critic_ops", "td_point_ops"):
    details[k]["in_geomean"] = 0

line, full = bench.build_result_line(details)
assert len(line) <= 1900, f"stdout line too long: {len(line)}"
parsed = json.loads(line[-2000:])  # the driver's exact capture window
assert parsed["metric"] == "fused_vs_naive_geomean_speedup"
assert parsed["unit"] == "x"
assert parsed["stages_completed"] == len(bench._ALL_STAGES)
assert abs(parsed["value"] - 25.285) < 0.01
assert "partial" not in parsed
assert set(parsed["stages"]) == set(bench._ALL_STAGES)
assert parsed["stages"]["vtrace_T1024_B4096_N32"] == {"s": 25.28, "sol": 25.1}
# The sidecar payload keeps the full per-stage fields the stdout line drops.
assert full["details"]["gae_T1024_B4096"]["naive_us"] == 140580.64

part = {k: details[k] for k in list(details)[:3]}
line2, _ = bench.build_result_line(part)
p2 = json.loads(line2[-2000:])
assert len(line2) <= 1900, f"partial line too long: {len(line2)}"
assert p2["partial"] is True
assert "vtrace_T1024_B4096_N32" in p2["missing_mandatory"]
print("BENCH_EMIT_OK")
"""


def test_result_line_parses_from_driver_tail_window():
    env = dict(os.environ, DIHPC_BENCH_PLATFORM="cpu")
    r = subprocess.run([sys.executable, "-c", _CODE], cwd=_REPO, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "BENCH_EMIT_OK" in r.stdout
