"""Record weak-scaling efficiency on the 8-virtual-device CPU mesh.

Runs benches.bench_scaling (sharded signed-affine table MSM — the shipping
strategy) and writes the JSON lines to SCALING_r04.json at the repo root.
The CPU mesh validates the sharding/collective structure; chip-slice ICI
numbers require multi-chip hardware this environment does not have
(BASELINE.md weak-scaling target >=80%).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import contextlib  # noqa: E402
import io  # noqa: E402

from bellman_mpc_tpu.benches import bench_scaling  # noqa: E402

buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    bench_scaling(quick="--quick" in sys.argv)
text = buf.getvalue()
print(text, end="")
out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING_r04.json")
with open(out, "w") as fh:
    fh.write(text)
print(f"wrote {out}", file=sys.stderr)
