"""Exercise parallel/multihost.py with REAL multi-process jax (VERDICT r2
missing #5): two CPU processes under jax.distributed.initialize run the
pickled-object gather and the BN-stat sync and assert the results.

Reference analogs: core/yolox/utils/dist.py:186-265 (gloo all_gather of
pickled objects), core/yolox/utils/allreduce_norm.py:59-103 (BN-stat mean).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax

# the environment's sitecustomize registers a TPU platform plugin and
# rewrites jax_platforms; force CPU again before any backend initialises
jax.config.update("jax_platforms", "cpu")
pid, port = int(sys.argv[1]), sys.argv[2]
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
sys.path.insert(0, sys.argv[3])
import numpy as np
import jax.numpy as jnp
from frlw_evd_tpu.parallel.multihost import (gather_objects,
                                             is_multiprocess,
                                             sync_batch_stats)

assert is_multiprocess()
# heterogeneous picklable payloads of different sizes, like per-host eval
# result lists
payload = {"pid": pid, "dets": [("box", i * 1.5) for i in range(3 + 5 * pid)]}
objs = gather_objects(payload)
assert [o["pid"] for o in objs] == [0, 1], objs
assert len(objs[1]["dets"]) == 8 and objs[1]["dets"][1] == ("box", 1.5)

bs = {"bn": {"mean": jnp.full((4,), float(pid)),
             "var": jnp.full((4,), 1.0 + pid)}}
out = sync_batch_stats(bs)
np.testing.assert_allclose(np.asarray(out["bn"]["mean"]), 0.5)
np.testing.assert_allclose(np.asarray(out["bn"]["var"]), 1.5)
print("MULTIHOST_OK", pid, flush=True)
"""


def test_two_process_gather_and_bn_sync(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port), REPO],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"process {i} timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"MULTIHOST_OK {i}" in out
