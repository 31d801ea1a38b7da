"""Real multi-process distributed tests (T20, SURVEY.md §5.2): two OS
processes wire up via jax.distributed.initialize over a localhost
coordinator (the same PJRT coordination service a pod slice uses — no
MPI/NCCL), build a global 2-device mesh, and run a psum and a config
broadcast across the process boundary."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)  # exactly 1 local CPU device
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
    import jax
    jax.config.update("jax_platforms", "cpu")

    coordinator, pid = sys.argv[1], int(sys.argv[2])
    from fastmatch_tpu.dist.bootstrap import initialize_distributed, broadcast_config

    info = initialize_distributed(coordinator, 2, pid)
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 2, info

    # Global psum over the 2-device (1 per process) mesh.
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map
    import numpy as np

    mesh = Mesh(np.array(jax.devices()), ("d",))
    def f(x):
        return jax.lax.psum(x, "d")
    g = jax.jit(shard_map(f, mesh=mesh, in_specs=P("d"), out_specs=P()))
    from jax.experimental import multihost_utils
    local = np.full((1,), float(pid + 1), np.float32)
    garr = multihost_utils.host_local_array_to_global_array(local, mesh, P("d"))
    out = g(garr)
    total = float(np.asarray(out.addressable_data(0))[0])
    assert total == 3.0, total  # (0+1) + (1+1)

    # Config broadcast: both processes end with process 0's config.
    from fastmatch_tpu.pipeline.config import PipelineConfig, MatchingConfig
    import dataclasses
    if pid == 0:
        cfg = PipelineConfig(matching=MatchingConfig(ratio=0.71))
    else:
        cfg = PipelineConfig()  # deliberately different
    cfg = broadcast_config(cfg)
    assert abs(cfg.matching.ratio - 0.71) < 1e-9, cfg.matching.ratio
    print(f"proc{pid} ok total={total} ratio={cfg.matching.ratio}")
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_psum_and_config_broadcast(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coordinator = f"127.0.0.1:{_free_port()}"
    # Strip XLA device-count flags AND the axon TPU plugin trigger: the
    # container's sitecustomize initializes the XLA backend at interpreter
    # start when PALLAS_AXON_POOL_IPS is set, which would break
    # jax.distributed.initialize's must-be-first contract.
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    # The workers must import fastmatch_tpu even when the editable install
    # is absent (this container wipes the venv between sessions): put the
    # repo's src/ on their path explicitly.
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "src")
    env["PYTHONPATH"] = src + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} ok total=3.0" in out, out
