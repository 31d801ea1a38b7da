"""In-engine failure detection (dist/watchdog.py, VERDICT r1 #9).

Unit: Watchdog raises CollectiveTimeout on a readback that never
completes; Heartbeat files go stale when a process stops beating.

Fault injection (SURVEY.md §6.3): two REAL processes run a loop of
distributed BA steps over a 2-device global mesh with per-step
checkpoints; process 1 is killed mid-loop (simulated host loss), process
0 must DETECT (bounded wait instead of infinite hang) and abort; the
supervisor restarts both processes from the last checkpoint and the final
state must equal the uninterrupted run's exactly."""

import os
import socket
import subprocess
import sys
import textwrap
import time

import numpy as np
import pytest

from fastmatch_tpu.dist.watchdog import (
    CollectiveTimeout, Heartbeat, Watchdog, stale_peers)


class _SlowLeaf:
    """Duck-types the jax.Array readback interface with a hang."""

    def __init__(self, seconds):
        self.seconds = seconds

    def block_until_ready(self):
        time.sleep(self.seconds)
        return self


class TestWatchdogUnit:
    def test_timeout_raises(self):
        wd = Watchdog(0.3)
        t0 = time.perf_counter()
        with pytest.raises(CollectiveTimeout):
            wd.wait(_SlowLeaf(30.0))
        assert time.perf_counter() - t0 < 5.0

    def test_fast_readback_passes_through(self):
        wd = Watchdog(5.0)
        leaf = _SlowLeaf(0.0)
        assert wd.wait(leaf) is leaf

    def test_on_timeout_hook_fires(self):
        fired = []
        wd = Watchdog(0.2, on_timeout=lambda: fired.append(1))
        with pytest.raises(CollectiveTimeout):
            wd.wait(_SlowLeaf(30.0))
        assert fired == [1]

    def test_real_array_wait(self):
        import jax.numpy as jnp

        wd = Watchdog(30.0)
        x = jnp.arange(8) * 2
        assert int(np.asarray(wd.wait(x)).sum()) == 56

    def test_heartbeat_and_stale_peers(self, tmp_path):
        a = str(tmp_path / "a.hb")
        b = str(tmp_path / "b.hb")
        hb = Heartbeat(a, interval_s=0.1).start()
        Heartbeat(b).beat()  # one beat, then silence
        time.sleep(0.5)
        hb.beat()
        dead = stale_peers({"a": a, "b": b, "c": str(tmp_path / "no.hb")},
                           stale_s=0.4)
        hb.stop()
        assert "a" not in dead
        assert "b" in dead and "c" in dead


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)  # exactly 1 local CPU device
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
    import jax
    jax.config.update("jax_platforms", "cpu")

    coordinator, pid, n_steps, die_at, ckpt = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
        sys.argv[5])

    from fastmatch_tpu.dist.bootstrap import initialize_distributed
    info = initialize_distributed(coordinator, 2, pid)
    assert info["global_devices"] == 2, info

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from fastmatch_tpu.ba.problem import BAProblem, Observations
    from fastmatch_tpu.core.lie import SE3
    from fastmatch_tpu.dist.dist_ba import ba_solve_sharded
    from fastmatch_tpu.dist.watchdog import (
        CollectiveTimeout, Heartbeat, Watchdog)

    mesh = Mesh(np.array(jax.devices()), ("bank",))
    hb = Heartbeat(os.path.join(ckpt, f"proc{pid}.hb"), 0.5).start()

    # Deterministic synthetic BA problem, same on both processes.
    rng = np.random.default_rng(0)
    n_cams, n_pts, n_obs = 6, 48, 512
    pts_gt = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (n_cams, 1, 1))
    t = np.zeros((n_cams, 3), np.float32)
    t[:, 2] = 4.0 + 0.3 * np.arange(n_cams)
    cam_idx = rng.integers(0, n_cams, n_obs).astype(np.int32)
    pt_idx = rng.integers(0, n_pts, n_obs).astype(np.int32)
    p = np.einsum("oij,oj->oi", R[cam_idx], pts_gt[pt_idx]) + t[cam_idx]
    uv = (p[:, :2] / p[:, 2:3]).astype(np.float32)
    fixed = np.zeros(n_cams, bool); fixed[:2] = True

    state_path = os.path.join(ckpt, "state.npz")
    start = 0
    poses_R, poses_t = R.copy(), t.copy()
    points = (pts_gt + 0.05).astype(np.float32)
    if os.path.exists(state_path):
        with np.load(state_path) as z:
            start = int(z["step"])
            poses_R, poses_t, points = z["R"], z["t"], z["points"]
        print(f"proc{pid} resumed at step {start}", flush=True)

    wd = Watchdog(20.0)
    for step in range(start, n_steps):
        if pid == 1 and step == die_at:
            os._exit(17)  # simulated host loss, mid-BA-loop
        # Each step perturbs the restored state and re-solves: step k+1
        # CONSUMES step k's output, so the checkpoint is load-bearing.
        prob = BAProblem(
            poses=SE3(jnp.asarray(poses_R), jnp.asarray(poses_t)),
            points=jnp.asarray(points + 0.01 * (step + 1)),
            obs=Observations(jnp.asarray(cam_idx), jnp.asarray(pt_idx),
                             jnp.asarray(uv), jnp.ones(n_obs, bool)),
            cam_mask=jnp.ones(n_cams, bool),
            pt_mask=jnp.ones(n_pts, bool),
            fixed_cams=jnp.asarray(fixed),
        )
        res = ba_solve_sharded(prob, mesh, max_iters=2, pcg_iters=8)
        try:
            wd.wait(res)
        except CollectiveTimeout:
            print(f"proc{pid} DETECTED peer loss at step {step} "
                  f"(watchdog timeout)", flush=True)
            os._exit(3)
        except Exception as e:
            # The runtime may surface the dead peer as an error on the
            # readback instead of a hang — that is detection too.
            print(f"proc{pid} DETECTED peer loss at step {step} "
                  f"({type(e).__name__})", flush=True)
            os._exit(3)
        poses_R = np.asarray(res.poses.R)
        poses_t = np.asarray(res.poses.t)
        points = np.asarray(res.points)
        if pid == 0:
            tmp = state_path + ".tmp.npz"
            np.savez(tmp, step=step + 1, R=poses_R, t=poses_t,
                     points=points)
            os.replace(tmp, state_path)

    digest = float(np.abs(poses_t).sum() + np.abs(points).sum())
    print(f"proc{pid} FINAL {digest:.9e}", flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(worker, ckpt, die_at, n_steps=4):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    # Import fastmatch_tpu without relying on the (session-wiped) editable
    # install — same fix as test_multiprocess.
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "src")
    env["PYTHONPATH"] = src + os.pathsep + env.get("PYTHONPATH", "")
    coordinator = f"127.0.0.1:{_free_port()}"
    return [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(pid),
             str(n_steps), str(die_at), str(ckpt)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]


def _collect(procs, timeout=600):
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return outs


@pytest.mark.slow
def test_kill_one_process_mid_ba_detect_and_restart(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    # Reference: uninterrupted 2-process run.
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    outs = _collect(_launch(worker, ref_dir, die_at=-1))
    ref_final = [l for l in outs[0].splitlines() if "FINAL" in l]
    assert ref_final, outs[0]

    # Fault run: process 1 dies at step 2; process 0 must detect (not
    # hang) and abort with the detection exit code.
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    procs = _launch(worker, run_dir, die_at=2)
    outs = _collect(procs)
    assert procs[1].returncode == 17, outs[1]
    assert procs[0].returncode == 3, (procs[0].returncode, outs[0])
    assert "DETECTED peer loss at step 2" in outs[0], outs[0]
    # The heartbeat trail lets a supervisor confirm WHICH process died.
    from fastmatch_tpu.dist.watchdog import stale_peers
    time.sleep(1.5)
    dead = stale_peers(
        {p: str(run_dir / f"proc{p}.hb") for p in (0, 1)}, stale_s=1.2)
    assert 1 in dead

    # Restart from the last checkpoint (written at end of step 1): the
    # continuation must complete and match the uninterrupted run exactly
    # (same devices, same psum order -> bitwise-identical digests).
    procs = _collect(_launch(worker, run_dir, die_at=-1))
    assert "resumed at step 2" in procs[0], procs[0]
    got_final = [l for l in procs[0].splitlines() if "FINAL" in l]
    assert got_final, procs[0]
    assert got_final[0].split()[-1] == ref_final[0].split()[-1], (
        got_final, ref_final)
