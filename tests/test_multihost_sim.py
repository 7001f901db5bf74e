"""Real multi-process multi-host simulation: two coordinated processes
(jax.distributed over localhost) run sharded train steps on a global
mesh spanning both processes' CPU devices.

This is the strongest cluster-free validation of the --multihost path:
every process feeds its own slice of the epoch plan, the global batch
is assembled with ``jax.make_array_from_process_local_data``, and the
gradient psum crosses the process boundary. Both processes must report
identical finite losses.
"""

import os
import socket
import subprocess
import sys

from phones_las_tpu.data.synthetic import write_synth_corpus

import pytest

pytestmark = pytest.mark.slow

_CHILD = os.path.join(os.path.dirname(__file__), "multihost_child.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training(tmp_path):
    # up-to-20-phone utterances (0.2–3 s) → the epoch plan mixes two
    # bucket shapes, exercising the bucket-aligned plan stride
    path, _ = write_synth_corpus(
        str(tmp_path / "train.plu"), n_utts=48, n_phones=5,
        n_phones_range=(3, 20),
    )
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # child sets platform via jax.config
    # two virtual CPU devices per process → 4-device global 'data' mesh
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    repo_root = os.path.dirname(os.path.dirname(_CHILD))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _CHILD, coord, "2", str(pid), path],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=os.path.dirname(os.path.dirname(_CHILD)), text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"child failed:\n{out}\n{err[-3000:]}"
        outs.append(out)
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("LOSSES")]
        assert lines, out
        losses.append(lines[-1])
    # both controllers computed the same global steps
    assert losses[0] == losses[1], losses


def test_multihost_cli_entry(tmp_path):
    """`train --multihost` through the REAL CLI in two processes.

    Regression: the CLI used to call enable_compilation_cache() (which
    touches jax.default_backend(), initializing the XLA backend) before
    jax.distributed.initialize(), making --multihost raise on arrival.
    The sim test above bypasses the CLI, so only this catches it.

    The workdir is SHARED (one per run, all processes): orbax
    coordinates the checkpoint save across processes and deadlocks on
    divergent directories — the CLI validates this up front.
    """
    from phones_las_tpu.cli import prepare as prepare_cli

    data = str(tmp_path / "d")
    prepare_cli.main(["synthetic", "--out", data, "--n-utts", "16",
                      "--n-phones", "4"])
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # honor_jax_platforms_env re-asserts it
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_COORDINATOR_ADDRESS"] = coord
    env["JAX_NUM_PROCESSES"] = "2"
    repo_root = os.path.dirname(os.path.dirname(_CHILD))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(2):
        e = dict(env)
        e["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "phones_las_tpu.cli.train",
             "--preset", "timit_phone_las", "--data", data,
             "--workdir", str(tmp_path / "w"), "--multihost",
             "--num-steps", "2", "--eval-every", "2", "--batch-size", "4",
             "--encoder-layers", "2", "--encoder-units", "16",
             "--decoder-units", "16", "--embedding-dim", "8",
             "--attention-units", "16"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=e,
            cwd=repo_root, text=True,
        ))
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"CLI --multihost failed:\n{out}\n{err[-3000:]}"
        assert "'loss':" in out, out
