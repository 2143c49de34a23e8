"""Stall watchdog: a wedged device call exits 43; healthy runs are untouched.

The failure this guards was observed live on the remote-TPU tunnel: a device
RPC loses its response and the host blocks forever in a futex wait — no
exception, no signal (trainer.py:_start_stall_watchdog). os._exit cannot be
exercised in-process, so the stall case runs the Trainer in a subprocess and
asserts the exit code; the healthy case just runs fit() here and checks the
watchdog thread is stopped afterwards.
"""

import os
import subprocess
import sys
import threading

from tests.test_preemption import _task

from genefaceplusplus_tpu.training.trainer import Trainer

_STALL_SCRIPT = r"""
import os, sys, time
sys.path.insert(0, os.environ["REPO"])
from tests.test_preemption import _task
from genefaceplusplus_tpu.training.trainer import Trainer

task = _task()
orig_step = task.train_step

def step_then_wedge(state, batch):
    s, m = orig_step(state, batch)
    if int(s.global_step) == 2:
        time.sleep(3600)  # a lost RPC: blocks forever, raises nothing
    return s, m

task.train_step = step_then_wedge
trainer = Trainer(task, sys.argv[1], max_updates=10, val_check_interval=100,
                  update_extra_interval=100, num_sanity_val_steps=0)
trainer.fit(resume=False)
print("fit returned — watchdog failed to fire")
sys.exit(1)
"""


def test_wedged_step_exits_43(tmp_path):
    # share the suite's persistent compile cache (the subprocess doesn't go
    # through conftest) and allow 600 s: on this single-core box a cold jit
    # compile under load has pushed the old 300 s cap past timeout
    env = dict(os.environ, REPO=os.path.dirname(os.path.dirname(__file__)),
               GFPP_STALL_TIMEOUT_S="2", JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5")
    # hermetic interpreter: with PALLAS_AXON_POOL_IPS set, this container's
    # sitecustomize claims the remote TPU at python STARTUP (axon.register),
    # which blocks forever when the tunnel relay is down — JAX_PLATFORMS=cpu
    # does not prevent the claim. The parent pytest process is immune only
    # because conftest flips platforms after the claim already happened.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _STALL_SCRIPT, str(tmp_path / "work")],
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 43, (proc.returncode, proc.stdout, proc.stderr)
    assert "STALL" in proc.stdout


def test_healthy_run_unaffected(tmp_path, monkeypatch):
    monkeypatch.setenv("GFPP_STALL_TIMEOUT_S", "60")
    task = _task()
    trainer = Trainer(task, str(tmp_path / "work"), max_updates=3,
                      val_check_interval=100, update_extra_interval=100,
                      num_sanity_val_steps=0)
    state = trainer.fit(resume=False)
    assert int(state.global_step) == 3
    assert trainer._watchdog_stop.is_set()
    # the daemon thread exits promptly once stopped (wait() granularity 15s max)
    assert not any(t.name == "stall-watchdog" and not t.daemon
                   for t in threading.enumerate())


def test_watchdog_disabled_by_zero(tmp_path, monkeypatch):
    monkeypatch.setenv("GFPP_STALL_TIMEOUT_S", "0")
    task = _task()
    trainer = Trainer(task, str(tmp_path / "work"), max_updates=2,
                      val_check_interval=100, update_extra_interval=100,
                      num_sanity_val_steps=0)
    state = trainer.fit(resume=False)
    assert int(state.global_step) == 2
    assert not any(t.name == "stall-watchdog" for t in threading.enumerate())


_SLOW_COMPILE_SCRIPT = r"""
import os, sys, time
sys.path.insert(0, os.environ["REPO"])
from tests.test_preemption import _task
from genefaceplusplus_tpu.training.trainer import Trainer

task = _task()
orig_step = task.train_step
first = [True]

def slow_first_step(state, batch):
    if first[0]:
        first[0] = False
        time.sleep(6)  # "cold compile": longer than the stall timeout
    return orig_step(state, batch)

task.train_step = slow_first_step
trainer = Trainer(task, sys.argv[1], max_updates=4, val_check_interval=100,
                  update_extra_interval=100, num_sanity_val_steps=0)
state = trainer.fit(resume=False)
assert int(state.global_step) == 4, state.global_step
print("OK compile-grace")
"""


def test_first_step_compile_grace(tmp_path):
    """A cold first-step compile longer than GFPP_STALL_TIMEOUT_S must NOT
    trip the watchdog (round-4 chain regression: the torso stage was killed
    at rc=43 after 600 s of first-step compile with zero steps logged). The
    grace expires once a full step has completed — the wedge test above
    pins that a mid-run stall still exits 43 under the same settings."""
    env = dict(os.environ, REPO=os.path.dirname(os.path.dirname(__file__)),
               GFPP_STALL_TIMEOUT_S="2", JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SLOW_COMPILE_SCRIPT, str(tmp_path / "work")],
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (proc.returncode, proc.stdout, proc.stderr)
    assert "OK compile-grace" in proc.stdout
