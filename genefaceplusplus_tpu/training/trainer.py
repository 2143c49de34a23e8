"""Training orchestrator: step loop, validation cadence, checkpoint retention.

Parity: Trainer, /root/reference/utils/commons/trainer.py:62-674 —
infinite-step train loop with val_check_interval (:309-367), atomic
step-stamped checkpoints with top-k + milestone retention (:511-567),
metric meters + TB scalars every tb_log_interval (:352-354, 620-638),
terminal-log tee (:653-656), NaN detection (:424-433).

TPU-native: no process spawning / NCCL — multi-chip data parallelism is a
sharding annotation on the jitted step (parallel/mesh.py); this loop is
single-process host orchestration either way.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np

from genefaceplusplus_tpu.utils.ckpt import get_last_checkpoint, restore_into, save_checkpoint


class Meters:
    """Deferred metric averaging.

    update() only buffers the step's (device-array) scalars — float()ing
    them in the hot loop would be ~a dozen synchronous device->host
    fetches PER STEP, each a ~26 ms round trip through the network device
    tunnel (measured: 7.4 -> 2.5 steps/s on the production SR config).
    means() reduces each key on device and fetches once per log interval;
    the host is free to run ahead dispatching steps in between."""

    def __init__(self):
        self.buf = []

    def update(self, metrics: Dict):
        self.buf.append(metrics)

    def means(self) -> Dict[str, float]:
        per_key: Dict[str, list] = {}
        for m in self.buf:
            for k, v in m.items():
                per_key.setdefault(k, []).append(v)
        out: Dict[str, float] = {}
        for k, vals in per_key.items():
            try:
                if len(vals) == 1:
                    out[k] = float(vals[0])
                else:
                    import jax.numpy as jnp

                    out[k] = float(jnp.mean(jnp.stack(
                        [jnp.asarray(v, jnp.float32) for v in vals])))
            except (TypeError, ValueError):
                pass
        return out

    def reset(self):
        self.buf = []


class TeeLogger:
    """stdout tee to work_dir/terminal_logs (trainer.py:44-59)."""

    def __init__(self, work_dir: str):
        log_dir = os.path.join(work_dir, "terminal_logs")
        os.makedirs(log_dir, exist_ok=True)
        self.f = open(os.path.join(log_dir, f"log_{int(time.time())}.txt"), "a")

    def log(self, msg: str):
        print(msg)
        self.f.write(msg + "\n")
        self.f.flush()


class Trainer:
    def __init__(
        self,
        task,
        work_dir: str,
        config=None,
        max_updates: int = 250_000,
        val_check_interval: int = 2000,
        tb_log_interval: int = 100,
        num_ckpt_keep: int = 1,
        milestone_interval: int = 100_000,
        update_extra_interval: int = 16,
        print_nan_grads: bool = False,
        num_sanity_val_steps: int = 1,
    ):
        self.task = task
        self.work_dir = work_dir
        self.config = config
        self.max_updates = max_updates
        self.val_check_interval = val_check_interval
        self.tb_log_interval = tb_log_interval
        self.num_ckpt_keep = num_ckpt_keep
        self.milestone_interval = milestone_interval
        self.update_extra_interval = update_extra_interval
        self.print_nan_grads = print_nan_grads
        self.num_sanity_val_steps = num_sanity_val_steps
        os.makedirs(work_dir, exist_ok=True)
        self.logger = TeeLogger(work_dir)
        self.metrics_file = open(os.path.join(work_dir, "metrics.jsonl"), "a")
        self._tb = self._make_tb()

    def _make_tb(self):
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(os.path.join(self.work_dir, "tb_logs"))
        except Exception:
            return None

    def _log_metrics(self, step: int, metrics: Dict[str, float]):
        rec = {"step": step, **{k: round(float(v), 6) for k, v in metrics.items()}}
        self.metrics_file.write(json.dumps(rec) + "\n")
        self.metrics_file.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"train/{k}", float(v), step)

    # ------------------------------------------------------------------
    def _install_preemption_handler(self):
        """SIGTERM/SIGINT -> finish the current step, checkpoint, exit.

        TPU-native failure story: preemptible/spot TPU VMs get a SIGTERM
        grace window; the reference's equivalent layer is the pkill-based
        worker teardown (utils/commons/trainer.py:151-155, 237-242) with no
        state save — here the run resumes losslessly from the saved step."""
        import signal

        self._preempted = False

        def _handler(signum, frame):
            self.logger.log(f"| signal {signum}: checkpoint-and-exit requested")
            self._preempted = True

        try:
            signal.signal(signal.SIGTERM, _handler)
            signal.signal(signal.SIGINT, _handler)
        except ValueError:
            pass  # non-main thread (tests): no handler, flag stays False

    def _start_stall_watchdog(self):
        """Detect a wedged device call and exit(43) so an outer loop resumes.

        Failure mode this guards (observed on the remote-TPU tunnel): a
        device RPC silently loses its response and the host blocks forever
        in a futex wait inside the runtime — no exception, no progress, no
        signal. The torch analogue is the NCCL watchdog timeout that DDP
        installs per process group; single-process JAX has no built-in
        equivalent, so the trainer keeps a host-side heartbeat (bumped once
        per step-loop iteration and around validation/save) and a daemon
        thread that calls os._exit(43) when the heartbeat goes stale for
        GFPP_STALL_TIMEOUT_S seconds (default 1800; 0 disables).

        Exit instead of recover: the wedged runtime cannot be torn down
        in-process (even device_get hangs), and state is device-side, so a
        checkpoint is impossible — the recovery unit is the process. Paired
        with resume=True and scripts/resilient_run.sh, a lost RPC costs at
        most val_check_interval steps. The timeout must exceed the longest
        legitimate host block: one tb_log_interval of steps plus the first
        remote compile (minutes through the tunnel) — 30 min clears both
        with margin on every measured config."""
        import threading

        timeout = float(os.environ.get("GFPP_STALL_TIMEOUT_S", "1800"))
        self._heartbeat = time.time()
        self._watchdog_stop = threading.Event()
        # Cold compiles are NOT stalls: the first train step and the first
        # validation each block the host for minutes building a fresh graph
        # (through the tunnel, remote compile adds RTT on top). A stall
        # timeout tuned for steady-state step cadence (e.g. 600 s in a job
        # chain) must not kill them, so those two events get a one-shot
        # grace window of GFPP_COMPILE_TIMEOUT_S (default 2400; the round-4
        # torso stage died at exactly this: rc=43 at 600 s of first-step
        # compile with zero steps logged).
        self._compile_allow_s = max(
            timeout, float(os.environ.get("GFPP_COMPILE_TIMEOUT_S", "2400")))
        self._allow_until = time.time() + self._compile_allow_s
        if timeout <= 0:
            return

        def _watch():
            while not self._watchdog_stop.wait(min(15.0, timeout / 4.0)):
                idle = time.time() - self._heartbeat
                if idle > timeout and time.time() > self._allow_until:
                    self.logger.log(
                        f"| STALL: no step progress for {idle:.0f}s "
                        f"(> GFPP_STALL_TIMEOUT_S={timeout:.0f}) — device call "
                        "presumed wedged; exiting 43 for outer resume")
                    os._exit(43)

        threading.Thread(target=_watch, daemon=True, name="stall-watchdog").start()

    def fit(self, resume: bool = True):
        task = self.task
        self._install_preemption_handler()
        self._start_stall_watchdog()
        try:
            return self._fit_inner(resume)
        finally:
            self._watchdog_stop.set()

    def _fit_inner(self, resume: bool = True):
        task = self.task
        state = task.create_state()
        start_step = 0
        if resume:
            ckpt, path = get_last_checkpoint(self.work_dir)
            if ckpt is not None:
                self.logger.log(f"| resuming from {path}")
                state = restore_into(_as_dict(state), ckpt["state_dict"])
                state = _from_dict(task.create_state(), state)
                task.load_extra_state(ckpt.get("extra_state", {}))
                start_step = int(ckpt["global_step"])

        # sanity validation before training (trainer.py:312-314 parity)
        if self.num_sanity_val_steps > 0 and start_step == 0:
            sanity = task.validate(state, max_frames=self.num_sanity_val_steps)
            if sanity:
                self.logger.log(f"| sanity val: {sanity}")

        meters = Meters()
        t0 = time.time()
        for step in range(start_step, self.max_updates):
            self._heartbeat = time.time()
            if step > start_step:
                # at least one full step completed: the first-dispatch
                # compile grace is over; steady-state cadence rules apply
                # (the first-validation grant below re-arms it just-in-time)
                self._allow_until = 0.0
            if self._preempted:
                self.save(state, step)
                self.logger.log(f"| preempted at step {step}; checkpoint saved, exiting")
                return state
            if step % self.update_extra_interval == 0:
                task.update_extra_state(state)

            try:
                batch = task.sample_train_batch(global_step=step)
            except TypeError:
                batch = task.sample_train_batch()
            state, metrics = task.train_step(state, batch)
            meters.update(metrics)

            if (step + 1) % self.tb_log_interval == 0:
                means = meters.means()
                means["steps_per_sec"] = self.tb_log_interval / max(1e-9, time.time() - t0)
                t0 = time.time()
                self._log_metrics(step + 1, means)
                self.logger.log(
                    f"| step {step + 1} "
                    + " ".join(f"{k}={v:.4g}" for k, v in sorted(means.items()))
                )
                if self.print_nan_grads and not np.isfinite(means.get("total_loss", 0.0)):
                    self.logger.log("| WARNING: non-finite loss detected")
                meters.reset()

            if (step + 1) % self.val_check_interval == 0 or step + 1 == self.max_updates:
                self._heartbeat = time.time()
                # let the task bump the heartbeat per rendered frame/chunk:
                # a warm validation longer than the stall timeout must not
                # be killed mid-render (advisor r4)
                task._trainer_heartbeat = lambda: setattr(
                    self, "_heartbeat", time.time())
                if not getattr(self, "_first_val_done", False):
                    # first validation compiles the full-frame render graph
                    self._first_val_done = True
                    self._allow_until = max(
                        getattr(self, "_allow_until", 0.0),
                        time.time() + getattr(self, "_compile_allow_s", 2400.0))
                try:
                    val_metrics = task.validate(state, save_dir=self.work_dir)
                except TypeError:  # tasks without render saving
                    val_metrics = task.validate(state)
                if val_metrics:
                    self._log_metrics(step + 1, val_metrics)
                    self.logger.log(f"| val @ {step + 1}: {val_metrics}")
                self.save(state, step + 1)
        return state

    def save(self, state, step: int):
        payload = {
            "state_dict": _as_dict(state),
            "extra_state": self.task.extra_state_dict(),
        }
        path = save_checkpoint(
            self.work_dir, step, payload, config=self.config,
            num_ckpt_keep=self.num_ckpt_keep, milestone_interval=self.milestone_interval,
        )
        self.logger.log(f"| saved {path}")


def _as_dict(state):
    """TrainState -> plain nested dict for serialisation."""
    import flax

    return flax.serialization.to_state_dict(state)


def _from_dict(template_state, d):
    import flax

    return flax.serialization.from_state_dict(template_state, d)
