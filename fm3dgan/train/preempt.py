"""Graceful-preemption handling for the training CLIs.

Spot/preemptible TPU VMs receive SIGTERM with a short grace window before
the machine disappears; losing everything since the last periodic
``model_save_freq`` checkpoint (the reference's only recovery mechanism,
/root/reference/train_3_encoder.py:708-733) can cost hours of accelerator
time.  ``GracefulShutdown`` converts the first SIGTERM/SIGINT into a flag the
training loop polls between iterations; the loop then flushes pending
metrics, saves a final checkpoint, and exits 0 so an external supervisor can
reschedule with ``--resume_dir/--resume_step``.

A second signal restores the previous handler and re-raises, so a shutdown
wedged on a hung device sync can still be interrupted.
"""

from __future__ import annotations

import os
import signal
import sys


class GracefulShutdown:
    """Installs handlers on construction; poll ``requested`` in the loop."""

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.requested = False
        self.signum: int | None = None
        self._prev = {}
        for s in signals:
            try:
                self._prev[s] = signal.signal(s, self._handler)
            except ValueError:
                # Not in the main thread (e.g. imported under a test
                # runner's worker); preemption handling is best-effort.
                pass

    def _handler(self, signum, frame):
        self.requested = True
        self.signum = signum
        print(
            f"[preempt] received signal {signum}; will checkpoint and exit "
            "after the current iteration",
            file=sys.stderr,
            flush=True,
        )
        # Second signal: restore the previous disposition so a wedged
        # shutdown (e.g. a hung remote-device sync inside save) can still be
        # killed the normal way.
        signal.signal(signum, self._prev.get(signum, signal.SIG_DFL))

    def checkpoint_and_exit(self, trainer, ckpt_dir: str, step: int, logf=None):
        """Save a final checkpoint and report how to resume.

        Returns normally (the caller breaks its loop) so ``with open(...)``
        blocks unwind and the process exits 0.
        """
        # The periodic model_save_freq save may have just written this step;
        # Orbax refuses to overwrite an existing checkpoint path.
        if not os.path.exists(os.path.join(ckpt_dir, f"{step:06d}")):
            trainer.save_checkpoint(ckpt_dir, step)
        if logf is not None:
            import json

            logf.write(
                json.dumps({"preempted_at": step, "signal": self.signum})
                + "\n"
            )
            logf.flush()
        print(
            f"[preempt] checkpoint saved at iter {step}; resume with "
            f"--resume_dir {os.path.abspath(ckpt_dir)} --resume_step {step}",
            flush=True,
        )
