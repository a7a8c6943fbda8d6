"""Preemption/interrupt handling for the training loop (VERDICT r3 next #6:
extracted from train.py so train_model keeps orchestration only).

Production pods stop with SIGTERM + a grace period; interactive runs stop
with Ctrl-C. Either sets a flag the step loop honors at the next safe
boundary (train.py saves a fully-resumable INTERRUPTED.npz before returning
normally). A second Ctrl-C aborts immediately. The legacy reference saved
INTERRUPTED.pth on KeyboardInterrupt (reference: legacy train.py __main__,
UNVERIFIED mount — same contingency class as SURVEY.md §A.1).
"""

from __future__ import annotations

import logging
import signal
import threading

logger = logging.getLogger(__name__)


class StopSignal:
    """Context manager: trap SIGTERM/SIGINT into a soft-stop flag.

    Handlers install only on the main thread (signal.signal raises
    elsewhere) and are ALWAYS restored on exit — a leaked no-op SIGTERM
    handler would make the process un-stoppable afterwards.
    """

    def __init__(self):
        self.requested = False
        self._prev: dict = {}

    def __enter__(self):
        if threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM, signal.SIGINT):
                self._prev[sig] = signal.signal(sig, self._on_signal)
        return self

    def __exit__(self, *exc):
        for sig, handler in self._prev.items():
            signal.signal(sig, handler)
        return False

    def _on_signal(self, signum, frame):
        if self.requested and signum == signal.SIGINT:
            raise KeyboardInterrupt  # second Ctrl-C: abort now
        self.requested = True
        logger.info(
            "%s received — will save a resumable checkpoint and stop at "
            "the next batch boundary", signal.Signals(signum).name,
        )
