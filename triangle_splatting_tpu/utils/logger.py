"""Logging: colored console + file + scalar/histogram/image metric sink.

Replaces the reference's ``utils/logger.py:161-218`` (python logging +
TensorBoard). TensorBoard is not guaranteed in the TPU image, so metrics are
always written to a JSONL event file (``events.jsonl``) that tools can tail;
if ``tensorboard`` is importable, a ``SummaryWriter`` mirror is attached
transparently. Images are saved as PNG next to the event log.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

_COLORS = {
    logging.DEBUG: "\033[36m",
    logging.INFO: "\033[32m",
    logging.WARNING: "\033[33m",
    logging.ERROR: "\033[31m",
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        color = _COLORS.get(record.levelno, "")
        base = super().format(record)
        return f"{color}{base}{_RESET}" if sys.stderr.isatty() else base


class Logger:
    """Console/file logger plus scalar/histogram/image sinks."""

    def __init__(self, name: str = "ts", output_dir: str | Path | None = None,
                 log_file: bool = True, use_tensorboard: bool = True,
                 level: int = logging.INFO):
        self.logger = logging.getLogger(f"{name}-{id(self)}")
        self.logger.setLevel(logging.DEBUG)
        self.logger.propagate = False
        fmt = "%(asctime)s %(levelname)s %(message)s"

        sh = logging.StreamHandler(sys.stderr)
        sh.setLevel(level)
        sh.setFormatter(_ColorFormatter(fmt, datefmt="%H:%M:%S"))
        self.logger.addHandler(sh)

        self.output_dir = Path(output_dir) if output_dir is not None else None
        self._events_file = None
        self._tb = None
        if self.output_dir is not None:
            log_dir = self.output_dir / "log"
            log_dir.mkdir(parents=True, exist_ok=True)
            if log_file:
                timestr = time.strftime("%Y%m%d_%H%M%S")
                fh = logging.FileHandler(log_dir / f"{timestr}_outputs.log")
                fh.setLevel(logging.DEBUG)
                fh.setFormatter(logging.Formatter(fmt))
                self.logger.addHandler(fh)
            self._events_file = open(log_dir / "events.jsonl", "a", buffering=1)
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter  # type: ignore
                    self._tb = SummaryWriter(str(self.output_dir / "tb"))
                except Exception:
                    self._tb = None

    # -- plain logging ----------------------------------------------------
    def debug(self, msg: str) -> None: self.logger.debug(msg)
    def info(self, msg: str) -> None: self.logger.info(msg)
    def warning(self, msg: str) -> None: self.logger.warning(msg)
    def error(self, msg: str) -> None: self.logger.error(msg)

    # -- metric sinks -----------------------------------------------------
    def _emit(self, kind: str, tag: str, step: int, payload: dict) -> None:
        if self._events_file is not None:
            rec = {"kind": kind, "tag": tag, "step": int(step),
                   "time": time.time(), **payload}
            self._events_file.write(json.dumps(rec) + "\n")

    def add_scalar(self, tag: str, value, step: int) -> None:
        value = float(value)
        self._emit("scalar", tag, step, {"value": value})
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_histogram(self, tag: str, values, step: int) -> None:
        values = np.asarray(values, np.float64).ravel()
        if values.size == 0:
            return
        counts, edges = np.histogram(values, bins=64)
        self._emit("histogram", tag, step, {
            "min": float(values.min()), "max": float(values.max()),
            "mean": float(values.mean()), "counts": counts.tolist(),
            "edges": [float(edges[0]), float(edges[-1])]})
        if self._tb is not None:
            self._tb.add_histogram(tag, values, step)

    def add_image(self, tag: str, image, step: int) -> None:
        """image: (3, H, W) or (H, W) float in [0,1]."""
        img = np.asarray(image)
        if img.ndim == 3 and img.shape[0] in (1, 3):
            img = np.transpose(img, (1, 2, 0))
        img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if self.output_dir is not None:
            img_dir = self.output_dir / "images"
            img_dir.mkdir(parents=True, exist_ok=True)
            safe_tag = tag.replace("/", "_").replace(" ", "_")
            try:
                from PIL import Image
                Image.fromarray(img8.squeeze()).save(img_dir / f"{safe_tag}_{step}.png")
            except Exception:
                np.save(img_dir / f"{safe_tag}_{step}.npy", img8)
        self._emit("image", tag, step, {"shape": list(img8.shape)})
        if self._tb is not None:
            self._tb.add_image(tag, np.transpose(img8, (2, 0, 1)) if img8.ndim == 3 else img8[None], step)

    def close(self) -> None:
        if self._events_file is not None:
            self._events_file.close()
        if self._tb is not None:
            self._tb.close()

    def warnOnce(self, msg: str) -> None:
        if not hasattr(self, "_warned"):
            self._warned = set()
        if msg not in self._warned:
            self.warning(msg)
            self._warned.add(msg)


def _mp_listener(queue, name, output_dir, use_tensorboard):
    logger = Logger(name, output_dir, use_tensorboard=use_tensorboard)
    while True:
        try:
            record = queue.get()
            if record is None:            # sentinel: shut down
                break
            kind, args = record
            getattr(logger, kind)(*args)
        except Exception:
            import traceback
            traceback.print_exc(file=sys.stderr)
    logger.close()


class Logger_MP:
    """Logger variant that forwards records through a multiprocessing queue
    to a background listener process (reference utils/logger.py:70-158), so
    file/TensorBoard IO never stalls the train loop.
    """

    def __init__(self, name: str = "ts", output_dir: str | Path | None = None,
                 use_tensorboard: bool = True):
        import multiprocessing as mp
        ctx = mp.get_context("spawn")     # fork is unsafe once jax is live
        self._queue = ctx.Queue(-1)
        self._listener = ctx.Process(
            target=_mp_listener,
            args=(self._queue, name,
                  str(output_dir) if output_dir is not None else None,
                  use_tensorboard),
            daemon=True)
        self._listener.start()
        self._warned: set[str] = set()

    def _put(self, kind: str, *args) -> None:
        self._queue.put((kind, args))

    def debug(self, msg: str) -> None: self._put("debug", msg)
    def info(self, msg: str) -> None: self._put("info", msg)
    def warning(self, msg: str) -> None: self._put("warning", msg)
    def error(self, msg: str) -> None: self._put("error", msg)

    def warnOnce(self, msg: str) -> None:
        if msg not in self._warned:
            self.warning(msg)
            self._warned.add(msg)

    def add_scalar(self, tag: str, value, step: int) -> None:
        self._put("add_scalar", tag, float(value), int(step))

    def add_histogram(self, tag: str, values, step: int) -> None:
        self._put("add_histogram", tag, np.asarray(values), int(step))

    def add_image(self, tag: str, image, step: int) -> None:
        self._put("add_image", tag, np.asarray(image), int(step))

    def close(self) -> None:
        if self._listener.is_alive():
            self._queue.put(None)
            # Generous: the spawn-context listener may still be STARTING
            # (fresh interpreter importing numpy) on a loaded host — a
            # 10 s join raced that and returned before the log file was
            # flushed (flaked once under a full parallel test+train load).
            self._listener.join(timeout=120)
            if self._listener.is_alive():
                import sys
                print("Logger_MP: listener did not drain within 120 s; "
                      "log records may be lost", file=sys.stderr)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# Module-level console-only logger (reference utils/logger.py:218).
stdout_logger = Logger("stdout_logger", output_dir=None)
