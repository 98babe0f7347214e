"""Training observability: stdout + metrics.jsonl + optional TensorBoard.

Replaces the reference's tensorboardX SummaryWriter scalars/mosaics
(ref train.py:190-191, trainer_parallel.py:299-400). Scalars go to a jsonl
file (machine-readable for the driver/judge) and to TensorBoard when torch's
SummaryWriter is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, output_dir: Optional[str], use_tensorboard: bool = True,
                 resume: bool = False):
        # output_dir=None -> inert logger (non-rank-0 processes under
        # multi-host; ref rank-0-only TB/fs writes, train.py:187-190)
        if output_dir is None:
            self.path = None
            self._f = None
            self._tb = None
            return
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        # fresh (non-resumed) runs truncate: appending would interleave two
        # runs' records at overlapping step numbers with no delimiter
        self._f = open(self.path, "a" if resume else "w")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(output_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float], prefix: str = "train"):
        if self._f is None:
            return
        rec = {"ts": time.time(), "step": int(step), "prefix": prefix}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), int(step))

    def log_image(self, step: int, name: str, pil_image, prefix: str = "train"):
        """Image observability (ref trainer_parallel.py:307-400 mosaics):
        TensorBoard when available; always a PNG under viz/ so the artifact
        exists without TB."""
        import numpy as np

        if self.path is None:
            return
        viz_dir = os.path.join(os.path.dirname(self.path), "viz")
        os.makedirs(viz_dir, exist_ok=True)
        pil_image.save(os.path.join(viz_dir, f"{name}_{int(step):07d}.png"))
        if self._tb is not None:
            self._tb.add_image(
                f"{prefix}/{name}", np.asarray(pil_image), int(step),
                dataformats="HWC",
            )

    def close(self):
        if self._f is None:
            return
        self._f.close()
        if self._tb is not None:
            self._tb.close()
