"""TensorBoard metrics writer — host-side equivalent of the reference's
host_call/outfeed summary machinery (utils/utils.py:103-161,
ScalarSummaryOperation :197-227, image summaries model_fns_tf.py:68-78).

In JAX no outfeed plumbing is needed: metrics are device arrays fetched on
the host loop's log cadence. Writes TF2 event files (same consumer:
TensorBoard); degrades to logging-only when TensorFlow isn't importable.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)


def _tf_writer(logdir: str):
    try:
        import tensorflow as tf  # noqa: PLC0415

        return tf.summary.create_file_writer(logdir)
    except Exception as e:  # pragma: no cover
        logger.warning("tensorboard writer unavailable (%s); metrics log-only", e)
        return None


class MetricsWriter:
    def __init__(self, model_dir: str):
        self.logdir = model_dir
        self._writer = None
        self._opened = False

    @property
    def writer(self):
        if not self._opened:
            self._writer = _tf_writer(self.logdir)
            self._opened = True
        return self._writer

    def scalars(self, step: int, values: dict):
        w = self.writer
        if w is None:
            return
        import tensorflow as tf  # noqa: PLC0415

        with w.as_default():
            for name, v in values.items():
                tf.summary.scalar(name, float(v), step=step)

    def images(self, step: int, images: dict, max_outputs: int = 4):
        """images: name -> [B, H, W, C] float arrays in [0, 1]."""
        w = self.writer
        if w is None:
            return
        import tensorflow as tf  # noqa: PLC0415

        with w.as_default():
            for name, v in images.items():
                arr = np.clip(np.asarray(v), 0.0, 1.0)
                tf.summary.image(name, arr, step=step, max_outputs=max_outputs)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        self.flush()
