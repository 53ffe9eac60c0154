"""Atomic checkpoint serialization shared by every resumable kernel.

Two failure modes of a bare ``np.savez(path)`` matter for checkpoints:

1. A kill *during* the save (the very event checkpointing exists to survive)
   truncates the only copy — resume then fails on a corrupt zip and the whole
   run is lost. Writing to a temp file in the same directory and
   ``os.replace``-ing it in is atomic on POSIX.
2. ``np.savez(str)`` silently appends ``.npz`` when the name lacks it, so a
   ``checkpoint_file="run.ckpt"`` is written to ``run.ckpt.npz`` while
   ``resume_from="run.ckpt"`` later opens nothing (or a stale file). Writing
   through a file handle uses the exact name given.
"""

import os
import tempfile

import numpy as np

__all__ = ["atomic_savez"]


def atomic_savez(filename, **arrays):
    """``np.savez`` to exactly ``filename``, atomically (write temp + rename)."""
    filename = os.fspath(filename)
    directory = os.path.dirname(os.path.abspath(filename))
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, filename)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
