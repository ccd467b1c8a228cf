""".mat interop and checkpointing.

The reference shards GT transients over `batch` .mat files
(exp_bunny/test.py:69-75: gt_transient[measurement_num/batch*i : ...] =
loadmat(filename)['gt_transient']) and dumps per-iteration optimization
state to progress*/%05d.mat (test.py:186-187).  We keep the same .mat
contract for interchange with the reference's MATLAB tooling, and add a
full resume checkpoint (mesh + optimizer + phase machine + RNG key) that
the reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterable, Optional

import numpy as np
import scipy.io


def load_transient_shards(filenames: Iterable[str], key: str = "gt_transient"
                          ) -> np.ndarray:
    """Concatenate GT transient shards row-wise (exp_bunny/test.py:69-75)."""
    parts = [scipy.io.loadmat(fn)[key] for fn in filenames]
    return np.concatenate(parts, axis=0)


def save_checkpoint(path: str, *, v: np.ndarray, f: np.ndarray,
                    iteration: int, rng_key: np.ndarray,
                    opt_m: Optional[np.ndarray] = None,
                    opt_v: Optional[np.ndarray] = None,
                    opt_step: int = 0,
                    extra: Optional[dict] = None) -> None:
    """One-file resume checkpoint (scipy .mat so MATLAB tooling can read the
    same dumps the reference's collect_progress_results.m consumes)."""
    payload = {
        "v": np.asarray(v), "f": np.asarray(f),
        "iteration": iteration, "rng_key": np.asarray(rng_key),
        "opt_step": opt_step,
    }
    if opt_m is not None:
        payload["opt_m"] = np.asarray(opt_m)
    if opt_v is not None:
        payload["opt_v"] = np.asarray(opt_v)
    if extra:
        payload.update({k: np.asarray(val) for k, val in extra.items()})
    tmp = path + ".tmp"
    scipy.io.savemat(tmp, payload, do_compression=True)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    d = scipy.io.loadmat(path, squeeze_me=True)
    return {k: v for k, v in d.items() if not k.startswith("__")}
