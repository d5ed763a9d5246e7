"""Checkpoint save/load.

Own format: a pickled pytree of numpy arrays under the reference's key scheme
{'model_state_dict': ..., ['optimizer_state_dict', 'scheduler_state_dict']}
and the reference's file-naming convention
(reference lrce/agent/agent_base.py:194-217). Reference torch checkpoints
(.pt/.pth) are ingested transparently through the torch_io converters, so a
user can evaluate reference-trained weights directly.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    scheduler_state: Optional[dict] = None) -> None:
    ckpt = {"model_state_dict": _to_numpy(params)}
    if opt_state is not None:
        ckpt["optimizer_state_dict"] = _to_numpy(opt_state)
    if scheduler_state is not None:
        ckpt["scheduler_state_dict"] = scheduler_state
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(ckpt, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    """Load a checkpoint.

    Native checkpoints (plain pickled numpy pytrees) and reference torch
    files share the `.pt` suffix (naming parity), so the format is sniffed:
    torch zips start with 'PK', our pickles with the pickle protocol magic.
    Torch files are converted through torch_io on the fly.
    """
    assert os.path.exists(path), path
    with open(path, "rb") as f:
        magic = f.read(2)
    from lrce_tpu.utils import torch_io as tio

    if magic[:1] == b"\x80":
        # Pickle protocol magic: either a native checkpoint or a legacy
        # (non-zip) torch pickle. Native ones plain-unpickle; legacy torch
        # ones carry persistent ids that plain pickle rejects — so on
        # failure try torch before declaring corruption, and if BOTH fail
        # report corruption of the native format rather than a misleading
        # torch conversion error.
        native_err: Exception
        try:
            with open(path, "rb") as f:
                ckpt = pickle.load(f)
            if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
                return ckpt
            native_err = RuntimeError(
                f"unpickled to {type(ckpt).__name__} without a "
                "'model_state_dict' key")
        except Exception as e:
            native_err = e
        try:
            sd = tio.load_torch_state_dict(path)
        except Exception:
            raise RuntimeError(
                f"{path} has pickle magic but is neither a loadable native "
                "lrce_tpu checkpoint nor a legacy torch pickle — the file "
                "is likely truncated or corrupt.") from native_err
        return {"model_state_dict": tio.convert_e2e(sd)}

    sd = tio.load_torch_state_dict(path)
    return {"model_state_dict": tio.convert_e2e(sd)}


def checkpoint_name(epoch: int, loss: float, metric: float) -> str:
    """Reference naming: epoch{N:02}_loss{L:.4f}_metric{M:.4f}.pt
    (agent_base.py:203-206)."""
    return f"epoch{epoch:02}_loss{loss:.4f}_metric{metric:.4f}.pt"
