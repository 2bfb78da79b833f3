"""Converted-weight caching via orbax (SURVEY.md §5.4).

The reference only ever LOADS checkpoints (torch.load / HF hub); the TPU
framework additionally caches the torch->Flax conversion so the port runs
once: ``load_or_convert`` checks an orbax checkpoint directory first and
falls back to the converter, saving the result for the next run.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional



def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_params(params: Any, path: str) -> None:
    ckpt = _checkpointer()
    ckpt.save(os.path.abspath(path), params, force=True)
    ckpt.wait_until_finished()


def load_params(path: str, template: Optional[Any] = None) -> Any:
    ckpt = _checkpointer()
    if template is not None:
        return ckpt.restore(os.path.abspath(path), target=template)
    return ckpt.restore(os.path.abspath(path))


def load_or_convert(
    cache_dir: str,
    name: str,
    convert: Callable[[], Any],
    template: Optional[Any] = None,
) -> Any:
    """Orbax-cached weight conversion: restore `cache_dir/name` if present,
    else run `convert()` (the torch->Flax port) and save."""
    path = os.path.join(cache_dir, name)
    if os.path.isdir(path):
        try:
            return load_params(path, template)
        except Exception:
            pass  # stale/corrupt cache: reconvert
    params = convert()
    os.makedirs(cache_dir, exist_ok=True)
    try:
        save_params(params, path)
    except Exception:
        pass  # caching is best-effort
    return params
