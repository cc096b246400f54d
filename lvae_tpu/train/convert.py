"""Torch-checkpoint conversion, both directions.

Import: the reference saves ``torch.save(model.state_dict(), ...)`` via its
boilr trainer (SURVEY.md §2.2 "Checkpoint save/load");
``torch_state_dict_to_flax`` converts such a state_dict into this
framework's flax param/batch-stats trees so a reference-trained model can
be evaluated (or fine-tuned) here.

Export: ``flax_to_torch_state_dict`` is the exact inverse — it emits a
reference-style state_dict from this framework's trees so a TPU-trained
model can be loaded back into the reference's torch implementation
(``model.load_state_dict(...)``, strict). Every layout transform below is
a bijection, so import(export(tree)) is bit-exact (tested).

The name and layout mapping is the one documented in
``docs/CHECKPOINT_FORMAT.md`` and exercised bidirectionally by
``tests/torch_mirror.py``:

- conv kernels: torch ``[out, in, kh, kw]`` -> flax ``[kh, kw, in, out]``
- transposed-conv kernels: torch ``[in, out, kh, kw]`` -> flax layout with
  the spatial taps flipped (flax ConvTranspose cross-correlates where
  torch's conv_transpose convolves)
- BatchNorm: ``weight``->``scale``, ``running_mean``->``mean``,
  ``running_var``->``var`` (flax tracks the biased batch variance in
  training updates; imported running stats are used as-is)
- learned top prior: NCHW ``[1, 2z, h, w]`` -> NHWC ``[1, h, w, 2z]``

Key translation is isolated in ``torch_key_for`` so that, when the actual
reference module names become readable, renames are one-line fixes
(SURVEY.md §0 "ACTION FOR FUTURE SELF").
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional

import numpy as np

_LEAF_TO_TORCH = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
}


def torch_key_for(path: tuple) -> str:
    """Dotted torch state_dict key for a flax tree path (mirror naming)."""
    if path[-1] == "top_prior":
        return ".".join(path)
    return ".".join((*path[:-1], _LEAF_TO_TORCH[path[-1]]))


def _to_flax_leaf(path: tuple, value: np.ndarray) -> np.ndarray:
    leaf = path[-1]
    v = np.asarray(value, dtype=np.float32)
    if leaf == "top_prior":
        return v.transpose(0, 2, 3, 1)  # NCHW -> NHWC
    if leaf == "kernel":
        if any("ConvTranspose" in c for c in path):
            # torch conv_transpose weight [in, out, kh, kw]: flip spatial
            # taps, then lay out [kh, kw, in, out]
            return np.ascontiguousarray(
                v.transpose(2, 3, 0, 1)[::-1, ::-1]
            )
        return v.transpose(2, 3, 1, 0)  # [out,in,kh,kw] -> [kh,kw,in,out]
    return v  # bias / scale / mean / var: 1-D, unchanged


def torch_state_dict_to_flax(
    template_params: Mapping,
    template_batch_stats: Optional[Mapping],
    state_dict: Mapping[str, "np.ndarray"],
    key_fn: Callable[[tuple], str] = torch_key_for,
    strict: bool = True,
) -> tuple[dict, dict]:
    """Convert a torch ``state_dict`` into (params, batch_stats) trees
    shaped like the given flax templates.

    ``key_fn`` maps each flax path to its state_dict key — swap it when
    the reference's real module names differ from the documented mirror
    naming. With ``strict``, unmatched template leaves or leftover
    state_dict entries (ignoring torch's ``num_batches_tracked``) raise.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    used = set()

    def fill(template: Mapping) -> dict:
        out = {}
        for path, tval in flatten_dict(template).items():
            key = key_fn(path)
            if key not in sd:
                if strict:
                    raise KeyError(
                        f"state_dict is missing {key!r} (for flax leaf "
                        f"{'/'.join(path)})"
                    )
                out[path] = np.asarray(tval)
                continue
            v = _to_flax_leaf(path, sd[key])
            used.add(key)
            if v.shape != tuple(np.shape(tval)):
                raise ValueError(
                    f"shape mismatch for {key!r}: state_dict {v.shape} vs "
                    f"model {tuple(np.shape(tval))}"
                )
            out[path] = v
        return unflatten_dict(out)

    params = fill(template_params)
    batch_stats = fill(template_batch_stats) if template_batch_stats else {}
    leftover = {
        k for k in sd
        if k not in used and not k.endswith("num_batches_tracked")
    }
    if strict and leftover:
        raise KeyError(f"unconverted state_dict entries: {sorted(leftover)[:8]}")
    return params, batch_stats


def _to_torch_leaf(path: tuple, value: np.ndarray) -> np.ndarray:
    """Inverse of ``_to_flax_leaf`` (pure layout transposes, bit-exact)."""
    leaf = path[-1]
    v = np.array(value, dtype=np.float32)  # copy: jax arrays are read-only
    if leaf == "top_prior":
        return np.ascontiguousarray(v.transpose(0, 3, 1, 2))  # NHWC -> NCHW
    if leaf == "kernel":
        if any("ConvTranspose" in c for c in path):
            # flax [kh,kw,in,out] with flipped taps -> unflip, then torch
            # conv_transpose layout [in, out, kh, kw]
            return np.ascontiguousarray(v[::-1, ::-1].transpose(2, 3, 0, 1))
        return np.ascontiguousarray(v.transpose(3, 2, 0, 1))  # -> [out,in,kh,kw]
    return v  # bias / scale / mean / var: 1-D, unchanged


def flax_to_torch_state_dict(
    params: Mapping,
    batch_stats: Optional[Mapping] = None,
    key_fn: Callable[[tuple], str] = torch_key_for,
    num_batches_tracked: int = 0,
) -> dict:
    """Convert (params, batch_stats) trees into a reference-style torch
    ``state_dict`` of numpy arrays (wrap leaves in ``torch.from_numpy``
    before ``load_state_dict``; ``torch.save`` accepts them as-is).

    Each BatchNorm gets a ``num_batches_tracked`` int64 scalar (torch's
    strict ``load_state_dict`` requires the buffer; the reference never
    reads it — momentum is fixed — so 0 is the conventional value for a
    converted checkpoint; override if a downstream consumer cares).
    """
    from flax.traverse_util import flatten_dict

    out: dict = {}
    for path, val in flatten_dict(params).items():
        out[key_fn(path)] = _to_torch_leaf(path, val)
    for path, val in flatten_dict(batch_stats or {}).items():
        out[key_fn(path)] = _to_torch_leaf(path, val)
        if path[-1] == "mean":
            out[".".join((*path[:-1], "num_batches_tracked"))] = np.asarray(
                num_batches_tracked, dtype=np.int64
            )
    return out
