"""Checkpoint conversion between ViT block parameter layouts.

The unfused :class:`~vit_marl_tpu.models.vit.Block` stores its parameters
in flax submodules (``ln1/attn/qkv/...``) while the fused kernels
(``ViTConfig.fused_block`` / ``fused_block_full``) store flat raw kernels
(``ln1_scale``, ``qkv_kernel``, ...).  The math is identical; only the
pytree layout differs, so a trained checkpoint from either mode can be
transplanted into the other — e.g. train with the unfused blocks, serve
with the fully-fused kernel.

No reference counterpart (the reference has neither a working vision path
nor TPU kernels); this exists so fused-mode A/Bs and deployments never
require retraining.
"""

from __future__ import annotations

from typing import Any, Dict

# unfused (module -> leaf) path for every fused flat param name
_FUSED_FROM_UNFUSED = {
    "ln1_scale": ("ln1", "scale"),
    "ln1_bias": ("ln1", "bias"),
    "qkv_kernel": ("attn", "qkv", "kernel"),
    "qkv_bias": ("attn", "qkv", "bias"),
    "proj_kernel": ("attn", "proj", "kernel"),
    "proj_bias": ("attn", "proj", "bias"),
    "ln2_scale": ("ln2", "scale"),
    "ln2_bias": ("ln2", "bias"),
    "mlp1_kernel": ("mlp1", "kernel"),
    "mlp1_bias": ("mlp1", "bias"),
    "mlp2_kernel": ("mlp2", "kernel"),
    "mlp2_bias": ("mlp2", "bias"),
}


def _is_block(name: str) -> bool:
    return name.startswith("block") and name[5:].isdigit()


def _get(node: Dict[str, Any], path) -> Any:
    for p in path:
        node = node[p]
    return node


def _unfused_block_to_fused(block: Dict[str, Any]) -> Dict[str, Any]:
    return {flat: _get(block, path)
            for flat, path in _FUSED_FROM_UNFUSED.items()}


def _fused_block_to_unfused(block: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for flat, path in _FUSED_FROM_UNFUSED.items():
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = block[flat]
    return out


def convert_vit_params(params: Any, to_fused: bool) -> Any:
    """Transplant a ViT param tree between the unfused and fused layouts.

    ``params``: anything containing ViT ``block{i}`` subtrees — the raw
    ``{"params": ...}`` of a :class:`ViTEncoder`, a full
    :class:`ViTActorCriticRNN` tree (blocks live under ``vit``), or a
    bare params dict.  Non-block entries (patch_embed, pos_embed, heads,
    GRU, ...) pass through unchanged.  ``to_fused=True`` converts
    unfused -> fused (``fused_block`` / ``fused_block_full`` — the two
    fused modes share one layout); ``to_fused=False`` converts back.

    Raises ``KeyError`` if a block is already in the target layout (so a
    double conversion fails loudly instead of corrupting silently).
    """
    if not isinstance(params, dict):
        return params
    out = {}
    for name, sub in params.items():
        if _is_block(name) and isinstance(sub, dict):
            out[name] = (_unfused_block_to_fused(sub) if to_fused
                         else _fused_block_to_unfused(sub))
        elif isinstance(sub, dict):
            out[name] = convert_vit_params(sub, to_fused)
        else:
            out[name] = sub
    return out
