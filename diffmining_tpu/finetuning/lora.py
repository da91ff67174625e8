"""LoRA finetuning of the UNet attention projections.

TPU-native replacement for the reference's peft/diffusers LoRA path
(reference: finetuning/base.py:199-205 `init_lora` attaches adapters to the
UNet attention processors with the given rank). Here LoRA is pure param-tree
algebra — no module surgery:

  * `init_lora_params(params, rank, rng)` creates {path: {"a": [in,r],
    "b": [r,out]}} for every attention projection kernel
    (to_q/to_k/to_v/to_out_0 of attn1+attn2);
  * `merge_lora(params, lora, scale)` returns a params pytree with
    kernel + scale·(a@b) — called inside the jitted loss so only the small
    factors are optimized (and only they get optimizer state);
  * at export, `merge_lora` once and save a dense pipeline.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

LORA_TARGETS = ("to_q", "to_k", "to_v", "to_out_0")


def _walk(tree: Dict[str, Any], path=()):  # yields (path, leaf_dict) for kernels
    for k, v in tree.items():
        if isinstance(v, dict):
            if "kernel" in v and k in LORA_TARGETS and ("attn1" in path or "attn2" in path):
                yield path + (k,), v
            else:
                yield from _walk(v, path + (k,))


def init_lora_params(params: Dict[str, Any], rank: int, rng: jax.Array) -> Dict[str, Any]:
    """Returns a sparse pytree mirroring `params` with {"a","b"} factors at
    each targeted kernel. a ~ N(0, 1/rank), b = 0 (standard LoRA init)."""
    tree = params.get("params", params)
    lora: Dict[str, Any] = {}
    for i, (path, leaf) in enumerate(_walk(tree)):
        kin, kout = leaf["kernel"].shape
        sub = jax.random.fold_in(rng, i)
        node = lora
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {
            "a": jax.random.normal(sub, (kin, rank), jnp.float32) / rank,
            "b": jnp.zeros((rank, kout), jnp.float32),
        }
    return {"params": lora} if "params" in params else lora


def merge_lora(params: Dict[str, Any], lora: Dict[str, Any], scale: float = 1.0) -> Dict[str, Any]:
    """Dense params with kernel += scale * a@b at every LoRA site. Cheap
    relative to a UNet step (a handful of [d,r]@[r,d] matmuls)."""

    def merge(p, l):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                if k in l and isinstance(l[k], dict) and "a" in l[k]:
                    delta = (l[k]["a"] @ l[k]["b"]) * scale
                    out[k] = {**v, "kernel": v["kernel"] + delta.astype(v["kernel"].dtype)}
                elif k in l:
                    out[k] = merge(v, l[k])
                else:
                    out[k] = v
            else:
                out[k] = v
        return out

    p = params.get("params", params)
    l = lora.get("params", lora)
    merged = merge(p, l)
    return {"params": merged} if "params" in params else merged


def count_lora_params(lora: Dict[str, Any]) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(lora))
