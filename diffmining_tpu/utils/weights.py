"""HF checkpoint → flax pytree weight conversion.

The reference loads SD-v1.5 as a diffusers `StableDiffusionPipeline`
(reference: diffmining/typicality/compute.py:65-73); we instead read the raw
safetensors tensors from the same directory layout (unet/, vae/, text_encoder/,
scheduler/scheduler_config.json, model_index.json) and rename/transpose them
into the pytrees our flax modules expect:

  * conv weights   OIHW → HWIO
  * linear weights (out,in) → (in,out)
  * norm weight/bias → scale/bias
  * nn.Embed weight → {"embedding": ...}

Schedule constants (beta schedule etc.) are read from the checkpoint's
scheduler config, never hardcoded (SURVEY.md §7 hard-part 6).
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Tuple

import numpy as np

from diffmining_tpu.diffusion.schedule import Schedule, make_schedule
from diffmining_tpu.models.clip import CLIPTextConfig
from diffmining_tpu.models.unet import UNetConfig
from diffmining_tpu.models.vae import VAEConfig

Tensors = Dict[str, np.ndarray]


def load_safetensors_dir(path: str) -> Tensors:
    """Load and merge every .safetensors (or pytorch *.bin) file in a dir."""
    from safetensors.numpy import load_file

    out: Tensors = {}
    for name in sorted(os.listdir(path)):
        if name.endswith(".safetensors"):
            out.update(load_file(os.path.join(path, name)))
    if not out:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    return out


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _leaf(name: str, w: np.ndarray, kind: str) -> Tuple[str, np.ndarray]:
    """Map a torch leaf (weight/bias) to a flax leaf name + layout."""
    if name == "bias":
        return "bias", w
    assert name == "weight", name
    if kind == "conv":
        return "kernel", w.transpose(2, 3, 1, 0)
    if kind == "linear":
        return "kernel", w.transpose(1, 0)
    if kind == "norm":
        return "scale", w
    if kind == "embed":
        return "embedding", w
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

_UNET_CONV = re.compile(
    r"(conv_in|conv_out|conv1|conv2|conv_shortcut|proj_in|proj_out|downsamplers\.0\.conv|upsamplers\.0\.conv)$"
)
_UNET_NORM = re.compile(r"(norm|norm1|norm2|norm3|conv_norm_out|group_norm)$")


def _unet_rename(torch_name: str) -> Tuple[str, ...]:
    """diffusers UNet param name → our flax module path (without leaf)."""
    n = torch_name + "."  # sentinel so suffix replacements match at end-of-path
    n = re.sub(r"^time_embedding\.", "time_embedding.", n)
    n = re.sub(r"^down_blocks\.(\d+)\.resnets\.(\d+)\.", r"down_\1_res_\2.", n)
    n = re.sub(r"^down_blocks\.(\d+)\.attentions\.(\d+)\.", r"down_\1_tf_\2.", n)
    n = re.sub(r"^down_blocks\.(\d+)\.downsamplers\.0\.", r"down_\1_downsample.", n)
    n = re.sub(r"^up_blocks\.(\d+)\.resnets\.(\d+)\.", r"up_\1_res_\2.", n)
    n = re.sub(r"^up_blocks\.(\d+)\.attentions\.(\d+)\.", r"up_\1_tf_\2.", n)
    n = re.sub(r"^up_blocks\.(\d+)\.upsamplers\.0\.", r"up_\1_upsample.", n)
    n = re.sub(r"^mid_block\.resnets\.(\d+)\.", r"mid_res_\1.", n)
    n = re.sub(r"^mid_block\.attentions\.0\.", r"mid_tf.", n)
    n = n.replace("transformer_blocks.", "transformer_blocks_").replace("_blocks_0.", "_blocks_0.")
    n = re.sub(r"transformer_blocks_(\d+)\.", r"transformer_blocks_\1.", n)
    n = n.replace("to_out.0.", "to_out_0.")
    n = n.replace("ff.net.0.proj.", "ff.net_0_proj.")
    n = n.replace("ff.net.2.", "ff.net_2.")
    return tuple(n.rstrip(".").split("."))


def convert_unet(tensors: Tensors) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for name, w in tensors.items():
        parts = name.rsplit(".", 1)
        module, leaf = parts[0], parts[1]
        if w.ndim == 4:
            kind = "conv"
        elif w.ndim == 2:
            kind = "linear"
        elif _UNET_NORM.search(module):
            kind = "norm"
        else:
            kind = "linear"  # 1-d bias-like handled by leaf name
        leaf_name, w = _leaf(leaf, w, kind)
        _set(params, _unet_rename(module) + (leaf_name,), np.asarray(w, dtype=np.float32))
    return params


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def _vae_rename(torch_name: str) -> Tuple[str, ...]:
    n = torch_name + "."  # sentinel so suffix replacements match at end-of-path
    n = re.sub(r"^(encoder|decoder)\.down_blocks\.(\d+)\.resnets\.(\d+)\.", r"\1.down_\2_res_\3.", n)
    n = re.sub(r"^(encoder|decoder)\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.", r"\1.down_\2_downsample.", n)
    n = re.sub(r"^(encoder|decoder)\.up_blocks\.(\d+)\.resnets\.(\d+)\.", r"\1.up_\2_res_\3.", n)
    n = re.sub(r"^(encoder|decoder)\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.", r"\1.up_\2_upsample.", n)
    n = re.sub(r"^(encoder|decoder)\.mid_block\.resnets\.(\d+)\.", r"\1.mid_res_\2.", n)
    n = re.sub(r"^(encoder|decoder)\.mid_block\.attentions\.0\.", r"\1.mid_attn.", n)
    # old checkpoints: query/key/value/proj_attn — normalize to to_q/to_k/to_v/to_out_0
    n = n.replace(".query.", ".to_q.").replace(".key.", ".to_k.").replace(".value.", ".to_v.")
    n = n.replace(".proj_attn.", ".to_out_0.")
    n = n.replace(".to_out.0.", ".to_out_0.")
    return tuple(n.rstrip(".").split("."))


def convert_vae(tensors: Tensors) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for name, w in tensors.items():
        module, leaf = name.rsplit(".", 1)
        if w.ndim == 4:
            # VAE attention q/k/v in old ckpts are (C,C,1,1) convs — squeeze to linear
            if "attn" in module and ("to_" in module or "query" in module or "key" in module or "value" in module or "proj_attn" in module):
                w = w[:, :, 0, 0]
                kind = "linear"
            else:
                kind = "conv"
        elif w.ndim == 2:
            kind = "linear"
        elif "norm" in module.split(".")[-1] or module.endswith("conv_norm_out") or module.endswith("group_norm"):
            kind = "norm"
        else:
            kind = "linear"
        leaf_name, w = _leaf(leaf, w, kind)
        _set(params, _vae_rename(module) + (leaf_name,), np.asarray(w, dtype=np.float32))
    return params


# ---------------------------------------------------------------------------
# CLIP text
# ---------------------------------------------------------------------------


def convert_clip_text(tensors: Tensors) -> Dict[str, Any]:
    """transformers CLIPTextModel state dict → our CLIPTextModel pytree."""
    params: Dict[str, Any] = {}
    for name, w in tensors.items():
        n = name
        if n.startswith("text_model."):
            n = n[len("text_model."):]
        if n == "embeddings.token_embedding.weight":
            _set(params, ("token_embedding", "embedding"), np.asarray(w, np.float32))
            continue
        if n == "embeddings.position_embedding.weight":
            _set(params, ("position_embedding",), np.asarray(w, np.float32))
            continue
        if n.startswith("embeddings.position_ids"):
            continue
        n = re.sub(r"^encoder\.layers\.(\d+)\.", r"layers_\1.", n)
        module, leaf = n.rsplit(".", 1)
        kind = "norm" if "layer_norm" in module or module.endswith("final_layer_norm") else "linear"
        leaf_name, w = _leaf(leaf, w, kind)
        _set(params, tuple(module.split(".")) + (leaf_name,), np.asarray(w, np.float32))
    return params


def convert_clip_vision(tensors: Tensors) -> Dict[str, Any]:
    """transformers CLIPVisionModel(WithProjection) state dict → our
    CLIPVisionModel pytree (reference clipmining/ranking.py runs the torch
    tower; this converter feeds ours from the same checkpoint files)."""
    params: Dict[str, Any] = {}
    for name, w in tensors.items():
        n = name
        if n.startswith("vision_model."):
            n = n[len("vision_model."):]
        if n == "embeddings.class_embedding":
            _set(params, ("class_embedding",), np.asarray(w, np.float32))
            continue
        if n == "embeddings.patch_embedding.weight":
            _set(params, ("patch_embedding", "kernel"), np.asarray(w, np.float32).transpose(2, 3, 1, 0))
            continue
        if n == "embeddings.position_embedding.weight":
            _set(params, ("position_embedding",), np.asarray(w, np.float32))
            continue
        if n.startswith("embeddings.position_ids"):
            continue
        if n == "visual_projection.weight":
            _set(params, ("visual_projection",), np.asarray(w, np.float32).transpose(1, 0))
            continue
        n = re.sub(r"^encoder\.layers\.(\d+)\.", r"layers_\1.", n)
        module, leaf = n.rsplit(".", 1)
        kind = "norm" if ("layer_norm" in module or "layrnorm" in module or "layernorm" in module) else "linear"
        leaf_name, w = _leaf(leaf, w, kind)
        _set(params, tuple(module.split(".")) + (leaf_name,), np.asarray(w, np.float32))
    return params


def convert_clip_text_projection(tensors: Tensors) -> Dict[str, Any]:
    """transformers CLIPTextModelWithProjection state dict → our
    CLIPTextModelWithProjection pytree (text_model nested + text_projection)."""
    text = convert_clip_text({k: v for k, v in tensors.items() if k.startswith("text_model.")})
    params: Dict[str, Any] = {"text_model": text}
    if "text_projection.weight" in tensors:
        params["text_projection"] = np.asarray(tensors["text_projection.weight"], np.float32).transpose(1, 0)
    return params


# ---------------------------------------------------------------------------
# Pipeline directory
# ---------------------------------------------------------------------------


def unet_config_from_json(cfg: Dict[str, Any]) -> UNetConfig:
    down_types = cfg.get("down_block_types", ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"])
    heads = cfg.get("attention_head_dim", 8)
    if isinstance(heads, (list, tuple)):
        heads = heads[0]
    return UNetConfig(
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels", (320, 640, 1280, 1280))),
        layers_per_block=cfg.get("layers_per_block", 2),
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        num_attention_heads=heads,
        down_block_has_attn=tuple("CrossAttn" in t for t in down_types),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        freq_shift=cfg.get("freq_shift", 0),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        sample_size=cfg.get("sample_size", 64),
    )


def vae_config_from_json(cfg: Dict[str, Any]) -> VAEConfig:
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )


def clip_config_from_json(cfg: Dict[str, Any]) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=cfg.get("vocab_size", 49408),
        hidden_size=cfg.get("hidden_size", 768),
        intermediate_size=cfg.get("intermediate_size", 3072),
        num_layers=cfg.get("num_hidden_layers", 12),
        num_heads=cfg.get("num_attention_heads", 12),
        max_position_embeddings=cfg.get("max_position_embeddings", 77),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
    )


def clip_vision_config_from_json(cfg: Dict[str, Any]):
    from diffmining_tpu.models.clip import CLIPVisionConfig

    if "vision_config" in cfg:  # full CLIPConfig (e.g. StreetCLIP config.json)
        proj = cfg.get("projection_dim", 768)
        cfg = dict(cfg["vision_config"], projection_dim=cfg["vision_config"].get("projection_dim", proj))
    return CLIPVisionConfig(
        image_size=cfg.get("image_size", 336),
        patch_size=cfg.get("patch_size", 14),
        hidden_size=cfg.get("hidden_size", 1024),
        intermediate_size=cfg.get("intermediate_size", 4096),
        num_layers=cfg.get("num_hidden_layers", 24),
        num_heads=cfg.get("num_attention_heads", 16),
        projection_dim=cfg.get("projection_dim", 768),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
    )


def schedule_from_json(cfg: Dict[str, Any]) -> Schedule:
    return make_schedule(
        num_train_timesteps=cfg.get("num_train_timesteps", 1000),
        beta_start=cfg.get("beta_start", 0.00085),
        beta_end=cfg.get("beta_end", 0.012),
        beta_schedule=cfg.get("beta_schedule", "scaled_linear"),
        prediction_type=cfg.get("prediction_type", "epsilon"),
    )


def _read_json(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return json.load(f)


def load_clip_dir(path: str):
    """Load a transformers CLIPModel checkpoint dir (e.g. converted
    StreetCLIP, reference clipmining/ranking.py:20-24) into vision + text
    bundles for the CLIP-mining baseline.

    Accepts either a full CLIPModel state dict (text_model.* + vision_model.*
    + *_projection) or separate CLIPVision/CLIPText*WithProjection dicts.
    Returns {"vision": {config, params}, "text": {config, params,
    projection_dim}, "tokenizer_dir"}.
    """
    tensors = load_safetensors_dir(path)
    cfg = _read_json(os.path.join(path, "config.json"))
    text_cfg = clip_config_from_json(cfg.get("text_config", cfg))
    vision_cfg = clip_vision_config_from_json(cfg)
    vision_tensors = {
        k: v for k, v in tensors.items() if k.startswith("vision_model.") or k == "visual_projection.weight"
    }
    text_tensors = {
        k: v for k, v in tensors.items() if k.startswith("text_model.") or k == "text_projection.weight"
    }
    if not vision_tensors or not text_tensors:
        raise FileNotFoundError(f"{path} does not contain both CLIP towers (vision={bool(vision_tensors)}, text={bool(text_tensors)})")
    out = {
        "vision": dict(config=vision_cfg, params=convert_clip_vision(vision_tensors)),
        "text": dict(
            config=text_cfg,
            params=convert_clip_text_projection(text_tensors),
            projection_dim=cfg.get("projection_dim", vision_cfg.projection_dim),
        ),
        "tokenizer_dir": path,
    }
    return out


def load_pipeline_dir(path: str):
    """Load a diffusers-layout pipeline directory into converted pytrees.

    Returns a dict with keys unet/vae/text_encoder (each {"config", "params"})
    plus "schedule" and "tokenizer_dir". Used by the typicality engine and the
    finetuning export path for drop-in compatibility with reference artifacts.
    """
    out: Dict[str, Any] = {}
    unet_cfg = _read_json(os.path.join(path, "unet", "config.json"))
    out["unet"] = dict(config=unet_config_from_json(unet_cfg), params=convert_unet(load_safetensors_dir(os.path.join(path, "unet"))))
    vae_cfg = _read_json(os.path.join(path, "vae", "config.json"))
    out["vae"] = dict(config=vae_config_from_json(vae_cfg), params=convert_vae(load_safetensors_dir(os.path.join(path, "vae"))))
    te_cfg = _read_json(os.path.join(path, "text_encoder", "config.json"))
    out["text_encoder"] = dict(
        config=clip_config_from_json(te_cfg), params=convert_clip_text(load_safetensors_dir(os.path.join(path, "text_encoder")))
    )
    out["schedule"] = schedule_from_json(_read_json(os.path.join(path, "scheduler", "scheduler_config.json")))
    out["tokenizer_dir"] = os.path.join(path, "tokenizer")
    return out
