"""Export our flax pytrees back to the diffusers directory layout.

The reference's inter-stage contract is an exported diffusers pipeline dir
(reference: finetuning/base.py:245-259 `end_training`; consumed at
typicality/compute.py:65-73). We write the same layout — safetensors with
diffusers tensor names + config.json per component + model_index.json — so
our finetuned checkpoints are drop-in for the typicality stage (and readable
by actual diffusers elsewhere).
"""
from __future__ import annotations

import json
import os
import re
import shutil
from os.path import join
from typing import Any, Dict

import numpy as np

from diffmining_tpu.diffusion.schedule import Schedule
from diffmining_tpu.models.clip import CLIPTextConfig
from diffmining_tpu.models.unet import UNetConfig
from diffmining_tpu.models.vae import VAEConfig


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _leaf_to_torch(name: str, w: np.ndarray):
    module, leaf = name.rsplit(".", 1)
    if leaf == "kernel":
        if w.ndim == 4:
            return module + ".weight", w.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        return module + ".weight", w.transpose(1, 0)
    if leaf == "scale":
        return module + ".weight", w
    if leaf == "embedding":
        return module + ".weight", w
    if leaf == "bias":
        return module + ".bias", w
    if leaf == "position_embedding":  # bare param
        return name + ".weight", w
    return name, w


def unconvert_unet(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    flat = _flatten(params.get("params", params))
    out = {}
    for name, w in flat.items():
        n = name
        n = re.sub(r"^down_(\d+)_res_(\d+)\.", r"down_blocks.\1.resnets.\2.", n)
        n = re.sub(r"^down_(\d+)_tf_(\d+)\.", r"down_blocks.\1.attentions.\2.", n)
        n = re.sub(r"^down_(\d+)_downsample\.", r"down_blocks.\1.downsamplers.0.", n)
        n = re.sub(r"^up_(\d+)_res_(\d+)\.", r"up_blocks.\1.resnets.\2.", n)
        n = re.sub(r"^up_(\d+)_tf_(\d+)\.", r"up_blocks.\1.attentions.\2.", n)
        n = re.sub(r"^up_(\d+)_upsample\.", r"up_blocks.\1.upsamplers.0.", n)
        n = re.sub(r"^mid_res_(\d+)\.", r"mid_block.resnets.\1.", n)
        n = re.sub(r"^mid_tf\.", "mid_block.attentions.0.", n)
        n = re.sub(r"transformer_blocks_(\d+)\.", r"transformer_blocks.\1.", n)
        n = n.replace("to_out_0.", "to_out.0.")
        n = n.replace("ff.net_0_proj.", "ff.net.0.proj.")
        n = n.replace("ff.net_2.", "ff.net.2.")
        tn, tw = _leaf_to_torch(n, w)
        # safetensors' numpy save_file writes the raw buffer WITHOUT
        # honoring strides: a transposed (non-C-contiguous) tensor
        # round-trips SCRAMBLED, silently. Caught by verify_checkpoint's
        # activation probes; astype(order='K') does NOT fix the layout.
        out[tn] = np.ascontiguousarray(tw, dtype=np.float32)
    return out


def unconvert_vae(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    flat = _flatten(params.get("params", params))
    out = {}
    for name, w in flat.items():
        n = name
        n = re.sub(r"^(encoder|decoder)\.down_(\d+)_res_(\d+)\.", r"\1.down_blocks.\2.resnets.\3.", n)
        n = re.sub(r"^(encoder|decoder)\.down_(\d+)_downsample\.", r"\1.down_blocks.\2.downsamplers.0.conv.", n)
        n = re.sub(r"^(encoder|decoder)\.up_(\d+)_res_(\d+)\.", r"\1.up_blocks.\2.resnets.\3.", n)
        n = re.sub(r"^(encoder|decoder)\.up_(\d+)_upsample\.", r"\1.up_blocks.\2.upsamplers.0.conv.", n)
        n = re.sub(r"^(encoder|decoder)\.mid_res_(\d+)\.", r"\1.mid_block.resnets.\2.", n)
        n = re.sub(r"^(encoder|decoder)\.mid_attn\.", r"\1.mid_block.attentions.0.", n)
        n = n.replace(".to_out_0.", ".to_out.0.")
        tn, tw = _leaf_to_torch(n, w)
        # safetensors' numpy save_file writes the raw buffer WITHOUT
        # honoring strides: a transposed (non-C-contiguous) tensor
        # round-trips SCRAMBLED, silently. Caught by verify_checkpoint's
        # activation probes; astype(order='K') does NOT fix the layout.
        out[tn] = np.ascontiguousarray(tw, dtype=np.float32)
    return out


def unconvert_clip_text(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    flat = _flatten(params.get("params", params))
    out = {}
    for name, w in flat.items():
        if name == "token_embedding.embedding":
            out["text_model.embeddings.token_embedding.weight"] = np.ascontiguousarray(w, dtype=np.float32)
            continue
        if name == "position_embedding":
            out["text_model.embeddings.position_embedding.weight"] = np.ascontiguousarray(w, dtype=np.float32)
            continue
        n = re.sub(r"^layers_(\d+)\.", r"encoder.layers.\1.", name)
        n = "text_model." + n
        tn, tw = _leaf_to_torch(n, w)
        # safetensors' numpy save_file writes the raw buffer WITHOUT
        # honoring strides: a transposed (non-C-contiguous) tensor
        # round-trips SCRAMBLED, silently. Caught by verify_checkpoint's
        # activation probes; astype(order='K') does NOT fix the layout.
        out[tn] = np.ascontiguousarray(tw, dtype=np.float32)
    return out


def unet_config_to_json(cfg: UNetConfig) -> Dict[str, Any]:
    down = ["CrossAttnDownBlock2D" if a else "DownBlock2D" for a in cfg.down_block_has_attn]
    up = ["CrossAttnUpBlock2D" if a else "UpBlock2D" for a in cfg.up_block_has_attn]
    return {
        "_class_name": "UNet2DConditionModel",
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        "cross_attention_dim": cfg.cross_attention_dim,
        "attention_head_dim": cfg.num_attention_heads,
        "down_block_types": down,
        "up_block_types": up,
        "norm_num_groups": cfg.norm_num_groups,
        "freq_shift": cfg.freq_shift,
        "flip_sin_to_cos": cfg.flip_sin_to_cos,
        "sample_size": cfg.sample_size,
    }


def vae_config_to_json(cfg: VAEConfig) -> Dict[str, Any]:
    n = len(cfg.block_out_channels)
    return {
        "_class_name": "AutoencoderKL",
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "latent_channels": cfg.latent_channels,
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        "norm_num_groups": cfg.norm_num_groups,
        "scaling_factor": cfg.scaling_factor,
        "down_block_types": ["DownEncoderBlock2D"] * n,
        "up_block_types": ["UpDecoderBlock2D"] * n,
    }


def clip_config_to_json(cfg: CLIPTextConfig) -> Dict[str, Any]:
    return {
        "architectures": ["CLIPTextModel"],
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "max_position_embeddings": cfg.max_position_embeddings,
        "hidden_act": cfg.hidden_act,
        "layer_norm_eps": cfg.layer_norm_eps,
    }


def schedule_config_to_json(s: Schedule) -> Dict[str, Any]:
    betas = np.asarray(s.betas)
    return {
        "_class_name": "DDPMScheduler",
        "num_train_timesteps": s.num_train_timesteps,
        "beta_start": float(np.sqrt(betas[0]) ** 2),
        "beta_end": float(betas[-1]),
        "beta_schedule": "scaled_linear",
        "prediction_type": s.prediction_type,
        "steps_offset": 1,
        "clip_sample": False,
        "set_alpha_to_one": False,
    }


def save_pipeline_dir(
    path: str,
    unet_config: UNetConfig,
    unet_params: Any,
    vae_config: VAEConfig,
    vae_params: Any,
    clip_config: CLIPTextConfig,
    clip_params: Any,
    schedule: Schedule,
    tokenizer_src_dir: str | None = None,
) -> None:
    from safetensors.numpy import save_file

    def write(sub: str, cfg: Dict[str, Any], tensors: Dict[str, np.ndarray], fname: str):
        os.makedirs(join(path, sub), exist_ok=True)
        with open(join(path, sub, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2)
        save_file(tensors, join(path, sub, fname))

    write("unet", unet_config_to_json(unet_config), unconvert_unet(unet_params), "diffusion_pytorch_model.safetensors")
    write("vae", vae_config_to_json(vae_config), unconvert_vae(vae_params), "diffusion_pytorch_model.safetensors")
    write("text_encoder", clip_config_to_json(clip_config), unconvert_clip_text(clip_params), "model.safetensors")
    os.makedirs(join(path, "scheduler"), exist_ok=True)
    with open(join(path, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump(schedule_config_to_json(schedule), f, indent=2)
    os.makedirs(join(path, "tokenizer"), exist_ok=True)
    if tokenizer_src_dir and os.path.isfile(join(tokenizer_src_dir, "vocab.json")):
        for name in ("vocab.json", "merges.txt", "tokenizer_config.json", "special_tokens_map.json"):
            src = join(tokenizer_src_dir, name)
            if os.path.isfile(src):
                shutil.copy(src, join(path, "tokenizer", name))
    with open(join(path, "model_index.json"), "w") as f:
        json.dump(
            {
                "_class_name": "StableDiffusionPipeline",
                "_diffusers_version": "diffmining_tpu-0.1.0",
                "unet": ["diffusers", "UNet2DConditionModel"],
                "vae": ["diffusers", "AutoencoderKL"],
                "text_encoder": ["transformers", "CLIPTextModel"],
                "tokenizer": ["transformers", "CLIPTokenizer"],
                "scheduler": ["diffusers", "DDPMScheduler"],
            },
            f,
            indent=2,
        )
