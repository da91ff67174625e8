"""DIFT featurizer: SD UNet intermediate features as patch descriptors.

Replacement for the reference's forked-forward DIFT stack (reference:
diffmining/typicality/dift.py — MyUNet2DConditionModel re-implements the whole
UNet forward to tap up-block activations; OneStepSDPipeline does VAE-encode →
add-noise → single UNet call). Our UNet returns taps natively
(models/unet.py `up_ft_indices`), so the featurizer is one jitted function:

    feat = mean_{e<E}[ unet(add_noise(vae(x), eps_e, t), t, emb).up_ft[i] ]

Defaults match the reference: t=261 generic / t=161 in the mining pipeline
("dift-161"), up_ft_index=1, ensemble_size=8 (dift.py:214-219, cluster.py:253).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffmining_tpu.diffusion.schedule import add_noise
from diffmining_tpu.typicality.compute import SD
from diffmining_tpu.utils.images import image_to_array


class SDFeaturizer:
    """Prompt-conditioned one-step UNet feature extractor."""

    def __init__(self, sd: SD, seed: int = 42, image_cache_size: int = 8, mesh=None):
        self.sd = sd
        self.seed = seed
        # with a mesh, the ensemble axis (E=8 noise draws) shards over "dp":
        # each chip runs E/dp UNet forwards and the feature mean reduces over
        # ICI — the mining-stage analog of the sweep's --mesh_dp
        self.mesh = mesh
        if mesh is not None:
            assert "dp" in mesh.shape, f"mesh needs a 'dp' axis, got {mesh.shape}"
        self._jit_cache = {}
        # per-image feature-map LRU: the reference recomputes the WHOLE image's
        # DIFT ensemble for every patch (cluster.py:291-299 via dift.forward);
        # top-5 patches/image share one map here — ~5x fewer UNet ensembles
        self._image_cache: "dict[tuple, np.ndarray]" = {}
        self._image_cache_size = image_cache_size

    def _feature_fn(self, up_ft_index: int, ensemble_size: int):
        key = (up_ft_index, ensemble_size)
        if key not in self._jit_cache:
            sd = self.sd

            @jax.jit
            def run(unet_params, latent, ctx, t, noise):
                # latent [h,w,C] (already VAE-encoded+scaled), ctx [77,D],
                # noise [E,h,w,C] (drawn outside the jit so the mesh path can
                # shard the ensemble axis; same threefry draw either way)
                E = ensemble_size
                lat = jnp.broadcast_to(latent[None], noise.shape)
                noisy = add_noise(sd.schedule, lat, noise, jnp.broadcast_to(t, (E,))).astype(sd.dtype)
                ctx_b = jnp.broadcast_to(ctx[None], (E,) + ctx.shape).astype(sd.dtype)
                out = sd.unet.apply(
                    unet_params, noisy, jnp.broadcast_to(t, (E,)), ctx_b,
                    up_ft_indices=(up_ft_index,),
                )
                return out["up_ft"][up_ft_index].astype(jnp.float32).mean(axis=0)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def forward(
        self,
        img_array: np.ndarray,
        prompt: str,
        t: int = 261,
        up_ft_index: int = 1,
        ensemble_size: int = 8,
        uid: Optional[int] = None,
    ) -> np.ndarray:
        """img_array [H,W,3] in [-1,1] -> feature map [h_f, w_f, C_f] fp32."""
        sd = self.sd
        uid = 0 if uid is None else uid
        base = jax.random.PRNGKey(self.seed)
        kvae = jax.random.fold_in(jax.random.fold_in(base, 11), uid)
        kens = jax.random.fold_in(jax.random.fold_in(base, 13), uid)
        latent = sd.encode_vae(jnp.asarray(img_array)[None], kvae)[0]
        ids = jnp.asarray(sd.tokenizer([prompt]))
        ctx = sd.clip.apply(sd.clip_params, ids)[0].astype(jnp.float32)
        fn = self._feature_fn(up_ft_index, ensemble_size)
        noise = jax.random.normal(kens, (ensemble_size,) + latent.shape, dtype=jnp.float32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = self.mesh.shape["dp"]
            assert ensemble_size % dp == 0, (
                f"ensemble_size={ensemble_size} must divide over dp={dp} "
                "(no silent unsharded fallback)"
            )
            noise = jax.device_put(noise, NamedSharding(self.mesh, P("dp")))
            rep = NamedSharding(self.mesh, P())
            latent, ctx = jax.device_put(latent, rep), jax.device_put(ctx, rep)
        # sweep_params: the SAME compute-dtype tree the typicality engines use
        # (flax casts params to the module dtype in-kernel either way, so this
        # changes no numerics — it avoids holding a second parameter copy)
        feat = fn(
            sd.sweep_params(self.mesh), latent, ctx, jnp.asarray(t, jnp.int32), noise,
        )
        return np.asarray(feat)

    def patch_feature(
        self,
        img_array: np.ndarray,
        prompt: str,
        box: Tuple[int, int, int, int],
        t: int = 261,
        up_ft_index: int = 1,
        ensemble_size: int = 8,
        uid: Optional[int] = None,
    ) -> np.ndarray:
        """Whole-image feature map cropped to `box` in feature space, mean over
        the crop, L2-normalized — the reference's patch embedding
        (cluster.py:291-299). box = (x_start, y_start, x_end, y_end) in image
        pixels, x = row (the reference's row-major convention)."""
        cache_uid = uid if uid is not None else hash(img_array.tobytes())
        key = (cache_uid, prompt, t, up_ft_index, ensemble_size, img_array.shape)
        feat = self._image_cache.get(key)
        if feat is None:
            feat = self.forward(img_array, prompt, t, up_ft_index, ensemble_size, uid)
            if len(self._image_cache) >= self._image_cache_size:
                self._image_cache.pop(next(iter(self._image_cache)))
            self._image_cache[key] = feat
        H, W = img_array.shape[:2]
        h, w = feat.shape[:2]
        x0, y0, x1, y1 = box
        rx, ry = h / H, w / W
        fx0, fx1 = int(x0 * rx), max(int(x1 * rx), int(x0 * rx) + 1)
        fy0, fy1 = int(y0 * ry), max(int(y1 * ry), int(y0 * ry) + 1)
        emb = feat[fx0:fx1, fy0:fy1].mean(axis=(0, 1))
        return emb / max(np.linalg.norm(emb), 1e-12)


def dift_pre(img) -> np.ndarray:
    """PIL -> [-1,1] array (reference dift.py:19-21)."""
    return image_to_array(img)
