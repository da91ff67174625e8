"""CLIP patch-ranking baseline (reference: clipmining/ranking.py).

StreetCLIP vision tokens projected through visual_projection are scored
against [country, ""] text embeddings; the softmax-diff (or raw-sim) score map
is upsampled to the image, 64×64 box-pooled, top-k non-overlap patches are
mined and clustered with k-means(32) ranked by median score — all the same
constants as the reference. Compute is jitted JAX: the vision tower runs once
per image, scoring/pooling/suppression reuse ops/pool.

Input sizing follows the reference processor (clipmining/ranking.py:24 with
do_center_crop=False: shortest edge resized to 336, README "rescaling an
input image to 336x336"): images are resized to `crop` on the shortest side
then center-cropped square. `crop` defaults to the vision config's
image_size; other values work too — CLIPVisionModel interpolates its learned
position embeddings when the patch grid differs (the reference's hard 336px
limit, clipmining/README.md last paragraph, is lifted).
"""
from __future__ import annotations

import argparse
import functools
import os
import pickle
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from os.path import join
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from PIL import Image

from diffmining_tpu.models.clip import CLIPTextModelWithProjection, CLIPVisionModel
from diffmining_tpu.models.tokenizer import CLIPTokenizer, tiny_tokenizer
from diffmining_tpu.ops.kmeans import KMeans
from diffmining_tpu.ops.pool import box_pool, top_patches, upsample_bilinear
from diffmining_tpu.utils.figures import make_grid

PATCH_COLUMNS = ["seed", "x_start", "y_start", "x_end", "y_end", "D"]

# CLIP normalization constants (processor means/stds)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


# --- device scoring path (VERDICT r4 #5) ------------------------------------
#
# The host score_map materializes the [D, H, W] bilinearly-upsampled token
# features per image (~350 MB fp32 at ViT-L/336) only to mean-pool 5 boxes of
# it. Bilinear resize is linear and separable, so a box mean equals
# u^T @ token_grid @ v with u/v the box-averaged 1-D resize weights — the
# device path fetches [k, D] per image instead of [D, H, W], and batches the
# score-map pooling across the encode chunk. Host path kept for A/B
# (DIFFMINING_CLIP_HOST_SCORING=1); parity pinned in test_clipmining.py.

_HOST_SCORING = os.environ.get("DIFFMINING_CLIP_HOST_SCORING", "0") == "1"


@functools.lru_cache(maxsize=None)
def _resize_weights(n: int, m: int) -> np.ndarray:
    """[m, n] weight matrix of jax.image.resize(..., 'linear') from n to m
    samples (upsampling; identity at n == m) — resize of eye(n) IS the matrix."""
    eye = np.eye(n, dtype=np.float32)
    return np.asarray(jax.image.resize(eye, (m, n), method="linear"))


@functools.partial(jax.jit, static_argnames=("ph", "pw", "h", "w", "kx", "ky", "diff"))
def _pooled_score_maps(tokens, text_embeds, ph, pw, h, w, kx, ky, diff):
    """Batched reference score_map up to the pooled map: tokens [B, P, D]
    (raw visual_projection outputs), text_embeds [2, D] L2-normalized →
    pooled [B, h-kx+1, w-ky+1] fp32 (diff: country − "")."""
    tok = tokens / jnp.linalg.norm(tokens, axis=-1, keepdims=True)
    scores = jnp.einsum("bpd,cd->bcp", tok, text_embeds)
    up = upsample_bilinear(scores.reshape(scores.shape[0], scores.shape[1], ph, pw), h, w)
    pooled = box_pool(up, kx, ky)
    return pooled[:, 0] - pooled[:, 1] if diff else pooled[:, 0]


@functools.partial(jax.jit, static_argnames=("ph", "pw"))
def _box_embeds(tokens, U, V, ph, pw):
    """Box-mean features of the upsampled token grid, exactly (bilinear is
    separable + linear): tokens [B, P, D], U [B, k, ph], V [B, k, pw] →
    L2-normalized [B, k, D]."""
    grid = tokens.reshape(tokens.shape[0], ph, pw, tokens.shape[-1])
    e = jnp.einsum("bkp,bpqd,bkq->bkd", U, grid, V)
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)


def resize_center_crop(img: Image.Image, size: int) -> Image.Image:
    """Shortest side → `size`, then center-crop square (the reference
    processor's effective transform on the square street-view inputs)."""
    w, h = img.size
    if min(w, h) != size:
        if w <= h:
            w, h = size, max(size, round(h * size / w))
        else:
            w, h = max(size, round(w * size / h)), size
        img = img.resize((w, h), Image.BICUBIC)
    left, top = max(0, (w - size) // 2), max(0, (h - size) // 2)
    return img.crop((left, top, left + size, top + size))


class CLIPRankCluster:
    def __init__(
        self,
        dataset_path: str,
        cache_path: str = "clip",
        mode: str = "diff",
        vision: Optional[CLIPVisionModel] = None,
        vision_params=None,
        text: Optional[CLIPTextModelWithProjection] = None,
        text_params=None,
        tokenizer: Optional[CLIPTokenizer] = None,
        crop: Optional[int] = None,
        batch_images: int = 8,
        host_scoring: Optional[bool] = None,
    ):
        assert mode in ("diff", "sim")
        self.host_scoring = _HOST_SCORING if host_scoring is None else host_scoring
        self.mode = mode
        self.dataset_path = dataset_path
        self.cache_path = join(cache_path, mode)
        self.load_paths_geo(dataset_path)
        self.vision = vision if vision is not None else CLIPVisionModel()
        self.crop = crop if crop is not None else self.vision.config.image_size
        self.vision_params = vision_params
        self.text = text if text is not None else CLIPTextModelWithProjection()
        self.text_params = text_params
        self.tokenizer = tokenizer if tokenizer is not None else tiny_tokenizer(
            self.text.config.vocab_size
        )
        self.batch_images = max(int(batch_images), 1)
        if self.vision_params is None or self.text_params is None:
            # no weights supplied: random towers keep the pipeline runnable
            # (smoke/demo), but the mining output is meaningless — say so
            # loudly instead of crashing on a None tree at first encode
            print(
                "clipmining: no CLIP weights supplied — towers are RANDOMLY "
                "initialized (smoke/test only); pass --clip_dir for real mining",
                flush=True,
            )
            rng = jax.random.PRNGKey(0)
            if self.vision_params is None:
                self.vision_params = self.vision.init(
                    rng, jnp.zeros((1, self.crop, self.crop, 3))
                )
            if self.text_params is None:
                self.text_params = self.text.init(rng, jnp.zeros((1, 77), jnp.int32))
        self._vis_fn = jax.jit(lambda p, x: self.vision.apply(p, x))
        self._txt_fn = jax.jit(lambda p, ids: self.text.apply(p, ids))

    # --- dataset protocol (same as typicality geo loader) ---

    def load_paths_geo(self, dataset_path: str) -> None:
        self.parent = {}
        self.country_path = defaultdict(list)
        for country_parent in sorted(os.listdir(dataset_path)):
            output_dir = join(dataset_path, country_parent)
            if not os.path.isdir(output_dir):
                continue
            for seed in sorted(os.listdir(output_dir)):
                country = seed.split("__")[0]
                if country.startswith("gt--"):
                    self.country_path[country.replace("gt--", "")].append((join(output_dir, seed), True))
                elif "--" not in country:
                    self.country_path[country].append((join(output_dir, seed), False))
            self.parent[country_parent] = True

    def categories(self) -> List[str]:
        return sorted(self.parent.keys())

    def get_seeds(self, c: str) -> List[str]:
        return [p for p, is_gt in self.country_path[c] if is_gt]

    # --- encode ---

    def load_image(self, path: str) -> Image.Image:
        return resize_center_crop(Image.open(path).convert("RGB"), self.crop)

    def _preprocess(self, img: Image.Image) -> np.ndarray:
        arr = np.asarray(img, dtype=np.float32) / 255.0
        return (arr - CLIP_MEAN) / CLIP_STD

    def project_image(self, img: Image.Image) -> Tuple[np.ndarray, int]:
        """-> (patch tokens through visual_projection [P, D], patch grid
        width). Runs at B=1 (its own compiled shape) — the public
        single-image API must not pay the rank loop's pad-to-batch."""
        tokens, pw = self.project_images([img], pad_to=1)
        return tokens[0], pw

    def project_images(self, imgs: Sequence[Image.Image], pad_to: Optional[int] = None,
                       ) -> Tuple[np.ndarray, int]:
        """Batched tower pass (the reference encodes one image per forward,
        ranking.py:70-74; same-crop inputs batch trivially and the ViT is
        all matmuls): -> (tokens [B, P, D], patch grid width). Partial
        chunks pad to `pad_to` (default `batch_images`) so the chunked rank
        loop hits ONE compiled shape (same policy as the sweep's
        _compute_group)."""
        tokens, pw = self._project_device(imgs, pad_to)
        return np.asarray(tokens[: len(imgs)], np.float32), pw

    def _project_device(self, imgs: Sequence[Image.Image], pad_to: Optional[int] = None,
                        ) -> Tuple[jax.Array, int]:
        """project_images without the host fetch: tokens stay on device
        (PADDED to the compiled batch) for the device scoring path."""
        n = len(imgs)
        pad_to = self.batch_images if pad_to is None else max(pad_to, 1)
        x = np.stack([self._preprocess(im) for im in imgs])
        if n < pad_to:
            x = np.concatenate([x, np.repeat(x[-1:], pad_to - n, axis=0)])
        _, tokens = self._vis_fn(self.vision_params, jnp.asarray(x))
        pw = imgs[0].width // self.vision.config.patch_size
        return tokens.astype(jnp.float32), pw

    def project_text(self, prompts: Sequence[str]) -> np.ndarray:
        ids = jnp.asarray(self.tokenizer(list(prompts)))
        _, pooled = self._txt_fn(self.text_params, ids)
        pooled = np.asarray(pooled, np.float32)
        return pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

    # --- scoring (reference dot_text_image) ---

    def score_map(self, tokens: np.ndarray, pw: int, text_embeds: np.ndarray, size: Tuple[int, int],
                  kx: int = 64, ky: int = 64) -> Tuple[np.ndarray, np.ndarray]:
        """-> (pooled score map, upsampled token features [D, H, W])."""
        tok = tokens / np.linalg.norm(tokens, axis=-1, keepdims=True)
        scores = tok @ text_embeds.T  # [P, 2]
        ph = tokens.shape[0] // pw
        scores_2d = scores.reshape(ph, pw, 2)
        up = np.asarray(upsample_bilinear(jnp.asarray(scores_2d.transpose(2, 0, 1)), *size))  # [2,H,W]
        if self.mode == "diff":
            # pooled RAW-similarity difference country − "": the reference's
            # live diff path (ranking.py:78-79; the softmax at ranking.py:77
            # is computed into a variable that is never read — dead code we
            # deliberately do not reproduce)
            pooled = np.asarray(box_pool(jnp.asarray(up[0])[None], kx, ky))[0] - np.asarray(
                box_pool(jnp.asarray(up[1])[None], kx, ky)
            )[0]
        else:
            pooled = np.asarray(box_pool(jnp.asarray(up[0])[None], kx, ky))[0]
        feats = np.asarray(
            upsample_bilinear(jnp.asarray(tokens.T.reshape(-1, ph, pw)), *size)
        )  # [D, H, W]
        return pooled, feats

    def rank(self, country: str, k_per_image: int = 5, kx: int = 64, ky: int = 64):
        text_embeds = self.project_text([country, ""])
        rows, embeds = [], []
        seeds = self.get_seeds(country)
        if self.host_scoring:
            for start in range(0, len(seeds), self.batch_images):
                chunk = seeds[start : start + self.batch_images]
                imgs = [self.load_image(p) for p in chunk]
                tokens_b, pw = self.project_images(imgs)
                for path, img, tokens in zip(chunk, imgs, tokens_b):
                    pooled, feats = self.score_map(tokens, pw, text_embeds, (img.height, img.width), kx, ky)
                    boxes, scores = top_patches(pooled, kx, ky, k_per_image)
                    for (x0, y0, x1, y1), s in zip(boxes, scores):
                        rows.append((path, x0, y0, x1, y1, float(s)))
                        crop = feats[:, x0:x1, y0:y1].reshape(feats.shape[0], -1).mean(axis=1)
                        embeds.append(crop / max(np.linalg.norm(crop), 1e-12))
            return pd.DataFrame(rows, columns=PATCH_COLUMNS), embeds

        # device path: batched pooled maps, [k, D] box-embed fetches, and the
        # next chunk's PIL decodes prefetched while the device computes
        te = jnp.asarray(text_embeds)
        chunks = [seeds[s : s + self.batch_images] for s in range(0, len(seeds), self.batch_images)]
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(lambda c: [self.load_image(p) for p in c], chunks[0]) if chunks else None
            for ci, chunk in enumerate(chunks):
                imgs = fut.result()
                if ci + 1 < len(chunks):
                    fut = pool.submit(lambda c: [self.load_image(p) for p in c], chunks[ci + 1])
                tokens_dev, pw = self._project_device(imgs)
                ph = tokens_dev.shape[1] // pw
                h, w = imgs[0].height, imgs[0].width
                pooled_b = np.asarray(_pooled_score_maps(
                    tokens_dev, te, ph, pw, h, w, kx, ky, self.mode == "diff"))
                wh, ww = _resize_weights(ph, h), _resize_weights(pw, w)
                U = np.zeros((len(tokens_dev), k_per_image, ph), np.float32)
                V = np.zeros((len(tokens_dev), k_per_image, pw), np.float32)
                counts = []
                for bi, path in enumerate(chunk):
                    boxes, scores = top_patches(pooled_b[bi], kx, ky, k_per_image)
                    counts.append(len(boxes))
                    for j, ((x0, y0, x1, y1), s) in enumerate(zip(boxes, scores)):
                        rows.append((path, x0, y0, x1, y1, float(s)))
                        U[bi, j] = wh[x0:x1].mean(axis=0)
                        V[bi, j] = ww[y0:y1].mean(axis=0)
                emb_b = np.asarray(_box_embeds(tokens_dev, jnp.asarray(U), jnp.asarray(V), ph, pw))
                for bi in range(len(chunk)):
                    embeds.extend(emb_b[bi, : counts[bi]])
        return pd.DataFrame(rows, columns=PATCH_COLUMNS), embeds

    # --- clustering (same constants as reference) ---

    def cluster(self, df: pd.DataFrame, embeds, num_clusters: int = 32):
        km = KMeans(n_clusters=num_clusters, random_state=10).fit(np.stack(embeds))
        clusters = defaultdict(list)
        for i, l in enumerate(km.labels_):
            row = df.iloc[i]
            x0, y0, x1, y1 = (int(row[c]) for c in ["x_start", "y_start", "x_end", "y_end"])
            pil = self.load_image(row["seed"]).crop((y0, x0, y1, x1))
            name = os.path.split(row["seed"])[1]
            idd = os.path.splitext(name)[0] + f"_{x0}-{y0}-{x1}-{y1}"
            clusters[int(l)].append((pil, row["D"], idd, embeds[i], row["seed"]))
        ranked = []
        for k, vs in clusters.items():
            vs = sorted(vs, key=lambda v: float(np.linalg.norm(v[3] - km.cluster_centers_[k])))
            ranked.append(([(a, b, c, e) for a, b, c, d, e in vs], float(np.median([v[1] for v in vs]))))
        return sorted(ranked, key=lambda kv: kv[1], reverse=True)

    def clustering(self, k_per_image: int = 5, k: int = 1000, num_clusters: int = 32,
                   hard_limit: int = 6, kx: int = 64, ky: int = 64):
        cache_path = join(self.cache_path, "dfs")
        figure_dir = join(self.cache_path, "figures")
        os.makedirs(cache_path, exist_ok=True)
        os.makedirs(figure_dir, exist_ok=True)
        results = {}
        for country in self.categories():
            # non-default mining params key the cache (a df mined with other
            # box sizes must not be silently reused); defaults keep the
            # reference's bare {country}.pkl name
            tag = "" if (k_per_image, kx, ky) == (5, 64, 64) else f"__{k_per_image}-{kx}-{ky}"
            fp = join(cache_path, country + tag + ".pkl")
            if os.path.isfile(fp):
                with open(fp, "rb") as f:
                    df, embeds = pickle.load(f)
            else:
                df, embeds = self.rank(country, k_per_image=k_per_image, kx=kx, ky=ky)
                with open(fp, "wb") as f:
                    pickle.dump((df, embeds), f)

            order = np.argsort(-df["D"].to_numpy(), kind="stable")[:k]
            df_top = df.iloc[order].reset_index(drop=True)
            embs = [embeds[i] for i in order]
            clusters = self.cluster(df_top, embs, num_clusters=num_clusters)
            results[country] = clusters

            parent_ = join(self.cache_path, "images", "clusters", country)
            os.makedirs(parent_, exist_ok=True)
            grid = []
            for i, (members, _score) in enumerate(clusters):
                row_imgs = []
                for j, (pil, _d, idd, _p) in enumerate(members):
                    pil.save(join(parent_, f"{i}-{j}-{num_clusters}_{idd}.png"))
                    if j < hard_limit:
                        row_imgs.append(pil.convert("RGB"))
                if row_imgs:
                    grid.append(row_imgs)
            if grid:
                make_grid(grid, 2, 4).save(join(figure_dir, f"{country}.png"))
        return results


def main(argv=None):
    p = argparse.ArgumentParser(description="CLIP patch-ranking baseline (reference clipmining CLI)")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--cache", type=str, default="clip")
    p.add_argument("--mode", type=str, default="diff", choices=["diff", "sim"])
    p.add_argument("--clip_dir", type=str, default=None,
                   help="dir with CLIPModel weights (vision+text safetensors + config.json), e.g. converted StreetCLIP")
    p.add_argument("--crop", type=int, default=None,
                   help="input size; defaults to the vision tower's native image_size")
    p.add_argument("--batch_images", type=int, default=8,
                   help="images per batched vision-tower pass (the reference "
                   "encodes one at a time)")
    args = p.parse_args(argv)
    if args.clip_dir:
        from diffmining_tpu.utils.weights import load_clip_dir

        bundle = load_clip_dir(args.clip_dir)
        vision = CLIPVisionModel(bundle["vision"]["config"])
        text = CLIPTextModelWithProjection(
            bundle["text"]["config"], projection_dim=bundle["text"]["projection_dim"]
        )
        tok_dir = bundle["tokenizer_dir"]
        if os.path.isfile(join(tok_dir, "vocab.json")):
            tokenizer = CLIPTokenizer.from_pretrained_dir(tok_dir)
        else:
            raise FileNotFoundError(f"no tokenizer files (vocab.json) in {tok_dir}")
        rc = CLIPRankCluster(
            args.dataset, args.cache, args.mode,
            vision=vision, vision_params={"params": bundle["vision"]["params"]},
            text=text, text_params={"params": bundle["text"]["params"]},
            tokenizer=tokenizer, crop=args.crop, batch_images=args.batch_images,
        )
    else:
        rc = CLIPRankCluster(args.dataset, args.cache, args.mode, crop=args.crop,
                             batch_images=args.batch_images)
    rc.clustering(k_per_image=5, k=1000, num_clusters=32, hard_limit=6)


if __name__ == "__main__":
    main()
