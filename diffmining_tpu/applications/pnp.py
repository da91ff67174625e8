"""Plug-and-Play cross-label translation, functional (TPU) edition.

Rebuild of the reference's PnP pipeline (reference: diffmining/applications/
parallel-dataset/pnp.py). Semantics preserved:

  * DDIM inversion of the VAE posterior MEAN (×0.18215) over 999 steps with
    the (empty) inversion prompt, storing the full latent trajectory
    (pnp.py:157-180; `uncond_ignore=True` in the main, so inversion uses "").
  * 50-step DDIM sampling with CFG 7.5 where the source image's activations
    are injected: resnet residual branches of up_blocks {1:[1]} for the first
    80% of steps, self-attention q/k of up_blocks {1:[1,2],2:[0,1,2],3:[0,1,2]}
    for the first 50% (pnp.py:480-487,560-569, rbf/rbg at 628-631).
  * Output files gt--/inverted--/projected--{c}_/{c}_ per source image
    (pnp.py:605-627).

Architecture difference (the TPU-first fix): the reference tiles the source
latent B+2B times into one batch and monkey-patches module forwards to copy
activations across batch entries at matching timesteps. Here the source pass
runs ONCE per step collecting taps (explicit `collect_injection`), and the
[uncond, cond] batch consumes them via the UNet's `injection` argument — no
module mutation, one less redundant source replica per target, jit-safe.
"""
from __future__ import annotations

import argparse
import os
from os.path import join
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from diffmining_tpu.diffusion.sampling import ddim_inversion
from diffmining_tpu.diffusion.schedule import ddim_step, ddim_timesteps
from diffmining_tpu.models.vae import AutoencoderKL
from diffmining_tpu.typicality.compute import SD
from diffmining_tpu.utils.images import array_to_image, image_to_array

# injection site tables (reference pnp.py:628-631)
RBF = {1: [1]}  # resnet residual-branch injections
RBG = {1: [1, 2], 2: [0, 1, 2], 3: [0, 1, 2]}  # self-attn q/k injections

CONF = dict(seed=1, guidance_scale=7.5, n_timesteps=50, pnp_attn_t=0.5, pnp_f_t=0.8)


def _res_keys() -> List[str]:
    return [f"up.{r}.res.{b}" for r, blocks in RBF.items() for b in blocks]


def _attn_keys() -> List[str]:
    out = []
    for r, blocks in RBG.items():
        for b in blocks:
            out += [f"up.{r}.tf.{b}.0.attn1.q", f"up.{r}.tf.{b}.0.attn1.k"]
    return out


class PNP:
    """Per-source-image translator. Build once per source, call
    `generate(target_prompts)` repeatedly (reference Generator/PNP classes)."""

    def __init__(self, sd: SD, inversion_steps: int = 999, n_timesteps: int = 50,
                 guidance_scale: float = 7.5, pnp_attn_t: float = 0.5, pnp_f_t: float = 0.8,
                 dedup_prefix: bool | None = None):
        self.sd = sd
        self.inversion_steps = inversion_steps
        self.n_timesteps = n_timesteps
        self.guidance_scale = guidance_scale
        self.pnp_attn_t = pnp_attn_t
        self.pnp_f_t = pnp_f_t
        if dedup_prefix is None:
            # the CFG pass feeds IDENTICAL latents to its uncond and cond
            # halves, so the sweep's ctx_tile prefix dedup applies here too
            # (PnP taps are batch-1 and broadcast, so injection composes) —
            # but MEASURED OFF by default: at the 10-target translate the
            # dedup program is ~25% SLOWER (16.8/17.9 s vs 13.3 s, two ON
            # samples vs OFF, v5e 512px — BENCH_NOTES round 4). Unlike the
            # sweep (+3.75% at its 8x2 batch), the 10-row prefix breaks
            # 8-sublane alignment and the interleaved eps[0::2]/[1::2] split
            # adds strided copies that outweigh the 2.5% FLOP saving.
            # DIFFMINING_PNP_DEDUP=1 re-enables.
            dedup_prefix = os.environ.get("DIFFMINING_PNP_DEDUP", "0") == "1"
        self.dedup_prefix = bool(dedup_prefix)
        self._eps_fn = jax.jit(lambda p, x, t, c: sd.unet.apply(p, x.astype(sd.dtype), t, c.astype(sd.dtype)))
        self._invert = jax.jit(
            lambda p, lat, ctx: ddim_inversion(self._eps_fn, p, sd.schedule, lat, ctx, num_steps=inversion_steps)
        )
        self._translate_cache: Dict[int, Callable] = {}
        self._source_latent = None
        self._trajectory = None

    # ------------------------------------------------------------------

    def embed(self, prompts: Sequence[str]) -> jax.Array:
        ids = jnp.asarray(self.sd.tokenizer(list(prompts)))
        return self.sd.clip.apply(self.sd.clip_params, ids).astype(jnp.float32)

    def encode_image_mean(self, img_array: np.ndarray) -> jax.Array:
        """VAE posterior MEAN × scaling (reference pnp.py:150-155 — PnP uses
        the mean, not a sample, so inversion is deterministic). Accepts one
        image [H,W,3] or a stack [S,H,W,3]."""
        arr = jnp.asarray(img_array)
        if arr.ndim == 3:
            arr = arr[None]
        mean, _ = self.sd.vae.apply(self.sd.vae_params, arr.astype(self.sd.dtype))
        return (mean.astype(jnp.float32) * self.sd.vae.config.scaling_factor)

    def invert(self, img_array: np.ndarray, inversion_prompt: str = "") -> None:
        """Run the 999-step inversion and cache the trajectory. Accepts one
        image [H,W,3] or a same-shape stack [S,H,W,3]: the whole stack inverts
        in ONE scan at UNet batch S (B=1 is the least MXU-efficient shape of
        the entire PnP product — 16.9 ms/call vs ~7.5 amortized at B=16,
        BENCH_NOTES; the reference inverts one image per GPU, pnp.py:157-180).
        Per-source math is identical — batching only widens the batch axis."""
        lat = self.encode_image_mean(img_array)
        S = lat.shape[0]
        ctx1 = self.embed([inversion_prompt])
        ctx = jnp.broadcast_to(ctx1, (S,) + ctx1.shape[1:])
        x_T, traj = self._invert(self.sd.unet_params, lat.astype(self.sd.dtype), ctx)
        self._source_latent = x_T  # [S,...] noised endpoints, the sampler's x_init
        self._trajectory = traj  # [T, S, ...]; traj[i] = x_{t=i+1}
        self._clean_latent = lat

    def num_sources(self) -> int:
        assert self._source_latent is not None, "call invert() first"
        return int(self._source_latent.shape[0])

    def reconstruct_many(self, source_latent=None) -> List[Image.Image]:
        """Sample every inverted source back down from its endpoint with the
        inversion prompt, in ONE B=S chain (reference 'inverted--' image,
        pnp.py:214-216)."""
        assert self._source_latent is not None
        # plain DDIM chain back down all inversion steps (no CFG)
        x = self._source_latent if source_latent is None else source_latent
        S = x.shape[0]
        ctx1 = self.embed([""])
        ctx = jnp.broadcast_to(ctx1, (S,) + ctx1.shape[1:])
        sched = self.sd.schedule
        ts = np.arange(self.inversion_steps, 0, -1, dtype=np.int32)

        def step(x, tt):
            t, t_prev = tt
            eps = self._eps_fn(self.sd.unet_params, x, jnp.broadcast_to(t, (x.shape[0],)), ctx)
            return ddim_step(sched, x, eps, t, t_prev), None

        ts_j = jnp.asarray(ts)
        ts_prev = jnp.concatenate([ts_j[1:], jnp.asarray([-1], jnp.int32)])
        x, _ = jax.lax.scan(step, x, (ts_j, ts_prev))
        img = self.sd.vae.apply(self.sd.vae_params, x.astype(self.sd.dtype), method=AutoencoderKL.decode)
        return [array_to_image(np.asarray(img[s], np.float32)) for s in range(S)]

    def reconstruct(self, source: int = 0) -> Image.Image:
        assert 0 <= source < self.num_sources(), (
            f"source={source} out of range (have {self.num_sources()} inverted sources)"
        )
        # single-source chain without re-running the others
        return self.reconstruct_many(self._source_latent[source : source + 1])[0]

    # ------------------------------------------------------------------

    def _translate_fn(self, B: int) -> Callable:
        """ONE jitted program for the whole 50-step translation: a single
        `lax.scan` whose body fuses the source-tap pass, the [uncond, cond]
        CFG pass and the DDIM update, with the final VAE decode — one device
        dispatch per generate(). The per-step injection schedule rides in as
        scanned BOOLEAN GATES (the UNet's (value, gate) injection form), so
        the body contains exactly TWO UNet traces regardless of the schedule
        — the remote-compile tunnel makes every extra full-SD trace minutes
        of compile. The reference drives 50 host iterations of a 1+2B batch
        per target batch (pnp.py:538-577); the round-1 port still dispatched
        2 UNet calls + a host-side trajectory index per step (~100 relay
        RTTs)."""
        if B in self._translate_cache:
            return self._translate_cache[B]
        sd = self.sd
        n_steps = self.n_timesteps
        ts = ddim_timesteps(n_steps, sd.schedule.num_train_timesteps)
        ts_j = jnp.asarray(ts, jnp.int32)
        ts_prev = jnp.concatenate([ts_j[1:], jnp.asarray([-1], jnp.int32)])
        steps = jnp.arange(n_steps)
        res_gate = steps < int(n_steps * self.pnp_f_t)
        attn_gate = steps < int(n_steps * self.pnp_attn_t)
        res_keys, attn_keys = _res_keys(), _attn_keys()
        gs = self.guidance_scale
        dedup = self.dedup_prefix

        @jax.jit
        def run(params, vae_params, x0, traj, cond, uncond1):
            T_traj = traj.shape[0]
            uncond_b = jnp.broadcast_to(uncond1, cond.shape)
            if dedup:
                # conditions-adjacent layout for ctx_tile: entry i -> rows
                # (2i)=uncond_i, (2i+1)=cond_i; the condition-independent
                # prefix of the CFG pass (conv_in, first resnet, the largest
                # L=H*W self-attention) then runs at B instead of 2B
                ctx = jnp.stack([uncond_b, cond], axis=1).reshape(
                    2 * cond.shape[0], *cond.shape[1:]
                )
            else:
                ctx = jnp.concatenate([uncond_b, cond], axis=0)  # [2B, 77, D]

            def body(x, step):
                t, t_prev, rg, ag = step
                # x_t of the source; with inversion_steps < 999 (debug
                # configs) the nearest stored level stands in for t
                src_lat = traj[jnp.minimum(t, T_traj) - 1]
                out = sd.unet.apply(
                    params, src_lat.astype(sd.dtype),
                    jnp.broadcast_to(t, (src_lat.shape[0],)),
                    uncond1.astype(sd.dtype), collect_injection=True,
                )
                taps = out["taps"]
                # filter statically: small/tiny UNet configs have fewer
                # blocks than the SD-scale injection tables name
                inj = {k: (taps[k], rg) for k in res_keys if k in taps}
                inj.update({k: (taps[k], ag) for k in attn_keys if k in taps})
                if dedup:
                    tb = jnp.broadcast_to(t, (x.shape[0],))
                    eps = sd.unet.apply(
                        params, x, tb, ctx.astype(sd.dtype), injection=inj, ctx_tile=2,
                    ).astype(jnp.float32)
                    eps_u, eps_c = eps[0::2], eps[1::2]
                else:
                    xx = jnp.concatenate([x, x], axis=0)
                    tb = jnp.broadcast_to(t, (xx.shape[0],))
                    eps = sd.unet.apply(params, xx, tb, ctx.astype(sd.dtype), injection=inj)
                    eps_u, eps_c = jnp.split(eps.astype(jnp.float32), 2, axis=0)
                eps_g = eps_u + gs * (eps_c - eps_u)
                return ddim_step(sd.schedule, x, eps_g.astype(x.dtype), t, t_prev), None

            x, _ = jax.lax.scan(body, x0, (ts_j, ts_prev, res_gate, attn_gate))
            imgs = sd.vae.apply(vae_params, x, method=AutoencoderKL.decode)
            return imgs.astype(jnp.float32)

        self._translate_cache[B] = run
        return run

    def generate(self, target_prompts: Sequence[str], uncond_prompt: str = "",
                 source: int = 0) -> List[Image.Image]:
        """Translate inverted source `source` to each target prompt."""
        assert self._trajectory is not None, "call invert() first"
        assert 0 <= source < self.num_sources(), (
            f"source={source} out of range (have {self.num_sources()} inverted sources)"
        )
        sd = self.sd
        B = len(target_prompts)
        cond = self.embed(list(target_prompts))
        src_lat = self._source_latent[source : source + 1]
        traj = self._trajectory[:, source : source + 1]
        x0 = jnp.concatenate([src_lat] * B, axis=0).astype(sd.dtype)
        run = self._translate_fn(B)
        imgs = run(sd.unet_params, sd.vae_params, x0, traj, cond, self.embed([uncond_prompt]))
        return [array_to_image(np.asarray(imgs[b], np.float32)) for b in range(B)]


class Generator:
    """Filesystem protocol around PNP (reference Generator/plotum,
    pnp.py:580-627): writes gt--, inverted--, projected--/{c}_ files.

    Accepts one image path or a list of SAME-SHAPE paths: a group inverts and
    reconstructs in single B=S scans (the B=1 inversion is the PnP product's
    least MXU-efficient stage); the per-source translations are unchanged."""

    def __init__(self, sd: SD, image_path, inversion_steps: int = 999, n_timesteps: int = 50,
                 cache_dir: Optional[str] = None):
        self.sd = sd
        paths = [image_path] if isinstance(image_path, str) else list(image_path)
        self.image_paths = paths
        self.countries_of = [os.path.split(os.path.split(p)[0])[1] for p in paths]
        self.pre_heads = ["_".join(os.path.split(p)[-1].split("_")[1:]) for p in paths]
        self.pils = [Image.open(p).convert("RGB") for p in paths]
        arrs = np.stack([image_to_array(pil) for pil in self.pils])
        # legacy single-image attributes
        self.image_path, self.country = paths[0], self.countries_of[0]
        self.pre_head, self.pil, self.arr = self.pre_heads[0], self.pils[0], arrs[0]
        self.pnp = PNP(sd, inversion_steps=inversion_steps, n_timesteps=n_timesteps)
        # per-source inversion cache (reference pnp.py:263-267 pickles each
        # image's DDIM trajectory under --cache so interrupted jobs skip the
        # 999-step inversion): fp32 npz, exact — a cache hit reproduces the
        # fresh run byte-for-byte
        cfiles = None
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            cfiles = [
                join(cache_dir, f"{c}_{ph}.inv{inversion_steps}.npz")
                for c, ph in zip(self.countries_of, self.pre_heads)
            ]
        if cfiles and all(os.path.isfile(f) for f in cfiles):
            data = [np.load(f) for f in cfiles]
            self.pnp._source_latent = jnp.asarray(np.stack([d["x_T"] for d in data]))
            self.pnp._trajectory = jnp.asarray(np.stack([d["traj"] for d in data], axis=1))
            self.pnp._clean_latent = jnp.asarray(np.stack([d["clean"] for d in data]))
        else:
            self.pnp.invert(arrs, inversion_prompt="")
            if cfiles:
                for s, f in enumerate(cfiles):
                    tmp = f + ".tmp.npz"
                    np.savez(
                        tmp,
                        x_T=np.asarray(self.pnp._source_latent[s], np.float32),
                        traj=np.asarray(self.pnp._trajectory[:, s], np.float32),
                        clean=np.asarray(self.pnp._clean_latent[s], np.float32),
                    )
                    os.replace(tmp, f)

    def plotum(self, dir_path: str, countries: Sequence[str], batch_size: int = 10,
               format_text: Callable[[str], str] = "{}".format) -> None:
        os.makedirs(dir_path, exist_ok=True)
        inverted = self.pnp.reconstruct_many()  # one B=S chain for the group
        for s, (country, pre_head) in enumerate(zip(self.countries_of, self.pre_heads)):
            self.pils[s].save(join(dir_path, f"gt--{country}_{pre_head}"))
            inverted[s].save(join(dir_path, f"inverted--{country}_{pre_head}"))
            for i in range(0, len(countries), batch_size):
                batch = list(countries[i : i + batch_size])
                images = self.pnp.generate([format_text(c) for c in batch], source=s)
                for c, image in zip(batch, images):
                    name = f"projected--{c}_{pre_head}" if c == country else f"{c}_{pre_head}"
                    image.save(join(dir_path, name))


COUNTRIES = [
    "United States", "Japan", "France", "Italy", "United Kingdom",
    "Brazil", "Russia", "Thailand", "Nigeria", "India",
]


def main(argv=None):
    p = argparse.ArgumentParser(description="PnP translation (reference pnp.py CLI)")
    p.add_argument("--idx_start", type=int, default=0)
    p.add_argument("--k_start", type=int, default=0)
    p.add_argument("--k_end", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--save_dir", type=str, default="dataset/parallel")
    p.add_argument("--model_path", type=str, default="models/export")
    p.add_argument("--base_path", type=str, default="dataset/base")
    p.add_argument("--inversion_steps", type=int, default=999)
    p.add_argument(
        "--batch_sources", type=int, default=4,
        help="invert/reconstruct this many source images per B=S scan "
        "(same-shape groups; 1 = the reference's one-image-at-a-time flow)",
    )
    p.add_argument(
        "--cache", type=str, default=None,
        help="cache each source's 999-step inversion trajectory here "
        "(~65 MB fp32 per 512px source) so interrupted jobs resume without "
        "re-inverting; the reference caches under .cache/ by default "
        "(pnp.py:50) — ours is opt-in",
    )
    args = p.parse_args(argv)

    sd = SD.from_pipeline_dir("geo", args.model_path, [])
    for country in COUNTRIES[args.idx_start : args.idx_start + 1]:
        path = join(args.base_path, country)
        dir_path = join(args.save_dir, country)
        pending = []
        for fname in sorted(os.listdir(path))[args.k_start : args.k_end]:
            pre_head = "_".join(fname.split("_")[1:])
            expected = [
                join(dir_path, f"inverted--{country}_{pre_head}"),
                join(dir_path, f"gt--{country}_{pre_head}"),
            ] + [
                join(dir_path, (f"projected--{c}_{pre_head}" if c == country else f"{c}_{pre_head}"))
                for c in COUNTRIES
            ]
            if all(os.path.isfile(pp) for pp in expected):
                continue  # idempotent work queue (reference pnp.py:655-669)
            pending.append(join(path, fname))
        sizes = []
        for p in pending:
            with Image.open(p) as im:  # header read only
                sizes.append(im.size)
        i = 0
        while i < len(pending):
            # group same-shape sources so the stack batches into one scan
            group = [pending[i]]
            while (
                len(group) < max(args.batch_sources, 1)
                and i + len(group) < len(pending)
                and sizes[i + len(group)] == sizes[i]
            ):
                group.append(pending[i + len(group)])
            g = Generator(sd, group, inversion_steps=args.inversion_steps,
                          cache_dir=args.cache)
            g.plotum(dir_path, COUNTRIES, batch_size=args.batch_size)
            i += len(group)


if __name__ == "__main__":
    main()
