"""One-command real-checkpoint verification (BASELINE.md fidelity target).

The weight converter (utils/weights.py) has full round-trip test coverage but
— in a zero-egress image — has never seen a real SD-v1.5 tensor-name set. The
day real weights land, this command turns "is the conversion right?" into one
invocation:

    python -m diffmining_tpu verify_checkpoint <pipeline_dir> \
        [--probes probes.npz] [--theirs ref_typicality_dir] \
        [--which cars --dataset data_dir] [--sweep_images 2] [--n_samples 100]

Stages (each prints PASS/FAIL; exit code 1 on any FAIL):
  1. convert    — load the diffusers-layout dir through load_pipeline_dir.
  2. structure  — converted pytrees must match each flax module's init tree
                  exactly (paths AND shapes, via jax.eval_shape — no compute).
                  Catches every rename/transpose drift on real tensor names.
  3. forward    — tiny deterministic forward of CLIP/VAE/UNet; finiteness.
  4. probes     — optional activation parity vs torch recordings (record with
                  scripts_tpu/record_probes.py on a diffusers machine; NCHW
                  fp32 npz). Reports max|Δ| + pearson per module.
  5. fidelity   — optional 2-image typicality mini-sweep compared against a
                  reference artifact tree (mean per-pixel map correlation —
                  the >0.95 number; RNG streams differ so correlation, not
                  bitwise equality, is the oracle, SURVEY.md §7 hard-part 2).
"""
from __future__ import annotations

import argparse
import os
import tempfile
from os.path import join
from typing import Any, Dict, Tuple

import numpy as np

PROBE_KEYS = ("text_hidden", "vae_mean", "unet_eps")


class _SkipStage(Exception):
    """Internal control flow: a verify stage that cannot run (missing
    optional oracle dependency) is skipped rather than failed."""


def _tree_paths(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Tuple[int, ...]]:
    out: Dict[Tuple[str, ...], Tuple[int, ...]] = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def check_structure(name: str, converted: Dict[str, Any], init_tree: Dict[str, Any]) -> bool:
    got, want = _tree_paths(converted), _tree_paths(init_tree)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    shape_bad = sorted(k for k in set(got) & set(want) if got[k] != want[k])
    ok = not (missing or extra or shape_bad)
    print(f"[structure:{name}] {'PASS' if ok else 'FAIL'} ({len(want)} params)")
    for k in missing[:8]:
        print(f"    missing from checkpoint: {'.'.join(k)} {want[k]}")
    for k in extra[:8]:
        print(f"    unexpected in checkpoint: {'.'.join(k)} {got[k]}")
    for k in shape_bad[:8]:
        print(f"    shape mismatch {'.'.join(k)}: ckpt {got[k]} vs model {want[k]}")
    return ok


def pearson(a: np.ndarray, b: np.ndarray) -> float:
    from diffmining_tpu.utils.fidelity import pearson as p

    return p(a, b)


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    """Rank correlation with AVERAGE ranks for ties (fidelity.spearman):
    argsort-of-argsort assigns order-dependent ranks to ties, and the fp16
    loss grids the stage-6 medians derive from do tie — arbitrary tie ranks
    add noise to a PASS/FAIL gate (ADVICE r4)."""
    from diffmining_tpu.utils.fidelity import spearman as s

    return s(np.asarray(a, np.float64), np.asarray(b, np.float64))


def cluster_rank_correlation(
    pipeline_dir: str,
    dataset: str,
    which: str,
    ours_tree: str,
    theirs_tree: str,
    num_clusters: int = 32,
    k_per_image: int = 5,
    patch: int = 64,
    feature_which: str = "dift-161",
    cache_path: str = None,
    sd=None,
) -> Dict[str, float]:
    """The headline BASELINE.md oracle: cluster RANK correlation of the FULL
    mining chain (patch tables → DIFT → k-means(rs=10) → median ranking,
    reference cluster.py:312-380) between two typicality artifact trees.

    Design: both trees' top-k patches are mined with identical code; the
    UNION patch set is DIFT-featurized ONCE (features depend only on the
    checkpoint + image, not on the tree) and jointly k-means-clustered; each
    cluster is then median-ranked under each tree's typicality scores, and
    the per-category number is the Spearman correlation of the two cluster
    score vectors. Identical maps give 1.0 by construction; a conversion bug
    that reorders which patches/clusters are typical drags it down even when
    per-pixel correlation looks high.
    """
    import pandas as pd

    from diffmining_tpu.ops.kmeans import KMeans
    from diffmining_tpu.ops.pool import top_patches
    from diffmining_tpu.typicality.cluster import PATCH_COLUMNS, Cluster

    cache = cache_path or join(ours_tree, "_rank_cache")
    ours = Cluster(
        which, ours_tree, dataset, cache, model_path=pipeline_dir,
        kx=patch, ky=patch, cache_features=False, dift_sd=sd,
    )
    theirs = Cluster(
        which, theirs_tree, dataset, join(cache, "theirs"),
        kx=patch, ky=patch, cache_features=False,
    )
    per_cat: Dict[str, float] = {}
    for c in sorted(ours.categories()):
        seeds = [p for p in ours.get_seeds(ours.D[c], c) if theirs.D[c].exists(p)]
        if not seeds:
            continue
        maps_o, maps_t = {}, {}
        union: Dict[Tuple[str, Tuple[int, int, int, int]], None] = {}
        for path in seeds:
            maps_o[path] = ours.load_typicality(ours.D[c], path)
            maps_t[path] = theirs.load_typicality(theirs.D[c], path)
            for m in (maps_o[path], maps_t[path]):
                boxes, _ = top_patches(m, patch, patch, k_per_image)
                for b in boxes:
                    union.setdefault((path, tuple(int(v) for v in b)))
        patches = list(union)
        if len(patches) < 4:
            continue
        nc = min(num_clusters, max(2, len(patches) // 2))
        # score convention matches df_D: the pooled map value at the patch's
        # top-left corner
        rows = [
            (path, x0, y0, x1, y1, float(maps_o[path][x0, y0]), "real")
            for path, (x0, y0, x1, y1) in patches
        ]
        df = pd.DataFrame(rows, columns=PATCH_COLUMNS)
        X, _ids, _pils, _ds, _paths = ours.compute_embeddings(
            df, c=c, to_add_border=False, feature_which=feature_which
        )
        km = KMeans(n_clusters=nc, random_state=10).fit(np.stack(X, axis=0))
        members: Dict[int, list] = {}
        for i, l in enumerate(km.labels_):
            members.setdefault(int(l), []).append(i)
        score_o, score_t = [], []
        for k in sorted(members):
            idx = members[k]
            score_o.append(float(np.median([maps_o[patches[i][0]][patches[i][1][0], patches[i][1][1]] for i in idx])))
            score_t.append(float(np.median([maps_t[patches[i][0]][patches[i][1][0], patches[i][1][1]] for i in idx])))
        per_cat[c] = spearman(np.asarray(score_o), np.asarray(score_t))
    return per_cat


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="verify a converted SD pipeline checkpoint")
    ap.add_argument("pipeline_dir")
    ap.add_argument("--probes", default=None, help="npz of torch activations (scripts_tpu/record_probes.py)")
    ap.add_argument(
        "--torch_oracle", action="store_true",
        help="run the checkpoint's own weights through the in-repo torch "
        "transcription (utils/torch_oracle.py) and compare one UNet forward "
        "against the converted flax model — full-config parity with NO "
        "external recordings needed",
    )
    ap.add_argument("--probe_tol", type=float, default=5e-2, help="max|Δ| gate for probe parity (bf16 compute)")
    ap.add_argument("--theirs", default=None, help="reference typicality artifact tree to correlate against")
    ap.add_argument("--which", default="cars")
    ap.add_argument("--dataset", default=None, help="dataset dir for the mini-sweep")
    ap.add_argument("--sweep_images", type=int, default=2)
    ap.add_argument("--n_samples", type=int, default=100)
    ap.add_argument("--t_min", type=float, default=0.1)
    ap.add_argument("--t_max", type=float, default=0.7)
    # stage 6 (cluster-rank): the headline BASELINE.md oracle over the FULL
    # mining chain; 0 disables
    ap.add_argument("--rank_images", type=int, default=16,
                    help="images to sweep for the cluster-rank stage (>= sweep_images)")
    ap.add_argument("--rank_clusters", type=int, default=32)
    ap.add_argument("--rank_patch", type=int, default=64, help="patch size (reference: 64)")
    ap.add_argument("--rank_feature", default="dift-161")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from diffmining_tpu.models.clip import CLIPTextModel
    from diffmining_tpu.models.unet import UNet2DCondition
    from diffmining_tpu.models.vae import AutoencoderKL
    from diffmining_tpu.utils.weights import load_pipeline_dir

    ok = True

    # 1. convert ------------------------------------------------------------
    p = load_pipeline_dir(args.pipeline_dir)
    print(f"[convert] PASS (unet/vae/text_encoder/scheduler loaded from {args.pipeline_dir})")

    unet = UNet2DCondition(p["unet"]["config"], dtype=jnp.float32)
    vae = AutoencoderKL(p["vae"]["config"], dtype=jnp.float32)
    clip = CLIPTextModel(p["text_encoder"]["config"], dtype=jnp.float32)
    D = p["unet"]["config"].cross_attention_dim
    f = 2 ** (len(p["vae"]["config"].block_out_channels) - 1)

    # 2. structure -----------------------------------------------------------
    rng = jax.random.PRNGKey(0)
    lat = jax.ShapeDtypeStruct((1, 8, 8, p["unet"]["config"].in_channels), jnp.float32)
    t_s = jax.ShapeDtypeStruct((1,), jnp.int32)
    ctx_s = jax.ShapeDtypeStruct((1, 77, D), jnp.float32)
    unet_init = jax.eval_shape(unet.init, rng, lat, t_s, ctx_s)
    img_s = jax.ShapeDtypeStruct((1, 8 * f, 8 * f, p["vae"]["config"].in_channels), jnp.float32)
    vae_init = jax.eval_shape(lambda r, x: vae.init(r, x, method=AutoencoderKL.encode_decode), rng, img_s)
    ids_s = jax.ShapeDtypeStruct((1, 77), jnp.int32)
    clip_init = jax.eval_shape(clip.init, rng, ids_s)
    ok &= check_structure("unet", p["unet"]["params"], unet_init["params"])
    ok &= check_structure("vae", p["vae"]["params"], vae_init["params"])
    ok &= check_structure("text_encoder", p["text_encoder"]["params"], clip_init["params"])

    # 3. forward -------------------------------------------------------------
    from diffmining_tpu.models.tokenizer import CLIPTokenizer, tiny_tokenizer

    tok_dir = p["tokenizer_dir"]
    if os.path.isfile(join(tok_dir, "vocab.json")):
        tokenizer = CLIPTokenizer.from_pretrained_dir(tok_dir)
    else:
        tokenizer = tiny_tokenizer(p["text_encoder"]["config"].vocab_size)
    try:
        ids = jnp.asarray(tokenizer([""]))
        hidden = clip.apply({"params": p["text_encoder"]["params"]}, ids)
        lat0 = jnp.zeros((1, 8, 8, p["unet"]["config"].in_channels), jnp.float32)
        eps = unet.apply({"params": p["unet"]["params"]}, lat0, jnp.asarray([261], jnp.int32), hidden)
        img0 = jnp.zeros((1, 8 * f, 8 * f, p["vae"]["config"].in_channels), jnp.float32)
        mean, logvar = vae.apply({"params": p["vae"]["params"]}, img0, method=AutoencoderKL.encode)
        fin = all(bool(jnp.isfinite(x).all()) for x in (hidden, eps, mean, logvar))
        print(f"[forward] {'PASS' if fin else 'FAIL'} (clip/unet/vae finite; eps std {float(jnp.std(eps)):.4f})")
        ok &= fin
    except Exception as e:  # a structure failure usually implies this one
        print(f"[forward] FAIL ({type(e).__name__}: {str(e).splitlines()[0][:120]})")
        ok = False
        if args.probes:
            print("[probe:*] SKIP (forward failed)")
            args.probes = None

    # 4a. torch oracle --------------------------------------------------------
    if args.torch_oracle:
        try:
            import torch

            from diffmining_tpu.utils.torch_oracle import UNet2DConditionRef
            from diffmining_tpu.utils.weights import load_safetensors_dir

            cfg = p["unet"]["config"]
            tref = UNet2DConditionRef(
                in_channels=cfg.in_channels, out_channels=cfg.out_channels,
                block_out_channels=cfg.block_out_channels,
                layers_per_block=cfg.layers_per_block,
                cross_attention_dim=cfg.cross_attention_dim,
                num_attention_heads=cfg.num_attention_heads,
                down_block_has_attn=cfg.down_block_has_attn,
                norm_num_groups=cfg.norm_num_groups,
                transformer_layers=cfg.transformer_layers,
                flip_sin_to_cos=cfg.flip_sin_to_cos,
                freq_shift=cfg.freq_shift,
            ).eval()
            raw = load_safetensors_dir(join(args.pipeline_dir, "unet"))
            missing, unexpected = tref.load_state_dict(
                {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in raw.items()},
                strict=False,
            )
            if missing:
                print(f"[torch_oracle] FAIL ({len(missing)} checkpoint keys missing, e.g. {missing[:3]})")
                ok = False
            else:
                if unexpected:
                    print(f"[torch_oracle] note: {len(unexpected)} unconsumed checkpoint keys, e.g. {unexpected[:3]}")
                rng_np = np.random.RandomState(0)
                x = rng_np.randn(1, cfg.in_channels, 16, 16).astype(np.float32)
                ctx = rng_np.randn(1, 77, D).astype(np.float32)
                with torch.no_grad():
                    want = tref(torch.from_numpy(x), torch.tensor([261]), torch.from_numpy(ctx)).numpy()
                got = np.asarray(
                    unet.apply(
                        {"params": p["unet"]["params"]},
                        jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray([261], jnp.int32), jnp.asarray(ctx),
                    )
                ).transpose(0, 3, 1, 2)
                d = float(np.abs(got - want).max())
                r = pearson(got, want)
                good = d < args.probe_tol and r > 0.999
                print(f"[torch_oracle] {'PASS' if good else 'FAIL'} max|Δ|={d:.2e} pearson={r:.6f}")
                ok &= good
        except Exception as e:
            print(f"[torch_oracle] FAIL ({type(e).__name__}: {str(e).splitlines()[0][:120]})")
            ok = False

        # text tower: transformers IS the reference implementation here (it is
        # what the reference imports), so load the checkpoint's raw tensors
        # into a real transformers CLIPTextModel and compare hidden states
        # the UNet stage above needs only torch + the in-repo oracle; the
        # text stage's oracle IS transformers, so absent that lib there is
        # nothing to compare against — skip, don't fail
        try:
            import transformers
        except ImportError:
            transformers = None
            print("[torch_oracle:text] SKIP (transformers not installed)")
        try:
            if transformers is None:
                raise _SkipStage

            import torch

            tc = p["text_encoder"]["config"]
            hf = transformers.CLIPTextModel(
                transformers.CLIPTextConfig(
                    vocab_size=tc.vocab_size, hidden_size=tc.hidden_size,
                    intermediate_size=tc.intermediate_size,
                    num_hidden_layers=tc.num_layers, num_attention_heads=tc.num_heads,
                    max_position_embeddings=77, hidden_act=tc.hidden_act,
                )
            ).eval()
            raw_t = load_safetensors_dir(join(args.pipeline_dir, "text_encoder"))
            missing, _unexp = hf.load_state_dict(
                {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in raw_t.items()},
                strict=False,
            )
            missing = [m for m in missing if not m.endswith("position_ids")]
            if missing:
                print(f"[torch_oracle:text] FAIL ({len(missing)} keys missing, e.g. {missing[:3]})")
                ok = False
            else:
                ids_np = np.random.RandomState(1).randint(0, tc.vocab_size, (2, 77))
                with torch.no_grad():
                    want_h = hf(torch.from_numpy(ids_np)).last_hidden_state.numpy()
                got_h = np.asarray(
                    clip.apply({"params": p["text_encoder"]["params"]}, jnp.asarray(ids_np, jnp.int32))
                )
                d = float(np.abs(got_h - want_h).max())
                r = pearson(got_h, want_h)
                good = d < args.probe_tol and r > 0.999
                print(f"[torch_oracle:text] {'PASS' if good else 'FAIL'} max|Δ|={d:.2e} pearson={r:.6f}")
                ok &= good
        except _SkipStage:
            pass
        except Exception as e:
            print(f"[torch_oracle:text] FAIL ({type(e).__name__}: {str(e).splitlines()[0][:120]})")
            ok = False

    # 4. probes --------------------------------------------------------------
    if args.probes:
        from diffmining_tpu.diffusion.schedule import add_noise

        z = np.load(args.probes, allow_pickle=True)
        image = np.asarray(z["image"], np.float32)  # [H,W,3] in [-1,1]
        prompt = str(z["prompt"])
        t = int(z["t"])
        ids = jnp.asarray(tokenizer([prompt]))
        got_hidden = np.asarray(clip.apply({"params": p["text_encoder"]["params"]}, ids))[0]
        got_mean = np.asarray(
            vae.apply({"params": p["vae"]["params"]}, jnp.asarray(image)[None], method=AutoencoderKL.encode)[0]
        )[0].transpose(2, 0, 1)
        # deterministic latent: posterior mean × sf, zero noise at t
        sf = p["vae"]["config"].scaling_factor
        lat = jnp.asarray(got_mean.transpose(1, 2, 0))[None] * sf
        noisy = add_noise(p["schedule"], lat, jnp.zeros_like(lat), jnp.asarray([t]))
        got_eps = np.asarray(
            unet.apply({"params": p["unet"]["params"]}, noisy, jnp.asarray([t], jnp.int32),
                       jnp.asarray(got_hidden)[None])
        )[0].transpose(2, 0, 1)
        for key, got in (("text_hidden", got_hidden), ("vae_mean", got_mean), ("unet_eps", got_eps)):
            want = np.asarray(z[key], np.float32)
            d = float(np.abs(got - want).max())
            r = pearson(got, want)
            good = d < args.probe_tol and r > 0.999
            print(f"[probe:{key}] {'PASS' if good else 'FAIL'} max|Δ|={d:.2e} pearson={r:.6f}")
            ok &= good

    # 5. fidelity mini-sweep ---------------------------------------------------
    if args.theirs:
        if not args.dataset:
            raise SystemExit("--theirs requires --dataset/--which for the mini-sweep")
        from diffmining_tpu.typicality.compute import Typicality
        from diffmining_tpu.utils.fidelity import compare_typicality_dirs

        with tempfile.TemporaryDirectory() as tmp:
            typ = Typicality(
                args.which, args.pipeline_dir, args.dataset, tmp,
                N=args.n_samples, t_min=args.t_min, t_max=args.t_max,
            )
            n_target = max(args.sweep_images, args.rank_images)
            n = 0
            for c in typ.categories():
                if n >= n_target:
                    break
                seeds = typ.get_seeds_(c)[: n_target - n]
                # prefer images the reference tree has, so correlations exist
                have = set()
                ref_cat = join(args.theirs, c)
                if os.path.isdir(ref_cat):
                    have = {os.path.splitext(f)[0] for f in os.listdir(ref_cat)}
                    preferred = [s for s in typ.get_seeds_(c) if os.path.splitext(os.path.basename(s))[0] in have]
                    seeds = (preferred or seeds)[: n_target - n]
                typ.D[c].compute_batch([(s, c) for s in seeds])
                n += len(seeds)
            res = compare_typicality_dirs(tmp, args.theirs)
            mean = res.get("__mean__", 0.0)
            good = mean > 0.95 and len(res) > 1
            print(f"[fidelity] {'PASS' if good else 'FAIL'} mean map correlation {mean:.4f} over {max(len(res) - 1, 0)} image(s)")
            ok &= good

            # 6. cluster-rank: the headline >0.95 number over the FULL mining
            # chain (patch mining → DIFT → k-means → median cluster ranking)
            if args.rank_images > 0:
                per_cat = cluster_rank_correlation(
                    args.pipeline_dir, args.dataset, args.which,
                    ours_tree=tmp, theirs_tree=args.theirs,
                    num_clusters=args.rank_clusters, patch=args.rank_patch,
                    feature_which=args.rank_feature,
                    cache_path=join(tmp, "_rank_cache"), sd=typ.sd,
                )
                if per_cat:
                    mean_r = float(np.mean(list(per_cat.values())))
                    good = mean_r > 0.95
                    detail = " ".join(f"{c}={v:.3f}" for c, v in sorted(per_cat.items()))
                    print(f"[cluster_rank] {'PASS' if good else 'FAIL'} mean spearman {mean_r:.4f} ({detail})")
                    ok &= good
                else:
                    print("[cluster_rank] FAIL (no category had >=4 shared patches)")
                    ok = False

    print(f"verify_checkpoint: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
