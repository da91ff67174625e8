"""Parallel-dataset pipeline: typicality + clustering over PnP translations.

Rebuild of the reference's parallel-dataset stage (reference: diffmining/
applications/parallel-dataset/compute.py + cluster.py), which runs on the
gt--/{country}_ files produced by the PnP translator (applications/pnp.py):

  * typicality: same engine as the main pipeline specialized to geo raw "{c}"
    prompts, computed for BOTH ground-truth and translated images (the
    reference batches B=100; our jitted sweep batches across images too);
  * mining: for each source image, the typicality maps of ALL translations
    are median-stacked into one map, boxes are picked on the median map and
    carry per-country D values + paths (cluster.py:224-251);
  * embeddings: per-box DIFT features of the SAME box across every translation,
    concatenated country-major (cluster.py:152-190), with raw "{c}" prompts;
  * compress: per-country-group dimensionality reduction to 32 then hstack
    (cluster.py:253-266; UMAP when available, PCA fallback);
  * clusters of visual elements ACROSS geography ranked by aggregate D.

Reference quirk preserved: the cluster "center" used for member ordering is
the FARTHEST point of the reduced space (np.argmax at cluster.py:281) — kept
behind `faithful_centers=True`.
"""
from __future__ import annotations

import argparse
import os
import pickle
import random
from collections import defaultdict
from os.path import join
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
from PIL import Image

from diffmining_tpu.ops.kmeans import KMeans
from diffmining_tpu.ops.pool import top_patches, typicality_map
from diffmining_tpu.typicality.compute import SD, D, Typicality
from diffmining_tpu.typicality.dift import SDFeaturizer
from diffmining_tpu.utils.figures import add_border, hcat, vcat
from diffmining_tpu.utils.images import image_to_array, image_uid

import jax.numpy as jnp


class ParallelTypicality(Typicality):
    """Typicality over the translated dataset: every file (gt + translations)
    is computed under its own country condition (reference parallel-dataset/
    compute.py:186-263)."""

    def __init__(self, model_path, dataset_path, typicality_path, sd=None, N=100,
                 t_min=0.0, t_max=1.0, batch_images=8, mesh=None):
        super().__init__(
            "geo", model_path, dataset_path, typicality_path, t_min=t_min, t_max=t_max,
            sd=sd, N=N, batch_images=batch_images, mesh=mesh,
        )

    def get_seeds_(self, c: str) -> List[str]:
        # both ground-truth and translated files, unlike the base pipeline
        return [p for p, _is_gt in self.country_path[c]]


def median_agg(vs):
    return float(np.median([v[1] for v in vs]))


def mean_agg(vs):
    return sum(v[1] for v in vs) / (1.0 * len(vs))


class ParallelCluster:
    def __init__(
        self,
        typicality_path: str,
        dataset_path: str,
        cache_path: str,
        recache: bool = False,
        model_path: Optional[str] = None,
        aggregate: str = "median",
        kx: int = 64,
        ky: int = 64,
        sd: Optional[SD] = None,
        dift_sd: Optional[SD] = None,
        faithful_centers: bool = True,
        clip_dir: Optional[str] = None,
        clip_bundle: Optional[dict] = None,
        mesh=None,
    ):
        self.typ = ParallelTypicality(None, dataset_path, typicality_path, sd=sd)
        self.D = self.typ.D
        self.parallel = self.typ.parallel
        self.countries = sorted(self.typ.parent.keys())
        self.cache_path = cache_path
        self.recache = recache
        self.kx, self.ky = kx, ky
        self.model_path = model_path
        self.aggregate = median_agg if aggregate == "median" else mean_agg
        self.faithful_centers = faithful_centers
        self._dift_sd = dift_sd
        self.mesh = mesh  # shard the DIFT ensemble axis over "dp" (--mesh_dp)
        self.dift: Optional[SDFeaturizer] = None
        # clip / clip+dift-* feature modes (reference parallel cluster.py:
        # 146-190): CLIP embeds of the per-country crops, flattened concat
        self.clip_dir = clip_dir
        self._clip_bundle = clip_bundle
        self._clip_embed = None

    def init_clip(self):
        if self._clip_embed is None:
            from diffmining_tpu.typicality.cluster import Cluster

            Cluster.init_clip(self)  # same lazy embedder, same bundle fields

    # ------------------------------------------------------------------

    def load_typicality(self, d: D, path: str) -> np.ndarray:
        img = Image.open(path)
        w, h = img.size
        return np.asarray(typicality_map(jnp.asarray(d(path)), h, w, self.kx, self.ky))

    def df_PD(self, k_per_image: int = 5, seed: int = 42, ascending: bool = False):
        """Median-stack translations per source image, mine boxes on the median
        map (reference cluster.py:224-251)."""
        columns = (
            ["x_start", "y_start", "x_end", "y_end", "origin", "D"]
            + self.countries
            + ["path_" + c for c in self.countries]
        )
        rows, rows_random = [], []
        rng = random.Random(seed)
        for origin in self.countries:
            for group in self.parallel[origin]:
                if not all(self.D[c].exists(p) for p, c in group):
                    continue
                try:
                    pths = {c: p for p, c in group}
                    ds = {c: self.load_typicality(self.D[c], p) for p, c in group}
                    if set(pths) != set(self.countries):
                        continue
                    dm = np.median(np.stack([ds[c] for c in self.countries]), axis=0)
                    boxes, scores = top_patches(dm if not ascending else -dm, self.kx, self.ky, k_per_image)
                    rnd = np.asarray(
                        [rng.random() for _ in range(dm.size)], np.float32
                    ).reshape(dm.shape)
                    rboxes, _ = top_patches(rnd, self.kx, self.ky, k_per_image)
                    for bx, is_random in ((boxes, False), (rboxes, True)):
                        for (x0, y0, x1, y1) in bx:
                            row = (
                                (int(x0), int(y0), int(x1), int(y1), origin, float(dm[x0, y0]))
                                + tuple(float(ds[c][x0, y0]) for c in self.countries)
                                + tuple(pths[c] for c in self.countries)
                            )
                            (rows_random if is_random else rows).append(row)
                except Exception as ex:
                    print("error", ex, "@paths=", group)
        return pd.DataFrame(rows, columns=columns), pd.DataFrame(rows_random, columns=columns)

    # ------------------------------------------------------------------

    def init_dift(self):
        if self.dift is None:
            sd = self._dift_sd
            if sd is None:
                assert self.model_path is not None
                sd = SD.from_pipeline_dir("geo", self.model_path, [])
            self.dift = SDFeaturizer(sd, mesh=self.mesh)

    def _cached(self, sub: str, idd: str, fn):
        emb_dir = join(self.cache_path, "embeddings", sub)
        os.makedirs(emb_dir, exist_ok=True)
        pkl_file = join(emb_dir, f"{idd}.pkl")
        if os.path.isfile(pkl_file):
            with open(pkl_file, "rb") as f:
                return pickle.load(f)
        out = fn()
        with open(pkl_file, "wb") as f:
            pickle.dump(out, f)
        return out

    def embed_batch(
        self, images: Sequence[Image.Image], t: Optional[int], idd: str, bbox,
        use_dift: bool = True, use_clip: bool = False,
    ) -> np.ndarray:
        """Concat per-country features of the same box across all translations
        (reference cluster.py:152-190); bbox = (y0, x0, y1, x1). DIFT = per-
        country patch features concatenated; CLIP = per-country crop embeds
        (each L2-normed) flattened; clip+dift = [clip | dift]."""
        parts = []
        if use_clip:
            def clip_feats():
                self.init_clip()
                y0, x0, y1, x1 = bbox
                return np.concatenate(
                    [self._clip_embed(pil.crop((y0, x0, y1, x1))) for pil in images]
                )

            parts.append(self._cached("clip", idd, clip_feats))
        if use_dift:
            def dift_feats():
                self.init_dift()
                y0, x0, y1, x1 = bbox
                feats = []
                for c, pil in zip(self.countries, images):
                    arr = image_to_array(pil)
                    feats.append(
                        self.dift.patch_feature(
                            arr, f"{c}", (x0, y0, x1, y1), t=t, uid=image_uid(idd + c)
                        )
                    )
                return np.concatenate(feats)

            parts.append(self._cached(f"dift-{t}", idd, dift_feats))
        return parts[0] if len(parts) == 1 else np.concatenate(parts)

    def compute_embeddings(self, df: pd.DataFrame, feature_which: str = "dift-261"):
        from diffmining_tpu.typicality.cluster import Cluster

        use_dift, use_clip, t = Cluster.parse_feature_which(feature_which)
        X, ids, pils, ds, origins = [], [], [], [], []
        for i in range(df.shape[0]):
            row = df.iloc[i]
            ds.append(row["D"])
            origins.append(row["origin"])
            images = [Image.open(row["path_" + c]).convert("RGB") for c in self.countries]
            x0, y0, x1, y1 = (int(row[c]) for c in ["x_start", "y_start", "x_end", "y_end"])
            name = os.path.split(row["path_" + row["origin"]])[1]
            idd = os.path.splitext(name)[0] + f"_{x0}-{y0}-{x1}-{y1}"
            ids.append(idd)
            X.append(self.embed_batch(images, t, idd, (y0, x0, y1, x1), use_dift=use_dift, use_clip=use_clip))
            bordered = [
                add_border(img.crop((y0, x0, y1, x1)), "red" if c == row["origin"] else "transparent")
                for c, img in zip(self.countries, images)
            ]
            pils.append(hcat(bordered))
        return X, ids, pils, ds, origins

    # ------------------------------------------------------------------

    def compress(self, X, num_components: int = 32, n_neighbors: int = 15) -> np.ndarray:
        """Per-country-group reduction then hstack (reference cluster.py:253-266).
        UMAP if importable; PCA otherwise (off the hot path either way)."""
        X = np.stack(X).astype(np.float32)
        emb_size = X.shape[1]
        group = emb_size // len(self.countries)
        num_components = min(num_components, max(2, len(X) - 1))
        parts = []
        for i in range(0, emb_size, group):
            block = X[:, i : i + group]
            try:
                import umap

                parts.append(umap.UMAP(n_components=num_components, n_neighbors=n_neighbors).fit_transform(block))
            except ImportError:
                centered = block - block.mean(axis=0)
                _u, _s, vt = np.linalg.svd(centered, full_matrices=False)
                parts.append(centered @ vt[:num_components].T)
        return np.hstack(parts)

    def cluster(self, X, ids, pils, ds, origins, num_clusters: int = 32, num_components: int = 32):
        Xr = self.compress(X, num_components=num_components)
        km = KMeans(n_clusters=num_clusters, random_state=10).fit(Xr)
        clusters = defaultdict(list)
        for i, l in enumerate(km.labels_):
            clusters[int(l)].append((pils[i], ds[i], ids[i], Xr[i], origins[i]))
        centers = []
        for cc in km.cluster_centers_:
            dist = np.linalg.norm(Xr - cc[None], axis=1)
            # reference picks argmax (farthest) — preserved behind the flag
            idx = int(np.argmax(dist) if self.faithful_centers else np.argmin(dist))
            centers.append(Xr[idx])
        ranked = []
        for k, vs in clusters.items():
            vs = sorted(vs, key=lambda v: float(np.linalg.norm(v[3] - centers[k])))
            ranked.append(([(a, b, c, e) for a, b, c, d_, e in vs], self.aggregate(vs)))
        return sorted(ranked, key=lambda kv: kv[1], reverse=True)

    def clustering(self, feature_which: str = "dift-161", k_per_image: int = 5, k: int = 1000,
                   num_clusters: int = 32, num_components: int = 32):
        cache = join(self.cache_path, "clusters")
        os.makedirs(cache, exist_ok=True)
        fp = join(cache, "all.pkl")
        if not os.path.isfile(fp) or self.recache:
            dfs = self.df_PD(k_per_image=k_per_image)
            with open(fp, "wb") as f:
                pickle.dump(dfs, f)
        with open(fp, "rb") as f:
            df, _df_random = pickle.load(f)
        df = df.sort_values(by=["D"], ascending=False).reset_index(drop=True).iloc[:k]
        embs = self.compute_embeddings(df, feature_which=feature_which)
        if not embs[0]:
            return []
        num_clusters = min(num_clusters, len(embs[0]))
        clusters = self.cluster(*embs, num_clusters=num_clusters, num_components=num_components)
        parent = join(self.cache_path, "images", "clusters", str(k), str(num_clusters), "ranked", feature_which)
        os.makedirs(parent, exist_ok=True)
        for i, (members, _score) in enumerate(clusters):
            for j, (pil, _d, idd, _o) in enumerate(members):
                pil.save(join(parent, f"{i}-{j}-{num_clusters}_{idd}.png"))
        return clusters

    def make_figure(self, figure_path: str, k: int, num_clusters: int, hard_limit: int = 6,
                    top_k: int = 5, min_im: int = 5, feature_which: str = "dift-161"):
        dirr = join(self.cache_path, "images", "clusters", str(k), str(num_clusters), "ranked", feature_which)
        if not os.path.isdir(dirr):
            return
        group = defaultdict(list)
        for image_path in os.listdir(dirr):
            cluster_id, idx = image_path.split("-")[:2]
            group[int(cluster_id)].append((int(idx), join(dirr, image_path)))
        parent = join(figure_path, "clusters", "ranked", feature_which, str(num_clusters))
        os.makedirs(parent, exist_ok=True)
        count = 0
        for cid in sorted(group):
            if count == top_k:
                break
            members = sorted(group[cid])
            if len(members) < min_im:
                continue
            vcat([Image.open(p).convert("RGB") for _, p in members[:hard_limit]], vertical_spacing=1).save(
                join(parent, f"{cid}__hard_limit_{hard_limit}__top_k_{top_k}__min_im_{min_im}.png")
            )
            count += 1


def main(argv=None):
    p = argparse.ArgumentParser(description="parallel-dataset mining (reference parallel cluster.py CLI)")
    p.add_argument("-d", "-i", "--dataset_path", required=True)
    p.add_argument("-t", "--typicality_path", required=True)
    p.add_argument("-c", "--cache_path", required=True)
    p.add_argument("-m", "--model_path", default=None)
    p.add_argument("--recache", action="store_true")
    p.add_argument("--cluster", action="store_true")
    p.add_argument("--compute", action="store_true")
    p.add_argument("--make_submission", action="store_true")
    p.add_argument("--submission_path", default=None)
    p.add_argument("--N", type=int, default=100)
    p.add_argument("--t_min", type=float, default=0.0)
    p.add_argument("--t_max", type=float, default=1.0)
    # reference-CLI parity (one CLI serves reference compute.py AND
    # cluster.py, whose short flags collide — -s stays submission-side in
    # MIGRATION.md): flags below are accepted and inert, matching upstream
    # where they are dead (--countries parsed-unused compute.py:297; --seed,
    # --cache_features parsed-unused cluster.py:369,371) or inverted by our
    # explicit --compute (--dont_compute)
    p.add_argument("--dont_compute", action="store_true",
                   help="suppress the compute stage (ours is opt-in via --compute)")
    p.add_argument("--countries", nargs="*", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cache_features", action="store_true")
    p.add_argument("--figures_only", action="store_true",
                   help="skip clustering compute; only regenerate figures")
    p.add_argument("--max_row", type=int, default=6)
    p.add_argument("--min_row", type=int, default=5)
    p.add_argument("--top_k_figure", type=int, default=5)
    p.add_argument("--topk", action="store_true",
                   help="accepted for parity; the reference's parallel --topk "
                   "path calls a method its Cluster does not define "
                   "(cluster.py:395 -> AttributeError upstream) — ignored here")
    p.add_argument("--top_full_images", action="store_true",
                   help="accepted for parity; broken upstream like --topk — ignored")
    p.add_argument("--split_id", type=int, default=0)
    p.add_argument("--sub_split", type=int, default=1)
    p.add_argument("--feature_which", type=str, default="dift-161")
    p.add_argument("--figure_path", type=str, default=None)
    p.add_argument("--num_images", type=int, default=None)
    p.add_argument("--num_clusters", type=int, default=32)
    p.add_argument("--num_components", type=int, default=32)
    p.add_argument("--k", type=int, default=64)
    p.add_argument("--aggregate", default="median", choices=["mean", "median"])
    p.add_argument(
        "--clip_dir", type=str, default=None,
        help="converted CLIPModel dir for the clip feature modes "
        "(reference parallel cluster.py:146 default models/clip-vit-base-patch32)",
    )
    p.add_argument(
        "--mesh_dp", type=int, default=None,
        help="shard the compute stage's sweep batch and the cluster stage's "
        "DIFT ensemble axis over a dp-axis device mesh",
    )
    args = p.parse_args(argv)

    mesh = None
    if args.mesh_dp is not None:
        from diffmining_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.mesh_dp, fsdp=1)

    if args.compute or args.make_submission:
        typ = ParallelTypicality(args.model_path, args.dataset_path, args.typicality_path,
                                 N=args.N, t_min=args.t_min, t_max=args.t_max, mesh=mesh)
        if args.make_submission:
            typ.make_submission(args.dataset_path, args.submission_path, sub_split=args.sub_split)
        if args.compute and not args.dont_compute:
            typ.compute_submission(join(args.submission_path, f"{args.split_id}.txt"))
        return

    k = 10000 if args.num_images is None else args.num_images
    cl = ParallelCluster(
        args.typicality_path, args.dataset_path, args.cache_path, args.recache,
        model_path=args.model_path, aggregate=args.aggregate, kx=args.k, ky=args.k,
        clip_dir=args.clip_dir, mesh=mesh,
    )
    if args.cluster and not args.figures_only:
        cl.clustering(args.feature_which, k=k, num_clusters=args.num_clusters, num_components=args.num_components)
    if args.figure_path:
        cl.make_figure(args.figure_path, k=k, num_clusters=args.num_clusters,
                       feature_which=args.feature_which, hard_limit=args.max_row,
                       top_k=args.top_k_figure, min_im=args.min_row)


if __name__ == "__main__":
    main()
