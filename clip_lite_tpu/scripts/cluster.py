"""Caption clustering for the hard-negative curriculum.

Equivalent of the reference's scripts/cluster.py (:109-192), which
SBERT-encodes every caption and runs **faiss GPU k-means**.  Here k-means
is a from-scratch JAX implementation — assignment is one big matmul on
the MXU (the exact workload TPUs are built for), Lloyd updates via
segment_sum — and the embedder is pluggable:

  * a trained checkpoint's text tower (the natural offline choice), or
  * sentence-transformers when available (reference parity).

Emits the same artifacts the clustered dataset consumes
(data/datasets.py CocoCaptionsClusteredDataset; reference
dataloader.py:609-664): ``img_id_cluster_map_{split}_{k}.pkl`` for each k,
plus ``img_id_caption_map_{split}.pkl`` and
``img_id_filename_map_{split}.pkl``.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--coco-root", required=True,
                    help="Raw COCO root (annotations/ + images/).")
parser.add_argument("--split", default="train")
parser.add_argument("--output-dir", required=True)
parser.add_argument("--min-clusters", type=int, default=2)
parser.add_argument("--max-clusters", type=int, default=10)
parser.add_argument("--iters", type=int, default=50)
parser.add_argument("--pretrain-config", default=None,
                    help="Config of a trained checkpoint to embed captions.")
parser.add_argument("--checkpoint-path", default=None)
parser.add_argument("--embeddings-file", default=None,
                    help="Precomputed (N, D) .npy of caption embeddings "
                         "(ordered by image id) to skip encoding.")


def kmeans(x, k: int, iters: int, seed: int = 0):
    """Plain Lloyd k-means, fully on-device: one (N, D) x (D, k) matmul per
    assignment step."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    key = jax.random.PRNGKey(seed)
    centers = x[jax.random.choice(key, n, (k,), replace=False)]
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)

    @jax.jit
    def step(centers):
        # argmin_j ||x - c_j||^2 == argmax_j (x.c_j - ||c_j||^2/2)
        logits = x @ centers.T - 0.5 * jnp.sum(centers * centers, axis=1)
        assign = jnp.argmax(logits, axis=1)
        sums = jax.ops.segment_sum(x, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,)), assign, num_segments=k)
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        # Keep empty clusters where they were.
        new_centers = jnp.where((counts > 0)[:, None], new_centers, centers)
        return new_centers, assign

    assign = None
    for _ in range(iters):
        centers, assign = step(centers)
    return np.asarray(assign), np.asarray(centers)


def load_image_captions(coco_root: str, split: str):
    ann = os.path.join(coco_root, f"annotations/captions_{split}2017.json")
    with open(ann) as f:
        data = json.load(f)
    cap_by_img, file_by_img = {}, {}
    for a in data["annotations"]:
        cap_by_img.setdefault(a["image_id"], []).append(a["caption"])
    for img in data["images"]:
        file_by_img[img["id"]] = f"images/{split}2017/{img['file_name']}"
    img_ids = sorted(i for i in cap_by_img if i in file_by_img)
    return img_ids, cap_by_img, file_by_img


def embed_captions(args, img_ids, cap_by_img) -> np.ndarray:
    """One embedding per image: mean of its caption embeddings."""
    if args.embeddings_file:
        return np.load(args.embeddings_file)
    if args.pretrain_config:
        from clip_lite_tpu.config import Config
        from clip_lite_tpu.eval_utils import EncoderBundle
        from clip_lite_tpu.factories import TokenizerFactory

        cfg = Config(args.pretrain_config)
        bundle = EncoderBundle(cfg, args.checkpoint_path, project=False,
                               normalize=True)
        tokenizer = TokenizerFactory.from_config(cfg)
        embs = []
        for img_id in img_ids:
            caps = cap_by_img[img_id]
            embs.append(bundle.encode_texts(caps, tokenizer).mean(0))
        return np.stack(embs)
    try:
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer("all-mpnet-base-v2")
        return np.stack([
            np.asarray(model.encode(cap_by_img[i])).mean(0) for i in img_ids])
    except ImportError as e:
        raise SystemExit(
            "Provide --pretrain-config/--checkpoint-path or "
            "--embeddings-file (sentence-transformers unavailable)") from e


def main(args) -> None:
    img_ids, cap_by_img, file_by_img = load_image_captions(
        args.coco_root, args.split)
    embeddings = embed_captions(args, img_ids, cap_by_img)
    os.makedirs(args.output_dir, exist_ok=True)

    with open(os.path.join(
            args.output_dir, f"img_id_caption_map_{args.split}.pkl"),
            "wb") as f:
        pickle.dump({i: cap_by_img[i] for i in img_ids}, f)
    with open(os.path.join(
            args.output_dir, f"img_id_filename_map_{args.split}.pkl"),
            "wb") as f:
        pickle.dump({i: file_by_img[i] for i in img_ids}, f)

    for k in range(args.min_clusters, args.max_clusters + 1):
        assign, _ = kmeans(embeddings, k, args.iters)
        out = os.path.join(
            args.output_dir, f"img_id_cluster_map_{args.split}_{k}.pkl")
        with open(out, "wb") as f:
            pickle.dump({img_id: int(c) for img_id, c in
                         zip(img_ids, assign)}, f)
        sizes = np.bincount(assign, minlength=k)
        print(f"k={k}: cluster sizes {sizes.tolist()}")


if __name__ == "__main__":
    main(parser.parse_args())
