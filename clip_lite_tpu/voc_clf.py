"""VOC07 SVM classification evaluation.

Equivalent of the reference's voc_clf.py (:71-278): extract L2-normalized
pooled features from the frozen image tower for the trainval and test
splits, train a per-class LinearSVC over costs {0.01, 0.1, 1, 10} with
3-fold cross-validated AP, pick the best cost per class, and report test
mAP.  Supports sweeping a directory of checkpoints (the climax snapshots)
and appends results to ``voc07_mAP.txt`` (reference :176-270).

Feature extraction is TPU-side (jitted, fixed batch); the SVM stays
host-side sklearn exactly as in the reference.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np

from clip_lite_tpu.config import Config
from clip_lite_tpu.eval_utils import EncoderBundle
from clip_lite_tpu.factories import DownstreamDatasetFactory
from clip_lite_tpu.data.pipeline import DataLoader
from clip_lite_tpu.utils.common import (
    apply_platform_args,
    common_parser,
    common_setup,
)

parser = common_parser(description="VOC07 SVM classification eval.")
parser.add_argument("--pretrain-config", required=True)
parser.add_argument("--pretrain-config-override", nargs="*", default=[])
parser.add_argument("--checkpoint-path", default=None,
                    help="Single checkpoint to evaluate.")
parser.add_argument("--checkpoints-glob", default=None,
                    help="Glob of checkpoints to sweep (climax snapshots).")
parser.add_argument("--batch-size", type=int, default=128)
parser.add_argument("--costs", type=float, nargs="*",
                    default=[0.01, 0.1, 1.0, 10.0])
parser.add_argument("--num-folds", type=int, default=3)
parser.add_argument("--project", action="store_true",
                    help="Use the critic's projection head on top of the "
                         "pooled features (reference uses loss.img_block, "
                         "voc_clf.py:178).")


def extract_features(bundle: EncoderBundle, dataset, batch_size: int,
                     workers: int):
    loader = DataLoader(dataset, batch_size, shuffle=False, drop_last=False,
                        num_workers=workers, background=False)
    feats, labels = [], []
    for batch in loader:
        feats.append(bundle.encode_images(np.asarray(batch["image"])))
        labels.append(np.asarray(batch["label"]))
    return np.concatenate(feats), np.concatenate(labels)


def svm_map(train_feats, train_labels, test_feats, test_labels,
            costs, num_folds, logger) -> float:
    """Per-class cost selection by k-fold CV AP, then test AP
    (reference: voc_clf.py:71-120)."""
    from sklearn.metrics import average_precision_score
    from sklearn.model_selection import KFold
    from sklearn.svm import LinearSVC

    num_classes = train_labels.shape[1]
    test_aps = []
    for cls in range(num_classes):
        y_tr = train_labels[:, cls]
        keep_tr = y_tr != -1  # -1 = ignore (difficult)
        Xtr, ytr = train_feats[keep_tr], y_tr[keep_tr]

        best_cost, best_cv = None, -1.0
        for cost in costs:
            cv_aps = []
            kf = KFold(n_splits=num_folds, shuffle=True, random_state=0)
            for tr_idx, va_idx in kf.split(Xtr):
                if len(set(ytr[tr_idx])) < 2:
                    continue
                clf = LinearSVC(C=cost, class_weight={1: 2, 0: 1},
                                max_iter=2000, dual="auto")
                clf.fit(Xtr[tr_idx], ytr[tr_idx])
                scores = clf.decision_function(Xtr[va_idx])
                if len(set(ytr[va_idx])) == 2:
                    cv_aps.append(average_precision_score(
                        ytr[va_idx], scores))
            mean_ap = float(np.mean(cv_aps)) if cv_aps else 0.0
            if mean_ap > best_cv:
                best_cv, best_cost = mean_ap, cost

        clf = LinearSVC(C=best_cost, class_weight={1: 2, 0: 1},
                        max_iter=2000, dual="auto")
        clf.fit(Xtr, ytr)
        y_te = test_labels[:, cls]
        keep_te = y_te != -1
        scores = clf.decision_function(test_feats[keep_te])
        ap = average_precision_score(y_te[keep_te], scores)
        test_aps.append(ap)
        logger.info("class %d: cost %s, CV AP %.4f, test AP %.4f",
                    cls, best_cost, best_cv, ap)
    return 100.0 * float(np.mean(test_aps))


def main(_A) -> None:
    apply_platform_args(_A)
    _C_down = Config(_A.config, list(_A.config_override))
    _C = Config(_A.pretrain_config, list(_A.pretrain_config_override))
    logger = common_setup(_C_down, _A, job_type="voc_clf")

    train_ds = DownstreamDatasetFactory.from_config(_C_down, split="trainval")
    test_ds = DownstreamDatasetFactory.from_config(_C_down, split="test")

    checkpoints = []
    if _A.checkpoint_path:
        checkpoints.append(_A.checkpoint_path)
    if _A.checkpoints_glob:
        checkpoints += sorted(glob.glob(_A.checkpoints_glob))
    if not checkpoints:
        raise SystemExit("Provide --checkpoint-path or --checkpoints-glob")

    results = {}
    out_path = os.path.join(_A.serialization_dir, "voc07_mAP.txt")
    for ckpt in checkpoints:
        logger.info("Evaluating %s", ckpt)
        bundle = EncoderBundle(_C, ckpt, batch_size=_A.batch_size,
                               project=_A.project, normalize=True)
        tr_f, tr_l = extract_features(bundle, train_ds, _A.batch_size,
                                      _A.cpu_workers)
        te_f, te_l = extract_features(bundle, test_ds, _A.batch_size,
                                      _A.cpu_workers)
        m = svm_map(tr_f, tr_l, te_f, te_l, _A.costs, _A.num_folds, logger)
        results[ckpt] = m
        logger.info("%s: VOC07 mAP %.2f", ckpt, m)
        with open(out_path, "a") as f:
            f.write(f"{ckpt}\t{m:.4f}\n")

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main(parser.parse_args())
