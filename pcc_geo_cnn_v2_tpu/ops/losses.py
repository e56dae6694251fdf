"""Training losses: α-balanced focal loss and the rate term.

Numerics mirror the reference exactly — sums, not means, with clip bounds
[1e-3, 0.999] (``/root/reference/src/utils/focal_loss.py:5-12``) and the
bits-per-occupied-voxel normalization ``Σ log p / (−ln2 · Σx)``
(``model_types.py:346-355``) — training RD curves drift otherwise
(SURVEY §7 hard parts).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["focal_loss", "bits_per_occupied_voxel", "rd_loss"]


def focal_loss(y_true, y_pred, gamma=2.0, alpha=0.9):
    """Sum-reduced binary focal loss on occupancy probabilities."""
    pt_1 = jnp.where(y_true == 1, y_pred, jnp.ones_like(y_pred))
    pt_0 = jnp.where(y_true == 0, y_pred, jnp.zeros_like(y_pred))
    pt_1 = jnp.clip(pt_1, 1e-3, 0.999)
    pt_0 = jnp.clip(pt_0, 1e-3, 0.999)
    return -jnp.sum(alpha * (1.0 - pt_1) ** gamma * jnp.log(pt_1)) - jnp.sum(
        (1 - alpha) * pt_0 ** gamma * jnp.log(1.0 - pt_0)
    )


def bits_per_occupied_voxel(likelihoods, num_occupied):
    """Σ log p / (−ln2 · Σx): mean bits per occupied input voxel."""
    return jnp.sum(jnp.log(likelihoods)) / (-np.log(2) * num_occupied)


def binary_classification_metrics(x, x_tilde):
    """Precision/recall/accuracy/specificity/F1 on rounded occupancy
    (reference ``model_types.py:90-105``)."""
    xq = jnp.round(jnp.clip(x, 0, 1))
    xtq = jnp.round(jnp.clip(x_tilde, 0, 1))
    tp = jnp.sum(xtq * xq)
    tn = jnp.sum((1 - xtq) * (1 - xq))
    fp = jnp.sum(xtq * (1 - xq))
    fn = jnp.sum((1 - xtq) * xq)
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    return {
        "bc_precision": precision,
        "bc_recall": recall,
        "bc_accuracy": (tp + tn) / (tp + tn + fp + fn),
        "bc_specificity": tn / (tn + fp),
        "bc_f1": 2 * precision * recall / (precision + recall),
    }


def rd_loss(x, x_tilde, likelihoods_list, lmbda, gamma=2.0, alpha=0.9):
    """λ·focal + Σ mbpov — the reference's training objective.

    :param likelihoods_list: [y_likelihoods] (v1) or [y, z] (v2).
    :return: (loss, dict of scalars for logging)
    """
    num_occupied = jnp.sum(x)
    fl = focal_loss(x, x_tilde, gamma=gamma, alpha=alpha)
    mbpovs = [bits_per_occupied_voxel(p, num_occupied) for p in likelihoods_list]
    mbpov = sum(mbpovs)
    loss = lmbda * fl + mbpov
    logs = {"loss": loss, "focal_loss": fl, "mbpov": mbpov,
            "num_occupied_voxels": num_occupied}
    for name, v in zip(("mbpov_y", "mbpov_z"), mbpovs):
        logs[name] = v
    logs.update(binary_classification_metrics(x, x_tilde))
    return loss, logs
