"""3DFF pretraining losses — masked, fixed-shape ports of the reference's
loss family (src_3dff/ss_trainer_3DFF.py:620-651,1053-1111 and
src_3dff/models/feature_fields.py:1303-1340):

  - cosine alignment (1 - cos) and subspace (mean-subtracted) variants
  - bidirectional InfoNCE contrastive loss, logit scale 10
  - category-classification focal loss: CE mean + mean of the top-10%-hardest
  - merge-discriminator CE with true/false class balancing (":1040-1046")

All take validity masks instead of the reference's dynamic filtering, so they
jit with static shapes; the focal top-k uses a dynamic-count mask over the
sorted losses, matching the reference's ``max(int(0.1*N),1)`` exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-5


def l2n(x: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def cosine_loss(pred: jnp.ndarray, tgt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over mask of ``1 - cos(pred, tgt)`` (inputs unnormalized)."""
    c = jnp.sum(l2n(pred) * l2n(tgt), axis=-1)
    return jnp.sum((1.0 - c) * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def subspace_cosine_loss(
    pred: jnp.ndarray, tgt: jnp.ndarray, pred_mean: jnp.ndarray,
    tgt_mean: jnp.ndarray, mask: jnp.ndarray,
) -> jnp.ndarray:
    """Cosine loss after subtracting per-view means (":1311-1316")."""
    return cosine_loss(pred - pred_mean, tgt - tgt_mean, mask)


def contrastive_loss(
    f1: jnp.ndarray, f2: jnp.ndarray, mask: jnp.ndarray, logit_scale: float = 10.0
) -> jnp.ndarray:
    """Bidirectional diagonal InfoNCE (ss_trainer_3DFF.py:626-638).

    Rows/cols with ``mask=False`` are excluded from both the softmax and the
    mean; inputs are normalized here (call sites normalize before, we fold it
    in for safety — cos-sim is what the reference computes after its norms).
    """
    a = l2n(f1)
    b = l2n(f2)
    sim = logit_scale * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    sim_masked = jnp.where(mask[None, :], sim, neg)

    def nce(s):
        # keep one finite entry per row so log_softmax of fully-masked rows
        # stays finite (their diagonal is zeroed below anyway)
        s = jnp.where(jnp.all(s <= neg / 2, axis=-1, keepdims=True), 0.0, s)
        lp = jax.nn.log_softmax(s, axis=-1)
        diag = jnp.where(mask, jnp.diagonal(lp), 0.0)
        return -jnp.sum(diag) / jnp.maximum(jnp.sum(mask), 1.0)

    return nce(sim_masked) + nce(jnp.where(mask[None, :], sim.T, neg))


def focal_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray,
    focal_rate: float = 0.1,
) -> jnp.ndarray:
    """CE mean + top-``max(0.1*N,1)``-hardest mean (ss_trainer_3DFF.py:620-624)."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(lp, jnp.maximum(targets, 0)[..., None], axis=-1)[..., 0]
    ce = jnp.where(mask, ce, 0.0)
    n = jnp.sum(mask)
    mean = jnp.sum(ce) / jnp.maximum(n, 1.0)
    k_dyn = jnp.maximum((focal_rate * n).astype(jnp.int32), 1)
    # -1 (not -inf) sentinel: with zero valid rows the top-k must stay finite
    sorted_ce = jnp.sort(jnp.where(mask, ce, -1.0))[::-1]
    in_topk = (jnp.arange(ce.shape[0]) < k_dyn) & (sorted_ce >= 0)
    topk_mean = jnp.sum(jnp.where(in_topk, sorted_ce, 0.0)) / jnp.maximum(
        jnp.sum(in_topk), 1
    )
    return jnp.where(n > 0, mean + topk_mean, 0.0)


def balanced_merge_ce(
    merge_logit: jnp.ndarray,   # [N] logit(merge) - logit(no-merge)
    target: jnp.ndarray,        # [N] {0,1}
    valid: jnp.ndarray,         # [N]
) -> jnp.ndarray:
    """Class-balanced CE over min(#true, #false) samples each
    (feature_fields.py:1040-1046).  With a scalar logit margin, CE reduces to
    softplus; balancing uses per-class means weighted by the smaller count
    (equal to the reference's truncated-mean up to sample selection order)."""
    t = target.astype(jnp.float32)
    v = valid.astype(jnp.float32)
    n_true = jnp.sum(t * v)
    n_false = jnp.sum((1 - t) * v)
    m = jnp.minimum(n_true, n_false)
    ce = jnp.logaddexp(0.0, jnp.where(target == 1, -merge_logit, merge_logit))
    true_mean = jnp.sum(ce * t * v) / jnp.maximum(n_true, 1.0)
    false_mean = jnp.sum(ce * (1 - t) * v) / jnp.maximum(n_false, 1.0)
    return jnp.where(m > 0, 0.5 * (true_mean + false_mean), 0.0)
