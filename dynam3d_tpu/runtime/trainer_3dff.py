"""3DFF pretraining trainer ("SS-ETP" in the reference registry).

TPU redesign of ``RLTrainer`` (src_3dff/ss_trainer_3DFF.py:63-2271).  The
reference's five dataset drivers (hm3d/scannet/3rscan/arkit/structured3d,
":733-2233") reduce to two shapes:

  - a *walk* driver: a simulator feed provides posed panoramas along a
    random/teacher walk, plus novel-view renders for supervision (hm3d);
  - a *posed-frames* driver: N posed RGB-D frames from disk are folded into
    the memory in one update, then rendered back (scannet/3rscan/
    arkit/structured3d; the latter two skip instance-label supervision).

Per iteration, a dataset id is drawn and synced across hosts (the
``distr.broadcast(src=0)`` at ":2239-2242" becomes a seeded host-agreed
draw).  AdamW lr 1e-5, grad-VALUE clip 10, all-ranks NaN skip (":504-519").

The device-side loss assembly (``pretrain_step_loss``) fuses: memory-update
alignment (instance/zone/subspace/contrastive), merge-discriminator CE,
novel-view rendering losses (cos x5 + subspace x2 + NCE/5), category focal
CE /10, and instance/zone-text alignment (NCE/5 + category CE/10), mirroring
":1053-1111" and feature_fields.py:1303-1340.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from dynam3d_tpu.config import Dynam3DConfig
from dynam3d_tpu.models.memory3d.pretrain import update_view_pretrain
from dynam3d_tpu.models.memory3d.state import FieldState
from dynam3d_tpu.models.render.nerf import render_view, render_view_posed
from dynam3d_tpu.ops.knn import knn_brute
from dynam3d_tpu.runtime.losses_3dff import (
    balanced_merge_ce,
    contrastive_loss,
    cosine_loss,
    focal_loss,
    l2n,
    subspace_cosine_loss,
)

Params = Dict[str, Any]


class PretrainBatch(NamedTuple):
    """One pretraining step's device inputs (single scene/episode element)."""

    depth: jnp.ndarray          # [V,HW] metric 24x24 depth
    grid_fts: jnp.ndarray       # [V,HW,D] CLIP patch features
    cls_fts: jnp.ndarray        # [V,D] CLIP CLS features (zone target)
    segm: jnp.ndarray           # [V,HW]
    position: jnp.ndarray       # [V,3] world frame
    heading: jnp.ndarray        # [V]
    gt_xyz: jnp.ndarray         # [G,3] gt point cloud
    gt_label: jnp.ndarray       # [G]
    gt_valid: jnp.ndarray       # [G]
    novel_position: jnp.ndarray  # [Nv,3]
    novel_heading: jnp.ndarray   # [Nv]
    novel_gt_fts: jnp.ndarray    # [Nv,R,D] avg-pooled CLIP targets
    cat_embeddings: jnp.ndarray  # [C,D] category text embeddings
    gtid_to_cat: jnp.ndarray     # [L] gt-instance-id -> category idx (-1 none)
    gtid_text_fts: jnp.ndarray   # [L,D] gt-instance-id -> caption text feature
    gtid_text_valid: jnp.ndarray  # [L]
    use_labels: jnp.ndarray      # scalar bool — False for arkit/structured3d
    # per-patch world geometry, precomputed host-side per view: habitat-mode
    # unprojection for simulator feeds, full-pose (K,R,T) geometry for
    # posed-frame datasets (geom.patch_geometry_from_pose; reference generic-
    # intrinsics branch, feature_fields.py:905-916)
    ppos: jnp.ndarray            # [V,HW,3] world patch positions
    pdir: jnp.ndarray            # [V,HW] patch directions
    pscale: jnp.ndarray          # [V,HW] patch scales
    # posed novel-view cameras (FramesDriver): one shared view-scaled K (the
    # reference's init_camera_intrinsic from frame 0 — it renders every view
    # back with per-view R,T but the frame-0 rays, ss_trainer_3DFF.py:
    # 1271-1273 + feature_fields.py:851-856).  None / ignored when the step
    # is built with posed=False.
    novel_k: Any = None          # [3,3]
    novel_rot: Any = None        # [Nv,3,3]
    novel_trans: Any = None      # [Nv,3]


def pretrain_step_loss(
    params: Params,
    cfg: Dynam3DConfig,
    state: FieldState,
    batch: PretrainBatch,
    max_gt_label: int = 512,
    posed: bool = False,
) -> Tuple[jnp.ndarray, FieldState, Dict[str, jnp.ndarray]]:
    f = cfg.fields

    # ---- fold views, collecting pretrain aux ----
    # remat the per-view update: without it the backward pass saves every
    # scan iteration's re-aggregation activations ([V, S, members+1, 4D]
    # f32 residuals — 15 GiB at V=16 full dims, OOM on a 16 GiB v5e); the
    # reference leans on torch autograd's per-call graphs + its GPU-memory
    # gate instead (feature_fields.py:1129-1137)
    @jax.checkpoint
    def step(st, xs):
        d, g, sg, pos, hd, pp, pd, ps = xs
        st, aux = update_view_pretrain(
            params["fields"], st, f, d, g, sg, pos, hd,
            batch.gt_xyz, batch.gt_label, batch.gt_valid, max_gt_label,
            geometry=(pp, pd, ps),
        )
        return st, aux

    state, aux = jax.lax.scan(
        step, state,
        (batch.depth, batch.grid_fts, batch.segm, batch.position, batch.heading,
         batch.ppos, batch.pdir, batch.pscale),
    )  # aux leaves have leading [V]

    loss, metrics = losses_after_update(
        params, cfg, state, aux, batch, posed=posed
    )
    return loss, state, metrics


def losses_after_update(
    params: Params,
    cfg: Dynam3DConfig,
    state: FieldState,
    aux,                           # PretrainAux stacked over [V] views
    batch,                         # PretrainBatch or WalkBatch (same fields)
    posed: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The full 3DFF loss family given a folded state + per-view aux.

    Shared by the posed-frames path (pretrain_step_loss) and the hm3d walk
    path (walk_step_loss) — the reference computes the identical terms in
    both run_on_hm3d (":1053-1111") and run_on_scannet (":1263-1340").
    """
    f = cfg.fields
    V = aux.base.seg_active.shape[0]
    S = f.max_segments

    act = aux.base.seg_active.reshape(-1)                      # [V*S]
    seg_fts = aux.base.seg_fts.reshape(-1, f.fts_dim)
    tgt_fts = aux.target_seg_fts.reshape(-1, f.fts_dim)
    pmean = jnp.repeat(aux.patch_mean_fts, S, axis=0)          # [V*S,D]

    # ---- update-time alignment (feature_fields.py:1303-1331) ----
    sim_loss = contrastive_loss(seg_fts, tgt_fts, act) / 5.0
    sim_loss += cosine_loss(seg_fts, tgt_fts, act)
    sim_loss += subspace_cosine_loss(seg_fts, tgt_fts, pmean, pmean, act)
    vmask = jnp.ones((V,), bool)
    sim_loss += contrastive_loss(aux.zone_pred_fts, batch.cls_fts, vmask) / 5.0
    sim_loss += cosine_loss(aux.zone_pred_fts, batch.cls_fts, vmask)
    cls_mean = jnp.mean(batch.cls_fts, axis=0)
    sim_loss += subspace_cosine_loss(
        aux.zone_pred_fts, batch.cls_fts, cls_mean, cls_mean, vmask
    )

    # ---- merge-discriminator CE (":1030-1047") ----
    segm_loss = balanced_merge_ce(
        aux.base.merge_logits.reshape(-1),
        aux.merge_target.reshape(-1),
        aux.merge_valid.reshape(-1) & batch.use_labels,
    )

    # ---- novel-view rendering losses (ss_trainer_3DFF.py:1053-1093) ----
    if posed:
        # FramesDriver: render with the real camera (K, R, T) — the
        # reference's generic-intrinsics branch (feature_fields.py:505-537),
        # preserving camera pitch and the true FOV (NOT position+heading)
        @jax.checkpoint
        def render_one_posed(rot, trans):
            out = render_view_posed(
                params["render"], f, state, batch.novel_k, rot, trans
            )
            return out.features.reshape(-1, f.fts_dim), out.positions.reshape(-1, 3)

        nv_fts, nv_pos = jax.lax.map(
            lambda xs: render_one_posed(*xs), (batch.novel_rot, batch.novel_trans)
        )  # [Nv,R,D], [Nv,R,3]
    else:
        @jax.checkpoint
        def render_one(pos, hd):
            out = render_view(params["render"], f, state, pos, hd)
            return out.features.reshape(-1, f.fts_dim), out.positions.reshape(-1, 3)

        nv_fts, nv_pos = jax.lax.map(
            lambda xs: render_one(*xs), (batch.novel_position, batch.novel_heading)
        )  # [Nv,R,D], [Nv,R,3]
    pred = nv_fts.reshape(-1, f.fts_dim).astype(jnp.float32)
    gt = batch.novel_gt_fts.reshape(-1, f.fts_dim).astype(jnp.float32)
    ray_mask = jnp.ones((pred.shape[0],), bool)
    # subspace x2 (per-view mean subtracted)
    nv_gt_mean = jnp.mean(batch.novel_gt_fts, axis=1, keepdims=True)
    nv_pr_mean = jnp.mean(nv_fts, axis=1, keepdims=True)
    render_loss = 2.0 * cosine_loss(
        (nv_fts - nv_pr_mean).reshape(-1, f.fts_dim),
        (batch.novel_gt_fts - nv_gt_mean).reshape(-1, f.fts_dim),
        ray_mask,
    )
    render_loss += 5.0 * cosine_loss(pred, gt, ray_mask)
    render_loss += contrastive_loss(pred, gt, ray_mask) / 5.0

    # ---- per-ray category focal loss (":895-918,1103-1111") ----
    sqd, nn = knn_brute(
        nv_pos.reshape(-1, 3), batch.gt_xyz, batch.gt_valid, 1
    )
    ray_gt = batch.gt_label[nn[:, 0]]
    ray_ok = (
        (jnp.sqrt(sqd[:, 0]) < f.search_radius)
        & (ray_gt > 0)
        & batch.use_labels
    )
    ray_cat = batch.gtid_to_cat[jnp.clip(ray_gt, 0, batch.gtid_to_cat.shape[0] - 1)]
    ray_ok = ray_ok & (ray_cat >= 0)
    cat_logits = 10.0 * jnp.dot(
        l2n(pred), batch.cat_embeddings.T, preferred_element_type=jnp.float32
    )
    lang_loss = focal_loss(cat_logits, ray_cat, ray_ok) / 10.0

    # ---- instance/zone text alignment (":922-1003,1080-1099") ----
    ipred = aux.inst_pred_fts.reshape(-1, f.fts_dim)
    igt = aux.inst_pred_gt.reshape(-1)
    iok = (igt >= 0) & act & batch.use_labels
    icat = batch.gtid_to_cat[jnp.clip(igt, 0, batch.gtid_to_cat.shape[0] - 1)]
    cat_ok = iok & (icat >= 0)
    inst_logits = 10.0 * jnp.dot(
        l2n(ipred), batch.cat_embeddings.T, preferred_element_type=jnp.float32
    )
    lp = jax.nn.log_softmax(inst_logits, axis=-1)
    ice = -jnp.take_along_axis(lp, jnp.maximum(icat, 0)[:, None], axis=-1)[:, 0]
    text_loss = jnp.sum(ice * cat_ok) / jnp.maximum(jnp.sum(cat_ok), 1.0) / 10.0

    itext = batch.gtid_text_fts[jnp.clip(igt, 0, batch.gtid_text_fts.shape[0] - 1)]
    it_ok = iok & batch.gtid_text_valid[
        jnp.clip(igt, 0, batch.gtid_text_valid.shape[0] - 1)
    ]
    text_loss += contrastive_loss(ipred, itext, it_ok) / 5.0

    # zone-text: first member with a caption (":978-1003" picks one member)
    zgt = aux.zone_member_gt[..., 0].reshape(-1)               # first member
    zpred = aux.zone_pred_zone_fts.reshape(-1, f.fts_dim)
    zok = (
        aux.zone_touch_valid.reshape(-1)
        & (zgt >= 0)
        & batch.use_labels
        & batch.gtid_text_valid[jnp.clip(zgt, 0, batch.gtid_text_valid.shape[0] - 1)]
    )
    ztext = batch.gtid_text_fts[jnp.clip(zgt, 0, batch.gtid_text_fts.shape[0] - 1)]
    text_loss += contrastive_loss(zpred, ztext, zok) / 5.0

    loss = sim_loss + segm_loss + render_loss + lang_loss + text_loss
    metrics = {
        "sim_loss": sim_loss,
        "segm_loss": segm_loss,
        "render_loss": render_loss,
        "lang_loss": lang_loss,
        "text_loss": text_loss,
    }
    return loss, metrics


def make_pretrain_optimizer(cfg: Dynam3DConfig) -> optax.GradientTransformation:
    """AdamW lr 1e-5 with grad-VALUE clip 10 (ss_trainer_3DFF.py:361,517)."""
    return optax.chain(
        optax.clip(cfg.train.grad_clip_value),
        optax.adamw(cfg.train.pretrain_lr),
    )


def make_pretrain_step(cfg: Dynam3DConfig, optimizer, posed: bool = False):
    """Jitted step: NaN-consensus skip (":504-517") + AdamW update.

    Trains the fields modules and the renderer (encoders stay frozen as in
    the reference — CLIP is never updated).  ``posed`` selects the
    generic-intrinsics novel-view render path (one compiled program per
    mode — the walk/frames drivers each keep their own)."""

    def step(trainable, opt_state, field_state, batch: PretrainBatch):
        def loss_fn(tr):
            loss, new_state, metrics = pretrain_step_loss(
                tr, cfg, field_state, batch, posed=posed
            )
            return loss, (new_state, metrics)

        (loss, (new_state, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isnan(g), 0.0, g), grads
        )
        updates, new_opt = optimizer.update(grads, opt_state, trainable)
        new_tr = optax.apply_updates(trainable, updates)
        skip = jnp.isnan(loss)
        new_tr = jax.tree_util.tree_map(
            lambda n, o: jnp.where(skip, o, n), new_tr, trainable
        )
        metrics["loss"] = loss
        metrics["skipped"] = skip
        return new_tr, new_opt, new_state, metrics

    return step


class WalkBatch(NamedTuple):
    """One hm3d walk step's device inputs (single episode element)."""

    rgb12: jnp.ndarray           # [12,Hc,Wc,3] u8 panorama, ccw sensor order
    depth12: jnp.ndarray         # [12,Hd,Wd] normalized depth
    position: jnp.ndarray        # [3] habitat-frame agent position
    heading: jnp.ndarray         # [] agent heading
    gt_xyz: jnp.ndarray          # [G,3] scene gt point cloud (world)
    gt_label: jnp.ndarray        # [G]
    gt_valid: jnp.ndarray        # [G]
    novel_position: jnp.ndarray  # [Nv,3] world-frame sampled camera positions
    novel_heading: jnp.ndarray   # [Nv]
    novel_gt_fts: jnp.ndarray    # [Nv,R,D] pooled CLIP targets of the views
    cat_embeddings: jnp.ndarray  # [C,D]
    gtid_to_cat: jnp.ndarray     # [L]
    gtid_text_fts: jnp.ndarray   # [L,D]
    gtid_text_valid: jnp.ndarray  # [L]
    use_labels: jnp.ndarray      # scalar bool


class _LossInputs(NamedTuple):
    """Duck-typed view of PretrainBatch for losses_after_update."""

    cls_fts: Any
    novel_position: Any
    novel_heading: Any
    novel_gt_fts: Any
    gt_xyz: Any
    gt_label: Any
    gt_valid: Any
    cat_embeddings: Any
    gtid_to_cat: Any
    gtid_text_fts: Any
    gtid_text_valid: Any
    use_labels: Any
    novel_k: Any = None
    novel_rot: Any = None
    novel_trans: Any = None


def walk_step_loss(
    params: Params,
    cfg: Dynam3DConfig,
    state: FieldState,             # batched [1, ...]
    batch: WalkBatch,
) -> Tuple[jnp.ndarray, FieldState, Dict[str, jnp.ndarray]]:
    """One hm3d walk step: panorama fold + novel-view render losses.

    Mirrors run_on_hm3d's per-step work (ss_trainer_3DFF.py:841-918): the
    persisted memory is detached at entry (feature_fields.py:845-848), the
    12-view panorama folds its 4 CLIP views in, and the losses use novel
    views sampled by the HOST at candidate-waypoint poses (":853-876" —
    positions/gt features arrive in the batch; the heatmap that chose them
    came from policy_3dff.waypoint_heatmap).

    INTENTIONAL DIVERGENCE: contrastive (NCE) terms normalize per step over
    this step's rays/instances; the reference concatenates all steps of the
    episode into one NCE matrix (":1056-1099").  Per-step NCE + gradient
    accumulation keeps each device program static-shaped.
    """
    from dynam3d_tpu.models.policy_3dff import perceive_panorama

    state = jax.lax.stop_gradient(state)
    pp = perceive_panorama(
        params, cfg, state,
        batch.rgb12[None], batch.depth12[None],
        batch.position[None], batch.heading[None],
        gt_xyz=batch.gt_xyz[None], gt_label=batch.gt_label[None],
        gt_valid=batch.gt_valid[None],
        with_waypoints=False,
    )
    aux = jax.tree_util.tree_map(lambda x: x[0], pp.aux)
    state1 = jax.tree_util.tree_map(lambda x: x[0], pp.state)

    inputs = _LossInputs(
        cls_fts=pp.cls_fts[0],
        novel_position=batch.novel_position,
        novel_heading=batch.novel_heading,
        novel_gt_fts=batch.novel_gt_fts,
        gt_xyz=batch.gt_xyz,
        gt_label=batch.gt_label,
        gt_valid=batch.gt_valid,
        cat_embeddings=batch.cat_embeddings,
        gtid_to_cat=batch.gtid_to_cat,
        gtid_text_fts=batch.gtid_text_fts,
        gtid_text_valid=batch.gtid_text_valid,
        use_labels=batch.use_labels,
    )
    loss, metrics = losses_after_update(params, cfg, state1, aux, inputs)
    new_state = jax.tree_util.tree_map(lambda x: x[None], state1)
    return loss, new_state, metrics


def make_walk_grad_step(cfg: Dynam3DConfig):
    """Jitted per-step gradient: returns (grads over trainable, new_state,
    metrics).  The driver accumulates grads across the episode and applies
    ONE optimizer update at the end — the reference backpropagates the
    episode-summed loss once per iteration (ss_trainer_3DFF.py:498-519)."""

    def step(trainable, frozen, state, batch: WalkBatch):
        def loss_fn(tr):
            params = {**frozen, **tr}
            loss, new_state, metrics = walk_step_loss(params, cfg, state, batch)
            return loss, (new_state, metrics)

        (loss, (new_state, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)
        metrics["loss"] = loss
        return grads, new_state, metrics

    return step


def apply_accumulated_grads(
    optimizer, trainable, opt_state, grad_sum, n_steps: int
):
    """Episode-end update: mean the accumulated grads, scrub NaNs, apply
    (the reference divides the summed loss by total_actions before its
    single backward, ":1053", and zero-fills NaN grads, ":513-517")."""
    import optax as _optax

    grads = jax.tree_util.tree_map(lambda g: g / max(n_steps, 1), grad_sum)
    grads = jax.tree_util.tree_map(
        lambda g: jnp.where(jnp.isnan(g), 0.0, g), grads
    )
    updates, new_opt = optimizer.update(grads, opt_state, trainable)
    new_tr = _optax.apply_updates(trainable, updates)
    return new_tr, new_opt


def draw_dataset_id(seed: int, iteration: int, n_datasets: int = 5) -> int:
    """Host-agreed dataset choice: all hosts derive the same id from the
    shared seed (replaces ``distr.broadcast(src=0)`` at ":2239-2242")."""
    return int(
        jax.random.randint(
            jax.random.fold_in(jax.random.PRNGKey(seed), iteration),
            (), 0, n_datasets,
        )
    )
