"""A dict-based emulator of the reference's Feature_Fields update semantics.

Mirrors update_feature_fields / delete_old_features_from_camera_frustum
(vlnce_baselines/models/feature_fields.py:493-816,329-396) the way the torch
code executes them — Python loops, dict id maps, sequential merges — but with
slot-consistent id reuse (the intentional divergence documented in
memory3d/state.py).  Shares the SAME jax module weights so outputs are
comparable tensor-for-tensor with the batched TPU update.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dynam3d_tpu.geom.projection import unproject_depth_habitat
from dynam3d_tpu.models.memory3d.state import cell_center
from dynam3d_tpu.models.memory3d.update import (
    _merge_discriminator,
    _patch_pos_embedding_input,
)
from dynam3d_tpu.ops.transformer import encoder_stack, mlp2


class RefEmulator:
    def __init__(self, params, cfg):
        self.p = params
        self.cfg = cfg
        self.heads = max(1, cfg.fts_dim // 64)
        # slot tables (slot-consistent variant of the reference's lists)
        P, I, Z = cfg.patch_capacity, cfg.instance_capacity, cfg.zone_capacity
        self.patch_pos = np.full((P, 3), -10000.0, np.float32)
        self.patch_fts = np.zeros((P, cfg.fts_dim), np.float32)
        self.patch_dir = np.zeros((P,), np.float32)
        self.patch_scale = np.zeros((P,), np.float32)
        self.patch_valid = np.zeros((P,), bool)
        self.patch_to_instance = {}
        self.instance_to_patch = {}
        self.inst_pos = np.full((I, 3), -10000.0, np.float32)
        self.inst_fts = np.zeros((I, cfg.fts_dim), np.float32)
        self.inst_valid = np.zeros((I,), bool)
        self.zone_key_to_id = {}
        self.zone_pos = np.full((Z, 3), -10000.0, np.float32)
        self.zone_fts = np.zeros((Z, cfg.fts_dim), np.float32)
        self.zone_valid = np.zeros((Z,), bool)

    # -- id allocators (smallest free slot, ":433-475") --
    def _free(self, valid, n):
        out = [i for i in range(len(valid)) if not valid[i]][:n]
        return out

    def _aggregate(self, fts, pos, dirs, scales, center):
        emb = _patch_pos_embedding_input(
            jnp.asarray(pos), jnp.asarray(center), jnp.asarray(dirs),
            jnp.asarray(scales),
        )
        tokens = jnp.asarray(fts) + mlp2(self.p["patch_pos_mlp"], emb)
        tokens = jnp.concatenate([self.p["p2i_agg_token"], tokens], axis=0)
        return np.asarray(encoder_stack(self.p["p2i_encoder"], tokens, self.heads)[0])

    def _aggregate_zone(self, inst_fts, member_pos_eff, zone_pos):
        rel = np.asarray(member_pos_eff) - zone_pos
        dist = np.linalg.norm(member_pos_eff, axis=-1, keepdims=True)
        emb = jnp.asarray(np.concatenate([rel, dist], -1).astype(np.float32))
        tokens = jnp.asarray(inst_fts) + mlp2(self.p["inst_pos_mlp"], emb)
        tokens = jnp.concatenate([self.p["i2z_agg_token"], tokens], axis=0)
        return np.asarray(encoder_stack(self.p["i2z_encoder"], tokens, self.heads)[0])

    def _cell(self, pos):
        return np.asarray(cell_center(jnp.asarray(pos, jnp.float32), self.cfg))

    # ------------------------------------------------------------------
    def update(self, depth, grid_fts, segm, position, heading):
        cfg = self.cfg
        H, W = cfg.input_height, cfg.input_width
        rx, ry, rz, pdir, pscale = unproject_depth_habitat(
            jnp.asarray(depth), jnp.asarray(heading), height=H, width=W,
            hfov_deg=cfg.input_hfov, vfov_deg=cfg.input_vfov,
        )
        ppos = np.asarray(jnp.stack([rx, ry, rz], -1)) + np.asarray(position)
        pdir = np.asarray(pdir)
        pscale = np.asarray(pscale)
        grid_fts = np.asarray(grid_fts, np.float32)
        segm = np.asarray(segm)

        # write patches into free slots
        slots = self._free(self.patch_valid, H * W)
        for j, s in enumerate(slots):
            self.patch_pos[s] = ppos[j]
            self.patch_fts[s] = grid_fts[j]
            self.patch_dir[s] = pdir[j]
            self.patch_scale[s] = pscale[j]
            self.patch_valid[s] = True

        # per-segment aggregation in segment-id order (torch.unique is sorted)
        seg_ids = sorted(set(segm.tolist()))
        seg_fts, seg_centers = {}, {}
        for sid in seg_ids:
            m = segm == sid
            center = ppos[m].mean(0)
            seg_centers[sid] = center
            seg_fts[sid] = self._aggregate(
                grid_fts[m], ppos[m], pdir[m], pscale[m], center
            )

        prev_valid = self.inst_valid.copy()
        prev_pos = self.inst_pos.copy()
        prev_fts = self.inst_fts.copy()
        any_valid = prev_valid.any()

        K = cfg.num_proposal_instances
        # proposals against the PRE-view table
        merges = {}
        if any_valid:
            d2 = ((np.stack([seg_centers[s] for s in seg_ids])[:, None]
                   - prev_pos[None]) ** 2).sum(-1)
            d2[:, ~prev_valid] = 1e10
            order = np.argsort(d2, axis=1)[:, :K]
            dsel = np.take_along_axis(d2, order, axis=1)
            col_ok = (dsel < 1e6).all(0)
            k_eff = 0
            for c in range(K):
                if col_ok[c]:
                    k_eff += 1
                else:
                    break
            for si, sid in enumerate(seg_ids):
                chosen = None
                for c in range(k_eff):
                    iid = int(order[si, c])
                    x = np.concatenate(
                        [prev_fts[iid], seg_fts[sid],
                         seg_centers[sid] - prev_pos[iid]]
                    )
                    logits = np.asarray(
                        _merge_discriminator(self.p["merge_disc"], jnp.asarray(x[None]))
                    )[0]
                    if logits[1] > logits[0]:
                        chosen = iid
                        break
                if chosen is not None:
                    merges[sid] = chosen

        # allocate new instances in segment order
        new_segs = [s for s in seg_ids if s not in merges]
        new_ids = self._free(self.inst_valid, len(new_segs))
        for sid, iid in zip(new_segs, new_ids):
            self.inst_pos[iid] = seg_centers[sid]
            self.inst_fts[iid] = seg_fts[sid]
            self.inst_valid[iid] = True
            self.instance_to_patch[iid] = []

        owner_of_seg = {**merges, **dict(zip(new_segs, new_ids))}
        for j, s in enumerate(slots):
            iid = owner_of_seg[int(segm[j])]
            self.patch_to_instance[s] = iid
            self.instance_to_patch.setdefault(iid, []).append(s)

        # re-aggregate merged instances with final membership
        for iid in sorted(set(merges.values())):
            members = self.instance_to_patch[iid]
            mp = self.patch_pos[members]
            self.inst_pos[iid] = mp.mean(0)
            self.inst_fts[iid] = self._aggregate(
                self.patch_fts[members], mp, self.patch_dir[members],
                self.patch_scale[members], self.inst_pos[iid],
            )

        # zones touched by the SEGMENT centers (reference quirk)
        touched = {}
        for sid in seg_ids:
            key = tuple(self._cell(seg_centers[sid]).tolist())
            touched[key] = True
        inst_cells = self._cell(self.inst_pos)
        for key in sorted(touched):
            members = [
                i for i in range(len(self.inst_valid))
                if self.inst_valid[i] and tuple(inst_cells[i].tolist()) == key
            ]
            if not members:
                continue
            exists = key in self.zone_key_to_id
            if exists:
                zid = self.zone_key_to_id[key]
                member_pos_eff = np.tile(np.asarray(key, np.float32), (len(members), 1))
            else:
                zid = self._free(self.zone_valid, 1)[0]
                self.zone_key_to_id[key] = zid
                member_pos_eff = self.inst_pos[members]
            zpos = member_pos_eff.mean(0)
            self.zone_pos[zid] = zpos
            self.zone_fts[zid] = self._aggregate_zone(
                self.inst_fts[members], member_pos_eff, zpos
            )
            self.zone_valid[zid] = True
