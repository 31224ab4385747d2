"""3DFF pretraining outer loop: walk + posed-frames dataset drivers.

The reference's per-iteration dispatcher draws one of five datasets and runs
its driver (ss_trainer_3DFF.py:2237-2258; hm3d ":733-1115", scannet
":1118-1425", 3rscan ":1429-1741", arkit ":1745-2046", structured3d
":2051-2233").  Those five reduce to two shapes here (see trainer_3dff.py):

  - :class:`WalkDriver` — a simulator feed walks teacher/random waypoints and
    samples 4 novel views per step from candidate positions for rendering
    supervision (hm3d);
  - :class:`FramesDriver` — N random posed RGB-D frames of a scene fold into
    a fresh memory, then render back (scannet/3rscan/arkit/structured3d;
    ``use_labels=False`` for the label-free pair).

Per iteration: host-agreed dataset draw -> driver assembles a
:class:`PretrainBatch` (CLIP runs in a jitted encode pass) -> one jitted
train step -> scalars -> periodic checkpoint.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Protocol, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dynam3d_tpu.config import Dynam3DConfig
from dynam3d_tpu.models.encoders import clip as clip_mod
from dynam3d_tpu.models.memory3d import init_state
from dynam3d_tpu.models.policy import nearest_resize_hw
from dynam3d_tpu.models.encoders.depth_resnet import preprocess_depth
from dynam3d_tpu.models.segmenter import depth_plane_segments
from dynam3d_tpu.geom.projection import (
    habitat_to_world,
    patch_geometry_from_pose,
    scale_intrinsics,
    unproject_depth_habitat,
    view_k,
)
from dynam3d_tpu.runtime import checkpoint as ckpt_mod
from dynam3d_tpu.runtime import trainer_3dff
from dynam3d_tpu.runtime.logging import MetricsLogger


class FrameScene(Protocol):
    """A posed-RGB-D scene sample (scannet-style)."""

    rgb: np.ndarray        # [N,H,W,3] u8
    depth: np.ndarray      # [N,Hd,Wd] normalized
    position: np.ndarray   # [N,3] habitat frame
    heading: np.ndarray    # [N]
    gt_xyz: np.ndarray     # [G,3] world frame
    gt_label: np.ndarray   # [G]
    use_labels: bool


class SyntheticFramesDataset:
    """Procedural posed-frames provider (test/bench stand-in for the disk
    loaders of scannet/3rscan/arkit/structured3d)."""

    def __init__(self, rgb_size=56, depth_size=32, frames=4, seed=0,
                 use_labels=True, posed=False):
        from dynam3d_tpu.runtime.feed import SyntheticRoomFeed

        self._feed = SyntheticRoomFeed(
            rgb_size=rgb_size, depth_size=depth_size, views=1, seed=seed
        )
        self.frames = frames
        self.use_labels = use_labels
        self.posed = posed  # emit (K, R, T) like the disk loaders do
        self.depth_size = depth_size
        self.rng = np.random.default_rng(seed)

    @staticmethod
    def _extrinsic_from_pose(heading: float) -> np.ndarray:
        """camera-to-world R for a level camera at the given heading: camera
        x right, y down, z forward (the posed-dataset convention)."""
        ch, sh = math.cos(heading), math.sin(heading)
        right = np.asarray([ch, sh, 0.0])
        down = np.asarray([0.0, 0.0, -1.0])
        forward = np.asarray([-sh, ch, 0.0])
        return np.stack([right, down, forward], axis=1).astype(np.float32)

    def sample_scene(self):
        self._feed.reset()
        rgbs, depths, poss, hds = [], [], [], []
        for _ in range(self.frames):
            pos = np.asarray(
                [self.rng.uniform(1, 7), 1.25, self.rng.uniform(1, 7)], np.float32
            )
            hd = float(self.rng.uniform(0, 2 * math.pi))
            obs = self._feed.get_observation(pos, hd)
            rgbs.append(obs.rgb[0])
            depths.append(obs.depth[0])
            poss.append(pos)
            hds.append(hd)
        G = 128
        gt_xyz = self.rng.uniform(0, 8, (G, 3)).astype(np.float32)
        gt_xyz[:, 2] = self.rng.uniform(0, 2.5, G)
        scene = dict(
            rgb=np.stack(rgbs),
            depth=np.stack(depths),
            position=np.stack(poss),
            heading=np.asarray(hds, np.float32),
            gt_xyz=gt_xyz,
            gt_label=self.rng.integers(1, 32, G).astype(np.int32),
            use_labels=self.use_labels,
        )
        if self.posed:
            from dynam3d_tpu.geom.projection import habitat_to_world

            ds = self.depth_size
            k = np.eye(3, dtype=np.float32)
            k[0, 0] = k[1, 1] = ds / 2.0  # hfov 90 pinhole
            k[0, 2] = k[1, 2] = ds / 2.0
            world = np.asarray(habitat_to_world(np.stack(poss)))
            rots = np.stack(
                [self._extrinsic_from_pose(hds[i]) for i in range(self.frames)]
            )
            scene.update(
                intrinsics=np.tile(k, (self.frames, 1, 1)),
                rot=rots,
                trans=world.astype(np.float32),
            )
        return scene


def synthetic_supervision(seed: int, fts_dim: int, n_points: int = 128,
                          n_cats: int = 16, max_label: int = 64) -> Dict:
    """Random gt pcd + category/caption tables (test/bench stand-in for the
    HM3DSemanticIndex + SceneVerse blobs)."""
    rng = np.random.default_rng(seed)
    gt_xyz = rng.uniform(0, 8, (n_points, 3)).astype(np.float32)
    gt_xyz[:, 2] = rng.uniform(0, 2.5, n_points)
    return dict(
        gt_xyz=gt_xyz,
        gt_label=rng.integers(1, max_label, n_points).astype(np.int32),
        cat_embeddings=rng.normal(size=(n_cats, fts_dim)).astype(np.float32),
        gtid_to_cat=rng.integers(-1, n_cats, max_label).astype(np.int32),
        gtid_text_fts=rng.normal(size=(max_label, fts_dim)).astype(np.float32),
        gtid_text_valid=np.ones((max_label,), bool),
    )


class WalkDriver:
    """hm3d SS-ETP walk driver (``run_on_hm3d``, ss_trainer_3DFF.py:733-1115).

    Per episode: reset the feed, then per step (<= ``max_len``) —

      1. frozen waypoint heatmap over the 12-view depth panorama
         (policy_3dff.waypoint_heatmap; ":845-849"), NMS candidates, with
         optional train-time waypoint-augmentation sampling (":847-849",
         Policy_3DFF.py:242-281);
      2. sample ``nv`` novel views: random candidate -> ``get_cand_real_pos``
         RPC, uniform random heading, ``get_observation`` RPC for the gt RGB
         (":853-876"); gt features = CLIP grid avg-pooled to the view size;
      3. one differentiable device step (trainer_3dff.walk_step_loss):
         panorama fold + render + the full loss family; grads ACCUMULATE;
      4. teacher (50%) or random (50%) candidate -> feed.step; teacher =
         argmin cand_dist_to_goal, STOP when within ``stop_distance``
         (":407-424,1006-1026" — geodesic stand-in: the feed's oracle);

    then ONE optimizer update from the grad mean (the reference's single
    per-episode backward, ":498-519").
    """

    def __init__(self, feed, supervision: Dict, nv: int = 4, max_len: int = 5,
                 seed: int = 0, teacher_prob: float = 0.5,
                 stop_distance: float = 1.5, waypoint_aug: bool = True):
        self.feed = feed
        self.sup = supervision
        self.nv = nv
        self.max_len = max_len
        self.rng = np.random.default_rng(seed)
        self.teacher_prob = teacher_prob
        self.stop_distance = stop_distance
        self.waypoint_aug = waypoint_aug

    def run_iteration(self, runner: "PretrainRunner") -> Dict[str, float]:
        from dynam3d_tpu.models.memory3d import init_state
        from dynam3d_tpu.models.waypoint.trm import extract_candidates
        from dynam3d_tpu.runtime.feed import STOP

        cfg = runner.cfg
        f = cfg.fields
        for k in ("depth_enc", "waypoint"):
            if k not in runner.params:
                raise KeyError(
                    f"WalkDriver needs frozen '{k}' params on the runner "
                    "(init_depth_encoder_params / init_waypoint_params or "
                    "their checkpoint converters)"
                )
        trainable = {
            "fields": runner.params["fields"],
            "render": runner.params["render"],
        }
        frozen = {k: v for k, v in runner.params.items() if k not in trainable}
        runner._ensure_opt(trainable)
        grad_fn = runner._get_walk_grad()
        heat_fn = runner._get_heatmap()

        obs = self.feed.reset()
        state = jax.tree_util.tree_map(
            lambda x: x[None], init_state(f)
        )
        grad_sum = jax.tree_util.tree_map(jnp.zeros_like, trainable)
        per_step: List[Dict[str, float]] = []

        for stepk in range(self.max_len):
            depth12 = jnp.asarray(obs.depth)  # [12,Hd,Wd]
            heat = heat_fn(frozen, depth12[None])
            cand = extract_candidates(cfg.waypoint, heat)
            mask = np.asarray(cand.mask[0])
            angles = np.asarray(cand.angles_ccw[0])[mask]
            dists = np.asarray(cand.distances[0])[mask]
            if self.waypoint_aug and len(angles):
                from dynam3d_tpu.models.policy_3dff import sample_waypoints_train

                n_ang = cfg.waypoint.num_angles
                bins = np.round(
                    (2 * math.pi - angles) / (2 * math.pi) * n_ang
                ).astype(np.int64) % n_ang
                sa, sd = sample_waypoints_train(
                    np.asarray(heat), [bins.tolist()], self.rng
                )
                angles = 2 * math.pi - np.asarray(sa[0]) / n_ang * 2 * math.pi
                dists = (np.asarray(sd[0]) + 1) * 0.25
            if len(angles) == 0:  # degenerate heatmap: forward fan fallback
                angles = np.asarray([0.0, math.pi / 2, -math.pi / 2])
                dists = np.asarray([0.5, 0.5, 0.5])

            # --- novel views at candidate positions ---
            nv_pos, nv_hd, nv_rgb = [], [], []
            for _ in range(self.nv):
                k = int(self.rng.integers(0, len(angles)))
                pos = self.feed.get_cand_real_pos(
                    float(angles[k]), float(dists[k])
                )
                hd = float(self.rng.uniform(-math.pi, math.pi))
                cam = self.feed.get_observation(pos, hd)
                nv_pos.append(pos)
                nv_hd.append(hd)
                nv_rgb.append(cam.rgb[0])
            _, ngrid = runner._encode(
                runner.params["clip"], jnp.asarray(np.stack(nv_rgb))
            )
            novel_gt = pool_to_view(ngrid, f)

            batch = trainer_3dff.WalkBatch(
                rgb12=jnp.asarray(obs.rgb),
                depth12=depth12,
                position=jnp.asarray(obs.position),
                heading=jnp.asarray(obs.heading, jnp.float32),
                gt_xyz=jnp.asarray(self.sup["gt_xyz"]),
                gt_label=jnp.asarray(self.sup["gt_label"]),
                gt_valid=jnp.ones((self.sup["gt_xyz"].shape[0],), bool),
                novel_position=habitat_to_world(jnp.asarray(np.stack(nv_pos))),
                novel_heading=jnp.asarray(nv_hd, jnp.float32),
                novel_gt_fts=novel_gt,
                cat_embeddings=jnp.asarray(self.sup["cat_embeddings"]),
                gtid_to_cat=jnp.asarray(self.sup["gtid_to_cat"]),
                gtid_text_fts=jnp.asarray(self.sup["gtid_text_fts"]),
                gtid_text_valid=jnp.asarray(self.sup["gtid_text_valid"]),
                use_labels=jnp.asarray(True),
            )
            grads, state, metrics = grad_fn(trainable, frozen, state, batch)
            grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
            per_step.append({k: float(v) for k, v in metrics.items()})

            # --- step the feed: teacher or random candidate ---
            if stepk == self.max_len - 1:
                action = STOP
            elif self.rng.uniform() < self.teacher_prob:
                cd = [
                    self.feed.cand_dist_to_goal(float(a), float(d))
                    for a, d in zip(angles, dists)
                ]
                if self.feed.oracle_distance(None) < self.stop_distance:
                    action = STOP
                else:
                    k = int(np.argmin(cd))
                    action = (float(angles[k]), float(dists[k]))
            else:
                k = int(self.rng.integers(0, len(angles)))
                action = (float(angles[k]), float(dists[k]))
            obs, done, _ = self.feed.step(action)
            if done or action == STOP:
                break

        new_tr, runner._tr_opt = trainer_3dff.apply_accumulated_grads(
            runner.opt, trainable, runner._tr_opt, grad_sum, len(per_step)
        )
        runner.params["fields"] = new_tr["fields"]
        runner.params["render"] = new_tr["render"]
        out = {
            k: float(np.mean([m[k] for m in per_step]))
            for k in per_step[0]
        }
        out["walk_steps"] = float(len(per_step))
        return out


def pool_to_view(grid: jnp.ndarray, f) -> jnp.ndarray:
    """CLIP patch grid [N, g*g, D] -> avg-pooled view targets [N, R, D]
    (the 24->12 AvgPool2d at ss_trainer_3DFF.py:884-887)."""
    N, GG, D = grid.shape
    g = int(math.sqrt(GG))
    vh, vw = f.view_height, f.view_width
    pool = grid.reshape(N, g, g, D)
    ph, pw = g // vh, g // vw
    pool = pool.reshape(N, vh, ph, vw, pw, D).mean(axis=(2, 4))
    return pool.reshape(N, vh * vw, D)


class PretrainRunner:
    """Owns the jitted encode/step programs and the iteration loop."""

    def __init__(self, params, cfg: Dynam3DConfig, seed: int = 0):
        self.cfg = cfg
        self.params = params
        self.opt = trainer_3dff.make_pretrain_optimizer(cfg)
        self._steps = {}  # posed-mode -> jitted step (walk/frames programs)
        self._encode = jax.jit(self._encode_views)
        # the whole device side of build_batch as ONE program: ~30 eager
        # dispatches each paying a host->device round trip otherwise
        self._build = jax.jit(
            self._build_device, static_argnames=("posed", "mode")
        )
        self.seed = seed
        self.it = 0

    def _get_step(self, posed: bool):
        if posed not in self._steps:
            self._steps[posed] = jax.jit(
                trainer_3dff.make_pretrain_step(self.cfg, self.opt, posed=posed)
            )
        return self._steps[posed]

    def _ensure_opt(self, trainable):
        if not hasattr(self, "_tr_opt"):
            self._tr_opt = self.opt.init(trainable)

    def _get_walk_grad(self):
        if not hasattr(self, "_walk_grad"):
            self._walk_grad = jax.jit(trainer_3dff.make_walk_grad_step(self.cfg))
        return self._walk_grad

    def _get_heatmap(self):
        if not hasattr(self, "_heatmap_fn"):
            from dynam3d_tpu.models.policy_3dff import waypoint_heatmap

            self._heatmap_fn = jax.jit(
                lambda p, d: waypoint_heatmap(p, self.cfg, d)
            )
        return self._heatmap_fn

    def _encode_views(self, clip_params, rgb):
        pixels = clip_mod.preprocess_rgb(rgb, self.cfg.clip.image_size)
        if self.cfg.clip.compute_dtype == "bf16":
            # bf16 tower, the reference's own CLIP precision (fp16 there;
            # clip/model.py convert_weights) — same cast the VLN perceive
            # path uses (models/policy.py); projected features return f32
            pixels = pixels.astype(jnp.bfloat16)
        cls, grid = clip_mod.encode_image(clip_params, self.cfg.clip, pixels)
        return cls.astype(jnp.float32), grid.astype(jnp.float32)

    def _build_device(self, clip_params, arrs, *, posed: bool, mode: str):
        """Device side of :meth:`build_batch` as ONE fused program.

        ``mode``:
          - ``"reuse"``    — posed FramesDriver default: the novel views ARE
            the input frames with their real (R, T), so their CLIP grids are
            reused, not re-encoded (ss_trainer_3DFF.py:1271-1273);
          - ``"slice2"``   — unposed default: the novel views are input
            frames 0..1, whose grids are rows of the input encoding;
          - ``"explicit"`` — caller-provided novel views, re-encoded.
        """
        f = self.cfg.fields
        H, W = f.input_height, f.input_width
        rgb = arrs["rgb"]
        # depth crosses the wire as uint16 + one f32 scale (build_batch):
        # the tunnel's ~10 MB/s makes the f32 depth plane ~40% of the
        # iteration's upload bytes; u16 at 10 m range quantizes to 0.15 mm,
        # far below sensor noise. Unpack on device inside the fused build.
        depth = arrs["depth_u16"].astype(jnp.float32) * arrs["depth_scale"]
        V = rgb.shape[0]

        cls, grid = self._encode_views(clip_params, rgb)
        d24 = nearest_resize_hw(depth, H, W)
        d24 = preprocess_depth(d24[..., None], (0.0, 10.0))[..., 0].reshape(
            V, H * W
        )
        # per-patch world geometry: full-pose for posed-frame datasets
        # (reference generic-intrinsics branch, feature_fields.py:905-916),
        # habitat-mode unprojection otherwise
        world_pos = habitat_to_world(arrs["position"])
        headings = arrs["heading"]
        if posed:
            d_hw = depth.shape[1:3]
            ks = jax.vmap(
                lambda k: scale_intrinsics(k, d_hw, (H, W))
            )(arrs["intrinsics"])
            ppos, pdir, pscale = jax.vmap(
                lambda d, k, r, t: patch_geometry_from_pose(d, k, r, t, H, W)
            )(d24, ks, arrs["rot"], arrs["trans"])
            # shared view-resolution K: frame 0's intrinsics rescaled with
            # principal point pinned to the view center (reference
            # init_camera_intrinsic, feature_fields.py:851-855)
            novel_k = view_k(
                arrs["intrinsics"][0], d_hw, (f.view_height, f.view_width)
            )
        else:
            def _geo(d, pos, hd):
                rx, ry, rz, pd_, ps_ = unproject_depth_habitat(
                    d, hd, height=H, width=W,
                    hfov_deg=f.input_hfov, vfov_deg=f.input_vfov,
                )
                return jnp.stack([rx, ry, rz], -1) + pos[None, :], pd_, ps_

            ppos, pdir, pscale = jax.vmap(_geo)(d24, world_pos, headings)
            novel_k = jnp.eye(3, dtype=jnp.float32)
        segm = jax.vmap(
            lambda dv: depth_plane_segments(dv, H, W, f.max_segments)
        )(d24)

        if mode == "reuse":
            ngrid, novel_pos, novel_hd = grid, world_pos, headings
        elif mode == "slice2":
            ngrid, novel_pos, novel_hd = grid[:2], world_pos[:2], headings[:2]
        else:
            _, ngrid = self._encode_views(clip_params, arrs["novel_rgb"])
            novel_pos = habitat_to_world(arrs["novel_position"])
            novel_hd = arrs["novel_heading"]
        # gt novel-view features: 24x24 grid avg-pooled 2x2 -> 12x12
        novel_gt = pool_to_view(ngrid, f)
        return dict(
            cls=cls, grid=grid, d24=d24, segm=segm, world_pos=world_pos,
            heading=headings, ppos=ppos, pdir=pdir, pscale=pscale,
            novel_pos=novel_pos, novel_hd=novel_hd, novel_gt=novel_gt,
            novel_k=novel_k,
        )

    # ------------------------------------------------------------------
    def build_batch(
        self,
        scene: Dict,
        clip_params,
        novel_views: Optional[Dict] = None,
        cat_embeddings: Optional[np.ndarray] = None,
        gtid_to_cat: Optional[np.ndarray] = None,
        gtid_text_fts: Optional[np.ndarray] = None,
        max_gt_label: int = 512,
    ) -> trainer_3dff.PretrainBatch:
        cfg = self.cfg
        f = cfg.fields
        D = f.fts_dim
        posed = "intrinsics" in scene

        depth_np = np.asarray(scene["depth"], np.float32)
        # halve the depth plane's wire bytes: u16 + scale, unpacked on
        # device by _build_device (see note there)
        dmax = float(depth_np.max()) if depth_np.size else 0.0
        dscale = (dmax / 65535.0) if dmax > 0 else 1.0
        arrs = {
            "rgb": np.asarray(scene["rgb"]),
            "depth_u16": np.clip(
                np.rint(depth_np / dscale), 0, 65535
            ).astype(np.uint16),
            "depth_scale": np.float32(dscale),
            "position": np.asarray(scene["position"], np.float32),
            "heading": np.asarray(scene["heading"], np.float32),
        }
        if posed:
            arrs["intrinsics"] = np.asarray(scene["intrinsics"], np.float32)
            arrs["rot"] = np.asarray(scene["rot"], np.float32)
            arrs["trans"] = np.asarray(scene["trans"], np.float32)
        if novel_views is not None:
            mode = "explicit"
            arrs["novel_rgb"] = np.asarray(novel_views["rgb"])
            arrs["novel_position"] = np.asarray(
                novel_views["position"], np.float32
            )
            arrs["novel_heading"] = np.asarray(
                novel_views["heading"], np.float32
            )
        elif posed:
            # FramesDriver renders EVERY input view back with its real
            # (R, T) (ss_trainer_3DFF.py:1271-1273) — the novel views ARE
            # the inputs, handled device-side by mode="reuse"
            mode = "reuse"
            novel_views = {"rot": scene["rot"], "trans": scene["trans"]}
        else:
            mode = "slice2"
            novel_views = {}
        out = self._build(clip_params, arrs, posed=posed, mode=mode)
        Nv = out["novel_gt"].shape[0]

        C = 16 if cat_embeddings is None else cat_embeddings.shape[0]
        L = max_gt_label
        rng = np.random.default_rng(self.seed + self.it)
        if cat_embeddings is None:
            cat_embeddings = rng.normal(size=(C, D)).astype(np.float32)
        if gtid_to_cat is None:
            gtid_to_cat = rng.integers(-1, C, L).astype(np.int32)
        if gtid_text_fts is None:
            gtid_text_fts = rng.normal(size=(L, D)).astype(np.float32)

        # everything below is either a device output of the fused program or
        # a host->device transfer (no eager compute dispatches)
        return trainer_3dff.PretrainBatch(
            depth=out["d24"],
            grid_fts=out["grid"],
            cls_fts=out["cls"],
            segm=out["segm"],
            position=out["world_pos"],
            heading=out["heading"],
            gt_xyz=jnp.asarray(scene["gt_xyz"]),
            gt_label=jnp.asarray(scene["gt_label"]),
            gt_valid=jnp.asarray(np.ones((scene["gt_xyz"].shape[0],), bool)),
            novel_position=out["novel_pos"],
            novel_heading=out["novel_hd"],
            novel_gt_fts=out["novel_gt"],
            novel_k=out["novel_k"],
            novel_rot=jnp.asarray(
                novel_views["rot"], jnp.float32
            ) if "rot" in novel_views else jnp.asarray(
                np.tile(np.eye(3, dtype=np.float32), (Nv, 1, 1))
            ),
            novel_trans=jnp.asarray(
                novel_views["trans"], jnp.float32
            ) if "trans" in novel_views else jnp.asarray(
                np.zeros((Nv, 3), np.float32)
            ),
            cat_embeddings=jnp.asarray(cat_embeddings),
            gtid_to_cat=jnp.asarray(gtid_to_cat),
            gtid_text_fts=jnp.asarray(gtid_text_fts),
            gtid_text_valid=jnp.asarray(np.ones((L,), bool)),
            use_labels=jnp.asarray(bool(scene.get("use_labels", True))),
            ppos=out["ppos"],
            pdir=out["pdir"],
            pscale=out["pscale"],
        )

    # ------------------------------------------------------------------
    def run(
        self,
        datasets: Sequence,            # providers with .sample_scene()
        iters: int,
        logger: Optional[MetricsLogger] = None,
        ckpt_dir: Optional[str] = None,
        log_every: int = 100,
    ) -> List[Dict[str, float]]:
        cfg = self.cfg
        history = []
        # one-iteration metrics pipeline: the float() conversion of iteration
        # t's scalars is deferred until iteration t+1's step is DISPATCHED,
        # so t+1's scene sampling + host->device staging + fused build run
        # under t's in-flight grad step (jax async dispatch) instead of
        # serializing behind a device->host sync every iteration
        pending = None  # (device metrics, iteration index)

        def _flush():
            nonlocal pending
            if pending is None:
                return
            metrics, it = pending
            pending = None
            m = {k: float(v) for k, v in metrics.items()}
            history.append(m)
            if logger:
                logger.add_scalars(m, it, prefix="loss/")

        for _ in range(iters):
            ds_id = trainer_3dff.draw_dataset_id(self.seed, self.it, len(datasets))
            ds = datasets[ds_id]
            if hasattr(ds, "run_iteration"):  # WalkDriver (hm3d episode)
                _flush()
                m = ds.run_iteration(self)
                history.append(m)
                if logger:
                    logger.add_scalars(m, self.it, prefix="loss/")
                if ckpt_dir and (self.it + 1) % log_every == 0:
                    ckpt_mod.save_checkpoint(
                        ckpt_dir, self.it + 1,
                        {"fields": self.params["fields"],
                         "render": self.params["render"]},
                    )
                self.it += 1
                continue
            scene = ds.sample_scene()
            batch = self.build_batch(scene, self.params["clip"])
            field_state = init_state(cfg.fields)
            trainable = {
                "fields": self.params["fields"],
                "render": self.params["render"],
            }
            # optimizer state tracks the trainable subtree only
            self._ensure_opt(trainable)
            step = self._get_step(posed="intrinsics" in scene)
            new_tr, self._tr_opt, _, metrics = step(
                trainable, self._tr_opt, field_state, batch
            )
            self.params["fields"] = new_tr["fields"]
            self.params["render"] = new_tr["render"]
            _flush()
            pending = (metrics, self.it)
            if ckpt_dir and (self.it + 1) % log_every == 0:
                ckpt_mod.save_checkpoint(
                    ckpt_dir, self.it + 1,
                    {"fields": self.params["fields"], "render": self.params["render"]},
                )
            self.it += 1
        _flush()
        return history
