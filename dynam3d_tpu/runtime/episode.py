"""Closed-loop episode driver: host feed <-> device policy step.

The TPU redesign of the reference's rollout (ss_trainer_Dynam3D.py:564-822):
the host owns tokenization, action-text parsing, history strings, and the
feed; the device owns perception, the 3D memory and the VLM.  Two compiled
programs run per step (perceive, generate) — all heavy state stays on device.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynam3d_tpu.config import Dynam3DConfig
from dynam3d_tpu.models import policy as policy_mod
from dynam3d_tpu.models.policy import I_ENV, Z_ENV
from dynam3d_tpu.models.vlm.tokenizer import ByteTokenizer, build_prompt
from dynam3d_tpu.runtime.feed import Feed, STOP
from dynam3d_tpu.utils.actions import EpisodeActionState, parse_action


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class EpisodeRunner:
    """Runs one (or a batch of) VLN episode(s) closed-loop.

    Args:
      params: policy params (init_policy_params or converted weights).
      cfg: full config.
      tokenizer: ByteTokenizer/HFTokenizer; splice offset is derived from the
        first <image> position it produces.
    """

    def __init__(self, params, cfg: Dynam3DConfig, tokenizer=None, views: int = 1):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer or ByteTokenizer(cfg.llava.phi3.vocab_size)
        self.views = views
        self.n_mm = views * cfg.fields.input_height * cfg.fields.input_width + I_ENV + Z_ENV
        probe = self.tok.encode(build_prompt("x", ["none\n"] * 4, 1))
        self.splice_start = probe.index(self.tok.image_id)

        self._perceive = jax.jit(
            lambda p, st, rgb, d, pos, hd: policy_mod.perceive(
                p, cfg, st, rgb, d, pos, hd
            )
        )
        self._generate = jax.jit(
            lambda p, ids, tv, mm, mv: policy_mod.generate_action_ids(
                p, cfg, ids, tv, mm, mv, self.splice_start
            )
        )
        # fused single-dispatch step (tokenize first, then one device call);
        # the memory tables are DONATED so XLA updates them in place rather
        # than copying ~P_cap x D of state every step
        self._full_step_jit = jax.jit(
            lambda p, st, rgb, d, pos, hd, ids, tv, pg: policy_mod.full_step(
                p, cfg, st, rgb, d, pos, hd, ids, tv, self.splice_start,
                prev_gen=pg,
            ),
            donate_argnums=(1,),
        )

    def _full_step(self, p, st, rgb, d, pos, hd, ids, tv, prev_gen=None):
        """One fused device step; ``prev_gen`` ([B,new_tok] last generated
        ids) primes the speculative-decode draft source (models/policy.py).
        ``None`` (step 0 / external callers) passes never-match sentinels,
        keeping one compiled program for both cases."""
        if prev_gen is None:
            prev_gen = jnp.full(
                (ids.shape[0], self.cfg.llava.max_new_tokens), -1, jnp.int32
            )
        return self._full_step_jit(p, st, rgb, d, pos, hd, ids, tv, prev_gen)

    # ------------------------------------------------------------------
    @staticmethod
    def pack_depth(depth: np.ndarray) -> np.ndarray:
        """Pack normalized [0,1] depth to the uint16 wire format (dequantized
        on-device at the top of policy.perceive); halves the host->device
        copy, the dominant wire term on a tunneled chip."""
        return np.clip(
            np.round(np.asarray(depth, np.float32) * 65535.0), 0.0, 65535.0
        ).astype(np.uint16)

    @staticmethod
    def _upload(o) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Begin the async host->device copy of one observation."""
        return (
            jax.device_put(o.rgb),
            jax.device_put(EpisodeRunner.pack_depth(o.depth)),
            jax.device_put(np.asarray(o.position, np.float32)),
        )

    # ------------------------------------------------------------------
    def _prompt_ids(
        self, instructions: Sequence[str], histories: Sequence[List[str]],
        gt_texts: Optional[Sequence[str]] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, np.ndarray]:
        """Tokenize prompts to a bucketed [B,T]; <image> span is static."""
        B = len(instructions)
        rows = []
        for b in range(B):
            text = build_prompt(
                instructions[b], histories[b], self.n_mm,
                gt_texts[b] if gt_texts else "",
            )
            rows.append(self.tok.encode(text))
        maxlen = max(len(r) for r in rows)
        T = _round_up(maxlen, self.cfg.llava.prefill_bucket)
        ids = np.full((B, T), self.tok.pad_id, np.int32)
        valid = np.zeros((B, T), bool)
        lens = np.zeros((B,), np.int32)
        for b, r in enumerate(rows):
            ids[b, : len(r)] = r
            valid[b, : len(r)] = True
            lens[b] = len(r)
        return jnp.asarray(ids), jnp.asarray(valid), lens

    # ------------------------------------------------------------------
    def pre_explore(
        self,
        feeds: Sequence[Feed],
        state,
        steps: int,
        rng: Optional[np.random.Generator] = None,
    ):
        """Lifelong-memory pre-exploration (BASELINE config 5): walk the scene
        feeding observations into the 3D memory WITHOUT consuming VLM steps,
        so navigation starts with a pre-built instance/zone map.  Feeds are
        reset afterwards; the memory persists."""
        rng = rng or np.random.default_rng(0)
        obs = [f.reset() for f in feeds]
        for _ in range(steps):
            rgb = jnp.asarray(np.stack([o.rgb for o in obs]))
            depth = jnp.asarray(np.stack([o.depth for o in obs]))
            pos = jnp.asarray(np.stack([o.position for o in obs]))
            hd = jnp.asarray(np.asarray([o.heading for o in obs], np.float32))
            out = self._perceive(self.params, state, rgb, depth, pos, hd)
            state = out.state
            for i, f in enumerate(feeds):
                o, done, _ = f.step(
                    (float(rng.uniform(0, 2 * np.pi)), float(rng.choice([0.25, 0.5])))
                )
                obs[i] = o
        for f in feeds:
            f.reset()
        return state

    # ------------------------------------------------------------------
    def run(
        self,
        feeds: Sequence[Feed],
        max_steps: Optional[int] = None,
        pre_explore_steps: int = 0,
        ignore_stop: bool = False,
    ) -> List[Dict]:
        """Greedy closed-loop eval of one episode per feed (batched).

        ``ignore_stop=True`` substitutes a small forward move whenever the
        decoded action is STOP, so every episode runs the full
        ``max_steps`` — the steady-state serving-benchmark mode (random or
        untrained weights decode to STOP almost immediately otherwise).

        Returns per-episode info dicts (positions, steps, final distance).
        """
        cfg = self.cfg
        max_steps = max_steps or cfg.train.max_traj_len
        B = len(feeds)
        state = policy_mod.batched_init_state(cfg, B)
        if pre_explore_steps:
            state = self.pre_explore(feeds, state, pre_explore_steps)
        obs = [f.reset() for f in feeds]
        act_state = [EpisodeActionState() for _ in range(B)]
        live = list(range(B))
        results: List[Optional[Dict]] = [None] * B

        # Double-buffered uploads: each episode's frame starts streaming to
        # the device (jax async dispatch — device_put returns immediately)
        # the moment its feed renders it, overlapping the copy with the
        # remaining feeds' host-side rendering and with tokenization, instead
        # of uploading the whole stacked batch synchronously at the top of
        # the step (the reference overlaps render/compute via per-env worker
        # processes, env_utils.py:119-126).
        dev_obs: Dict[int, Tuple] = {i: self._upload(obs[i]) for i in live}
        # per-episode previous generation: primes the spec-decode drafts
        # (consecutive actions repeat; see policy.generate_action_ids)
        last_gen: Dict[int, np.ndarray] = {}
        no_gen = np.full((self.cfg.llava.max_new_tokens,), -1, np.int32)

        for stepk in range(max_steps):
            rgb = jnp.stack([dev_obs[i][0] for i in live])
            depth = jnp.stack([dev_obs[i][1] for i in live])
            pos = jnp.stack([dev_obs[i][2] for i in live])
            hd = jnp.asarray(
                np.asarray([obs[i].heading for i in live], np.float32)
            )

            ids, tvalid, _ = self._prompt_ids(
                [obs[i].instruction for i in live],
                [act_state[i].history_actions for i in live],
            )
            prev = jnp.asarray(
                np.stack([last_gen.get(i, no_gen) for i in live])
            )
            state, gen = self._full_step(
                self.params, state, rgb, depth, pos, hd, ids, tvalid, prev
            )
            gen = np.asarray(gen)
            for row, i in enumerate(live):
                last_gen[i] = gen[row]

            done_now: List[int] = []
            for row, i in enumerate(list(live)):
                text = self.tok.decode(gen[row])
                cut = text.find("<|end|>")
                if cut != -1:
                    text = text[:cut]
                act_state[i].push_history(text + "\n")
                action = parse_action(text, cfg.action)
                if ignore_stop and stepk < max_steps - 1 and (
                    action == STOP
                    or (action[0] == 0.0 and action[1] == 0.0)
                ):
                    # zero-actions (unparseable text) also terminate the
                    # episode below; the serving-soak contract is "run the
                    # full max_steps", so substitute those too
                    action = (0.1, 0.25)
                if action == STOP or stepk == max_steps - 1 or (
                    action != STOP and action[0] == 0.0 and action[1] == 0.0
                ):
                    o, d, info = feeds[i].step(STOP)
                    results[i] = {
                        "steps": stepk + 1,
                        "distance_to_goal": feeds[i].oracle_distance(),
                        **info,
                    }
                    done_now.append(i)
                else:
                    o, d, info = feeds[i].step(action)
                    obs[i] = o
                    if not d:  # stream while the other feeds render
                        dev_obs[i] = self._upload(o)
                    if d:
                        results[i] = {
                            "steps": stepk + 1,
                            "distance_to_goal": feeds[i].oracle_distance(),
                            **info,
                        }
                        done_now.append(i)

            for i in done_now:
                row = live.index(i)
                state = policy_mod.pop_state(state, row)
                live.remove(i)
            if not live:
                break

        for i in list(live):
            results[i] = {
                "steps": max_steps,
                "distance_to_goal": feeds[i].oracle_distance(),
            }
        return results  # type: ignore[return-value]

    # ------------------------------------------------------------------
    def run_interleaved(
        self,
        feeds: Sequence[Feed],
        groups: int = 2,
        max_steps: Optional[int] = None,
        ignore_stop: bool = False,
    ) -> List[Dict]:
        """Round-robin two (or more) episode groups so host work (feed
        rendering, tokenization) overlaps device compute — the throughput
        role of the reference's per-env worker processes (env_utils.py:
        119-126) without fork()ing simulators.

        Dispatches group g's device step, then prepares group g+1's inputs
        while g computes; results land in feed order.
        """
        import threading

        groups = max(1, min(groups, len(feeds)))
        parts = [list(range(len(feeds)))[g::groups] for g in range(groups)]
        results: List[Optional[Dict]] = [None] * len(feeds)

        def worker(idxs):
            out = self.run([feeds[i] for i in idxs], max_steps, ignore_stop=ignore_stop)
            for j, i in enumerate(idxs):
                results[i] = out[j]

        threads = [threading.Thread(target=worker, args=(p,)) for p in parts]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return results  # type: ignore[return-value]
