"""`ballbot-train`: the training entry point.

Counterpart of the reference trainer (ballbot_rl/training/train.py:36-326):
YAML config -> env + PPO, timestamped run dir with config.yaml/info.txt dump,
CSV + stdout logging, periodic deterministic evaluation with best-model
checkpointing and evaluations.npz, periodic full-state checkpoints, resume.

TPU-first differences: envs are a sharded batch axis on a device mesh instead
of subprocesses; the whole collect+update iteration is one jitted program; a
checkpoint restores the complete runner state (exact resume).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import random
import sys
import time
from datetime import datetime
from typing import Dict, Optional

import numpy as np
import yaml


def main(config: Dict, seed: int, out_dir: Optional[str] = None,
         max_iterations: Optional[int] = None, verbose: bool = True,
         assume_yes: bool = False) -> str:
    import jax

    multihost = config.get("multihost", False)
    if multihost:
        # SPMD across hosts: each process contributes its local devices and
        # runs the same program; DCN carries dispatch, ICI the collectives.
        # `multihost: true` auto-detects the cluster (TPU pod metadata);
        # a dict passes coordinator_address/num_processes/process_id
        # explicitly (used by tests/integration/test_multihost.py to run
        # 2 CPU processes on localhost).
        kwargs = dict(multihost) if isinstance(multihost, dict) else {}
        jax.distributed.initialize(**kwargs)

    # Multihost runs share ONE run directory on a shared filesystem: orbax
    # checkpoint saves are collective (the primary creates the tree, every
    # process writes its addressable shards into the SAME path — per-process
    # paths deadlock the save), while host-side artifacts (csv, eval npz,
    # videos, config) are written by the primary only.
    is_primary = (not multihost) or jax.process_index() == 0

    def _host_barrier(name: str, timeout_ms: int = 600_000) -> None:
        """Align all processes at a named coordination-service barrier.

        The CPU cross-process collectives rendezvous over gloo, whose store
        wait times out after ~30 s — less than the cross-process skew a cold
        XLA compile can produce. The coordination service barrier has an
        explicit (generous) timeout, so compile skew is absorbed here instead
        of DEADLINE_EXCEEDED-ing the first collective of a freshly compiled
        program."""
        from jax._src import distributed
        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_ms)

    from openballbot_rl_tpu.envs import make_env_from_config, make_terrain_bank
    from openballbot_rl_tpu.parallel.mesh import (
        make_mesh, replicate, shard_env_axis)
    from openballbot_rl_tpu.train import PPO, PPOConfig
    from openballbot_rl_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
    from openballbot_rl_tpu.utils.logging import CSVLogger, EvalLog, Stopwatch

    algo_cfg = config.get("algo", {})
    algo_type = str(algo_cfg.get("type", "ppo")).lower()
    total_timesteps = int(float(config.get("total_timesteps", 8e6)))
    num_envs = int(config.get("num_envs", 10))

    from openballbot_rl_tpu.envs import make_env_from_config

    env, terrain_gen = make_env_from_config(config)

    if algo_type == "sac":
        from openballbot_rl_tpu.train import SAC, SACConfig

        cfg = SACConfig(
            num_envs=num_envs,
            n_steps=int(algo_cfg.get("n_steps", 32)),
            buffer_size=int(float(algo_cfg.get("buffer_size", 500_000))),
            batch_size=int(algo_cfg.get("batch_sz", 256)),
            gradient_steps=int(algo_cfg.get("gradient_steps", 64)),
            learning_starts=int(float(algo_cfg.get("learning_starts", 1e4))),
            gamma=float(algo_cfg.get("gamma", 0.99)),
            tau=float(algo_cfg.get("tau", 0.005)),
            learning_rate=float(algo_cfg.get("learning_rate", 3e-4)),
            ent_coef=str(algo_cfg.get("ent_coef", "auto")),
            target_entropy=algo_cfg.get("target_entropy"),
            replay_window=(int(float(algo_cfg["replay_window"]))
                           if algo_cfg.get("replay_window") else None),
            total_timesteps=total_timesteps,
        )
        algo = SAC(env, cfg)
    elif algo_type == "ppo":
        cfg = PPOConfig(
            num_envs=num_envs,
            n_steps=int(algo_cfg.get("n_steps", 2048)),
            batch_size=int(algo_cfg.get("batch_sz", 256)),
            n_epochs=int(algo_cfg.get("n_epochs", 5)),
            gamma=float(algo_cfg.get("gamma", 0.99)),
            gae_lambda=float(algo_cfg.get("gae_lambda", 0.95)),
            clip_range=float(algo_cfg.get("clip_range", 0.015)),
            ent_coef=float(algo_cfg.get("ent_coef", 0.001)),
            vf_coef=float(algo_cfg.get("vf_coef", 2.0)),
            target_kl=float(algo_cfg.get("target_kl", 0.3)),
            weight_decay=float(algo_cfg.get("weight_decay", 0.01)),
            learning_rate=float(algo_cfg.get("learning_rate", -1)),
            normalize_advantage=bool(algo_cfg.get("normalize_advantage",
                                                  False)),
            lr_anneal_start=float(algo_cfg.get("lr_anneal_start", -1)),
            lr_final=float(algo_cfg.get("lr_final", 3e-5)),
            total_timesteps=total_timesteps,
        )

        # policy resolved through the registry (reference policy registration
        # side effect + create_policy, core/factories.py) — shared with
        # every checkpoint consumer so restores always rebuild the same net
        from openballbot_rl_tpu.nn.networks import build_policy_network

        algo = PPO(env, cfg, build_policy_network(config))
    else:
        raise ValueError(f"unknown algo type {algo_type!r} (ppo | sac)")

    bank_size = int(config.get("terrain_bank_size", 64))
    terrain_cfg = config.get("problem", {}).get("terrain", {})
    fixed_seed = (terrain_cfg.get("config", {}) or {}).get("seed")
    key = jax.random.PRNGKey(seed)
    key, k_bank, k_init, k_eval = jax.random.split(key, 4)
    # vision envs also get the renderer's aligned camera-tile supply
    # (sensors/depth.py render_tiles); blind envs skip the ~170 MB bank
    is_vision = hasattr(env, "vp")
    bank = make_terrain_bank(terrain_gen, env.model.hfield_n, env.params.zscale,
                             k_bank, bank_size, fixed_seed=fixed_seed,
                             build_cam_tiles=is_vision,
                             half_extent=float(env.model.hfield_half_extent))

    # terrain curriculum (capability the reference lacks): anneal one terrain
    # config parameter over training and regenerate the bank on the fly —
    # banks are just arrays passed into the jitted iteration, and the native
    # generator rebuilds 64 terrains in ~190 ms, so this is nearly free
    cur_cfg = config.get("curriculum", {}) or {}
    cur_param = cur_cfg.get("param")
    cur_value = None
    if cur_param:
        from openballbot_rl_tpu.core.factories import create_terrain as _ct
        from openballbot_rl_tpu.train.curriculum import CurriculumSchedule

        schedule = CurriculumSchedule.from_config(cur_cfg)
        cur_every = schedule.regen_every
        # adaptive decisions wait at least one episode span so each one is
        # based on episodes that ran at the current difficulty — the regen
        # cadence alone (default 5 iters) is ~3x faster than the measurement
        # latency (max_ep_steps/n_steps iters) and would promote repeatedly
        # off one stale measurement
        cur_decide_every = schedule.decide_every if schedule.decide_every \
            else max(cur_every, -(-env.params.max_ep_steps // cfg.n_steps))
        cur_last_decision = 0
        base_tcfg = dict(terrain_cfg.get("config", {}) or {})

        def bank_at(value, key):
            gen = _ct({"type": terrain_cfg["type"],
                       "config": {**base_tcfg, cur_param: value}})
            return make_terrain_bank(gen, env.model.hfield_n,
                                     env.params.zscale, key, bank_size,
                                     fixed_seed=fixed_seed,
                                     build_cam_tiles=is_vision,
                                     half_extent=float(
                                         env.model.hfield_half_extent))

    # Evaluation always runs on a dedicated bank at FINAL difficulty: under a
    # curriculum, evaluating on the current (easier) bank would make eval
    # rewards non-comparable across training. With a fixed eval bank, an early
    # policy simply scores low on the hard terrain and best-by-mean-reward
    # needs no gating.
    if cur_param:
        key, k_eb = jax.random.split(key)
        eval_bank = bank_at(schedule.end, k_eb)
    else:
        eval_bank = bank

    # run dir (train.py:169-219)
    if out_dir is None:
        stamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        out_dir = os.path.join("outputs", "experiments", "runs",
                               f"{stamp}_ppo_seed{seed}")
    from openballbot_rl_tpu.train.interactive import confirm
    if is_primary:
        if os.path.exists(os.path.join(out_dir, "progress.csv")):
            # overwrite guard (reference train.py:272-281)
            if not confirm(f"run dir {out_dir} already has results; "
                           "overwrite?", assume_yes=assume_yes):
                raise SystemExit("aborted")
        os.makedirs(out_dir, exist_ok=True)
        os.makedirs(os.path.join(out_dir, "results"), exist_ok=True)
        dump_cfg = config
        if cur_param:
            # Bake the curriculum END value into the archived terrain
            # section. The source config leaves <cur_param> unset (bank_at
            # injects it per build), so without this every downstream
            # checkpoint consumer (ballbot-eval / -visualize / -collect /
            # live-view) reading config.yaml would silently fall back to
            # the generator's DEFAULT — amplitude 1.0 for perlin, 4x a
            # 0.25-curriculum's target difficulty (round-5 re-eval bug).
            # END matches the in-run eval bank (bank_at(schedule.end)),
            # i.e. the difficulty the run's eval numbers refer to.
            import copy

            dump_cfg = copy.deepcopy(config)
            for node in (dump_cfg.get("problem", {}).get("terrain"),
                         dump_cfg.get("terrain")):
                if isinstance(node, dict):
                    node.setdefault("config", {})[cur_param] = schedule.end
        with open(os.path.join(out_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(dump_cfg, f)
        with open(os.path.join(out_dir, "info.txt"), "w") as f:
            f.write(f"seed: {seed}\nppo: {dataclasses.asdict(cfg)}\n"
                    f"devices: {jax.devices()}\nstarted: {datetime.now()}\n")

    # trainer state that lives outside the jitted RunnerState (adaptive
    # curriculum difficulty) rides in a sidecar next to each checkpoint so
    # exact resume includes it
    def _save(path, rs):
        save_checkpoint(path, rs)
        if cur_param:
            with open(path + ".trainer.json", "w") as f:
                json.dump({"curriculum_value": cur_value}, f)

    rs = algo.init(bank, k_init)
    resume = config.get("resume", "")
    if resume:
        print(f"resuming full runner state from {resume}")
        rs = restore_checkpoint(resume, rs)
        sidecar = resume.rstrip("/") + ".trainer.json"
        if cur_param and os.path.exists(sidecar):
            with open(sidecar) as f:
                cur_value = json.load(f).get("curriculum_value")
            print(f"resumed curriculum {cur_param} = {cur_value}")

    # shard envs over available devices when >1
    mesh = None
    if len(jax.devices()) > 1 and cfg.num_envs % len(jax.devices()) == 0:
        mesh = make_mesh()
        rs = rs.replace(env_states=shard_env_axis(rs.env_states, mesh),
                        obs=shard_env_axis(rs.obs, mesh),
                        params=replicate(rs.params, mesh),
                        opt_state=replicate(rs.opt_state, mesh))
        bank = replicate(bank, mesh)
        if cur_param:   # otherwise eval_bank already aliases the new bank
            eval_bank = replicate(eval_bank, mesh)
        else:
            eval_bank = bank

    n_params = sum(x.size for x in jax.tree.leaves(rs.params))
    if verbose:
        print(f"run dir: {out_dir}")
        print(f"devices: {jax.devices()}  params: {n_params:,}")
        if algo_type == "ppo":
            updates = cfg.n_epochs * cfg.minibatches_per_epoch
            print(f"updates per rollout: ~{updates}")
            if updates > 400:
                # advisory + confirm (reference train.py:248-281)
                print(f"WARNING: {updates} gradient updates per rollout is "
                      "high; consider a larger batch_sz or smaller n_steps")
        else:
            print(f"updates per iteration: {cfg.gradient_steps} "
                  f"(collect {cfg.num_envs * cfg.n_steps} transitions)")
        if not confirm("start training?", default=True,
                       assume_yes=assume_yes):
            raise SystemExit("aborted")

    eval_cfg = config.get("evaluation", {}) or {}
    eval_freq = int(eval_cfg.get("freq", 5000))
    n_eval_episodes = int(eval_cfg.get("n_episodes", 8))
    ckpt_freq = int(config.get("checkpoint_freq", 20000))

    # visualization callbacks (reference callbacks.py:94-517: video-on-best
    # + periodic viz; synchronous here — a full episode renders in one jit
    # call, so no background thread is needed)
    viz_cfg = config.get("visualization", {}) or {}
    video_on_best = bool(viz_cfg.get("video_on_best", False)) and is_primary
    periodic_viz_freq = (int(viz_cfg.get("periodic_freq", 0))
                         if is_primary else 0)
    viz_episodes = int(viz_cfg.get("episodes", 1))
    next_viz = periodic_viz_freq if periodic_viz_freq else None

    def _render_video(tag, gs, params=None):
        from openballbot_rl_tpu.viz.rollout import visualize_episodes

        p = rs.params if params is None else params

        def policy_fn(obs, k):
            return algo.deterministic_action(p, obs)

        out = os.path.join(out_dir, "videos", f"{tag}_{gs}.mp4")
        # encode to a temp name, rename on completion: a partial file from a
        # killed worker is then detectable (never a truncated .mp4)
        tmp = out + ".part.mp4"
        try:
            v = visualize_episodes(
                env, bank, policy_fn, jax.random.PRNGKey(gs), viz_episodes,
                env.params.max_ep_steps, tmp, verbose=False)
            if v:
                os.replace(tmp, out)
                return out
            return None
        except Exception as e:  # noqa: BLE001 — video failure never kills
            print(f"  video render failed ({e})")   # training (callbacks.py:238-275)
            return None

    # Async video-on-best, matching the reference's background recorder
    # (callbacks.py:94-331: a worker thread + queue so training never stalls
    # on a render). One daemon worker; a new best while a render is in
    # flight replaces any queued request (only the LATEST best is recorded,
    # like the reference's is_recording gate). JAX dispatch is thread-safe;
    # the render jit shares the device but the ~seconds-long render no
    # longer blocks the training loop's host thread.
    _video_q = []
    _video_lock = None
    if video_on_best:
        import threading

        _video_lock = threading.Condition()

        def _video_worker():
            while True:
                with _video_lock:
                    while not _video_q:
                        _video_lock.wait()
                    item = _video_q.pop()          # latest request wins
                    if item[0] is None and _video_q:
                        # drain sentinel arrived with work still queued:
                        # do the work first, keep the sentinel for next loop
                        work = _video_q.pop()
                        _video_q.clear()
                        _video_q.append(item)
                        item = work
                    else:
                        _video_q.clear()           # drop superseded requests
                tag, gs, params = item
                if tag is None:
                    return
                v = _render_video(tag, gs, params)
                if v and verbose:
                    print(f"  video -> {v}")

        _video_thread = threading.Thread(target=_video_worker, daemon=True,
                                         name="video-on-best")
        _video_thread.start()

    def _submit_video(tag, gs):
        with _video_lock:
            _video_q.append((tag, gs, rs.params))
            _video_lock.notify()

    if is_primary:
        csvlog = CSVLogger(os.path.join(out_dir, "progress.csv"))
        evallog = EvalLog(os.path.join(out_dir, "results"))
    else:
        class _NullLog:
            def best_mean(self):           # non-primary tracks best locally
                return float("-inf")

            def __getattr__(self, _name):
                return lambda *a, **k: None
        csvlog = evallog = _NullLog()
    if resume:
        # resuming into a dir with history: drop rows recorded past the
        # checkpoint's step, and don't demote the best model already saved
        csvlog.truncate(int(rs.global_step))
        evallog.truncate(int(rs.global_step))
    else:
        # fresh run into a confirmed-overwrite dir: discard preloaded history
        csvlog.truncate(-1)
        evallog.truncate(-1)
    watch = Stopwatch()
    best_eval = evallog.best_mean()
    next_eval = 0
    next_ckpt = 0
    if multihost and jax.process_count() > 1:
        # AOT-compile the two big programs, then align processes, so the
        # first gloo rendezvous happens with ZERO compile skew (cold-cache
        # robustness of tests/integration/test_multihost.py — gloo's ~30 s
        # store timeout is far below worst-case cross-process compile skew)
        type(algo).train_iteration.lower(algo, rs, bank).compile()
        type(algo).evaluate.lower(
            algo, rs.params, eval_bank, n_eval_episodes,
            env.params.max_ep_steps, jax.random.PRNGKey(0)).compile()
        _host_barrier("programs_compiled")

    iteration = 0
    last_row = {}
    retired_bank = None
    last_ep_rew = float("nan")
    last_ep_len = float("nan")

    profile_dir = config.get("profile_dir", "")
    profiling = False

    steps_per_iter = cfg.num_envs * cfg.n_steps

    # One-slot bank prefetch: under a LINEAR curriculum the next regen value
    # is a pure function of the step clock, so the host can build the next
    # bank (native generator + device transfer) while the device runs the
    # intervening iteration, instead of stalling it at the regen boundary
    # (~35% slower iterations otherwise). The key split happens at submission
    # time, so the k_cur stream is identical to the synchronous path whether
    # the prefetch hits or misses. Adaptive mode depends on episode stats
    # that only exist after the iteration completes — it stays synchronous.
    prefetch = None          # (value, k_cur, future)
    pf_enabled = bool(cur_param) and schedule.mode == "linear"

    def _submit_prefetch(value, k_cur):
        # daemon thread, not a ThreadPoolExecutor: its non-daemon workers
        # are joined at interpreter exit, so a wedged device transfer in
        # the worker (the TPU relay's known failure mode) would hang the
        # process forever after any training exception
        import threading

        box = {}

        def run():
            try:
                box["value"] = bank_at(value, k_cur)
            except BaseException as e:  # noqa: BLE001 — re-raised on result
                box["error"] = e

        t = threading.Thread(target=run, daemon=True)
        t.start()

        class _F:
            def result(self):
                t.join()
                if "error" in box:
                    raise box["error"]
                return box["value"]

        return _F()
    gs_pred = int(rs.global_step)   # exact: each iteration adds steps_per_iter

    while int(rs.global_step) < cfg.total_timesteps:
        if max_iterations is not None and iteration >= max_iterations:
            break
        # trace iterations 2-4 (skip iteration 1: compile)
        if profile_dir and iteration == 1 and not profiling:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        if cur_param and iteration % cur_every == 0:
            if cur_value is None:
                cur_value = schedule.start
                cur_last_decision = iteration
            elif (schedule.mode != "adaptive"
                  or iteration - cur_last_decision >= cur_decide_every):
                cur_value = schedule.next_value(
                    int(rs.global_step) / cfg.total_timesteps, cur_value,
                    last_ep_len, env.params.max_ep_steps)
                cur_last_decision = iteration
            # retire the outgoing bank's device buffers once the iteration
            # that last used it has been fetched (below): with tile + camera
            # tile banks a vision curriculum swaps ~500 MB every regen, and
            # leaving ~190 retired banks to relay-side GC exhausted HBM at
            # ~120M steps in the round-4 vision seed study
            retired_bank = bank
            if prefetch is not None:
                pf_value, k_cur, fut = prefetch
                prefetch = None
                # the key was already split at submission; reuse k_cur on a
                # miss so the RNG stream is independent of hit/miss
                if pf_value == cur_value:
                    bank = fut.result()
                else:
                    # prefetch MISS (adaptive schedules can diverge from the
                    # prediction): explicitly free the mispredicted bank's
                    # ~500 MB of device buffers instead of leaving them to
                    # the unreliable relay-side GC (ADVICE r4) — same
                    # treatment as retired_bank below
                    try:
                        missed = fut.result()
                        for leaf in jax.tree.leaves(missed):
                            if not leaf.is_deleted():
                                leaf.delete()
                    except Exception:
                        pass
                    bank = bank_at(cur_value, k_cur)
            else:
                key, k_cur = jax.random.split(key)
                bank = bank_at(cur_value, k_cur)
            if mesh is not None:
                bank = replicate(bank, mesh)
            if pf_enabled:
                # submit the NEXT regen's bank now — the worker gets the
                # full regen_every iterations to build + transfer it
                nv = schedule.next_value(
                    (gs_pred + cur_every * steps_per_iter)
                    / cfg.total_timesteps, cur_value,
                    last_ep_len, env.params.max_ep_steps)
                key, k_cur = jax.random.split(key)
                prefetch = (nv, k_cur, _submit_prefetch(nv, k_cur))
        # (A static render schedule for the vision rollout exists —
        # PPO.train_iteration(phase=...) + envs/vision.blocked_vision_scan,
        # bit-identical to the dynamic cadence — but measured slightly
        # SLOWER on the chip (4.34 vs 3.92 ms/step at B=1024,
        # performance.md), so the trainer keeps the dynamic path.)
        rs, metrics = algo.train_iteration(rs, bank)
        iteration += 1
        gs_pred += steps_per_iter
        gs = int(rs.global_step)
        fps = watch.fps(gs)
        if retired_bank is not None:
            # the int(global_step) fetch above forced this iteration — and
            # everything queued before it — to completion, so the retired
            # bank has no in-flight consumers; free its HBM now instead of
            # waiting on relay-side GC
            for leaf in jax.tree.leaves(retired_bank):
                try:
                    if not leaf.is_deleted():
                        leaf.delete()
                except Exception:
                    pass
            retired_bank = None

        # SB3-style ep_info_buffer: keep the last finished-episode stats on
        # iterations where no episode ended (instead of printing 0.00)
        if int(metrics["episodes"]) > 0:
            last_ep_rew = float(metrics["ep_return_mean"])
            last_ep_len = float(metrics["ep_len_mean"])

        row = {
            "time/total_timesteps": gs,
            "time/iterations": iteration,
            "time/fps": round(fps),
            "time/time_elapsed": round(watch.elapsed()),
            "rollout/ep_rew_mean": last_ep_rew,
            "rollout/ep_len_mean": last_ep_len,
            "train/policy_gradient_loss": float(metrics["pg_loss"]),
            "train/value_loss": float(metrics["v_loss"]),
            "train/entropy": float(metrics["entropy"]),
            "train/approx_kl": float(metrics["approx_kl"]),
            "train/clip_fraction": float(metrics["clip_fraction"]),
            "train/learning_rate": float(metrics["lr"]),
        }
        if cur_param:
            row["train/curriculum_value"] = cur_value
        if "alpha" in metrics:
            # SAC: SB3-style off-policy diagnostics (round-4 bimodal-seed
            # study needs entropy temperature + Q trajectories per run)
            row["train/ent_coef"] = float(metrics["alpha"])
            row["train/q_value"] = float(metrics["q_value"])
            row["train/buffer_size"] = float(metrics["buffer_size"])

        if gs >= next_eval:
            next_eval = gs + eval_freq
            k_eval, k = jax.random.split(k_eval)
            ev = algo.evaluate(rs.params, eval_bank, n_eval_episodes,
                               env.params.max_ep_steps, k)
            evallog.add(gs, np.asarray(ev["rewards"]), np.asarray(ev["lengths"]))
            row["eval/mean_reward"] = float(ev["mean_reward"])
            row["eval/mean_ep_length"] = float(ev["mean_ep_length"])
            row["eval/survival_rate"] = float(ev["survival_rate"])
            if float(ev["mean_reward"]) > best_eval:
                best_eval = float(ev["mean_reward"])
                _save(os.path.join(out_dir, "best_model"), rs)
                if verbose:
                    print(f"  new best eval {best_eval:.2f} @ {gs} -> best_model")
                if video_on_best:
                    _submit_video("best", gs)   # async, never stalls the loop

        if next_viz is not None and gs >= next_viz:
            next_viz = gs + periodic_viz_freq
            v = _render_video("periodic", gs)
            if v and verbose:
                print(f"  periodic visualization -> {v}")

        if gs >= next_ckpt:
            next_ckpt = gs + ckpt_freq
            _save(os.path.join(out_dir, "checkpoints", f"step_{gs}"), rs)

        if profiling and iteration >= 4:
            jax.block_until_ready(metrics["reward_mean"])
            jax.profiler.stop_trace()
            profiling = False
            if verbose:
                print(f"  device trace (iters 2-4) -> {profile_dir}")

        csvlog.log(row)
        last_row = row
        if verbose:
            extra = f" {cur_param} {cur_value:.3f}" if cur_param else ""
            print(f"iter {iteration} step {gs} fps {row['time/fps']} "
                  f"ep_rew {row['rollout/ep_rew_mean']:.2f} "
                  f"ep_len {row['rollout/ep_len_mean']:.0f} "
                  f"kl {row['train/approx_kl']:.4f}" + extra)

    if profiling:   # run ended before the trace window closed
        jax.profiler.stop_trace()

    if video_on_best:
        # drain: let an in-flight best-video finish (bounded), like the
        # reference's thread join at training end
        with _video_lock:
            _video_q.append((None, 0, None))
            _video_lock.notify()
        _video_thread.join(timeout=300)
        if _video_thread.is_alive():
            print("  warning: video worker still encoding after 300 s "
                  "drain; an unfinished *.part.mp4 may remain in videos/")

    _save(os.path.join(out_dir, "final_model"), rs)
    if multihost and jax.process_count() > 1:
        # each process records ITS OWN view of the final replicated metrics
        # (SPMD invariant: these must be identical across processes — the
        # multihost test asserts it; also handy when debugging a real pod)
        with open(os.path.join(
                out_dir, f"proc{jax.process_index()}.metrics.json"),
                "w") as f:
            json.dump({k: v for k, v in last_row.items()
                       if isinstance(v, (int, float))}, f)
        # no process exits (tearing down its gloo endpoints and coordination
        # session) while a slower peer is still inside the training program
        _host_barrier("train_end")
    return out_dir


def cli_main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Train ballbot PPO (TPU-native)")
    parser.add_argument("--config", required=True)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--out", default=None)
    parser.add_argument("--max-iterations", type=int, default=None)
    parser.add_argument("-y", "--yes", action="store_true",
                        help="skip interactive confirmations")
    parser.add_argument("--profile", default="",
                        help="capture a device trace of iterations 2-4 into "
                             "this directory (view with tensorboard)")
    args = parser.parse_args(argv)

    from openballbot_rl_tpu.core.config import load_training_config

    config = load_training_config(args.config)
    seed = args.seed if args.seed is not None else int(config.get("seed", 10))
    if seed == -1:
        print("seed -1 is not allowed; pass an explicit seed", file=sys.stderr)
        return 2  # train.py:289-326 refuses seed=-1
    random.seed(seed)
    np.random.seed(seed)
    if args.profile:
        config = {**config, "profile_dir": args.profile}
    main(config, seed, out_dir=args.out or (config.get("out") or None),
         max_iterations=args.max_iterations, assume_yes=args.yes)
    return 0


if __name__ == "__main__":
    sys.exit(cli_main())
