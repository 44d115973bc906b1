"""Multi-session streaming: N concurrent 30 fps avatars on one chip.

The reference serves ONE session per process (scripts/rt.py main loop,
rt_simplified.py:315 — a single AudioBuffer + model instance per run).
On TPU the per-frame compute is ~0.1 ms of mostly small GEMMs at B=1;
batching S sessions into one jitted step turns those into (S, ...) GEMMs
on the MXU at nearly the same step latency, so one chip serves hundreds
of concurrent real-time streams — a serving capability with no reference
counterpart.

Design: :func:`~koemorph_tpu.runtime.streaming.stream_frame` is a pure
function of a :class:`StreamState` carry, so the server is ``jax.vmap``
over a session axis — with ONE deliberate exception: ``frame_count`` (the
emotion-refresh clock) stays UNBATCHED, shared by every session. The
refresh ``lax.cond`` predicate then stays scalar, so vmap keeps it a true
branch (a per-session predicate would lower to ``select`` and run the
heavy eGeMAPS refresh every frame for every session), and all sessions
refresh in the same step — one batched (S, ...) eGeMAPS pass every K
frames instead of S staggered scalar ones.

Cost of the shared clock: a session admitted mid-phase starts from
silence rings (exactly like a fresh single-session engine) and waits up
to one refresh interval (<=300 ms at the production cadence) for its
first non-silence emotion vector. Lane outputs are otherwise identical
to a dedicated :class:`StreamingInference` fed the same audio (pinned by
tests/runtime/test_multistream.py).

``refresh_cohorts=G`` generalizes the shared clock to G clocks: lanes
split into G static cohorts whose refresh phases are spread over the
K-frame cadence, so each step refreshes AT MOST ONE cohort of S/G
sessions instead of all S every K frames. Each cohort's predicate is
still a scalar (one ``lax.cond`` per cohort, unrolled at trace time), so
the heavy branch stays a true branch — the refresh load just moves from
one giant spike every K frames to a small constant per step. That spike
was the capacity wall (and the HBM peak): flattening it lifted one
chip's measured real-time capacity from 384 to 640 sessions
(docs/performance.md — 768 misses the 33 ms budget). Lane ``l`` belongs
to cohort ``l % G``; phase-shifted lanes remain exactly a dedicated
engine whose clock started at the cohort's phase (pinned by
TestRefreshCohorts).
"""

from __future__ import annotations

import time
from collections import deque
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.runtime.streaming import (
    StreamingConfig,
    init_stream_state,
    stream_frame,
)

__all__ = ["MultiStreamInference"]


class MultiStreamInference:
    """Serve ``n_sessions`` independent streaming sessions in one step.

    Typical use::

        server = MultiStreamInference(params, cfg, n_sessions=64)
        server.warmup()
        frames = server.step(hops)     # (64, hop) audio -> (64, 52)

    ``params`` is the same dict :class:`StreamingInference` takes (the
    trained SimplifiedDualStreamModel params); every session shares it.
    """

    def __init__(self, params: dict, cfg: StreamingConfig,
                 n_sessions: int, device: Optional[jax.Device] = None,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 refresh_cohorts: int = 1):
        """``mesh`` shards the session axis over a device mesh (its first
        axis): every per-session leaf — states, incoming hops, outputs —
        carries ``PartitionSpec(axis)`` while params and the shared
        refresh clock replicate, so the step contains ZERO collectives
        (sessions are independent) and capacity scales linearly with
        devices (384/chip measured → 8 × 384 on a v5e-8 data mesh).
        ``n_sessions`` must divide evenly over the mesh."""
        if n_sessions < 1:
            raise ValueError("n_sessions must be >= 1")
        k = cfg.emotion_update_frames
        if not 1 <= refresh_cohorts <= max(k, 1):
            raise ValueError(
                f"refresh_cohorts {refresh_cohorts} must be in [1, "
                f"emotion_update_frames={k}] (distinct phases mod the "
                f"cadence keep at most one cohort refreshing per step)")
        if n_sessions % refresh_cohorts:
            raise ValueError(
                f"n_sessions {n_sessions} must divide into "
                f"{refresh_cohorts} cohorts")
        self.cfg = cfg
        self.n_sessions = n_sessions
        self.refresh_cohorts = refresh_cohorts
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            n_dev = mesh.devices.shape[0]
            if n_sessions % n_dev:
                raise ValueError(
                    f"n_sessions {n_sessions} must divide over the mesh's "
                    f"{n_dev}-device '{axis}' axis")
            if (n_sessions // refresh_cohorts) % n_dev:
                raise ValueError(
                    f"each cohort ({n_sessions // refresh_cohorts} "
                    f"sessions) must divide over the mesh's {n_dev} "
                    f"devices")
            self.device = None
            self._lane_sharding = NamedSharding(mesh, P(axis))
            self._scan_lane_sharding = NamedSharding(mesh, P(None, axis))
            self._repl_sharding = NamedSharding(mesh, P())
            self.params = jax.device_put(params, self._repl_sharding)
        else:
            self.device = device or jax.devices()[0]
            self.params = jax.device_put(params, self.device)

        single = init_stream_state(cfg)
        # session axis everywhere EXCEPT the shared refresh clock
        axes = jax.tree_util.tree_map(lambda _: 0, single)
        axes = axes.replace(frame_count=None)
        self._state_axes = axes
        self.states = self._place_states(self._fresh_states(single))

        # one vmapped step shared by step() and run_scan() so the
        # state-axes treatment can never diverge between the two paths
        self._vstep = jax.vmap(
            lambda p, s, a: stream_frame(p, s, a, cfg),
            in_axes=(None, axes, 0),
            out_axes=({"blendshapes": 0}, axes))
        base_sstep = (self._vstep if refresh_cohorts == 1
                      else self._make_cohort_step())

        def sstep_any_dtype(p, s, a):
            # int16 PCM converts ON DEVICE: the UDP wire format is int16,
            # so uploading it raw halves host->device bytes per tick
            # (1.1 MB -> 0.55 MB at S=512/30 fps) and x * 2^-15 is
            # bit-exact to the host-side x / 32768.0 it replaces
            if a.dtype == jnp.int16:
                a = a.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
            return base_sstep(p, s, a)

        self._sstep = sstep_any_dtype
        self._step = jax.jit(self._sstep, donate_argnums=1)
        self._reset_fns: dict = {}
        self.frames_emitted = 0
        # bounded like StreamingInference's (streaming.py): a long-running
        # server must not grow host memory one float per frame forever
        self.step_times: deque[float] = deque(maxlen=300)

    def _init_clock(self) -> jnp.ndarray:
        """() scalar for the single shared clock; (G,) phase vector for
        cohorts — cohort c's clock starts at phase ``c*K//G`` so refreshes
        land on distinct steps of the K-frame cadence (at most one cohort
        refreshes per step; cohort 0 keeps the legacy refresh-at-frame-0
        behavior)."""
        g = self.refresh_cohorts
        if g == 1:
            return jnp.zeros((), jnp.int32)
        k = self.cfg.emotion_update_frames
        return jnp.asarray([(c * k) // g for c in range(g)], jnp.int32)

    def _fresh_states(self, single=None):
        single = single if single is not None else init_stream_state(self.cfg)
        n = self.n_sessions
        batched = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n,) + x.shape), single)
        return batched.replace(frame_count=self._init_clock())

    def _make_cohort_step(self):
        """Step with per-cohort emotion refresh: one scalar-predicate
        refresh ``lax.cond`` per cohort (unrolled at trace time), the
        (G,) clock carried separately from the lane-batched leaves.

        Cohort membership is ``lane % G`` — chosen so cohort slices are
        DEVICE-LOCAL under any mesh: the lane axis is block-sharded over
        the mesh's ``D`` devices, and a contiguous global slice of S/G
        lanes would span a device *subset*, forcing GSPMD to reshard
        every cohort's states each step (measured on the virtual
        8-device mesh before this layout: 75 collective-permutes + 30
        all-gathers per step). Viewing each leaf as ``(D, lpc, G, ...)``
        — a shape-only change, sharded (mesh-axis, None, None, ...) —
        cohort ``c`` is the local index ``c`` on the last cohort axis of
        EVERY device's block, so slice, vstep, and reassembly all stay
        on-device (zero collectives, pinned by compiled-HLO count in
        tests/runtime/test_multistream.py). Because ``lane % G`` is
        independent of D, mesh and single-device servers assign
        identical phases lane-for-lane.

        Only the REFRESH is per-cohort. The base work (ring/mel update,
        attention, EMA) runs over ALL lanes in single vmapped calls —
        fragmenting it into G small-batch calls measured 24.9 ms/step at
        S=640 where base(640)+refresh(80) is ~11 ms (the small-batch
        GEMMs and G x kernel launches ate the difference)."""
        from koemorph_tpu.runtime.streaming import (
            StreamState,
            _refresh_tail_len,
            _stream_post,
            _stream_pre,
            _stream_refresh,
        )

        g, n = self.refresh_cohorts, self.n_sessions
        d = 1 if self.mesh is None else int(self.mesh.devices.shape[0])
        per_dev = n // d
        lpc = per_dev // g           # lanes per cohort per device
        cfg = self.cfg
        tail_len = _refresh_tail_len(cfg)
        axes = self._state_axes

        vpre = jax.vmap(lambda s, a: _stream_pre(s, a, cfg),
                        in_axes=(axes, 0))

        def refresh_lane(params, fc, er, lr, lc, tail):
            pseudo = StreamState(
                audio_ring=jnp.zeros((0,), jnp.float32),
                mel_db=jnp.zeros((0, 1), jnp.float32),
                emotion_raw=er, frame_count=fc, temporal=None,
                lld_ring=lr, lld_carry=lc)
            return _stream_refresh(params, pseudo, tail, cfg)

        vrefresh = jax.vmap(refresh_lane, in_axes=(None, None, 0, 0, 0, 0))
        vpost = jax.vmap(
            lambda p, mel, det, er, temp: _stream_post(
                p, mel, det, er, temp, cfg),
            in_axes=(None, 0, 0, 0, 0))

        def take(x, c):              # device-local rows of cohort c
            v = x.reshape((d, lpc, g) + x.shape[1:])[:, :, c]
            return v.reshape((d * lpc,) + x.shape[1:])

        def unview(parts):           # G x (d*lpc, ...) -> (n, ...)
            stacked = jnp.stack(
                [p.reshape((d, lpc) + p.shape[1:]) for p in parts], axis=2)
            return stacked.reshape((n,) + stacked.shape[3:])

        def merge(parts):
            """Combine per-cohort pytrees back into full-lane trees."""
            if jax.tree_util.tree_leaves(parts[0]) == []:
                return parts[0]      # all-None subtree (no lld state)
            return jax.tree_util.tree_map(
                lambda *xs: unview(list(xs)), *parts)

        def sstep(params, states, hops):
            clocks = states.frame_count                       # (G,)
            scalar_state = states.replace(
                frame_count=jnp.zeros((), jnp.int32))
            ring, mel_db, mel, detail = vpre(scalar_state, hops)
            tails = ring[:, -tail_len:]

            ers, lrs, lcs = [], [], []
            for c in range(g):
                er, lr, lc = vrefresh(
                    params, clocks[c],
                    take(states.emotion_raw, c),
                    jax.tree_util.tree_map(
                        lambda x, c=c: take(x, c), states.lld_ring),
                    jax.tree_util.tree_map(
                        lambda x, c=c: take(x, c), states.lld_carry),
                    take(tails, c))
                ers.append(er)
                lrs.append(lr)
                lcs.append(lc)
            emotion_raw = unview(ers)
            lld_ring = merge(lrs)
            lld_carry = merge(lcs)

            out, temporal = vpost(params, mel, detail, emotion_raw,
                                  states.temporal)
            new_state = StreamState(
                audio_ring=ring, mel_db=mel_db, emotion_raw=emotion_raw,
                frame_count=clocks + 1, temporal=temporal,
                lld_ring=lld_ring, lld_carry=lld_carry)
            return out, new_state

        return sstep

    def _place_states(self, states):
        """Pin the state pytree to its home: lane-sharded over the mesh
        (shared clock replicated), or the single serving device."""
        if self.mesh is None:
            return jax.device_put(states, self.device)
        clock = jax.device_put(states.frame_count, self._repl_sharding)
        dummy = states.replace(frame_count=jnp.zeros(
            (self.n_sessions,), jnp.int32))
        placed = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._lane_sharding), dummy)
        return placed.replace(frame_count=clock)

    def _put_hops(self, hops: jnp.ndarray) -> jnp.ndarray:
        if self.mesh is None:
            return jax.device_put(hops, self.device)
        return jax.device_put(hops, self._lane_sharding)

    # -- serving -----------------------------------------------------------

    def warmup(self, dtype=jnp.float32) -> None:
        """Compile the batched step ahead of the real-time loop. Pass
        ``dtype=jnp.int16`` when the live loop will feed raw PCM (each
        input dtype is its own jit specialization)."""
        hop = self.cfg.hop_length
        out, _ = self._step(
            self.params,
            jax.tree_util.tree_map(jnp.copy, self.states),
            self._put_hops(jnp.zeros((self.n_sessions, hop), dtype)))
        # materialize, don't block_until_ready: through the axon tunnel
        # block_until_ready returns before remote compile+execute finish,
        # which would push the whole first compile into the first live
        # tick (measured: a 397 s first tick in the serve loop)
        np.asarray(out["blendshapes"])

    def step(self, hops: np.ndarray) -> jax.Array:
        """One frame for every session: (S, hop) audio -> (S, 52).

        Accepts float32 in [-1, 1] or raw int16 PCM (converted on device
        at half the upload bytes); device-resident arrays pass through
        without a host round trip."""
        if not isinstance(hops, jax.Array):
            hops = np.asarray(hops)
            if hops.dtype != np.int16:
                hops = np.asarray(hops, np.float32)
            hops = jnp.asarray(hops)
        if hops.shape != (self.n_sessions, self.cfg.hop_length):
            raise ValueError(
                f"expected ({self.n_sessions}, {self.cfg.hop_length}) "
                f"audio, got {hops.shape}")
        hops = self._put_hops(hops)
        t0 = time.perf_counter()
        out, self.states = self._step(self.params, self.states, hops)
        self.step_times.append(time.perf_counter() - t0)
        self.frames_emitted += self.n_sessions
        return out["blendshapes"]

    def reset_sessions(self, indices: Sequence[int]) -> None:
        """Re-admit the given lanes as fresh sessions (silence rings,
        unsmoothed first frame). The shared refresh clock keeps running:
        the new session's first emotion refresh lands on the next global
        phase boundary."""
        idx = np.asarray(sorted(set(int(i) for i in indices)), np.int32)
        if idx.size == 0:
            return
        if idx.min() < 0 or idx.max() >= self.n_sessions:
            raise ValueError(f"session index out of range: {idx}")
        fn = self._reset_fns.get(idx.size)
        if fn is None:
            def reset(states, lanes):
                fresh = init_stream_state(self.cfg)

                def set_lanes(batched, leaf):
                    rows = jnp.broadcast_to(
                        leaf, (lanes.shape[0],) + leaf.shape)
                    return batched.at[lanes].set(rows)

                # the shared clock is not per-lane: swap in a dummy lane
                # column for the tree_map, then restore it
                clock = states.frame_count
                states = jax.tree_util.tree_map(
                    set_lanes,
                    states.replace(frame_count=jnp.zeros(
                        (self.n_sessions,), jnp.int32)),
                    fresh.replace(frame_count=jnp.zeros((), jnp.int32)))
                return states.replace(frame_count=clock)

            fn = jax.jit(reset, donate_argnums=0)
            self._reset_fns[idx.size] = fn
        self.states = fn(self.states, jnp.asarray(idx))

    # -- measurement ---------------------------------------------------------

    def run_scan(self, audio: np.ndarray) -> jax.Array:
        """Decode (S, T*hop) audio as T batched frames inside ONE jitted
        ``lax.scan`` — the honest way to measure sustained per-frame cost
        through the tunneled chip (amortizes dispatch; same methodology
        as bench.py). Returns (T, S, 52); updates ``self.states``."""
        audio = np.asarray(audio, np.float32)
        hop = self.cfg.hop_length
        s, total = audio.shape
        if s != self.n_sessions or total % hop:
            raise ValueError(
                f"audio must be ({self.n_sessions}, k*{hop}), got "
                f"{audio.shape}")
        t = total // hop
        hops = np.swapaxes(audio.reshape(s, t, hop), 0, 1)   # (T, S, hop)

        scan = getattr(self, "_scan_fn", None)
        if scan is None:
            def scan_impl(params, states, hops):
                def body(st, a):
                    out, st2 = self._sstep(params, st, a)
                    return st2, out["blendshapes"]

                return jax.lax.scan(body, states, hops)

            scan = self._scan_fn = jax.jit(scan_impl)

        hops = jnp.asarray(hops)
        if self.mesh is not None:
            hops = jax.device_put(hops, self._scan_lane_sharding)
        self.states, frames = scan(self.params, self.states, hops)
        self.frames_emitted += t * s
        return frames

    def sustained_stats(self, n_frames: int = 300,
                        warmup_frames: Optional[int] = None) -> dict:
        """Sustained batched throughput: silence-fed scan, value-fetch
        synchronized. Reports per-frame step latency across all sessions
        and the 30 fps realtime headroom.

        Every warmup scan runs the SAME frame count as the timed scan so
        all passes hit one executable; ``warmup_frames`` larger than
        ``n_frames`` adds whole extra warmup scans to cover it."""
        hop = self.cfg.hop_length
        silence = np.zeros((self.n_sessions, n_frames * hop), np.float32)
        n_warm_scans = max(1, -(-(warmup_frames or n_frames) // n_frames))
        for _ in range(n_warm_scans):                    # compile + warm
            f = self.run_scan(silence)
        float(np.asarray(f[-1, 0, 0]))
        t0 = time.perf_counter()
        f = self.run_scan(silence)
        float(np.asarray(f[-1, 0, 0]))                   # device sync
        dt = time.perf_counter() - t0
        per_frame = dt / n_frames
        budget = 1.0 / self.cfg.target_fps
        return {
            "sessions": self.n_sessions,
            "frames": n_frames,
            "scans_run": n_warm_scans + 1,
            "step_ms": per_frame * 1e3,
            "per_session_us": per_frame / self.n_sessions * 1e6,
            "rtf": per_frame / budget,
            "realtime": bool(per_frame < budget),
            "frames_per_s": self.n_sessions / per_frame,
        }

    def performance_stats(self) -> dict:
        """Dispatch-path stats for the per-step serving loop (the last
        ``step_times.maxlen`` ticks; p50/p99 feed the live-loop serving
        validation — VERDICT r4 item 6)."""
        if not self.step_times:
            return {"frames": 0}
        times = np.asarray(self.step_times)
        budget = 1.0 / self.cfg.target_fps
        return {
            "sessions": self.n_sessions,
            "frames": self.frames_emitted,
            "avg_step_ms": float(times.mean() * 1e3),
            "p50_step_ms": float(np.percentile(times, 50) * 1e3),
            "p99_step_ms": float(np.percentile(times, 99) * 1e3),
            "max_step_ms": float(times.max() * 1e3),
            "rtf": float(times.mean() / budget),
        }
