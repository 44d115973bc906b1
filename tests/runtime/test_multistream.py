"""Multi-session streaming server pins.

The load-bearing property: a lane of :class:`MultiStreamInference` must
produce the same frames as a dedicated :class:`StreamingInference` fed
the same audio — batching sessions is a layout change, not a behavior
change. Also pinned: the shared refresh clock keeps the emotion-refresh
``lax.cond`` a true branch under vmap (cost property, asserted
structurally via the unbatched frame_count), and lane resets re-admit
fresh sessions without disturbing neighbours.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.runtime import (
    MultiStreamInference,
    StreamingConfig,
    StreamingInference,
)
from tests.runtime.test_streaming import TINY, tiny_params


def _speech_like(n_samples: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples) / TINY.sample_rate
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t + seed)
    sig = 0.3 * np.sin(2 * np.pi * np.cumsum(f0) / TINY.sample_rate)
    return (sig + 0.02 * rng.standard_normal(n_samples)).astype(np.float32)


class TestMultiStreamEquivalence:
    def test_lanes_match_dedicated_engines(self):
        params = tiny_params()
        hop = TINY.hop_length
        n_frames, n_sessions = 8, 3
        audio = np.stack([_speech_like(n_frames * hop, seed=s)
                          for s in range(n_sessions)])

        server = MultiStreamInference(params, TINY, n_sessions)
        batched = []
        for i in range(n_frames):
            batched.append(np.asarray(
                server.step(audio[:, i * hop:(i + 1) * hop])))
        batched = np.stack(batched)                      # (T, S, 52)

        for s in range(n_sessions):
            single = StreamingInference(params, TINY)
            frames = np.stack(single.process_audio(audio[s]))
            np.testing.assert_allclose(
                batched[:, s], frames, atol=1e-5, rtol=0,
                err_msg=f"lane {s} diverged from dedicated engine")

    def test_scan_matches_step_loop(self):
        params = tiny_params()
        hop = TINY.hop_length
        n_frames, n_sessions = 6, 2
        audio = np.stack([_speech_like(n_frames * hop, seed=10 + s)
                          for s in range(n_sessions)])

        a = MultiStreamInference(params, TINY, n_sessions)
        loop = np.stack([np.asarray(
            a.step(audio[:, i * hop:(i + 1) * hop]))
            for i in range(n_frames)])

        b = MultiStreamInference(params, TINY, n_sessions)
        scanned = np.asarray(b.run_scan(audio))
        np.testing.assert_allclose(scanned, loop, atol=1e-6, rtol=0)

    def test_shared_clock_is_unbatched(self):
        params = tiny_params()
        server = MultiStreamInference(params, TINY, 4)
        assert server.states.frame_count.shape == ()
        server.step(np.zeros((4, TINY.hop_length), np.float32))
        assert server.states.frame_count.shape == ()
        assert int(server.states.frame_count) == 1
        # per-session state IS batched
        assert server.states.audio_ring.shape[0] == 4


class TestSessionReset:
    def test_reset_lane_matches_fresh_session_at_phase_boundary(self):
        params = tiny_params()
        hop = TINY.hop_length
        k = TINY.emotion_update_frames
        n_sessions = 3
        pre = np.stack([_speech_like(k * hop, seed=20 + s)
                        for s in range(n_sessions)])
        post = np.stack([_speech_like(2 * k * hop, seed=40 + s)
                         for s in range(n_sessions)])

        server = MultiStreamInference(params, TINY, n_sessions)
        for i in range(k):
            server.step(pre[:, i * hop:(i + 1) * hop])
        # reset lane 1 exactly at a refresh-phase boundary: from here its
        # refresh schedule coincides with a fresh engine's
        server.reset_sessions([1])
        out = np.stack([np.asarray(
            server.step(post[:, i * hop:(i + 1) * hop]))
            for i in range(2 * k)])

        single = StreamingInference(params, TINY)
        fresh = np.stack(single.process_audio(post[1]))
        np.testing.assert_allclose(out[:, 1], fresh, atol=1e-5, rtol=0)

    def test_reset_leaves_other_lanes_untouched(self):
        params = tiny_params()
        hop = TINY.hop_length
        n_frames, n_sessions = 5, 3
        audio = np.stack([_speech_like(n_frames * hop, seed=60 + s)
                          for s in range(n_sessions)])

        plain = MultiStreamInference(params, TINY, n_sessions)
        expected = np.stack([np.asarray(
            plain.step(audio[:, i * hop:(i + 1) * hop]))
            for i in range(n_frames)])

        resetting = MultiStreamInference(params, TINY, n_sessions)
        out = []
        for i in range(n_frames):
            if i == 2:
                resetting.reset_sessions([0])
            out.append(np.asarray(
                resetting.step(audio[:, i * hop:(i + 1) * hop])))
        out = np.stack(out)
        np.testing.assert_allclose(out[:, 1:], expected[:, 1:],
                                   atol=1e-6, rtol=0)
        # the reset lane really did change
        assert np.abs(out[2:, 0] - expected[2:, 0]).max() > 0

    def test_reset_validates_indices(self):
        params = tiny_params()
        server = MultiStreamInference(params, TINY, 2)
        import pytest
        with pytest.raises(ValueError, match="out of range"):
            server.reset_sessions([5])


class TestStats:
    def test_sustained_stats_shape(self):
        params = tiny_params()
        server = MultiStreamInference(params, TINY, 2)
        stats = server.sustained_stats(n_frames=12)
        assert stats["sessions"] == 2
        assert stats["frames"] == 12
        assert stats["step_ms"] > 0 and np.isfinite(stats["rtf"])
        # warmup scan + timed scan, both 12 frames, 2 sessions
        assert server.frames_emitted == 2 * 24


class TestMeshSharding:
    """Session-axis sharding over a device mesh: a layout change only —
    lane outputs must match the single-device server to float32
    rounding, state leaves must STAY lane-sharded across steps (no
    silent full-gather), and params/the shared clock must replicate."""

    def _servers(self, n_sessions=8):
        from koemorph_tpu.parallel.mesh import make_mesh

        params = tiny_params()
        mesh = make_mesh()
        return (MultiStreamInference(params, TINY, n_sessions),
                MultiStreamInference(params, TINY, n_sessions, mesh=mesh),
                mesh)

    def test_lanes_match_unsharded_server(self):
        hop = TINY.hop_length
        n_frames, n_sessions = 8, 8
        audio = np.stack([_speech_like(n_frames * hop, seed=80 + s)
                          for s in range(n_sessions)])
        plain, sharded, _ = self._servers(n_sessions)
        for i in range(n_frames):
            chunk = audio[:, i * hop:(i + 1) * hop]
            a = np.asarray(plain.step(chunk))
            b = np.asarray(sharded.step(chunk))
            # per-shard (1, ...) GEMMs vs one (8, ...) GEMM reduce in a
            # different order: float32 rounding only (observed ~4e-9)
            np.testing.assert_allclose(a, b, atol=1e-6, rtol=0,
                                       err_msg=f"frame {i}")

    def test_states_stay_lane_sharded(self):
        hop = TINY.hop_length
        _, sharded, mesh = self._servers(8)
        axis = mesh.axis_names[0]
        for _ in range(3):
            sharded.step(np.zeros((8, hop), np.float32))

        def spec_of(x):
            return x.sharding.spec

        assert spec_of(sharded.states.mel_db)[0] == axis
        assert spec_of(sharded.states.audio_ring)[0] == axis
        # shared refresh clock and params replicate
        assert all(s is None for s in spec_of(sharded.states.frame_count))
        leaf = jax.tree_util.tree_leaves(sharded.params)[0]
        assert all(s is None for s in spec_of(leaf))

    def test_run_scan_matches_step_loop_sharded(self):
        hop = TINY.hop_length
        n_frames, n_sessions = 6, 8
        audio = np.stack([_speech_like(n_frames * hop, seed=90 + s)
                          for s in range(n_sessions)])
        _, sharded, mesh = self._servers(n_sessions)
        via_scan = np.asarray(sharded.run_scan(audio))

        _, stepper, _ = self._servers(n_sessions)
        via_steps = np.stack([np.asarray(
            stepper.step(audio[:, i * hop:(i + 1) * hop]))
            for i in range(n_frames)])
        np.testing.assert_allclose(via_scan, via_steps, atol=1e-6, rtol=0)

    def test_reset_under_mesh(self):
        hop = TINY.hop_length
        _, sharded, _ = self._servers(8)
        before = np.asarray(sharded.step(
            np.full((8, hop), 0.1, np.float32)))
        sharded.reset_sessions([0, 5])
        after = np.asarray(sharded.step(np.zeros((8, hop), np.float32)))
        assert np.isfinite(after).all()
        assert before.shape == after.shape == (8, 52)

    def test_uneven_sessions_rejected(self):
        from koemorph_tpu.parallel.mesh import make_mesh

        import pytest
        with pytest.raises(ValueError, match="divide"):
            MultiStreamInference(tiny_params(), TINY, 5, mesh=make_mesh())


class TestRefreshCohorts:
    """Staggered emotion refresh: lanes of cohort c must equal a dedicated
    StreamingInference whose clock STARTED at the cohort's phase — the
    cohort split is a scheduling change, not a compute change."""

    def test_cohort_lanes_match_phase_shifted_engines(self):
        import dataclasses

        from koemorph_tpu.runtime import StreamingInference
        from koemorph_tpu.runtime.streaming import init_stream_state

        params = tiny_params()
        hop = TINY.hop_length
        k = TINY.emotion_update_frames           # 3 in the TINY config
        n_frames, n_sessions, g = 2 * k + 1, 4, 2
        audio = np.stack([_speech_like(n_frames * hop, seed=120 + s)
                          for s in range(n_sessions)])

        server = MultiStreamInference(params, TINY, n_sessions,
                                      refresh_cohorts=g)
        phases = np.asarray(server.states.frame_count)
        assert phases.shape == (g,) and len(set(phases.tolist())) == g

        batched = np.stack([np.asarray(
            server.step(audio[:, i * hop:(i + 1) * hop]))
            for i in range(n_frames)])           # (T, S, 52)

        for s in range(n_sessions):
            single = StreamingInference(params, TINY)
            single.state = single.state.replace(
                frame_count=jnp.asarray(int(phases[s % g]), jnp.int32))
            frames = np.stack(single.process_audio(audio[s]))
            np.testing.assert_allclose(
                batched[:, s], frames, atol=1e-5, rtol=0,
                err_msg=f"lane {s} (cohort {s % g}) diverged")

    def test_cohort_machinery_with_equal_phases_equals_legacy(self):
        """Force both cohorts' clocks to phase 0: the cohort step's
        slice/vstep/reassemble machinery must then reproduce the legacy
        shared-clock server exactly (every lane refreshes together)."""
        hop = TINY.hop_length
        params = tiny_params()
        audio = np.stack([_speech_like(4 * hop, seed=140 + s)
                          for s in range(4)])
        a = MultiStreamInference(params, TINY, 4)
        b = MultiStreamInference(params, TINY, 4, refresh_cohorts=2)
        b.states = b.states.replace(
            frame_count=jnp.zeros((2,), jnp.int32))
        for i in range(4):
            chunk = audio[:, i * hop:(i + 1) * hop]
            np.testing.assert_allclose(
                np.asarray(a.step(chunk)), np.asarray(b.step(chunk)),
                atol=1e-6, rtol=0, err_msg=f"frame {i}")

    def test_cohort_step_has_zero_collectives_under_mesh(self):
        """The lane%G cohort layout keeps every cohort slice device-local;
        a contiguous-slice layout measured 75 collective-permutes + 30
        all-gathers per step on this same mesh."""
        from koemorph_tpu.parallel.mesh import make_mesh

        params = tiny_params()
        server = MultiStreamInference(params, TINY, 16,
                                      refresh_cohorts=2, mesh=make_mesh())
        hops = server._put_hops(
            jnp.zeros((16, TINY.hop_length), jnp.float32))
        compiled = jax.jit(server._sstep).lower(
            server.params, server.states, hops).compile()
        hlo = compiled.as_text()
        # the contiguous-slice layout's resharding signature was 75
        # collective-permutes + 30 all-to-alls + 30 state-sized
        # all-gathers per step
        for op in ("collective-permute", "all-to-all", "all-reduce"):
            assert hlo.count(op) == 0, f"{op} in cohort step"
        # remaining all-gathers must all feed XLA fft ops: the CPU-only
        # stft dispatch (ops/stft platform_dependent) uses jnp.fft, which
        # GSPMD cannot partition; the TPU path is a matmul DFT with no
        # fft op at all. Anything else gathering is a layout regression.
        lines = [l.strip()[:160] for l in hlo.splitlines()
                 if "all-gather" in l]
        n_fft = hlo.count("fft(%all-gather")
        assert hlo.count("all-gather(") == n_fft, "\n".join(lines)

    def test_cohorts_with_mesh(self):
        from koemorph_tpu.parallel.mesh import make_mesh

        hop = TINY.hop_length
        params = tiny_params()
        n_sessions, g = 16, 2                    # 8 lanes/cohort over 8 dev
        audio = np.stack([_speech_like(3 * hop, seed=160 + s)
                          for s in range(n_sessions)])
        plain = MultiStreamInference(params, TINY, n_sessions,
                                     refresh_cohorts=g)
        sharded = MultiStreamInference(params, TINY, n_sessions,
                                       refresh_cohorts=g, mesh=make_mesh())
        for i in range(3):
            chunk = audio[:, i * hop:(i + 1) * hop]
            np.testing.assert_allclose(
                np.asarray(plain.step(chunk)),
                np.asarray(sharded.step(chunk)), atol=1e-6, rtol=0)

    def test_reset_keeps_cohort_phase(self):
        hop = TINY.hop_length
        params = tiny_params()
        server = MultiStreamInference(params, TINY, 4, refresh_cohorts=2)
        phases = np.asarray(server.states.frame_count).copy()
        server.step(np.zeros((4, hop), np.float32))
        server.reset_sessions([0, 3])
        after = np.asarray(server.states.frame_count)
        np.testing.assert_array_equal(after, phases + 1)

    def test_run_scan_matches_step_loop_cohorted(self):
        hop = TINY.hop_length
        params = tiny_params()
        n_frames, n_sessions = 7, 4
        audio = np.stack([_speech_like(n_frames * hop, seed=180 + s)
                          for s in range(n_sessions)])
        a = MultiStreamInference(params, TINY, n_sessions,
                                 refresh_cohorts=2)
        via_scan = np.asarray(a.run_scan(audio))
        b = MultiStreamInference(params, TINY, n_sessions,
                                 refresh_cohorts=2)
        via_steps = np.stack([np.asarray(
            b.step(audio[:, i * hop:(i + 1) * hop]))
            for i in range(n_frames)])
        np.testing.assert_allclose(via_scan, via_steps, atol=1e-6, rtol=0)

    def test_validation(self):
        import pytest
        params = tiny_params()
        with pytest.raises(ValueError, match="refresh_cohorts"):
            MultiStreamInference(params, TINY, 8,
                                 refresh_cohorts=TINY.
                                 emotion_update_frames + 1)
        with pytest.raises(ValueError, match="divide into"):
            MultiStreamInference(params, TINY, 5, refresh_cohorts=2)


class TestInt16Ingest:
    def test_int16_step_bit_exact_vs_float(self):
        """Raw int16 PCM converts on device (x * 2^-15) bit-exactly to
        the float32 path (x / 32768.0) — the serve listen loop uploads
        half the bytes per tick with identical outputs."""
        params = tiny_params()
        hop = TINY.hop_length
        n_frames, n_sessions = 6, 2
        rng = np.random.default_rng(3)
        pcm = rng.integers(-32768, 32768,
                           (n_sessions, n_frames * hop)).astype(np.int16)
        as_float = pcm.astype(np.float32) / 32768.0

        sv_f = MultiStreamInference(params, TINY, n_sessions)
        sv_i = MultiStreamInference(params, TINY, n_sessions)
        sv_i.warmup(dtype=jnp.int16)
        for i in range(n_frames):
            sl = slice(i * hop, (i + 1) * hop)
            f = np.asarray(sv_f.step(as_float[:, sl]))
            g = np.asarray(sv_i.step(pcm[:, sl]))
            np.testing.assert_array_equal(
                f, g, err_msg=f"frame {i} int16 path diverged")
