"""Production-config sharding pins (VERDICT r2 item 4).

The round-2 DP-equivalence test ran a toy config (d_model=32, basic
emotion backend). These tests run the FLAGSHIP config — d_model=256,
egemaps emotion backend with 3-window concatenation, 256-frame mel
window — through the virtual 8-device mesh, because the eGeMAPS chain is
exactly the part with static-shape/sharding risk.

Heavy by unit-test standards (~2 min total on CPU): params/model are
built once per module and shared between the decode and train-step pins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koemorph_tpu.models.dual_stream_model import SequentialDualStreamModel
from koemorph_tpu.parallel import BatchedSequentialDecoder
from koemorph_tpu.parallel.mesh import batch_sharding, make_mesh, replicate

SPAN_FRAMES = 264          # window (256) + 8 output frames at stride 1
HOP = 533


def production_model() -> SequentialDualStreamModel:
    """Flagship config — must stay in sync with __graft_entry__.py."""
    return SequentialDualStreamModel(
        d_model=256, num_heads=8, mel_sequence_length=256,
        emotion_backend="egemaps", use_concatenation=True,
        stride_frames=1, target_fps=30, dropout=0.1)


@pytest.fixture(scope="module")
def prod():
    model = production_model()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(
        (8, SPAN_FRAMES * HOP)).astype(np.float32) * 0.1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 audio[:1])["params"]
    return model, params, audio


class TestProductionShardedDecode:
    def test_batched_decoder_matches_single_device(self, prod, cpu_devices):
        model, params, audio = prod

        # single-device reference (no mesh, replicated everything)
        ref = jax.jit(lambda p, a: model.apply(
            {"params": p}, a, deterministic=True)["blendshapes"])(
                params, audio)

        decoder = BatchedSequentialDecoder(model, params)
        assert decoder.num_devices == 8
        out = decoder(np.asarray(audio))
        assert out.shape == ref.shape == (8, 9, 52)
        assert len(out.sharding.device_set) == 8
        # sharding is a layout change, not a numerics change: each row is
        # computed by exactly one device with the same replicated params.
        # Local batch 1-per-device vs 8-on-one changes XLA matmul tile
        # shapes, so reductions reorder at ~1e-9 (measured 2.8e-9 max);
        # anything beyond that epsilon is a sharding bug.
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-7, rtol=0)

    def test_sequence_parallel_decode_production(self, prod, cpu_devices):
        """SP decode (ONE flagship utterance, 9 windows sharded over 8
        devices + EMA replay) must match the single-call decode."""
        model, params, audio = prod
        ref = jax.jit(lambda p, a: model.apply(
            {"params": p}, a, deterministic=True)["blendshapes"])(
                params, audio[:1])[0]                  # (9, 52)
        decoder = BatchedSequentialDecoder(model, params)
        out = decoder.decode_sequence_parallel(np.asarray(audio[0]))
        assert out.shape == ref.shape == (9, 52)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=0)


class TestProductionShardedTrainStep:
    def test_sharded_step_matches_single_device(self, prod, cpu_devices):
        import optax

        model, params, audio = prod
        rng = np.random.default_rng(1)
        targets = jnp.asarray(rng.uniform(
            0, 0.05, (8, 9, 52)).astype(np.float32))

        tx = optax.adam(1e-3)
        opt0 = tx.init(params)

        def loss_fn(p, a, t):
            out = model.apply({"params": p}, a, deterministic=True)
            return jnp.mean((out["blendshapes"] - t) ** 2)

        @jax.jit
        def step(p, opt, a, t):
            loss, g = jax.value_and_grad(loss_fn)(p, a, t)
            updates, opt = tx.update(g, opt)
            return optax.apply_updates(p, updates), loss

        p1, loss1 = step(params, opt0, audio, targets)

        mesh = make_mesh()
        sh = batch_sharding(mesh)
        p8, loss8 = step(replicate(params, mesh), replicate(opt0, mesh),
                         jax.device_put(audio, sh),
                         jax.device_put(targets, sh))

        # all-reduce vs single-device sum reorders the batch reduction;
        # tolerance covers reduction-order epsilon only
        np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
        for x, y in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p8)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-4, atol=2e-6)

        # 2-D (data=4, model=2) mesh: flagship params tensor-parallel per
        # the rule table, batch on the data axis. Pin LOSS and GRADIENTS
        # (the sharding-correctness signal) rather than the post-Adam
        # params: a fresh Adam state updates by ~lr*g/(|g|+eps), so for
        # near-zero gradient entries reduction-order epsilon flips the
        # update magnitude by O(10%) — measured 2/256 elements of one
        # bias — without any sharding bug. The full Adam-update
        # equivalence is pinned at tiny scale in
        # tests/parallel/test_tp_sp.py::test_trainer_tensor_parallel.
        from koemorph_tpu.parallel.tp import make_mesh_2d, shard_tree
        mesh2 = make_mesh_2d(data=4, model=2)
        sh2 = batch_sharding(mesh2)
        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        loss_1, g_1 = grad_fn(params, audio, targets)
        loss_tp, g_tp = grad_fn(shard_tree(params, mesh2),
                                jax.device_put(audio, sh2),
                                jax.device_put(targets, sh2))
        np.testing.assert_allclose(float(loss_1), float(loss_tp),
                                   rtol=1e-5)
        for x, y in zip(jax.tree_util.tree_leaves(g_1),
                        jax.tree_util.tree_leaves(g_tp)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-3, atol=1e-6)


class TestProductionMeshServing:
    """Mesh-sharded cohort serving at the FLAGSHIP shape (VERDICT r3
    item 5): the cohort-sliced eGeMAPS refresh under the session sharding
    is exactly where layout/collective risk lives, and until round 4 it
    was only pinned at the tiny config. Lane outputs of the sharded
    cohort server must match the unsharded cohort server (layout change
    only), and per-session state must STAY lane-sharded across steps."""

    def test_sharded_cohort_lanes_match_unsharded(self, prod, cpu_devices):
        from koemorph_tpu.runtime import MultiStreamInference, StreamingConfig

        _, params, _ = prod
        cfg = StreamingConfig()      # production defaults: d=256, egemaps,
        hop = cfg.hop_length         # 3-window concat, 256-frame window
        # device-local cohorts: each cohort must divide over the 8
        # devices, so 16 lanes x 2 cohorts = one lane per (cohort, device)
        n_sessions, cohorts, n_frames = 16, 2, 2
        rng = np.random.default_rng(7)
        t = np.arange(n_frames * hop) / cfg.sample_rate
        audio = np.stack([
            (0.3 * np.sin(2 * np.pi * (120 + 10 * s) * t)
             + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
            for s in range(n_sessions)])

        plain = MultiStreamInference(params, cfg, n_sessions,
                                     refresh_cohorts=cohorts)
        mesh = make_mesh()
        sharded = MultiStreamInference(params, cfg, n_sessions, mesh=mesh,
                                       refresh_cohorts=cohorts)
        for i in range(n_frames):
            chunk = audio[:, i * hop:(i + 1) * hop]
            a = np.asarray(plain.step(chunk))
            b = np.asarray(sharded.step(chunk))
            np.testing.assert_allclose(a, b, atol=1e-6, rtol=0,
                                       err_msg=f"frame {i}")

        axis = mesh.axis_names[0]
        assert sharded.states.mel_db.sharding.spec[0] == axis
        assert sharded.states.audio_ring.sharding.spec[0] == axis
        leaf = jax.tree_util.tree_leaves(sharded.params)[0]
        assert all(s is None for s in leaf.sharding.spec)
