"""Mesh/sharding tests on the virtual 8-device CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koemorph_tpu.parallel import (
    batch_sharding,
    local_batch_size,
    make_mesh,
    pad_batch_to_multiple,
    replicate,
    shard_batch,
)


class TestMesh:
    def test_full_mesh(self, cpu_devices):
        mesh = make_mesh()
        assert mesh.devices.size == len(cpu_devices)
        assert mesh.axis_names == ("data",)

    def test_subset_mesh(self):
        mesh = make_mesh(num_devices=4)
        assert mesh.devices.size == 4

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh(num_devices=1024)


class TestSharding:
    def test_shard_batch_places_across_devices(self):
        mesh = make_mesh()
        batch = {"audio": np.zeros((16, 100), np.float32),
                 "step": np.asarray(3)}
        sharded = shard_batch(batch, mesh)
        assert sharded["audio"].sharding == batch_sharding(mesh)
        assert len(sharded["audio"].sharding.device_set) == 8
        # scalar replicated
        assert sharded["step"].sharding.is_fully_replicated

    def test_replicate_params(self):
        mesh = make_mesh()
        params = {"w": jnp.ones((4, 4))}
        rep = replicate(params, mesh)
        assert rep["w"].sharding.is_fully_replicated

    def test_psum_over_sharded_batch(self):
        """A jitted mean over a sharded batch matches the host value (XLA
        inserts the collective)."""
        mesh = make_mesh()
        x = np.arange(32, dtype=np.float32).reshape(16, 2)
        sharded = shard_batch({"x": x}, mesh)["x"]
        got = jax.jit(lambda a: jnp.mean(a))(sharded)
        np.testing.assert_allclose(np.asarray(got), x.mean(), rtol=1e-6)

    def test_pad_batch_to_multiple(self):
        batch = {"a": np.ones((5, 3)), "s": np.asarray(1)}
        padded, real = pad_batch_to_multiple(batch, 8)
        assert padded["a"].shape == (8, 3)
        assert real == 5
        np.testing.assert_array_equal(padded["a"][4], padded["a"][7])

    def test_local_batch_size(self):
        mesh = make_mesh(num_devices=4)
        assert local_batch_size(16, mesh) == 4
        with pytest.raises(ValueError):
            local_batch_size(10, mesh)


class TestBatchedSequentialDecoder:
    def test_decode_over_8_devices(self, dummy_audio):
        import jax.numpy as jnp
        from koemorph_tpu.models.dual_stream_model import (
            SequentialDualStreamModel)
        from koemorph_tpu.parallel import BatchedSequentialDecoder

        model = SequentialDualStreamModel(
            d_model=32, num_heads=2, mel_sequence_length=16,
            emotion_backend="basic", use_concatenation=False,
            stride_frames=4, dropout=0.0)
        span = 24 * 533
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, span)))["params"]
        decoder = BatchedSequentialDecoder(model, params)
        assert decoder.num_devices == 8
        batch = np.stack([dummy_audio[:span]] * 16)
        out = decoder(batch)
        assert out.shape == (16, 3, 52)
        # batch axis is sharded across the mesh
        assert len(out.sharding.device_set) == 8
        # padded rows identical to source rows (pure function of input)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[8]),
                                   atol=1e-5)

    def test_indivisible_batch_raises(self):
        import jax.numpy as jnp
        from koemorph_tpu.models.dual_stream_model import (
            SequentialDualStreamModel)
        from koemorph_tpu.parallel import BatchedSequentialDecoder

        model = SequentialDualStreamModel(
            d_model=32, num_heads=2, mel_sequence_length=16,
            emotion_backend="basic", use_concatenation=False,
            stride_frames=4, dropout=0.0)
        span = 17 * 533
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, span)))["params"]
        decoder = BatchedSequentialDecoder(model, params)
        with pytest.raises(ValueError):
            decoder(np.zeros((3, span), np.float32))


class TestDataParallelEquivalence:
    """Distributed-correctness pin: a jitted train step over the 8-device
    mesh must produce the SAME loss and the same updated params as the
    identical global batch on one device — data parallelism is a layout
    change, not a numerics change (XLA all-reduce vs single-device sum)."""

    def test_sharded_step_matches_single_device(self, cpu_devices):
        import optax

        from koemorph_tpu.models.dual_stream_model import (
            SequentialDualStreamModel)
        from koemorph_tpu.parallel.mesh import (
            batch_sharding, make_mesh, replicate)

        model = SequentialDualStreamModel(
            d_model=32, num_heads=2, mel_sequence_length=16,
            emotion_backend="basic", use_concatenation=False,
            stride_frames=8, target_fps=30, dropout=0.0)
        rng = np.random.default_rng(0)
        span = 24
        audio = jnp.asarray(rng.standard_normal(
            (8, span * 533)).astype(np.float32) * 0.1)
        n_out = (span - 16) // 8 + 1
        targets = jnp.asarray(rng.uniform(
            0, 0.05, (8, n_out, 52)).astype(np.float32))

        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     audio[:1])["params"]
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

        # single device
        p1, loss1 = step(params, opt0, audio, targets)

        # sharded over the full mesh
        mesh = make_mesh()
        sh = batch_sharding(mesh)
        p_rep = replicate(params, mesh)
        opt_rep = replicate(opt0, mesh)
        a_sh = jax.device_put(audio, sh)
        t_sh = jax.device_put(targets, sh)
        p8, loss8 = step(p_rep, opt_rep, a_sh, t_sh)

        np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
        flat1 = jax.tree_util.tree_leaves(p1)
        flat8 = jax.tree_util.tree_leaves(p8)
        for x, y in zip(flat1, flat8):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-4, atol=2e-6)


class TestScheduledDecode:
    """Progressive-stride batched decoding (BASELINE.json config #5)."""

    def _model(self, stride):
        from koemorph_tpu.models.dual_stream_model import (
            SequentialDualStreamModel)
        return SequentialDualStreamModel(
            d_model=32, num_heads=2, mel_sequence_length=16,
            emotion_backend="basic", use_concatenation=False,
            stride_frames=stride, dropout=0.0)

    def test_uniform_schedule_matches_fixed_stride(self, dummy_audio):
        import jax.numpy as jnp
        from koemorph_tpu.parallel import BatchedSequentialDecoder

        model = self._model(4)
        span = 32 * 533
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, span)))["params"]
        decoder = BatchedSequentialDecoder(model, params)
        batch = np.stack([dummy_audio[:span]] * 8)
        ref = np.asarray(decoder(batch))
        out, mask = decoder.decode_scheduled(batch, 4)
        assert mask.all() and out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    def test_per_utterance_strides_pad_and_mask(self, dummy_audio):
        import jax.numpy as jnp
        from koemorph_tpu.parallel import BatchedSequentialDecoder

        span = 32 * 533
        num_frames, window = 32, 16
        audio = np.stack([dummy_audio[:span]] * 8)
        model4 = self._model(4)
        params = jax.jit(model4.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, span)))["params"]
        decoder = BatchedSequentialDecoder(model4, params)

        strides = np.array([4, 8] * 4)
        out, mask = decoder.decode_scheduled(audio, strides)
        n4 = (num_frames - window) // 4 + 1      # densest rows
        n8 = (num_frames - window) // 8 + 1
        assert out.shape == (8, n4, 52)
        assert mask[0].sum() == n4 and mask[1].sum() == n8

        # each row must equal the fixed-stride sequential decode at ITS
        # stride (EMA smoothing runs over that row's own window sequence)
        for stride, row in ((4, 0), (8, 1)):
            m = self._model(stride)
            ref = jax.jit(lambda a, m=m: m.apply(
                {"params": params}, a, deterministic=True)["blendshapes"])(
                    jnp.asarray(audio[row:row + 1]))
            n = (num_frames - window) // stride + 1
            np.testing.assert_allclose(
                np.asarray(out[row, :n]), np.asarray(ref[0]), atol=1e-5)

    def test_exact_window_stft_rejects_schedule(self):
        import jax.numpy as jnp
        from koemorph_tpu.models.dual_stream_model import (
            SequentialDualStreamModel)

        model = SequentialDualStreamModel(
            d_model=32, num_heads=2, mel_sequence_length=16,
            emotion_backend="basic", use_concatenation=False,
            stride_frames=4, dropout=0.0, exact_window_stft=True)
        span = 24 * 533
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, span)))["params"]
        with pytest.raises(ValueError, match="window_starts"):
            model.apply({"params": params},
                        jnp.zeros((1, span)), deterministic=True,
                        window_starts=jnp.zeros((1, 3), jnp.int32))
