"""Config composition tests (Hydra-surface parity,
reference configs/config.yaml + README.md:210-228 override syntax)."""

from pathlib import Path

import pytest

from koemorph_tpu.utils.config import Config, load_config

REPO_CONFIGS = Path(__file__).resolve().parents[2] / "configs"


class TestRepoConfigs:
    def test_legacy_root_composes(self):
        cfg = load_config(REPO_CONFIGS / "config.yaml")
        assert cfg.seed == 42
        assert cfg.frame_rate == 30
        assert cfg.data.sample_rate == 16000
        assert cfg.model.d_model == 256
        assert cfg.training.optimizer.name == "adamw"

    def test_frame_rate_interpolation(self):
        cfg = load_config(REPO_CONFIGS / "config.yaml")
        assert cfg.data.target_fps == 30
        assert cfg.model.target_fps == 30

    def test_dual_stream_root(self):
        cfg = load_config(REPO_CONFIGS / "dual_stream_config.yaml")
        assert cfg.model.name == "sequential_dual_stream"
        assert cfg.model.emotion_config.backend == "egemaps"
        assert cfg.model.mel_sequence_length == 256
        assert cfg.data.features.mel is True

    def test_eval_resolver_60fps(self):
        cfg = load_config(REPO_CONFIGS / "dual_stream_config.yaml",
                          overrides=["frame_rate=60"])
        assert cfg.model.mel_sequence_length == 512
        assert cfg.model.target_fps == 60

    def test_dot_overrides(self):
        cfg = load_config(REPO_CONFIGS / "dual_stream_config.yaml",
                          overrides=["model.d_model=128",
                                     "training.optimizer.lr=3e-4",
                                     "+extra.flag=true"])
        assert cfg.model.d_model == 128
        assert cfg.training.optimizer.lr == pytest.approx(3e-4)
        assert cfg.extra.flag is True

    def test_group_swap(self):
        cfg = load_config(REPO_CONFIGS / "config.yaml",
                          overrides=["model=dual_stream"])
        assert cfg.model.name == "sequential_dual_stream"

    def test_model_group_defaults_inheritance(self):
        cfg = load_config(REPO_CONFIGS / "config.yaml",
                          overrides=["model=dual_stream_60fps",
                                     "frame_rate=60"])
        # dual_stream_60fps inherits dual_stream's keys
        assert cfg.model.emotion_config.backend == "egemaps"
        assert cfg.model.mel_sequence_length == 512


class TestConfigPrimitives:
    def test_attribute_access_and_wrap(self):
        cfg = Config.wrap({"a": {"b": [1, {"c": 2}]}})
        assert cfg.a.b[1].c == 2
        assert cfg.get_path("a.b") == cfg.a.b
        assert cfg.get_path("a.missing", "dflt") == "dflt"

    def test_interpolation_cycle_detected(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("a: ${b}\nb: ${a}\n")
        with pytest.raises(ValueError):
            load_config(p)

    def test_eval_rejects_names(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("a: ${eval:__import__}\n")
        with pytest.raises((ValueError, SyntaxError)):
            load_config(p)


class TestOverrideSemantics:
    def test_group_swap_preserves_root_customizations(self, tmp_path):
        """A CLI group swap must not discard the root config's inline
        customizations for that group (reviewed double-apply bug)."""
        (tmp_path / "model").mkdir()
        (tmp_path / "model" / "small.yaml").write_text("d: 8\n")
        (tmp_path / "model" / "large.yaml").write_text("d: 64\n")
        (tmp_path / "root.yaml").write_text(
            "defaults:\n  - model: small\n  - _self_\n"
            "model:\n  dropout: 0.2\n")
        cfg = load_config(tmp_path / "root.yaml", overrides=["model=large"])
        assert cfg.model.d == 64
        assert cfg.model.dropout == pytest.approx(0.2)

    def test_override_entry_replaces_selection(self, tmp_path):
        """'override group: name' replaces the earlier selection; keys from
        the discarded option must not leak (hydra semantics)."""
        (tmp_path / "model").mkdir()
        (tmp_path / "model" / "small.yaml").write_text(
            "d: 8\nextra_key: 1\n")
        (tmp_path / "model" / "large.yaml").write_text("d: 64\n")
        (tmp_path / "root.yaml").write_text(
            "defaults:\n  - model: small\n  - override model: large\n"
            "  - _self_\n")
        cfg = load_config(tmp_path / "root.yaml")
        assert cfg.model.d == 64
        assert "extra_key" not in cfg.model
