"""Monitor tests (reference tests had none for the monitor; these cover the
statistics/report/export surface and thread safety)."""

import json
import threading

import numpy as np

from koemorph_tpu.utils.emotion_monitor import (
    EmotionProcessingMonitor,
    get_monitor,
    initialize_monitor,
)


class TestMonitor:
    def test_record_and_statistics(self, tmp_path):
        m = EmotionProcessingMonitor(log_dir=tmp_path, enable_plotting=False)
        t = m.log_processing_start("egemaps", audio_shape=(1, 16000))
        m.log_processing_end(t, success=True,
                             emotion_predictions={"happy": 0.8,
                                                  "neutral": 0.2},
                             blendshape_weights=np.full(52, 0.2))
        s = m.get_statistics()
        assert s["total_extractions"] == 1
        assert s["success_rate"] == 1.0
        assert "egemaps" in s["backends"]
        assert s["backends"]["egemaps"]["count"] == 1
        assert m.history[0]["dominant_emotion"] == "happy"
        assert m.history[0]["blendshape_stats"]["active_count"] == 52

    def test_fallback_log(self, tmp_path):
        m = EmotionProcessingMonitor(log_dir=tmp_path, enable_plotting=False)
        m.log_fallback_usage("emotion2vec", "opensmile", "weights missing")
        assert m.get_statistics()["fallback_events"] == 1

    def test_report_and_export(self, tmp_path):
        m = EmotionProcessingMonitor(log_dir=tmp_path, enable_plotting=False)
        t = m.log_processing_start("basic")
        m.log_processing_end(t, success=True)
        report = m.generate_report()
        assert "# Emotion Processing Report" in report
        assert "basic" in report
        path = m.export_data()
        data = json.loads(open(path).read())
        assert data["statistics"]["total_extractions"] == 1
        assert len(data["history"]) == 1

    def test_thread_safety(self, tmp_path):
        m = EmotionProcessingMonitor(log_dir=tmp_path, enable_plotting=False)

        def worker():
            for _ in range(50):
                t = m.log_processing_start("egemaps")
                m.log_processing_end(t, success=True)

        threads = [threading.Thread(target=worker) for _ in range(4)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert m.get_statistics()["total_extractions"] == 200

    def test_reset(self, tmp_path):
        m = EmotionProcessingMonitor(log_dir=tmp_path, enable_plotting=False)
        t = m.log_processing_start("basic")
        m.log_processing_end(t)
        m.reset_metrics()
        assert m.get_statistics()["total_extractions"] == 0

    def test_singleton_and_initialize(self, tmp_path):
        a = get_monitor()
        b = get_monitor()
        assert a is b
        c = initialize_monitor({"log_dir": str(tmp_path), "verbose": True})
        assert get_monitor() is c
        assert c.verbose

    def test_plot(self, tmp_path):
        m = EmotionProcessingMonitor(log_dir=tmp_path)
        t = m.log_processing_start("egemaps")
        m.log_processing_end(t, success=True)
        out = m.plot_performance_metrics()
        assert out is not None and out.endswith(".png")


class TestExtractorIntegration:
    def test_extractor_records_into_monitor(self, dummy_audio, tmp_path):
        from koemorph_tpu.features.emotion import EmotionExtractor
        m = initialize_monitor({"log_dir": str(tmp_path),
                                "enable_plotting": False})
        ex = EmotionExtractor(backend="basic", enable_caching=False)
        ex.extract_features(dummy_audio)
        assert m.get_statistics()["total_extractions"] >= 1
