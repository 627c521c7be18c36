"""C7 config loader — reference tests/test_config.py semantics: defaults,
partial file, invalid keys, env override precedence."""

import json

import pytest

from horizon_ocr_python_spark.kernel.config import EngineConfig, load_config


class TestDefaults:
    def test_reference_defaults(self):
        cfg = load_config(env={})
        assert cfg.thresholds.reroute_to_tesseract_below == 0.60
        assert cfg.thresholds.reocr_confidence == 0.70
        assert cfg.thresholds.reocr_improvement == 0.05
        assert cfg.thresholds.max_reocr_lines == 50
        assert cfg.fusion.strategy == "weighted_vote"
        assert cfg.fusion.source_weights["donut"] == 1.0
        assert cfg.fusion.source_weights["tesseract"] == 0.7
        assert cfg.extraction.max_link_density == 0.33

    def test_to_dict_broadcastable(self):
        d = load_config(env={}).to_dict()
        assert json.dumps(d)  # plain JSON-serializable (broadcast-safe)
        assert d["thresholds"]["low_confidence"] == 0.5


class TestFileLoad:
    def test_partial_file(self, tmp_path):
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({"fusion": {"strategy": "consensus"}}))
        cfg = load_config(path=str(p), env={})
        assert cfg.fusion.strategy == "consensus"
        assert cfg.thresholds.reocr_confidence == 0.70  # untouched default

    def test_unknown_key_rejected(self, tmp_path):
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({"fusion": {"stratgy": "typo"}}))
        with pytest.raises(ValueError, match="unknown config keys"):
            load_config(path=str(p), env={})

    def test_unknown_section_rejected(self):
        with pytest.raises(ValueError, match="unknown config sections"):
            load_config(data={"nonsense": {}}, env={})

    def test_invalid_json_raises(self, tmp_path):
        p = tmp_path / "cfg.json"
        p.write_text("{not json")
        with pytest.raises(json.JSONDecodeError):
            load_config(path=str(p))


class TestEnvOverride:
    def test_env_beats_file(self):
        cfg = load_config(
            data={"thresholds": {"reocr_confidence": 0.80}},
            env={"HSP_THRESHOLDS_REOCR_CONFIDENCE": "0.65"})
        assert cfg.thresholds.reocr_confidence == 0.65

    def test_env_type_coercion(self):
        cfg = load_config(env={
            "HSP_THRESHOLDS_MAX_REOCR_LINES": "25",
            "HSP_FUSION_STRATEGY": "highest_confidence",
            "HSP_FUSION_SOURCE_WEIGHTS": '{"donut": 2.0}',
        })
        assert cfg.thresholds.max_reocr_lines == 25
        assert cfg.fusion.strategy == "highest_confidence"
        assert cfg.fusion.source_weights == {"donut": 2.0}

    def test_unrelated_env_ignored(self):
        cfg = load_config(env={"HSP_NOPE_X": "1", "PATH": "/bin"})
        assert cfg == EngineConfig()


class TestConfigThroughEngine:
    def test_fusion_strategy_reaches_kernel(self):
        """A conflict page where highest_confidence and consensus disagree,
        extracted under each strategy via the kernel entry the engine uses."""
        from horizon_ocr_python_spark.kernel.document import extract_document

        # kv says $1.00 (conf 0.9); table repeats $2.00 twice via rows ->
        # consensus favors agreement, highest_confidence favors the 0.9 kv
        html = (b"<html><body><p>Total: $1.00</p>"
                b"<table><tr><td>Total</td><td>$2.00</td></tr></table>"
                b"<table><tr><td>Total</td><td>$2.00</td></tr></table>"
                b"</body></html>")
        hc = extract_document("u", html, fusion_strategy="highest_confidence")
        cs = extract_document("u", html, fusion_strategy="consensus")
        hc_total = next(f["value"] for f in hc["fields"] if f["name"] == "total")
        cs_total = next(f["value"] for f in cs["fields"] if f["name"] == "total")
        assert hc_total == "$1.00"
        assert cs_total == "$2.00"
