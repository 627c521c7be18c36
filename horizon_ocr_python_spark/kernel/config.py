"""Engine configuration — C7 (reference config.py:24-337: YAML -> nested
dataclasses with env-var fallback; defaults pinned to the reference's).

JSON instead of YAML (no PyYAML in this container; the contract — nested
config file -> typed dataclasses -> env override -> broadcastable dict — is
identical). Env vars use the HSP_<SECTION>_<FIELD> convention and take
precedence over the file, as in the reference's load order.

At scale the resolved dict is what gets broadcast to executors (SURVEY §2.2
P7 "flags = broadcast config"); dataclasses stay driver-side ergonomics.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class Thresholds:
    """Reference defaults: config.py:151-164 + targeted_reocr.py:64-67."""
    low_confidence: float = 0.5            # config.py:163
    reroute_to_tesseract_below: float = 0.60   # config.py:157
    reocr_confidence: float = 0.70         # targeted_reocr.py:64
    reocr_improvement: float = 0.05        # targeted_reocr.py:66
    max_reocr_lines: int = 50              # targeted_reocr.py:67
    # raster-path calibrations (the glyph recognizer's confidence scale
    # runs high — garbage ~0.7, clean >= 0.95 — so the re-OCR selection
    # threshold is recalibrated from the reference's 0.70; the image gates
    # are engine additions, see kernel.document)
    glyph_reocr_confidence: float = 0.90
    image_text_gate: float = 0.88
    picture_floor: float = 0.80
    # minimum recognized non-space chars (absent a table) for image-text
    # acceptance — the gate score is a char-weighted mean, so one lucky
    # noise cell must not clear it alone (kernel.document rationale)
    min_image_text_chars: int = 8


@dataclass
class FusionConfig:
    """Reference defaults: orchestrator.py:241-251 / fuse.py:44-71."""
    strategy: str = "weighted_vote"
    min_confidence: float = 0.2
    validator_bonus: float = 0.2
    source_weights: dict = field(default_factory=lambda: {
        "donut": 1.0, "layoutlmv3": 0.9, "trocr": 0.8,
        "tesseract": 0.7, "ppstructure": 0.85,
        "html_kv": 1.0, "html_table": 0.9, "pdf_text": 0.95,
        # raster-path sources, mirroring fuse.DEFAULT_SOURCE_WEIGHTS. A
        # user-supplied dict is MERGED over the kernel defaults at resolve
        # time (kernel.document._resolve_settings) — missing sources keep
        # their calibrated weights; explicit keys override.
        "ocr_fallback": 0.8, "ocr_table": 0.8,
    })


@dataclass
class ExtractionConfig:
    max_payload_bytes: int = 8 * 1024 * 1024   # engine length cap
    min_block_chars: int = 3                   # html_extract.MIN_BLOCK_CHARS
    max_link_density: float = 0.33             # html_extract.MAX_LINK_DENSITY
    min_text_density: float = 0.0              # chars/(1+tags); 0 = off


@dataclass
class EngineConfig:
    thresholds: Thresholds = field(default_factory=Thresholds)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    extraction: ExtractionConfig = field(default_factory=ExtractionConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


_SECTIONS = {"thresholds": Thresholds, "fusion": FusionConfig,
             "extraction": ExtractionConfig}


def _coerce(value: str, target_type: type) -> Any:
    if target_type is bool:
        return value.lower() in ("1", "true", "yes", "on")
    if target_type is int:
        return int(value)
    if target_type is float:
        return float(value)
    if target_type is dict:
        return json.loads(value)
    return value


def load_config(path: Optional[str] = None,
                data: Optional[dict] = None,
                env: Optional[dict] = None) -> EngineConfig:
    """Build EngineConfig from (in increasing precedence): dataclass
    defaults -> JSON file / dict -> HSP_* environment variables.

    Unknown file keys raise (the reference's Pydantic-style validation at
    the config boundary); unknown env vars are ignored (they may belong to
    other tools).
    """
    if path is not None:
        with open(path) as fh:
            data = json.load(fh)
    data = data or {}
    env = os.environ if env is None else env

    sections: dict[str, Any] = {}
    for name, cls in _SECTIONS.items():
        file_part = data.get(name, {})
        valid = {f.name: f for f in dataclasses.fields(cls)}
        unknown = set(file_part) - set(valid)
        if unknown:
            raise ValueError(f"unknown config keys in '{name}': {sorted(unknown)}")
        kwargs = dict(file_part)
        for fname, fdef in valid.items():
            env_key = f"HSP_{name.upper()}_{fname.upper()}"
            if env.get(env_key):  # empty value == unset, not an override
                ftype = (type(fdef.default) if fdef.default is not
                         dataclasses.MISSING else dict)
                kwargs[fname] = _coerce(env[env_key], ftype)
        sections[name] = cls(**kwargs)

    extra = set(data) - set(_SECTIONS)
    if extra:
        raise ValueError(f"unknown config sections: {sorted(extra)}")
    return EngineConfig(**sections)
