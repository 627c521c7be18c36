"""Targeted re-processing (O7): selection, acceptance, and application.

Semantics pinned to the reference's TargetedReOCR (docvision/ocr/
targeted_reocr.py), minus the image enhancement + engine calls (cv2/models
absent — the recompute function is injected, mirroring the reference's
strategy dispatch at targeted_reocr.py:349-445):

- selection: lines with confidence < 0.70, worst-first capped at 50/page
  (identify_low_confidence_lines, targeted_reocr.py:150-178; defaults
  targeted_reocr.py:64-67 — confidence_threshold 0.70, max 50)
- acceptance: improvement = new_conf - old_conf; accept iff
  improvement >= 0.05 (targeted_reocr.py:440-443; improvement_threshold
  config at targeted_reocr.py:66 / config.py:221)
- application: accepted results overwrite text/confidence/source in place;
  stats track processed/improved/failed (process_local,
  targeted_reocr.py:470-512)

Dataset-level analogue of the selection: Window.partitionBy(page).orderBy
(confidence) + row_number <= K — surfaced as the `o7_worst_k` oracle query.
"""

from __future__ import annotations

from typing import Callable, Optional

CONFIDENCE_THRESHOLD = 0.70   # targeted_reocr.py:64
IMPROVEMENT_THRESHOLD = 0.05  # targeted_reocr.py:66
MAX_REOCR_LINES = 50          # targeted_reocr.py:67


def identify_low_confidence_lines(lines: list[dict],
                                  threshold: Optional[float] = None,
                                  max_lines: int = MAX_REOCR_LINES) -> list[dict]:
    """Select re-OCR candidates (targeted_reocr.py:150-178).

    Filter below threshold; if more than max_lines qualify, keep the WORST
    max_lines (sorted ascending by confidence — Python's stable sort, so
    equal-confidence lines keep their original order, as in the reference).
    """
    thresh = threshold if threshold is not None else CONFIDENCE_THRESHOLD
    low_conf = [ln for ln in lines if ln["confidence"] < thresh]
    if len(low_conf) > max_lines:
        low_conf.sort(key=lambda ln: ln["confidence"])
        low_conf = low_conf[:max_lines]
    return low_conf


def reocr_result(original_text: str, original_confidence: float,
                 new_text: str, new_confidence: float,
                 source: str = "reocr") -> dict:
    """ReOCRResult with the acceptance rule applied
    (targeted_reocr.py:71-79, 440-443)."""
    improvement = new_confidence - original_confidence
    return {
        "original_text": original_text,
        "original_confidence": original_confidence,
        "new_text": new_text,
        "new_confidence": new_confidence,
        "improved": improvement >= IMPROVEMENT_THRESHOLD,
        "source": source,
    }


def process_lines(lines: list[dict],
                  recompute: Callable[[dict], tuple[str, float]],
                  threshold: Optional[float] = None,
                  max_lines: int = MAX_REOCR_LINES,
                  source: str = "reocr") -> dict:
    """Run the full O7 pass in place (process_local,
    targeted_reocr.py:470-512): select candidates, recompute each, apply
    accepted improvements, return stats.

    `recompute(line) -> (new_text, new_confidence)` stands in for the
    enhancement+engine strategy (injected, like the reference's
    strategy enum).
    """
    candidates = identify_low_confidence_lines(lines, threshold, max_lines)
    improved = 0
    for line in candidates:
        new_text, new_conf = recompute(line)
        result = reocr_result(line["text"], line["confidence"],
                              new_text, new_conf, source)
        if result["improved"]:
            line["text"] = result["new_text"]
            line["confidence"] = result["new_confidence"]
            line["source"] = result["source"]
            improved += 1
    return {
        "total_processed": len(candidates),
        "improved": improved,
        "failed": len(candidates) - improved,
    }
