"""K4: BIO-tagged token grouping into fields.

Exact semantics of the reference's _group_entities / _create_field_from_entity
(docvision/kie/layoutlmv3_runner.py:300-424), including the quiet edge cases:

- `B-X` starts a new entity (closing any open one)
- `I-X` continues ONLY when an entity of the same type is open; an `I-X`
  with a DIFFERENT type mid-entity is silently skipped and the entity stays
  open (the reference's elif has no inner else, :333-340)
- an orphan `I-X` with no open entity closes nothing and starts nothing
  (falls to the outside branch with current_entity=None, :342-355)
- `O` (or any other label) closes the open entity
- the final open entity is flushed at end of stream (:357-365)
- field: value = " ".join(words); confidence = mean; bbox = union;
  name = type.lower(); data_type AMOUNT/TOTAL/TAX -> currency, DATE -> date;
  status >=0.8 confident / >=0.5 single_source / uncertain (:369-424)

Dataset-level analogue (the common path, no orphan/mismatched I): runs =
cumulative count of B- starts over an ordered window — surfaced as the
`k4_bio_grouping` oracle query.
"""

from __future__ import annotations

from typing import Optional

CURRENCY_TYPES = {"AMOUNT", "TOTAL", "TAX"}


def _entity_field(entity_type: str, words: list[str], boxes: list,
                  confidences: list[float], page_num: int,
                  source: str = "layoutlmv3") -> dict:
    value = " ".join(words)
    avg_conf = sum(confidences) / len(confidences) if confidences else 0.0
    bbox = None
    if boxes:
        bbox = (min(b[0] for b in boxes), min(b[1] for b in boxes),
                max(b[2] for b in boxes), max(b[3] for b in boxes))
    if entity_type in CURRENCY_TYPES:
        data_type = "currency"
    elif entity_type == "DATE":
        data_type = "date"
    else:
        data_type = "string"
    if avg_conf >= 0.8:
        status = "confident"
    elif avg_conf >= 0.5:
        status = "single_source"
    else:
        status = "uncertain"
    return {
        "name": entity_type.lower(),
        "value": value,
        "data_type": data_type,
        "confidence": avg_conf,
        "status": status,
        "page": page_num,
        "bbox": bbox,
        "chosen_source": source,
        "candidates": [{"source": source, "value": value,
                        "confidence": avg_conf, "bbox": bbox,
                        "page": page_num, "metadata": {}}],
        "validators": [],
    }


def group_bio_entities(results: list[tuple[str, str, float]],
                       boxes: Optional[list] = None,
                       page_num: int = 1) -> list[dict]:
    """Group (word, label, confidence) triples into Field dicts."""
    boxes = boxes or []
    fields: list[dict] = []
    current_entity: Optional[str] = None
    current_words: list[str] = []
    current_boxes: list = []
    current_confs: list[float] = []

    def flush() -> None:
        nonlocal current_entity, current_words, current_boxes, current_confs
        if current_entity:
            fields.append(_entity_field(current_entity, current_words,
                                        current_boxes, current_confs, page_num))
        current_entity, current_words = None, []
        current_boxes, current_confs = [], []

    for i, (word, label, conf) in enumerate(results):
        if label.startswith("B-"):
            flush()
            current_entity = label[2:]
            current_words = [word]
            current_boxes = [boxes[i]] if i < len(boxes) else []
            current_confs = [conf]
        elif label.startswith("I-") and current_entity:
            if label[2:] == current_entity:
                current_words.append(word)
                if i < len(boxes):
                    current_boxes.append(boxes[i])
                current_confs.append(conf)
            # mismatched I-type: skipped, entity stays open (:333-340)
        else:
            flush()
    flush()
    return fields
