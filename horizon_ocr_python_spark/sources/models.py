"""S8 model-file source: registry, presence checks, executor distribution.

The reference ships a model downloader (download_models.py:1-253): a MODELS
registry of five weight sets (single-file .pt/.pth vs transformers
directories), presence checks (:82-95 — a transformers model needs
config.json + at least one *.safetensors; a file model needs the file),
idempotent skip-if-present download with per-model failure containment
(:98-121), an all-models driver with a downloaded/failed summary
(:174-197), and a status report (:200-224).

This module reimplements the registry/presence/idempotency/status contract
and adds the Spark half the reference's single-process design never needed
(SURVEY §2 S8 mapping: "SparkFiles/--archives distribution of model dir to
executors"):

- ``distribute_models`` ships the local model root to every executor via
  ``SparkContext.addFile(recursive=True)`` — ONCE per application, not per
  task;
- ``model_path`` resolves a model on an executor via SparkFiles (falling
  back to the local root in local mode / on the driver);
- ``load_model`` memoizes the loaded object per worker PROCESS, so a
  reused Python worker pays the load cost once, not once per task — the
  per-executor analog of the reference loading each model once per run.

The actual network fetch is this sandbox's declared boundary: there is no
huggingface_hub/transformers here, so ``ensure_models`` takes an injected
``fetch`` callable and the default raises NotImplementedError per model —
contained exactly like the reference's per-model try/except (:114-121),
so present models still verify and absent ones report failed.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

# Registry mirroring download_models.py:15-60 (public HuggingFace repo ids).
MODELS = [
    {"name": "DocLayNet YOLOv8", "repo_id": "hantian/yolo-doclaynet",
     "filename": "yolov8x-doclaynet.pt",
     "local_path": "models/yolov8x-doclaynet.pt",
     "description": "Document layout detection", "size_mb": 131},
    {"name": "CRAFT Text Detector",
     "repo_id": "boomb0om/CRAFT-text-detector",
     "filename": "craft_mlt_25k.pth",
     "local_path": "models/craft_mlt_25k.pth",
     "description": "Character-level text region detection", "size_mb": 80},
    {"name": "TrOCR Printed", "repo_id": "microsoft/trocr-base-printed",
     "filename": None, "local_path": "models/trocr-base-printed",
     "description": "Printed text OCR recognition", "size_mb": 1277,
     "type": "transformers"},
    {"name": "TrOCR Handwritten",
     "repo_id": "microsoft/trocr-base-handwritten",
     "filename": None, "local_path": "models/trocr-base-handwritten",
     "description": "Handwritten text OCR recognition", "size_mb": 1277,
     "type": "transformers"},
    {"name": "Table Transformer",
     "repo_id": "microsoft/table-transformer-structure-recognition",
     "filename": None, "local_path": "models/table-transformer-structure",
     "description": "Table structure detection", "size_mb": 110,
     "type": "transformers"},
]


def _resolve(root: str, local_path: str) -> str:
    return os.path.join(root, local_path)


def _dir_size_mb(path: str) -> float:
    """download_models.py:76-79."""
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total / 1024 / 1024


def is_model_present(model_info: dict, root: str = ".") -> bool:
    """Presence rule (download_models.py:82-95): transformers models need a
    directory with config.json AND at least one *.safetensors; file models
    need the file."""
    path = _resolve(root, model_info["local_path"])
    if model_info.get("type") == "transformers":
        return (os.path.isdir(path)
                and os.path.exists(os.path.join(path, "config.json"))
                and any(f.endswith(".safetensors")
                        for f in os.listdir(path)))
    return os.path.isfile(path)


def _default_fetch(model_info: dict, root: str) -> bool:
    """The network boundary: no huggingface_hub/transformers in this
    environment (download_models.py:124-171 would hf_hub_download /
    save_pretrained here). Contained per model by ensure_models."""
    raise NotImplementedError(
        f"no model hub access in this environment; place "
        f"{model_info['local_path']!r} under {root!r} yourself or inject "
        f"a fetch callable")


def ensure_models(root: str = ".", force: bool = False,
                  fetch: Optional[Callable[[dict, str], bool]] = None,
                  models: Optional[list] = None) -> dict:
    """Idempotent all-models driver (download_models.py:98-121, 174-197):
    present models are skipped unless ``force``; each fetch failure is
    contained per model; returns
    ``{"downloaded": n, "skipped": n, "failed": [names]}``."""
    fetch = fetch or _default_fetch
    downloaded, skipped, failed = 0, 0, []
    for model_info in models if models is not None else MODELS:
        if is_model_present(model_info, root) and not force:
            skipped += 1
            continue
        try:
            ok = fetch(model_info, root)
        except Exception:  # noqa: BLE001 — per-model containment (:114-121)
            ok = False
        if ok and is_model_present(model_info, root):
            downloaded += 1
        else:
            failed.append(model_info["name"])
    return {"downloaded": downloaded, "skipped": skipped, "failed": failed}


def check_models(root: str = ".", models: Optional[list] = None) -> dict:
    """Status report (download_models.py:200-224): name -> availability,
    path, and on-disk size."""
    status = {}
    for model_info in models if models is not None else MODELS:
        path = _resolve(root, model_info["local_path"])
        if is_model_present(model_info, root):
            size = (_dir_size_mb(path) if os.path.isdir(path)
                    else os.path.getsize(path) / 1024 / 1024)
            status[model_info["name"]] = {
                "available": True, "path": path, "size_mb": round(size, 1)}
        else:
            status[model_info["name"]] = {"available": False, "path": path}
    return status


# --- Spark distribution ------------------------------------------------------

def distribute_models(spark, root: str = ".",
                      models: Optional[list] = None) -> list[str]:
    """Ship every PRESENT model to the executors via
    ``SparkContext.addFile(..., recursive=True)`` — the SURVEY §2 S8
    mapping. One upload per application; Spark's file server caches the
    bits per executor, so 1000 executors do not hammer a shared
    filesystem. Returns the distributed model names."""
    shipped = []
    for model_info in models if models is not None else MODELS:
        if not is_model_present(model_info, root):
            continue
        path = _resolve(root, model_info["local_path"])
        spark.sparkContext.addFile(path, recursive=os.path.isdir(path))
        shipped.append(model_info["name"])
    return shipped


def model_path(local_path: str, root: str = ".") -> str:
    """Executor-side path of a distributed model: SparkFiles when the task
    runs with a files root (cluster executors), else the local root
    (driver / local mode)."""
    try:
        from pyspark import SparkFiles

        candidate = SparkFiles.get(os.path.basename(local_path))
        if os.path.exists(candidate):
            return candidate
    except Exception:  # noqa: BLE001 — no active Spark files root
        pass
    return _resolve(root, local_path)


_WORKER_CACHE: dict[str, object] = {}


def load_model(name: str, loader: Callable[[str], object],
               root: str = ".") -> object:
    """Per-worker-process memoized model load: the first task in a reused
    Python worker pays ``loader(path)``; every later task gets the cached
    object (spark.python.worker.reuse keeps workers alive across tasks).
    ``loader`` is injected because the weight formats need torch — absent
    here, the boundary documented in _default_fetch. The cache keys on the
    RESOLVED path, not just the name — two roots must not serve each
    other's weights."""
    info = next((m for m in MODELS if m["name"] == name), None)
    if info is None:
        raise KeyError(f"unknown model {name!r}")
    path = model_path(info["local_path"], root)
    key = f"{name}@{path}"
    if key in _WORKER_CACHE:
        return _WORKER_CACHE[key]
    obj = loader(path)
    _WORKER_CACHE[key] = obj
    return obj
