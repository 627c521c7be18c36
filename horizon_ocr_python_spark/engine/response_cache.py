"""Content-addressed response cache + Spark bridge (azure/response_cache.py).

The reference caches every cloud response as ``<sha256-key>.json`` under a
cache directory so identical content never re-bills (response_cache.py:
37-233): deterministic key from (content, service, model, extra), put/get
with an in-memory index, has/stats/clear, mtime-based eviction above
max_entries, JSON-serialisation of model objects. This is the LOCAL
infrastructure half of C4 — the transport is cloud-scoped out, but a user
who recorded responses through the reference's cache can point THIS module
at the same directory.

``cached_responses_df`` is the Spark bridge the reference never needed:
it reads a cache directory as a DataFrame of (key, response-JSON) rows —
JVM-side ``spark.read.json``, no Python — shaped exactly for
``engine.azure_stage.map_recorded_responses``, closing the loop
cache -> table -> replay -> page model.

Recorded deviation: cached_at timestamps are UTC (the reference pins
America/New_York, response_cache.py:125 — a tz-dependent value is a
cross-engine determinism hazard and the timestamp is metadata only).
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time
from typing import Any, Optional


class ResponseCache:
    """File-per-entry content-addressed cache with an in-memory index."""

    def __init__(self, cache_dir: str = ".cache/azure", enabled: bool = True,
                 max_entries: int = 500) -> None:
        self.cache_dir = cache_dir
        self.enabled = enabled
        self.max_entries = max_entries
        self._index: dict[str, str] = {}
        self._lock = threading.Lock()
        self._hits = 0
        self._misses = 0
        if enabled:
            os.makedirs(cache_dir, exist_ok=True)
            self._index = {name[:-5]: os.path.join(cache_dir, name)
                           for name in os.listdir(cache_dir)
                           if name.endswith(".json")}

    @staticmethod
    def make_key(content: bytes, service: str = "di", model: str = "",
                 extra: str = "") -> str:
        """Deterministic key from content + service params
        (response_cache.py:66-91): sha256 over content, then service,
        model, and extra when present."""
        h = hashlib.sha256()
        h.update(content)
        h.update(service.encode())
        h.update(model.encode())
        if extra:
            h.update(extra.encode())
        return h.hexdigest()

    def _entry_path(self, key: str) -> str:
        return os.path.join(self.cache_dir, f"{key}.json")

    def get(self, key: str) -> Optional[dict]:
        """Cached response dict, or None on miss (disabled -> always None,
        response_cache.py:95-115). A corrupt or vanished entry counts as a
        miss, never an error."""
        entry = None
        if self.enabled and self.has(key):
            try:
                with open(self._entry_path(key), encoding="utf-8") as fh:
                    entry = json.load(fh)
            except (OSError, ValueError):
                entry = None
            if not isinstance(entry, dict):  # valid JSON, wrong shape
                entry = None
        if not self.enabled:
            return None
        if entry is None:
            self._misses += 1
            return None
        self._hits += 1
        return entry.get("response")

    def put(self, key: str, response: Any,
            metadata: Optional[dict] = None) -> None:
        """Store a response (no-op when disabled); evicts oldest entries
        past max_entries (response_cache.py:117-142, 213-233)."""
        if not self.enabled:
            return
        path = self._entry_path(key)
        body = json.dumps(
            {"key": key,
             # UTC, not wall-clock-local (recorded deviation, docstring)
             "cached_at": time.strftime("%Y-%m-%dT%H:%M:%S+00:00",
                                        time.gmtime()),
             "metadata": metadata or {},
             "response": _serialise(response)},
            ensure_ascii=False, default=str)
        try:
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(body)
        except OSError:
            return
        with self._lock:
            self._index[key] = path
        self._evict_over_limit()

    def has(self, key: str) -> bool:
        if not self.enabled:
            return False
        with self._lock:
            path = self._index.get(key)
        return path is not None and os.path.exists(path)

    @property
    def size(self) -> int:
        with self._lock:
            return len(self._index)

    @property
    def hit_rate(self) -> float:
        total = self._hits + self._misses
        return self._hits / total if total else 0.0

    def stats(self) -> dict:
        """response_cache.py:172-181 shape."""
        return {
            "enabled": self.enabled,
            "entries": self.size,
            "hits": self._hits,
            "misses": self._misses,
            "hit_rate": round(self.hit_rate, 3),
            "cache_dir": str(self.cache_dir),
        }

    def clear(self) -> int:
        """Delete every entry; returns how many (response_cache.py:185-199)."""
        with self._lock:
            count = 0
            for path in self._index.values():
                try:
                    os.unlink(path)
                    count += 1
                except OSError:
                    pass
            self._index.clear()
        self._hits = 0
        self._misses = 0
        return count

    def _evict_over_limit(self) -> None:
        with self._lock:
            excess = len(self._index) - self.max_entries
            if excess <= 0:
                return
            def mtime(item):
                try:
                    return os.stat(item[1]).st_mtime
                except OSError:
                    return 0.0
            for key, path in sorted(self._index.items(), key=mtime)[:excess]:
                try:
                    os.unlink(path)
                except OSError:
                    pass
                del self._index[key]


def _serialise(obj: Any) -> Any:
    """JSON-safe form of a response object (response_cache.py:235-273):
    objects exposing model_dump / dataclasses flatten to dicts, containers
    recurse, ndarrays drop (images are not responses)."""
    if obj is None:
        return None
    if hasattr(obj, "model_dump"):
        return obj.model_dump(mode="json")
    if hasattr(obj, "__dataclass_fields__"):
        import dataclasses

        return dataclasses.asdict(obj)
    if isinstance(obj, dict):
        return {k: _serialise(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_serialise(v) for v in obj]
    try:
        import numpy as np

        if isinstance(obj, np.ndarray):
            return None
    except ImportError:
        pass
    return obj


def cached_responses_df(spark, cache_dir: str):
    """A cache directory as a replay-ready DataFrame: one row per entry,
    columns (url = cache key, response = the response's raw JSON string).

    Reads each entry as whole text and slices out ``$.key`` / ``$.response``
    with ``get_json_object`` — NO schema inference, so a real reference
    cache dir that mixes Document Intelligence analyzeResults with GPT-KIE
    field dicts (the orchestrator shares one cache for both) round-trips
    each response verbatim instead of being mangled into a union schema.
    Entries whose response carries no ``pages`` (e.g. GPT-KIE dicts)
    simply map to zero page rows in the replay stage. An empty cache dir
    yields an empty frame, not an AnalysisException."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField("url", StringType(), True),
                         StructField("response", StringType(), True)])
    has_entries = os.path.isdir(cache_dir) and any(
        name.endswith(".json") for name in os.listdir(cache_dir))
    if not has_entries:
        return spark.createDataFrame([], schema)
    entries = spark.read.option("wholetext", "true").text(
        os.path.join(cache_dir, "*.json"))
    return entries.select(
        F.get_json_object("value", "$.key").alias("url"),
        F.get_json_object("value", "$.response").alias("response"))
