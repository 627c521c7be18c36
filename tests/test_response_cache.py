"""ResponseCache (engine/response_cache.py) vs the reference's contract
(azure/response_cache.py:37-273; expectations mirrored from the
reference's own tests, tests/test_cost_cache_batch.py:177-288), plus the
Spark bridge that closes cache -> table -> replay."""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from horizon_ocr_python_spark.engine.response_cache import (ResponseCache,
                                                            _serialise)


class TestKeys:
    def test_make_key_deterministic(self):
        a = ResponseCache.make_key(b"img", service="di", model="layout")
        b = ResponseCache.make_key(b"img", service="di", model="layout")
        assert a == b and len(a) == 64

    def test_make_key_differs_by_service(self):
        assert ResponseCache.make_key(b"img", service="di") != \
            ResponseCache.make_key(b"img", service="gpt")

    def test_make_key_differs_by_content(self):
        assert ResponseCache.make_key(b"a") != ResponseCache.make_key(b"b")

    def test_make_key_extra_differentiator(self):
        assert ResponseCache.make_key(b"a", extra="invoice") != \
            ResponseCache.make_key(b"a")


class TestCoreOps:
    def test_put_and_get(self, tmp_path):
        cache = ResponseCache(cache_dir=str(tmp_path / "c"))
        cache.put("k1", {"pages": [1, 2]})
        assert cache.get("k1") == {"pages": [1, 2]}

    def test_miss_returns_none(self, tmp_path):
        cache = ResponseCache(cache_dir=str(tmp_path / "c"))
        assert cache.get("nope") is None

    def test_has(self, tmp_path):
        cache = ResponseCache(cache_dir=str(tmp_path / "c"))
        assert not cache.has("k")
        cache.put("k", {"x": 1})
        assert cache.has("k")

    def test_disabled_cache(self, tmp_path):
        cache = ResponseCache(cache_dir=str(tmp_path / "c"), enabled=False)
        cache.put("k", {"x": 1})
        assert cache.get("k") is None and not cache.has("k")
        assert not (tmp_path / "c").exists()

    def test_stats(self, tmp_path):
        cache = ResponseCache(cache_dir=str(tmp_path / "c"))
        cache.put("k", {"x": 1})
        cache.get("k")
        cache.get("missing")
        s = cache.stats()
        assert s["entries"] == 1 and s["hits"] == 1 and s["misses"] == 1
        assert s["hit_rate"] == 0.5 and s["enabled"] is True

    def test_clear(self, tmp_path):
        cache = ResponseCache(cache_dir=str(tmp_path / "c"))
        cache.put("a", {}), cache.put("b", {})
        assert cache.clear() == 2
        assert cache.size == 0 and cache.get("a") is None

    def test_persistence_reloads_index(self, tmp_path):
        d = str(tmp_path / "c")
        ResponseCache(cache_dir=d).put("k", {"v": 7})
        again = ResponseCache(cache_dir=d)
        assert again.size == 1 and again.get("k") == {"v": 7}

    def test_eviction_keeps_newest(self, tmp_path):
        cache = ResponseCache(cache_dir=str(tmp_path / "c"), max_entries=3)
        for i in range(5):
            cache.put(f"k{i}", {"i": i})
            # distinct mtimes on coarse-resolution filesystems
            os.utime(os.path.join(cache.cache_dir, f"k{i}.json"),
                     (i, float(i)))
        assert cache.size == 3
        assert not cache.has("k0") and not cache.has("k1")
        assert cache.has("k4")

    def test_corrupt_entry_is_a_miss(self, tmp_path):
        cache = ResponseCache(cache_dir=str(tmp_path / "c"))
        cache.put("k", {"x": 1})
        with open(os.path.join(cache.cache_dir, "k.json"), "w") as fh:
            fh.write("{not json")
        assert cache.get("k") is None
        assert cache.stats()["misses"] == 1


@dataclasses.dataclass
class _FakeResult:
    text: str
    conf: float


class TestSerialise:
    def test_nested_containers(self):
        out = _serialise({"a": [{"b": 1}], "c": (2, 3)})
        assert out == {"a": [{"b": 1}], "c": [2, 3]}

    def test_dataclass_flattens(self):
        assert _serialise(_FakeResult("hi", 0.9)) == \
            {"text": "hi", "conf": 0.9}

    def test_ndarray_dropped(self):
        assert _serialise({"img": np.zeros((2, 2))}) == {"img": None}


class TestSparkBridge:
    def test_cache_to_replay_loop(self, spark, tmp_path):
        from horizon_ocr_python_spark.engine.azure_stage import (
            map_recorded_responses)
        from horizon_ocr_python_spark.engine.response_cache import (
            cached_responses_df)

        cache = ResponseCache(cache_dir=str(tmp_path / "c"))
        resp = {"pages": [{"pageNumber": 1, "width": 8.5, "height": 11.0,
                           "unit": "inch",
                           "lines": [{"content": "Cached line",
                                      "polygon": [1, 1, 3, 1, 3, 2, 1, 2],
                                      "spans": [{"offset": 0,
                                                 "length": 11}]}],
                           "words": []}]}
        key = ResponseCache.make_key(b"page-bytes", service="di",
                                     model="prebuilt-layout")
        cache.put(key, resp, metadata={"model": "prebuilt-layout"})

        df = cached_responses_df(spark, cache.cache_dir)
        pages = map_recorded_responses(df).collect()
        assert len(pages) == 1
        assert pages[0].url == key and pages[0].status == "ok"
        assert pages[0].text_lines[0].text == "Cached line"
        assert pages[0].raw_text == "Cached line"


class TestReviewFindings:
    def test_non_object_json_entry_is_a_miss(self, tmp_path):
        cache = ResponseCache(cache_dir=str(tmp_path / "c"))
        cache.put("k", {"x": 1})
        with open(os.path.join(cache.cache_dir, "k.json"), "w") as fh:
            fh.write("[1, 2]")  # valid JSON, wrong shape
        assert cache.get("k") is None
        assert cache.stats()["misses"] == 1

    def test_empty_cache_dir_yields_empty_frame(self, spark, tmp_path):
        from horizon_ocr_python_spark.engine.response_cache import (
            cached_responses_df)

        df = cached_responses_df(spark, str(tmp_path / "nothing"))
        assert df.count() == 0 and df.columns == ["url", "response"]

    def test_mixed_di_and_gpt_entries_round_trip(self, spark, tmp_path):
        # the reference shares ONE cache between DI analyzeResults and
        # GPT-KIE field dicts; both must survive verbatim (no inferred
        # union schema) and non-page entries map to zero page rows
        from horizon_ocr_python_spark.engine.azure_stage import (
            map_recorded_responses)
        from horizon_ocr_python_spark.engine.response_cache import (
            cached_responses_df)

        cache = ResponseCache(cache_dir=str(tmp_path / "c"))
        di = {"pages": [{"pageNumber": 1, "width": 1.0, "height": 1.0,
                         "lines": [{"content": "x",
                                    "spans": [{"offset": 0, "length": 1}]}],
                         "words": []}]}
        gpt = {"fields": {"total": "$5.00"}, "confidence": 0.9}
        cache.put("di-key", di)
        cache.put("gpt-key", gpt)

        df = cached_responses_df(spark, cache.cache_dir)
        rows = {r.url: r.response for r in df.collect()}
        assert json.loads(rows["gpt-key"]) == gpt  # verbatim round-trip
        mapped = map_recorded_responses(df)
        pages = mapped.collect()
        assert [r.url for r in pages if r.status == "ok"] == ["di-key"]
