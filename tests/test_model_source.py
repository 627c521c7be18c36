"""S8 model-file source (sources/models.py) vs download_models.py:1-253:
registry shape, presence rules, idempotent ensure with per-model
containment, status report, and the Spark distribution half."""

from __future__ import annotations

import os

import pytest

from horizon_ocr_python_spark.sources import models as model_src


def _fake_file_model(root, info, n_bytes=64):
    path = os.path.join(root, info["local_path"])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(b"\x00" * n_bytes)


def _fake_transformers_model(root, info):
    path = os.path.join(root, info["local_path"])
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as fh:
        fh.write("{}")
    with open(os.path.join(path, "model.safetensors"), "wb") as fh:
        fh.write(b"\x00" * 128)


FILE_MODEL = model_src.MODELS[0]        # yolov8x-doclaynet.pt
TRF_MODEL = model_src.MODELS[2]         # trocr-base-printed dir


class TestRegistryAndPresence:
    def test_registry_mirrors_reference(self):
        # download_models.py:15-60: five entries, two single-file + three
        # transformers dirs
        assert len(model_src.MODELS) == 5
        assert sum(1 for m in model_src.MODELS
                   if m.get("type") == "transformers") == 3
        assert {m["name"] for m in model_src.MODELS} == {
            "DocLayNet YOLOv8", "CRAFT Text Detector", "TrOCR Printed",
            "TrOCR Handwritten", "Table Transformer"}

    def test_file_model_presence(self, tmp_path):
        assert not model_src.is_model_present(FILE_MODEL, str(tmp_path))
        _fake_file_model(str(tmp_path), FILE_MODEL)
        assert model_src.is_model_present(FILE_MODEL, str(tmp_path))

    def test_transformers_presence_needs_config_and_weights(self, tmp_path):
        # download_models.py:88-93: dir + config.json + *.safetensors
        root = str(tmp_path)
        path = os.path.join(root, TRF_MODEL["local_path"])
        os.makedirs(path)
        assert not model_src.is_model_present(TRF_MODEL, root)
        with open(os.path.join(path, "config.json"), "w") as fh:
            fh.write("{}")
        assert not model_src.is_model_present(TRF_MODEL, root)  # no weights
        with open(os.path.join(path, "model.safetensors"), "wb") as fh:
            fh.write(b"\x00")
        assert model_src.is_model_present(TRF_MODEL, root)


class TestEnsureModels:
    def test_skip_present_fetch_missing(self, tmp_path):
        root = str(tmp_path)
        _fake_file_model(root, FILE_MODEL)
        fetched = []

        def fetch(info, r):
            fetched.append(info["name"])
            if info.get("type") == "transformers":
                _fake_transformers_model(r, info)
            else:
                _fake_file_model(r, info)
            return True

        summary = model_src.ensure_models(root, fetch=fetch)
        # present model skipped (idempotency, :106-112), others fetched
        assert FILE_MODEL["name"] not in fetched
        assert summary == {"downloaded": 4, "skipped": 1, "failed": []}

    def test_force_refetches_all(self, tmp_path):
        root = str(tmp_path)
        _fake_file_model(root, FILE_MODEL)
        calls = []

        def fetch(info, r):
            calls.append(info["name"])
            _fake_file_model(r, info) if info.get("type") != "transformers" \
                else _fake_transformers_model(r, info)
            return True

        model_src.ensure_models(root, force=True, fetch=fetch)
        assert len(calls) == 5

    def test_per_model_failure_containment(self, tmp_path):
        # one fetch raising must not kill the run (:114-121)
        root = str(tmp_path)

        def fetch(info, r):
            if info["name"] == "CRAFT Text Detector":
                raise OSError("network down")
            if info.get("type") == "transformers":
                _fake_transformers_model(r, info)
            else:
                _fake_file_model(r, info)
            return True

        summary = model_src.ensure_models(root, fetch=fetch)
        assert summary["downloaded"] == 4
        assert summary["failed"] == ["CRAFT Text Detector"]

    def test_default_fetch_is_declared_boundary(self, tmp_path):
        summary = model_src.ensure_models(str(tmp_path))
        assert summary["downloaded"] == 0
        assert len(summary["failed"]) == 5  # all contained, none raised

    def test_check_models_status(self, tmp_path):
        root = str(tmp_path)
        _fake_file_model(root, FILE_MODEL, n_bytes=2048)
        status = model_src.check_models(root)
        assert status[FILE_MODEL["name"]]["available"] is True
        assert status[FILE_MODEL["name"]]["size_mb"] == 0.0  # tiny fake
        assert status["CRAFT Text Detector"]["available"] is False


class TestSparkDistribution:
    def test_distribute_and_resolve_on_executors(self, spark, tmp_path):
        root = str(tmp_path)
        _fake_file_model(root, FILE_MODEL, n_bytes=32)
        shipped = model_src.distribute_models(spark, root)
        assert shipped == [FILE_MODEL["name"]]

        local_path = FILE_MODEL["local_path"]

        def read_on_worker(_):
            path = model_src.model_path(local_path, root)
            with open(path, "rb") as fh:
                return [len(fh.read())]

        sizes = (spark.sparkContext.parallelize(range(4), 4)
                 .mapPartitions(read_on_worker).collect())
        assert sizes == [32, 32, 32, 32]

    def test_load_model_memoized_per_process(self, tmp_path):
        root = str(tmp_path)
        _fake_file_model(root, FILE_MODEL)
        model_src._WORKER_CACHE.clear()
        loads = []

        def loader(path):
            loads.append(path)
            return object()

        a = model_src.load_model(FILE_MODEL["name"], loader, root)
        b = model_src.load_model(FILE_MODEL["name"], loader, root)
        assert a is b and len(loads) == 1

    def test_load_model_unknown_name(self):
        with pytest.raises(KeyError):
            model_src.load_model("nope", lambda p: None)
