"""K4 BIO grouping kernel — reference layoutlmv3_runner.py:300-424 semantics
including the quiet edge cases."""

from horizon_ocr_python_spark.kernel.bio import group_bio_entities


def t(word, label, conf=0.9):
    return (word, label, conf)


class TestBioGrouping:
    def test_simple_entity(self):
        fields = group_bio_entities([
            t("$1,234.56", "B-TOTAL"),
        ])
        assert len(fields) == 1
        f = fields[0]
        assert f["name"] == "total" and f["value"] == "$1,234.56"
        assert f["data_type"] == "currency"

    def test_multiword_entity_joined(self):
        fields = group_bio_entities([
            t("January", "B-DATE", 0.8), t("15,", "I-DATE", 0.6),
            t("2024", "I-DATE", 0.7),
        ])
        assert fields[0]["value"] == "January 15, 2024"
        assert abs(fields[0]["confidence"] - 0.7) < 1e-9  # mean
        assert fields[0]["data_type"] == "date"

    def test_o_closes_entity(self):
        fields = group_bio_entities([
            t("a", "B-VENDOR"), t("x", "O"), t("b", "B-VENDOR"),
        ])
        assert [f["value"] for f in fields] == ["a", "b"]
        assert fields[0]["data_type"] == "string"

    def test_b_closes_previous(self):
        fields = group_bio_entities([
            t("a", "B-AMOUNT"), t("b", "B-TAX"),
        ])
        assert [(f["name"], f["value"]) for f in fields] == \
            [("amount", "a"), ("tax", "b")]

    def test_mismatched_i_skipped_entity_stays_open(self):
        # I-DATE inside an AMOUNT run: the word is dropped, the run continues
        # (layoutlmv3_runner.py:333-340 has no inner else)
        fields = group_bio_entities([
            t("10", "B-AMOUNT"), t("bogus", "I-DATE"), t("20", "I-AMOUNT"),
        ])
        assert len(fields) == 1
        assert fields[0]["value"] == "10 20"

    def test_orphan_i_ignored(self):
        fields = group_bio_entities([
            t("lost", "I-AMOUNT"), t("kept", "B-TAX"),
        ])
        assert [f["value"] for f in fields] == ["kept"]

    def test_final_entity_flushed(self):
        fields = group_bio_entities([t("end", "B-VENDOR", 0.4)])
        assert fields[0]["status"] == "uncertain"

    def test_status_thresholds(self):
        assert group_bio_entities([t("x", "B-A", 0.8)])[0]["status"] == "confident"
        assert group_bio_entities([t("x", "B-A", 0.6)])[0]["status"] == "single_source"

    def test_bbox_union(self):
        fields = group_bio_entities(
            [t("a", "B-AMOUNT"), t("b", "I-AMOUNT")],
            boxes=[(0, 0, 10, 10), (20, 5, 30, 15)])
        assert fields[0]["bbox"] == (0, 0, 30, 15)

    def test_empty(self):
        assert group_bio_entities([]) == []
