"""JSONL ingest: good/quarantine split, schema discipline, round-trip."""

from __future__ import annotations

import gzip

import pytest

from blueetl_spark.sources import corpus


@pytest.fixture()
def jsonl_dir(tmp_path):
    lines = [
        '{"doc_id": 1, "text": "hello world"}',
        '{"doc_id": 2, "text": "second doc"}',
        '{"doc_id": 3, "text": "trunca',  # malformed: cut mid-string
        'not json at all',
        '{"doc_id": 5, "text": "fine again"}',
    ]
    p = tmp_path / "corpus"
    p.mkdir()
    (p / "part-0.jsonl").write_text("\n".join(lines))
    return str(p)


def test_read_jsonl_splits_good_and_quarantine(spark, jsonl_dir):
    good, bad = corpus.read_jsonl(spark, jsonl_dir, "doc_id long, text string")
    assert sorted(r.doc_id for r in good.collect()) == [1, 2, 5]
    assert good.columns == ["doc_id", "text"]  # corrupt col projected away
    raw = sorted(r.raw_line for r in bad.collect())
    assert raw == ["not json at all", '{"doc_id": 3, "text": "trunca']
    assert corpus.quarantine_rate(good, bad) == pytest.approx(0.4)


def test_read_jsonl_rejects_reserved_column(spark, jsonl_dir):
    with pytest.raises(ValueError, match="_corrupt_record"):
        corpus.read_jsonl(
            spark, jsonl_dir, "doc_id long, _corrupt_record string"
        )


def test_jsonl_roundtrip_gzip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    out = str(tmp_path / "out")
    corpus.write_jsonl(df, out, n_files=1)
    files = list((tmp_path / "out").glob("*.json.gz"))
    assert len(files) == 1
    with gzip.open(files[0], "rt") as fh:
        assert len(fh.readlines()) == 3
    good, bad = corpus.read_jsonl(spark, out, "doc_id long, text string")
    assert bad.count() == 0
    assert sorted((r.doc_id, r.text) for r in good.collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
