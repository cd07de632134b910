"""NDJSON/CSV schema-first readers: round-trip + corrupt-row quarantine."""

from elastic_asset_etl_poc_spark.sources.textfiles import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
)


def test_jsonl_corrupt_rows_quarantined(spark, tmp_path):
    p = tmp_path / "d.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok line"}\n'
        "this is not json\n"
        '{"doc_id": 3, "text": "another"}\n'
        '{"doc_id": "not-a-number", "text": "bad type"}\n'
    )
    df = read_jsonl(
        spark, str(p), "doc_id bigint, text string", keep_corrupt=True
    )
    rows = df.collect()
    good = [r for r in rows if r[CORRUPT_COL] is None]
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert sorted(r["doc_id"] for r in good) == [1, 3]
    assert len(bad) == 2  # the non-json line and the type mismatch
    assert any("not json" in r[CORRUPT_COL] for r in bad)
    # default drops the quarantine column
    assert CORRUPT_COL not in read_jsonl(
        spark, str(p), "doc_id bigint, text string"
    ).columns


def test_csv_round_trip_and_quoting(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(
        'id,name,val\n1,"comma, inside",2.5\n2,plain,3.5\n'
    )
    df = read_csv(spark, str(p), "id bigint, name string, val double")
    got = {r["id"]: (r["name"], r["val"]) for r in df.collect()}
    assert got == {1: ("comma, inside", 2.5), 2: ("plain", 3.5)}


def test_csv_corrupt_row_quarantined(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,val\n1,2.5\nnot-a-number,xyz\n")
    df = read_csv(spark, str(p), "id bigint, val double", keep_corrupt=True)
    rows = df.collect()
    assert sum(1 for r in rows if r[CORRUPT_COL] is not None) == 1
    assert sum(1 for r in rows if r["id"] == 1) == 1
