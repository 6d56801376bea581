"""Bronze CSV ingest: header sanitization, all-string schema, glob
multi-file reads (SURVEY.md §2.1 S1/S2/S7)."""

from __future__ import annotations

from apl_commissions_etl_spark.sources.csv_ingest import (
    read_raw_csv,
    sanitize_column,
    sanitize_columns,
)


def test_sanitize_rules():
    # ref load-csv.ts:155-165
    assert sanitize_column("﻿Group ID", 0) == "Group_ID"
    assert sanitize_column("  Rate (%)  ", 1) == "Rate____"
    assert sanitize_column("2024Premium", 2) == "Col_2024Premium"
    assert sanitize_column("", 3) == "Column3"
    assert sanitize_columns(["a b", "a-b", "ok"]) == ["a_b", "a_b_1", "ok"]


def test_read_csv_all_string_with_sanitized_header(spark, tmp_path):
    p = tmp_path / "Cert_2024.csv"
    p.write_text(
        "﻿Cert ID,Premium $,2024 Flag\n"
        "1,100.50,Y\n"
        "2,,N\n"
    )
    df = read_raw_csv(spark, str(p))
    assert df.columns == ["Cert_ID", "Premium__", "Col_2024_Flag"]
    assert all(t == "string" for _, t in df.dtypes)
    rows = df.orderBy("Cert_ID").collect()
    assert rows[0].Cert_ID == "1" and rows[0].Premium__ == "100.50"
    assert rows[1].Premium__ is None  # empty cell -> null, typed later


def test_glob_reads_many_files_as_one_table(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"CommissionsDetail_{i}.csv").write_text(
            "Id,Amt\n" + f"{i},10\n"
        )
    (tmp_path / "Other.csv").write_text("Id,Amt\nx,1\n")
    df = read_raw_csv(spark, str(tmp_path / "CommissionsDetail_*.csv"))
    assert df.count() == 3
    assert sorted(r.Id for r in df.collect()) == ["0", "1", "2"]


def test_zip_extract_and_read(spark, tmp_path):
    import zipfile

    from apl_commissions_etl_spark.sources.archive import (
        find_newest_zip,
        read_zip_csvs,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    old = drop / "old.zip"
    with zipfile.ZipFile(old, "w") as zf:
        zf.writestr("nested/Other_1.csv", "Id,V\n9,z\n")
    import os, time
    new = drop / "new.zip"
    with zipfile.ZipFile(new, "w") as zf:
        zf.writestr("nested/CommissionsDetail_1.csv", "Id,V\n1,a\n")
        zf.writestr("CommissionsDetail_2.csv", "Id,V\n2,b\n")
        zf.writestr("readme.txt", "not a csv")
        zf.writestr("Other_3.csv", "Id,V\n3,c\n")
    os.utime(old, (time.time() - 100, time.time() - 100))

    assert find_newest_zip(str(drop)) == str(new)
    df = read_zip_csvs(
        spark, str(new), str(tmp_path / "work"), prefix="CommissionsDetail_"
    )
    assert sorted(r.Id for r in df.collect()) == ["1", "2"]
    assert all(t == "string" for _, t in df.dtypes)


def test_typed_read_quarantines_malformed_rows(spark, tmp_path):
    from apl_commissions_etl_spark.sources.csv_ingest import (
        read_typed_csv_with_quarantine,
    )

    p = tmp_path / "mixed.csv"
    p.write_text(
        "id,amount,day\n"
        "1,10.5,2024-01-02\n"
        "2,notanumber,2024-01-03\n"   # bad decimal
        "3,30.25,2024-01-04\n"
        "4,40.0,not-a-date\n"         # bad date
    )
    good, bad = read_typed_csv_with_quarantine(
        spark, str(p), "id INT, amount DOUBLE, day DATE"
    )
    ids = sorted(r.id for r in good.collect())
    assert ids == [1, 3]
    lines = sorted(r.raw_line for r in bad.collect())
    assert lines == ["2,notanumber,2024-01-03", "4,40.0,not-a-date"]


def test_jsonl_document_roundtrip(spark, tmp_path):
    """JSONL — the lingua franca of LLM corpora — round-trips through
    the engine with an explicit schema (no inference job at scale) and
    preserves unicode + embedded quotes."""
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello \\"world\\"", "lang": "en"}\n'
        '{"doc_id": 2, "text": "café 世界", "lang": "mixed"}\n'
        '{"doc_id": 3, "text": null, "lang": "en"}\n'
    )
    df = spark.read.schema("doc_id LONG, text STRING, lang STRING").json(
        str(p)
    )
    rows = {r.doc_id: (r.text, r.lang) for r in df.collect()}
    assert rows == {
        1: ('hello "world"', "en"),
        2: ("café 世界", "mixed"),
        3: (None, "en"),
    }
