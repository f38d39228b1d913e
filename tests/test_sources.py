"""Sources/sinks tests (SURVEY.md §2.1 S1, S6, S7, S9, S10)."""

import json
import os
import re

from pyspark.sql import functions as F

from mr_dice_spark.sources import (
    cif_text_column,
    filter_to_tag,
    multi_provider_scan,
    read_table,
    tagged_output_dir,
    write_json_sink,
    write_manifest,
)


def test_read_table_parquet(spark, sf_dir):
    df = read_table(spark, os.path.join(sf_dir, "region.parquet"))
    assert df.count() == 5


def test_multi_provider_scan_union_and_rank(spark, sf_dir, tmp_path):
    # two "providers" with drifting schemas: one has an extra column
    a = spark.range(3).select(
        F.col("id"), F.lit("x").alias("payload"), F.lit(1.5).alias("extra")
    )
    b = spark.range(2, 6).select(F.col("id"), F.lit("y").alias("payload"))
    pa, pb = str(tmp_path / "prov_a"), str(tmp_path / "prov_b")
    a.write.parquet(pa)
    b.write.parquet(pb)

    out = multi_provider_scan(spark, {"alpha": pa, "beta": pb})
    assert out.count() == 7
    # schema drift absorbed: beta rows have NULL extra
    assert out.where(F.col("provider") == "beta").where(F.col("extra").isNull()).count() == 4
    # deterministic provider priority follows dict insertion order
    ranks = {r["provider"]: r["provider_rank"] for r in
             out.select("provider", "provider_rank").distinct().collect()}
    assert ranks == {"alpha": 0, "beta": 1}
    # first-wins dedup by id via provider_rank (SURVEY.md §2.7 D1)
    from mr_dice_spark.operators import dedup_first_wins
    deduped = dedup_first_wins(out, "id", [F.col("provider_rank")])
    assert deduped.count() == 6
    overlap = {r["payload"] for r in deduped.where(F.col("id") == 2).collect()}
    assert overlap == {"x"}  # alpha (rank 0) wins on the overlapping id


def test_filter_to_tag_and_output_dir(tmp_path):
    tag = filter_to_tag('elements HAS ALL "Ti","O" AND nelements<=3')
    assert re.fullmatch(r"[a-z0-9_]+", tag)
    assert len(tag) <= 40
    d = tagged_output_dir(str(tmp_path), 'nelements=3 AND chemical_formula_reduced="O2Si"')
    base = os.path.basename(d)
    assert re.fullmatch(r"[a-z0-9_]+_\d{8}_\d{6}_[0-9a-f]{8}", base)


def test_json_sink_and_manifest(spark, tmp_path):
    df = spark.range(3).select(F.col("id"), (F.col("id") * 2).alias("v"))
    out = str(tmp_path / "rows")
    write_json_sink(df, out, single_file=True)
    files = [f for f in os.listdir(out) if f.endswith(".json")]
    assert len(files) == 1
    rows = [json.loads(line) for line in open(os.path.join(out, files[0]))]
    assert {r["id"] for r in rows} == {0, 1, 2}

    mpath = write_manifest(str(tmp_path / "m"), query="q", n_found=3,
                           stats={"providers": 2}, warnings=["w1"])
    manifest = json.load(open(mpath))
    assert manifest["n_found"] == 3 and manifest["warnings"] == ["w1"]


def test_cif_text_column(spark):
    df = spark.createDataFrame(
        [("O2Si",
          [[4.0, 0.0, 0.0], [0.0, 4.0, 0.0], [0.0, 0.0, 4.0]],
          ["Si", "O", "O"],
          [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [2.0, 2.0, 2.0]])],
        "formula string, lattice array<array<double>>, species array<string>, "
        "positions array<array<double>>",
    )
    cif = df.select(
        cif_text_column(F.col("formula"), F.col("lattice"),
                        F.col("species"), F.col("positions")).alias("cif")
    ).first()["cif"]
    assert cif.startswith("data_O2Si")
    assert "_chemical_formula_sum  O2Si" in cif
    assert cif.count("\n") >= 8  # 3 lattice + 3 site lines + headers
    assert "Si  0.000000  0.000000  0.000000" in cif


def test_derive_output_path(spark):
    from mr_dice_spark.sources import derive_output_path

    df = spark.createDataFrame(
        [("hMOF", "m1", None), ("core", "m2", None), ("other", "m3", None),
         ("hMOF", "m4", "explicit/m4.cif")],
        "database string, name string, cif_path string",
    )
    out = df.select(
        derive_output_path(
            F.col("database"), F.col("name"),
            rules={"hMOF": "hmof_dir", "core": "core_dir"},
            explicit_path=F.col("cif_path"),
        ).alias("p")
    )
    assert [r["p"] for r in out.collect()] == [
        "hmof_dir/m1.cif", "core_dir/m2.cif", "misc/m3.cif", "explicit/m4.cif",
    ]


def test_multi_provider_failure_isolation(spark, sf_dir, tmp_path):
    # R5: a dead provider degrades to a warning, not a query failure
    good = str(tmp_path / "good")
    spark.range(3).write.parquet(good)
    warnings = []
    out = multi_provider_scan(
        spark,
        {"ok": good, "dead": str(tmp_path / "missing")},
        skip_unavailable=True,
        warnings=warnings,
    )
    assert out.count() == 3
    assert len(warnings) == 1 and "dead" in warnings[0]
    # without isolation the same scan raises
    import pytest as _pytest
    with _pytest.raises(Exception):
        multi_provider_scan(spark, {"dead": str(tmp_path / "missing")})


# ---------------------------------------------------------------------------
# quarantine ingestion: schema-enforced parse with bad-record capture
# ---------------------------------------------------------------------------


def test_read_with_quarantine_json(spark, tmp_path):
    from mr_dice_spark.sources import read_with_quarantine

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "v": 2.5}\n'
        "this is not json\n"
        '{"id": "NaN-ish", "v": "also bad"}\n'
        '{"id": 3, "v": 0.5}\n'
    )
    good, bad = read_with_quarantine(spark, str(p), "id long, v double", fmt="json")
    g = {r["id"]: r["v"] for r in good.collect()}
    assert g == {1: 2.5, 3: 0.5}
    b = [r["_corrupt_record"] for r in bad.collect()]
    assert len(b) == 2 and any("not json" in x for x in b)


def test_read_with_quarantine_csv(spark, tmp_path):
    from mr_dice_spark.sources import read_with_quarantine

    p = tmp_path / "feed.csv"
    p.write_text("id,v\n1,2.5\n2,not_a_number\n3,0.5\n")
    good, bad = read_with_quarantine(spark, str(p), "id long, v double", fmt="csv")
    assert {r["id"] for r in good.collect()} == {1, 3}
    assert bad.count() == 1


def test_read_with_quarantine_csv_header_edge_cases(spark, tmp_path):
    from mr_dice_spark.sources import read_with_quarantine

    # comma-bearing type in the DDL must not break header recognition,
    # and a DATA row that parses fine is never dropped on raw equality
    p = tmp_path / "feed.csv"
    p.write_text("id,amount\n1,2.50\nbroken,row,here,x\n2,3.75\n")
    good, bad = read_with_quarantine(
        spark, str(p), "id long, amount decimal(10,2)", fmt="csv"
    )
    assert {r["id"] for r in good.collect()} == {1, 2}
    # only the genuinely broken row is quarantined; the header is dropped
    assert bad.count() == 1

    # all-string schema: every line (header included) parses, so nothing
    # is ever silently dropped — the documented contract is that header
    # detection only applies to rows that FAIL the typed parse; with no
    # typed column the header is data and the caller filters it
    p2 = tmp_path / "feed2.csv"
    p2.write_text("a,b\nx,y\na,b\n")
    good2, bad2 = read_with_quarantine(spark, str(p2), "a string, b string", fmt="csv")
    rows = sorted((r["a"], r["b"]) for r in good2.collect())
    assert rows == [("a", "b"), ("a", "b"), ("x", "y")]
    assert bad2.count() == 0
