"""Ingestion normalization tests (R3/R4): provider dialects collapse to
canonical columns once, at ingest — then spg/bandgap queries are plain
pushdown-able predicates."""

import pytest
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.ingest import (
    SYMBOL_TO_NUMBER,
    fetch_with_bandgap,
    fetch_with_spg,
    normalize_structures,
)


@pytest.fixture(scope="module")
def raw(spark):
    # three "providers": one numeric spg, one plain H-M symbol, one
    # TCOD-spaced symbol; band gap under two different property names;
    # formulas with unicode subscripts and non-Hill element order
    rows = [
        (1, "SiO₂", 152, None, None, 1.1, None),
        (2, "TiO2", None, "Pm-3m", None, None, 3.2),
        (3, "Fe2O3", None, None, "P m -3 m", 2.0, None),
        (4, "H2O", None, "P21/c", None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "id long, chemical_formula_reduced string, _alexandria_spg int, "
        "_oqmd_spacegroup string, _tcod_sg string, _mp_band_gap double, "
        "_oqmd_bandgap double",
    )


@pytest.fixture(scope="module")
def normalized(raw):
    return normalize_structures(
        raw,
        spg_cols=("_alexandria_spg", "_oqmd_spacegroup", "_tcod_sg"),
        bandgap_cols=("_mp_band_gap", "_oqmd_bandgap"),
    )


def test_symbol_inversion_covers_both_spacings():
    assert SYMBOL_TO_NUMBER["Pm-3m"] == 221
    assert SYMBOL_TO_NUMBER["P m -3 m"] == 221
    assert SYMBOL_TO_NUMBER["P21/c"] == 14


def test_canonical_columns(normalized):
    rows = {r["id"]: r for r in normalized.collect()}
    assert rows[1]["formula_hill"] == "O2Si"      # unicode ₂ + Hill reorder
    assert rows[2]["formula_hill"] == "O2Ti"
    assert rows[4]["formula_hill"] == "H2O"
    assert rows[1]["spacegroup_number"] == 152    # numeric passthrough
    assert rows[2]["spacegroup_number"] == 221    # plain symbol
    assert rows[3]["spacegroup_number"] == 221    # TCOD-spaced symbol
    assert rows[4]["spacegroup_number"] == 14
    assert rows[1]["band_gap"] == 1.1 and rows[2]["band_gap"] == 3.2


def test_fetch_with_spg(normalized):
    got = {r["id"] for r in fetch_with_spg(normalized, 221).collect()}
    assert got == {2, 3}
    with pytest.raises(ValueError):
        fetch_with_spg(normalized, 231)


def test_fetch_with_spg_and_base_filter(normalized):
    # the base filter's formula literal canonicalizes to Hill at compile
    # time, matching the ingested column (R4 round trip)
    got = fetch_with_spg(
        normalized, 221, base_filter='formula_hill="TiO2"'
    ).collect()
    assert [r["id"] for r in got] == [2]


def test_fetch_with_bandgap_open_range(normalized):
    got = {r["id"] for r in fetch_with_bandgap(normalized, min_ev=2.0).collect()}
    assert got == {2, 3}
    got = {r["id"] for r in fetch_with_bandgap(normalized, max_ev=2.0).collect()}
    assert got == {1, 3}


def test_write_partitioned_prunes(spark, sf_dir, tmp_path):
    from mr_dice_spark.ingest import write_partitioned
    from mr_dice_spark.plans.inspect import formatted_plan

    ev = Catalog(spark, sf_dir).events.select("event_id", "event_type", "value")
    out = str(tmp_path / "ev_part")
    write_partitioned(ev, out, partition_by=["event_type"])
    back = spark.read.parquet(out).where(F.col("event_type") == "purchase")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == ev.where(F.col("event_type") == "purchase").count()


def test_write_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    from mr_dice_spark.ingest import write_bucketed_table
    from mr_dice_spark.plans.inspect import shuffle_count

    # warehouse.dir is static config — tables land in the default
    # ./spark-warehouse (gitignored); always drop them afterwards
    t = Catalog(spark, sf_dir)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force sort-merge so the assertion proves BUCKETING (not a
        # broadcast) eliminated the exchanges
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed_table(t.orders.select("o_orderkey", "o_custkey"),
                             "b_orders", ["o_orderkey"], 8)
        write_bucketed_table(t.lineitem.select("l_orderkey", "l_quantity"),
                             "b_lineitem", ["l_orderkey"], 8)
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        # co-bucketed join: sort-merge without any exchange
        assert shuffle_count(j) == 0
        assert "SortMergeJoin" in j._jdf.queryExecution().executedPlan().toString()
        # same join on the UNbucketed source tables needs two exchanges
        plain = t.orders.select("o_orderkey", "o_custkey").join(
            t.lineitem.select("l_orderkey", "l_quantity"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert shuffle_count(plain) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_write_compacted_file_count(spark, sf_dir, tmp_path):
    from mr_dice_spark.ingest import write_compacted

    ev = Catalog(spark, sf_dir).events
    n = write_compacted(ev, str(tmp_path / "compact"), target_file_mb=1)
    import glob
    files = glob.glob(str(tmp_path / "compact" / "*.parquet"))
    assert len(files) == n >= 1
    assert spark.read.parquet(str(tmp_path / "compact")).count() == ev.count()


def test_write_clustered_prunes_files_on_key_filter(spark, sf_dir, tmp_path):
    """Range clustering must physically co-locate a key's rows: the rows
    matching a point filter live in <=2 of the N files (that locality is
    what makes parquet footer min/max skipping effective; the skipping
    itself is Spark's own behavior, not asserted here)."""
    from pyspark.sql import functions as F

    from mr_dice_spark.ingest import write_clustered

    ev = Catalog(spark, sf_dir).events
    path = str(tmp_path / "clustered")
    n = write_clustered(ev, path, ["user_id"], n_files=8)
    assert n == 8
    rd = spark.read.parquet(path).where(F.col("user_id") == 5)
    touched = rd.select(F.input_file_name()).distinct().count()
    assert touched <= 2, f"point filter touched {touched} of {n} files"
    # correctness: clustering is layout-only
    assert rd.count() == ev.where(F.col("user_id") == 5).count()


def test_zorder_prunes_on_both_dimensions(spark, sf_dir, tmp_path):
    """Lexicographic clustering on (user_id, value) localizes only user_id;
    a narrow value filter touches ~all files. Z-order keeps partial
    locality on BOTH columns, so the same value filter touches fewer
    files, and correctness is unaffected."""
    from pyspark.sql import functions as F

    from mr_dice_spark.ingest import write_clustered, write_zordered

    ev = Catalog(spark, sf_dir).events
    lex, zed = str(tmp_path / "lex"), str(tmp_path / "zed")
    write_clustered(ev, lex, ["user_id", "value"], n_files=16)
    write_zordered(ev, zed, ["user_id", "value"], n_files=16)

    def files_touched(path, cond):
        return (
            spark.read.parquet(path).where(cond)
            .select(F.input_file_name()).distinct().count()
        )

    cond = F.col("value").between(100.0, 130.0)
    lex_touched = files_touched(lex, cond)
    z_touched = files_touched(zed, cond)
    assert z_touched < lex_touched, (z_touched, lex_touched)
    # and the layout changes nothing semantically
    assert (
        spark.read.parquet(zed).where(cond).count()
        == ev.where(cond).count()
        == spark.read.parquet(lex).where(cond).count()
    )


def test_zorder_key_bit_budget(spark):
    import pytest
    from pyspark.sql import functions as F

    from mr_dice_spark.ingest import zorder_key

    with pytest.raises(ValueError):
        zorder_key([F.col("a")] * 6, [(0, 1)] * 6, bits=12)  # 72 bits


# ---------------------------------------------------------------------------
# open provider-attribute schema (§1.3): MapType escape hatch + promotion
# ---------------------------------------------------------------------------


def test_pack_provider_attrs_roundtrip(spark):
    from mr_dice_spark.ingest import pack_provider_attrs, promote_attr

    df = spark.createDataFrame(
        [
            (1, "SiO2", 221, None),
            (2, "FeO", None, "Pm-3m"),
        ],
        "id long, formula string, _alexandria_space_group int, _oqmd_spacegroup string",
    )
    packed = pack_provider_attrs(df)
    assert set(packed.columns) == {"id", "formula", "provider_attrs"}
    rows = {r["id"]: r["provider_attrs"] for r in packed.collect()}
    # null-valued attrs are dropped; survivors stringify
    assert rows[1] == {"_alexandria_space_group": "221"}
    assert rows[2] == {"_oqmd_spacegroup": "Pm-3m"}

    promoted = promote_attr(packed, "_alexandria_space_group", "int", alias="spg")
    got = {r["id"]: r["spg"] for r in promoted.collect()}
    assert got == {1: 221, 2: None}


def test_pack_provider_attrs_no_attr_columns(spark):
    from mr_dice_spark.ingest import pack_provider_attrs

    df = spark.createDataFrame([(1,)], "id long")
    out = pack_provider_attrs(df)
    assert out.collect()[0]["provider_attrs"] == {}


def test_scan_evolving_merges_schemas(spark, tmp_path):
    from mr_dice_spark.ingest import scan_evolving

    p1, p2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    spark.createDataFrame([(1, "x")], "id long, a string").write.parquet(p1)
    spark.createDataFrame([(2, 3.5)], "id long, b double").write.parquet(p2)
    out = scan_evolving(spark, p1, p2).orderBy("id")
    assert set(out.columns) == {"id", "a", "b"}
    rows = out.collect()
    assert rows[0]["a"] == "x" and rows[0]["b"] is None
    assert rows[1]["a"] is None and rows[1]["b"] == 3.5
