"""Unit contract for the fuzzed-input mutator (round-14 VERDICT task 2).

The fuzz differential's value rests on three properties the full run
can't cheaply re-prove: determinism (same seed → byte-identical
parquet), schema preservation (mutated tables are drop-in for both
engines), and permute-only join invariance (the key bijection is
applied consistently to every column of a family, so equijoin
cardinalities are exactly preserved). Spark-free: pyarrow + duckdb.
"""

import hashlib
import os

import duckdb
import pyarrow.parquet as pq
import pytest

from financial_tracker_etl_spark.catalog import TABLES, table_path
from financial_tracker_etl_spark.fuzz import (
    KEY_FAMILIES,
    MUTATIONS,
    NULLABLE_COLS,
    SUBSAMPLE_TABLES,
    mutate_dir,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _sha(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_mutator_is_deterministic_and_schema_preserving(tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = mutate_dir(SF_DIR, d1, seed=42)
    m2 = mutate_dir(SF_DIR, d2, seed=42)
    assert m1 == m2
    for name in TABLES:
        assert _sha(table_path(d1, name)) == _sha(table_path(d2, name))
        base = pq.read_schema(table_path(SF_DIR, name))
        mut = pq.read_schema(table_path(d1, name))
        assert [(f.name, f.type) for f in base] == [
            (f.name, f.type) for f in mut
        ], name
    # a different seed actually changes the data
    d3 = str(tmp_path / "c")
    mutate_dir(SF_DIR, d3, seed=43)
    assert any(
        _sha(table_path(d1, n)) != _sha(table_path(d3, n)) for n in TABLES
    )


def test_mutation_classes_do_what_the_manifest_claims(tmp_path):
    out = str(tmp_path / "m")
    manifest = mutate_dir(SF_DIR, out, seed=7)
    for name in TABLES:
        rec = manifest[name]
        assert rec["rows_out"] == len(pq.read_table(table_path(out, name)))
        if name in SUBSAMPLE_TABLES:
            # subsample shrinks; dupes add back at most a few percent
            assert rec["rows_out"] < rec["rows_in"]
        else:
            assert rec["rows_out"] == rec["rows_in"]
        if NULLABLE_COLS.get(name) and rec["rows_in"] >= 100:
            assert rec["nulls_injected"] > 0, name
    # duplicate inflation is observable: at least one exact-dup row pair
    con = duckdb.connect()
    n_dup = con.execute(
        f"""SELECT count(*) FROM (
            SELECT l_orderkey, l_linenumber, count(*) c
            FROM read_parquet('{table_path(out, "lineitem")}')
            GROUP BY 1, 2 HAVING count(*) > 1)"""
    ).fetchone()[0]
    assert n_dup > 0


def test_permute_only_preserves_every_fk_join_cardinality(tmp_path):
    out = str(tmp_path / "p")
    mutate_dir(SF_DIR, out, seed=11, mutations=("permute",))
    con = duckdb.connect()
    joins = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    for lt, lk, rt, rk in joins:
        q = (
            "SELECT count(*) FROM read_parquet('{d}/" + lt + ".parquet') a "
            "JOIN read_parquet('{d}/" + rt + ".parquet') b "
            f"ON a.{lk} = b.{rk}"
        )
        nb = con.execute(q.format(d=SF_DIR)).fetchone()[0]
        nm = con.execute(q.format(d=out)).fetchone()[0]
        assert nb == nm, (lt, rt, nb, nm)
    # row order/content outside key columns is untouched by permute
    for name in TABLES:
        base = pq.read_table(table_path(SF_DIR, name))
        mut = pq.read_table(table_path(out, name))
        keyed = {c for fam in KEY_FAMILIES for t, c in fam if t == name}
        for col in base.column_names:
            if col not in keyed:
                assert base[col].equals(mut[col]), (name, col)


def test_key_dtypes_survive_permutation(tmp_path):
    out = str(tmp_path / "d")
    mutate_dir(SF_DIR, out, seed=3, mutations=("permute",))
    for fam in KEY_FAMILIES:
        for tname, col in fam:
            base = pq.read_schema(table_path(SF_DIR, tname)).field(col).type
            mut = pq.read_schema(table_path(out, tname)).field(col).type
            assert base == mut, (tname, col)


def test_mutation_set_is_the_documented_universe():
    assert MUTATIONS == (
        "shuffle", "subsample", "dupes", "nulls", "empties", "permute",
        "skew", "unicode", "extreme", "timewarp", "orphans",
    )


def test_timewarp_class_plants_boundary_timestamps(tmp_path):
    import numpy as np

    from financial_tracker_etl_spark.fuzz import TIMEWARP_VALUES

    out = str(tmp_path / "tw")
    mutate_dir(SF_DIR, out, seed=29, mutations=("timewarp",))
    ev = pq.read_table(table_path(out, "events"))["ts"].to_pylist()
    palette = set(np.array(TIMEWARP_VALUES, dtype="datetime64[us]").tolist())
    planted = [t for t in ev if t in palette]
    assert planted, "no boundary timestamp planted in events.ts"
    # timewarp alone injects no nulls
    assert pq.read_table(table_path(out, "events"))["ts"].null_count == 0


def test_orphans_class_plants_out_of_domain_fk_values(tmp_path):
    import numpy as np

    from financial_tracker_etl_spark.fuzz import ORPHAN_COLS, ORPHAN_VALUES

    out = str(tmp_path / "orph")
    mutate_dir(SF_DIR, out, seed=31, mutations=("orphans",))
    planted_any = False
    for tname, cols in ORPHAN_COLS.items():
        base = pq.read_table(table_path(SF_DIR, tname))
        mut = pq.read_table(table_path(out, tname))
        for col in cols:
            vals = np.asarray(mut[col].to_pylist(), dtype=object)
            orphaned = [v for v in vals if v in ORPHAN_VALUES]
            if orphaned:
                planted_any = True
            # every planted value is genuinely out of the observed
            # domain (the class's defining property)
            domain = set(base[col].to_pylist())
            assert not domain.intersection(ORPHAN_VALUES)
            # orphans alone injects no nulls
            assert mut[col].null_count == 0
    assert planted_any, "no orphan FK value planted anywhere"


def test_empties_class_produces_empty_and_blank_strings(tmp_path):
    import pyarrow.compute as pc

    out = str(tmp_path / "e")
    mutate_dir(SF_DIR, out, seed=9, mutations=("empties",))
    text = pq.read_table(table_path(out, "documents"))["text"].combine_chunks()
    n_empty = pc.sum(pc.equal(text, "")).as_py() or 0
    n_blank = pc.sum(pc.equal(text, "   ")).as_py() or 0
    assert n_empty + n_blank > 0
    assert text.null_count == 0  # empties alone injects no nulls


def test_skew_class_creates_one_hub_key_with_fk_integrity(tmp_path):
    """~35% of lineitem.l_partkey collapses onto ONE observed part key:
    the hub share lands in the judge's 30-40% band and — because the
    hub is drawn from the live domain — every skewed FK still joins."""
    import collections

    from financial_tracker_etl_spark.fuzz import SKEW_RATE

    out = str(tmp_path / "s")
    mutate_dir(SF_DIR, out, seed=21, mutations=("skew",))
    li = pq.read_table(table_path(out, "lineitem"))
    counts = collections.Counter(li["l_partkey"].to_pylist())
    hub, hub_n = counts.most_common(1)[0]
    assert 0.25 <= hub_n / len(li) <= 0.45, (hub, hub_n, len(li))
    parts = set(pq.read_table(table_path(out, "part"))["p_partkey"].to_pylist())
    assert set(counts) <= parts  # referential integrity preserved
    assert 0.30 <= SKEW_RATE <= 0.40


def test_unicode_class_plants_adversarial_text_and_valid_json(tmp_path):
    """documents.text gets raw snippets; events.props stays VALID JSON
    with a live integer "k" so the payload still parses on both
    engines instead of short-circuiting to null at from_json."""
    import json

    from financial_tracker_etl_spark.fuzz import UNICODE_SNIPPETS

    out = str(tmp_path / "u")
    mutate_dir(SF_DIR, out, seed=23, mutations=("unicode",))
    texts = pq.read_table(table_path(out, "documents"))["text"].to_pylist()
    planted = [t for t in texts if t in UNICODE_SNIPPETS]
    assert planted, "no unicode snippet planted in documents.text"
    props = pq.read_table(table_path(out, "events"))["props"].to_pylist()
    noted = [p for p in props if p and "note" in p]
    assert noted, "no unicode note planted in events.props"
    for p in noted:
        parsed = json.loads(p)  # must remain valid JSON
        assert isinstance(parsed["k"], int)
        assert parsed["note"] in UNICODE_SNIPPETS


def test_extreme_class_plants_boundary_numerics_only_on_valid_slots(
    tmp_path,
):
    from financial_tracker_etl_spark.fuzz import (
        EXTREME_RATE_VALUES,
        EXTREME_VALUES,
    )

    out = str(tmp_path / "x")
    mutate_dir(SF_DIR, out, seed=25, mutations=("extreme",))
    li = pq.read_table(table_path(out, "lineitem"))
    prices = li["l_extendedprice"].to_pylist()
    assert any(v in EXTREME_VALUES for v in prices if v is not None)
    discounts = li["l_discount"].to_pylist()
    assert any(
        v in EXTREME_RATE_VALUES[1:] for v in discounts if v is not None
    )
    # extreme alone injects no nulls (nulls class owns null coverage)
    assert li["l_extendedprice"].null_count == 0


def test_empty_table_axis_truncates_after_mutation(tmp_path):
    out = str(tmp_path / "z")
    manifest = mutate_dir(
        SF_DIR, out, seed=27, empty_tables=("events", "documents")
    )
    for name in ("events", "documents"):
        tbl = pq.read_table(table_path(out, name))
        assert len(tbl) == 0 and manifest[name]["emptied"]
        base = pq.read_schema(table_path(SF_DIR, name))
        assert [(f.name, f.type) for f in base] == [
            (f.name, f.type) for f in tbl.schema
        ]
    assert len(pq.read_table(table_path(out, "orders"))) > 0
    with pytest.raises(ValueError):
        mutate_dir(SF_DIR, str(tmp_path / "bad"), 1, empty_tables=("nope",))


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_RUN_FUZZ"),
    reason="opt-in: set SPARK_GRAFT_RUN_FUZZ=1 (full differential on a "
    "mutated fixture, ~6-8 min; the per-round certification runs the "
    "CLI at sf0.01 x 3 seeds instead)",
)
def test_full_registry_differential_on_mutated_fixture(spark, tmp_path):
    """Opt-in end-to-end: one seeded variant of sf0.001, full 150-query
    Spark-vs-DuckDB differential. The CLI (`python -m
    financial_tracker_etl_spark.fuzz`) is the per-round certification
    path; this test makes the same check reachable from pytest."""
    from financial_tracker_etl_spark.queries import registry
    from financial_tracker_etl_spark.verify import duckdb_connection, run_one

    out = str(tmp_path / "fuzzed")
    mutate_dir(SF_DIR, out, seed=1)
    con = duckdb_connection(out)
    failures = []
    for name in registry():
        try:
            ok, msg = run_one(spark, con, out, name)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        if not ok:
            failures.append((name, msg))
    assert not failures, failures


def test_content_null_rate_override_is_lower(tmp_path):
    """documents.text carries the 1% content rate, not the 2% payload
    rate: a content null disables the whole row for most operators, so
    the override keeps the mutated corpus representative. Expected
    counts at sf0.001 (500 docs): ~5 text nulls vs ~10 n_chars nulls."""
    import pyarrow.compute as pc

    from financial_tracker_etl_spark.fuzz import NULL_RATE_OVERRIDES

    assert NULL_RATE_OVERRIDES[("documents", "text")] < 0.02
    assert NULL_RATE_OVERRIDES[("embeddings", "embedding")] < 0.02
    out = str(tmp_path / "cn")
    mutate_dir(SF_DIR, out, seed=5, mutations=("nulls",))
    docs = pq.read_table(table_path(out, "documents"))
    emb = pq.read_table(table_path(out, "embeddings"))
    assert 0 < docs["text"].null_count < docs["n_chars"].null_count
    assert emb["embedding"].null_count > 0
