"""Guard the driver contract: every queries() entry must build (analyze)
against the testdata schemas, every oracle key must exist, and entry() must
execute. Catches bit-rot in __spark_entry__ before the driver's gate does.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_queries_analyze_and_oracles_align(spark):
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs), "oracle keys must be a subset of queries"
    # rows-only queries: iterative recurrences with no fixed-SQL form —
    # each must carry an exact pure-python reference test instead
    ROWS_ONLY = {"bpe_merges"}  # tests/test_bpe.py pins merge-list equality
    missing_oracle = set(qs) - set(oracles) - ROWS_ONLY
    assert not missing_oracle, f"queries without oracle: {missing_oracle}"
    for name, fn in qs.items():
        df = fn(spark, SF)
        assert df.schema.fields, name  # forces analysis
        assert len(set(df.columns)) == len(df.columns), f"dup columns in {name}"


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.schema.fields


def test_segmented_generation_identical():
    """Corpora whose token total exceeds one ListArray's int32 offset space
    generate in segments. Sort/shuffle is per-segment since r5 (a GLOBAL
    sort_by/take over the chunked list column concatenates chunks and
    overflows the same int32 offsets — hit for real at 10^8 events), so:
    the ORDERED path (what write_binlog_chunks / every bench row uses) is
    byte-identical to single-shot, and the shuffled path is content-
    identical with ts-ordering preserved across segment boundaries."""
    import ticdc_spark.testgen as tg

    ordered = tg.BinlogSpec(
        n_events=20_000, n_keys=2_000, seed=31, out_of_order=False
    )
    shuffled = tg.BinlogSpec(n_events=20_000, n_keys=2_000, seed=31)
    one_o = tg.generate_binlog(ordered)
    one_s = tg.generate_binlog(shuffled)
    saved = tg._MAX_LIST_VALUES
    try:
        tg._MAX_LIST_VALUES = 50_000  # force many segments
        seg_o = tg.generate_binlog(ordered)
        seg_s = tg.generate_binlog(shuffled)
    finally:
        tg._MAX_LIST_VALUES = saved
    assert one_o.equals(seg_o.combine_chunks())
    keys = [
        ("commit_ts", "ascending"),
        ("seq", "ascending"),
        ("op", "ascending"),
    ]
    assert one_s.sort_by(keys).equals(seg_s.combine_chunks().sort_by(keys))
