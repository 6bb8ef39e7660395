"""LWW dedup semantics vs the single-threaded oracle.

Mirrors cdc/puller/entry_sorter_test.go (ordering: commit_ts asc, delete
before put at ties) + the final-state diff methodology of
tests/_utils/check_sync_diff.
"""

import pyarrow as pa
import pytest

from ticdc_spark.model import BINLOG_SCHEMA, PAYLOAD_COLS
from ticdc_spark.operators.lww import (
    final_state,
    lww_latest_agg,
    lww_latest_salted,
    lww_latest_window,
)
from ticdc_spark.oracle import apply_binlog, diff_tables
from ticdc_spark.testgen import BinlogSpec, generate_binlog


def _spark_df(spark, tbl: pa.Table):
    return spark.createDataFrame(tbl.to_pandas(), schema=BINLOG_SCHEMA)


def _final(spark, df, strategy):
    dd = strategy(df)
    return final_state(dd, PAYLOAD_COLS)


def _collect_arrow(df) -> pa.Table:
    pdf = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(pdf["doc_id"], pa.string()),
            "tokens": pa.array(
                [None if t is None else list(t) for t in pdf["tokens"]],
                pa.list_(pa.int32()),
            ),
            "n_tok": pa.array(pdf["n_tok"], pa.int32()),
            "source": pa.array(pdf["source"], pa.string()),
        }
    )


SPECS = [
    BinlogSpec(n_events=2000, n_keys=300, seed=1),
    BinlogSpec(n_events=2000, n_keys=50, seed=2, p_delete=0.3, p_insert=0.4),
    # heavy ties incl. same-(commit_ts,seq) delete+put pairs
    BinlogSpec(n_events=1500, n_keys=100, seed=3, tie_frac=0.7, dup_seq_tie_frac=0.5),
    # hot-key skew: 50% of traffic on 3 keys
    BinlogSpec(n_events=3000, n_keys=500, seed=4, hot_frac=0.5, hot_keys=3),
]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: f"seed{s.seed}")
@pytest.mark.parametrize(
    "strategy", [lww_latest_agg, lww_latest_window, lww_latest_salted],
    ids=["agg", "window", "salted"],
)
def test_lww_matches_oracle(spark, spec, strategy):
    binlog = generate_binlog(spec)
    expected = apply_binlog(binlog)
    df = _spark_df(spark, binlog)
    actual = _collect_arrow(_final(spark, df, strategy))
    problems = diff_tables(expected, actual)
    assert not problems, problems


def test_delete_before_put_tie(spark):
    """At equal (commit_ts, seq), delete applies first, put wins
    (entry_sorter.go:62-72). A later bare delete wins as delete."""
    rows = [
        # key a: delete and put at same (ts,seq) -> put survives
        (10, 1, "t", "D", "a", None, None, None, 0, 0),
        (10, 1, "t", "I", "a", [1, 2], 2, "web", 0, 0),
        # key b: put then delete at same ts, later seq -> deleted
        (10, 1, "t", "I", "b", [3], 1, "web", 0, 0),
        (10, 2, "t", "D", "b", None, None, None, 0, 0),
        # key c: reinsert after delete at later ts
        (10, 1, "t", "I", "c", [4], 1, "web", 0, 0),
        (11, 2, "t", "D", "c", None, None, None, 0, 0),
        (12, 3, "t", "I", "c", [5, 6], 2, "book", 0, 0),
    ]
    df = spark.createDataFrame(rows, schema=BINLOG_SCHEMA)
    for strat in (lww_latest_agg, lww_latest_window, lww_latest_salted):
        out = {
            r["doc_id"]: (r["tokens"], r["source"])
            for r in _final(spark, df, strat).collect()
        }
        assert set(out) == {"a", "c"}, strat.__name__
        assert out["a"] == ([1, 2], "web")
        assert out["c"] == ([5, 6], "book")


def test_lww_strategies_agree_hypothesis(spark):
    """Fuzz the tie semantics: all four physical strategies must agree with
    the sequential apply oracle on arbitrary event interleavings, including
    same-(commit_ts, seq) delete/put pairs (entry_sorter.go:62-72)."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import functions as F

    from ticdc_spark.operators.lww import (
        lww_collapse_prearranged,
        lww_latest_agg,
        lww_latest_salted,
        lww_latest_semijoin,
        lww_latest_window,
    )

    def bucketed(df, keys):
        expr = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(4))
        return lww_collapse_prearranged(df, expr, 4, keys).drop("_bucket")

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 3),      # key idx
                st.integers(0, 1),      # op: 0=put 1=delete
                st.integers(100, 104),  # commit_ts
            ),
            min_size=1,
            max_size=24,
        )
    )
    def run(events):
        rows = []
        for i, (k, is_del, ts) in enumerate(events):
            rows.append((f"k{k}", "D" if is_del else "U", ts, i, i * 10))
        df = spark.createDataFrame(
            rows, "doc_id string, op string, commit_ts long, seq long, payload long"
        )
        # sequential oracle: apply in (commit_ts, seq, delete-before-put) order
        state = {}
        for doc, op, ts, seq, payload in sorted(
            rows, key=lambda r: (r[2], r[3], 0 if r[1] == "D" else 1)
        ):
            state[doc] = (op, ts, seq, payload)
        want = {d: v for d, v in state.items()}
        for strat in (lww_latest_agg, lww_latest_window, lww_latest_semijoin, lww_latest_salted, bucketed):
            got = {
                r["doc_id"]: (r["op"], r["commit_ts"], r["seq"], r["payload"])
                for r in strat(df, ["doc_id"]).collect()
            }
            assert got == want, strat.__name__

    run()
