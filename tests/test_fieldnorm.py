import numpy as np

from tantivy_spark.fieldnorm import (
    FIELD_NORMS_TABLE,
    MAX_FIELDNORM,
    fieldnorm_to_id,
    id_to_fieldnorm,
    quantize_fieldnorm,
    sql_quantize_fieldnorm,
)


def test_table_matches_reference_goldens():
    """Pinned values from /root/reference/src/fieldnorm/code.rs:13-270."""
    assert FIELD_NORMS_TABLE[0] == 0
    assert FIELD_NORMS_TABLE[40] == 40
    assert FIELD_NORMS_TABLE[41] == 42
    assert FIELD_NORMS_TABLE[56] == 88
    assert FIELD_NORMS_TABLE[57] == 96
    assert FIELD_NORMS_TABLE[255] == 2_013_265_944
    assert len(FIELD_NORMS_TABLE) == 256
    assert (np.diff(FIELD_NORMS_TABLE) > 0).all()


def test_roundtrip_like_reference_test():
    """Port of code.rs:277-293 test_decode_code."""
    for i in range(41):
        assert fieldnorm_to_id(i) == i
    assert fieldnorm_to_id(41) == 40
    assert fieldnorm_to_id(42) == 41
    for idx in range(43, 256):
        fn = int(FIELD_NORMS_TABLE[idx])
        assert id_to_fieldnorm(idx) == fn
        assert fieldnorm_to_id(fn) == idx
        assert fieldnorm_to_id(fn - 1) == idx - 1
        assert fieldnorm_to_id(fn + 1) == idx
    assert fieldnorm_to_id(2**32 - 1) == 255


def test_sql_closed_form_matches_table_duckdb():
    import duckdb
    import pandas as pd

    ns = np.unique(np.concatenate([
        np.arange(0, 3000),
        FIELD_NORMS_TABLE, FIELD_NORMS_TABLE + 1,
        np.maximum(FIELD_NORMS_TABLE.astype(np.int64) - 1, 0),
        np.logspace(0, 9.5, 2000).astype(np.int64),
    ]))
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"n": ns}))
    got = con.sql(
        f"SELECT {sql_quantize_fieldnorm('n')} AS q FROM t ORDER BY n"
    ).df()["q"].to_numpy()
    assert np.array_equal(got, quantize_fieldnorm(np.sort(ns)))


def test_sql_closed_form_matches_table_spark(spark):
    import pandas as pd

    ns = np.unique(np.concatenate([
        np.arange(0, 3000),
        FIELD_NORMS_TABLE, FIELD_NORMS_TABLE + 1,
        np.maximum(FIELD_NORMS_TABLE.astype(np.int64) - 1, 0),
    ]))
    sdf = spark.createDataFrame(pd.DataFrame({"n": ns}))
    got = (
        sdf.selectExpr("n", f"{sql_quantize_fieldnorm('n')} AS q")
        .orderBy("n").toPandas()["q"].to_numpy()
    )
    assert np.array_equal(got, quantize_fieldnorm(np.sort(ns)))
