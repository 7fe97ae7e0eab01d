"""Golden-case tests for convertColumnData parity (SURVEY §1.3 matrix)."""

import pyarrow as pa

from go_mysql_transfer_ray.functions.coerce import (
    ColumnSpec,
    coerce_column,
)
from go_mysql_transfer_ray.functions.dateformat import to_strftime


def col(values, type_=None):
    return pa.array(values, type_)


def test_enum_ordinal_and_out_of_range():
    spec = ColumnSpec("c", "enum", enum_values=("red", "green", "blue"))
    out = coerce_column(col([1, 3, 0, 4, None], pa.int64()), spec)
    # 1-based ordinal; out-of-range → "" (endpoint.go:96-110)
    assert out.to_pylist() == ["red", "blue", "", "", None]


def test_enum_string_passthrough():
    spec = ColumnSpec("c", "enum", enum_values=("a",))
    out = coerce_column(col(["red"], pa.string()), spec)
    assert out.to_pylist() == ["red"]


def test_set_bitmask():
    spec = ColumnSpec("c", "set", set_values=("a", "b", "c"))
    out = coerce_column(col([0b101, 0b010, 0, None], pa.int64()), spec)
    assert out.to_pylist() == ["a,c", "b", "", None]


def test_bit():
    spec = ColumnSpec("c", "bit")
    out = coerce_column(col(["\x01", "\x00", "x", None], pa.string()), spec)
    assert out.to_pylist() == [1, 0, 0, None]


def test_json_parse_and_fallback():
    spec = ColumnSpec("c", "json")
    out = coerce_column(
        col(['{"b":1,"a":2}', "not json", None, "null"], pa.string()), spec
    )
    # canonical re-serialization; parse failure → raw; "null" → raw (f==nil)
    assert out.to_pylist() == ['{"a":2,"b":1}', "not json", None, "null"]


def test_datetime_formatter_and_zero_date():
    spec = ColumnSpec("c", "datetime")
    vals = col(
        ["2023-07-04 10:30:45", "0000-00-00 00:00:00", "garbage", None], pa.string()
    )
    # no formatter: verbatim (endpoint.go:161-163)
    assert coerce_column(vals, spec).to_pylist() == [
        "2023-07-04 10:30:45",
        "0000-00-00 00:00:00",
        "garbage",
        None,
    ]
    # formatter: reformat; zero/bad → null (endpoint.go:148-160)
    out = coerce_column(vals, spec, datetime_formatter="yyyy/mm/dd HH:MM:SS")
    assert out.to_pylist() == ["2023/07/04 10:30:45", None, None, None]


def test_date_formatter():
    spec = ColumnSpec("c", "date")
    out = coerce_column(
        col(["2023-07-04", "0000-00-00", None], pa.string()),
        spec,
        date_formatter="dd.mm.yyyy",
    )
    assert out.to_pylist() == ["04.07.2023", None, None]


def test_number_bad_parse_null():
    spec = ColumnSpec("c", "number")
    out = coerce_column(col(["42", "-7", "4x2", "", None], pa.string()), spec)
    assert out.to_pylist() == [42, -7, None, None, None]


def test_decimal_float():
    spec = ColumnSpec("c", "decimal")
    out = coerce_column(col(["3.14", "-2e3", "nope", None], pa.string()), spec)
    assert out.to_pylist() == [3.14, -2000.0, None, None]


def test_dsl_quirks():
    # lowercase mm = month, uppercase MM = minutes (date_format.go:61-71,98-100)
    assert to_strftime("yyyy-mm-dd HH:MM:SS") == "%Y-%m-%d %H:%M:%S"
    assert to_strftime("yyyy-MM-dd") == "%Y-%M-%d"  # the reference quirk!
    assert to_strftime("hh:MM tt") == "%I:%M %p"
    assert to_strftime("MMM dd, yyyy") == "%b %d, %Y"


def test_arity_guard_multi_ddl():
    """Width grows by one at EACH DDL (review regression: second DDL's
    rows must not be dropped)."""
    import pyarrow as pa

    from go_mysql_transfer_ray.schema import DDL_TYPE, EVENT_SCHEMA, ROW_IMAGE_TYPE, TABLE_NAME
    from go_mysql_transfer_ray.stages.decode import decode_batch

    def ev(gtid, cc):
        img = {"repo": "r", "path": "p", "commit": "c", "lang": "go",
               "content": "x", "stars": None}
        return {
            "gtid": gtid, "seq_in_txn": 0, "pos": gtid, "op": "insert",
            "table": TABLE_NAME, "ts": 1700000000, "col_count": cc,
            "before": None, "after": img, "ddl": None,
        }

    rows = [ev(1, 5), ev(10, 6), ev(20, 7), ev(21, 6)]  # last = stale arity
    batch = pa.Table.from_pylist(rows, schema=EVENT_SCHEMA)
    out = decode_batch(batch, ddl_gtid=[5, 15])
    assert out.column("gtid").to_pylist() == [1, 10, 20]
