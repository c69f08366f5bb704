"""Range-partitioned sorted write: the layout contract is that file i
holds a sorted slice of the key space disjoint from and ordered before
file i+1 — the concatenation in range order is the global sort, without
any single-machine global sort ever existing."""

from __future__ import annotations

import pyarrow.parquet as pq

from etl_poc_spark.io import load_table
from etl_poc_spark.operators.layout import range_manifest, write_range_sorted


def test_write_range_sorted_contract(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_date")
    orders = load_table(spark, sf_dir, "orders")
    n_rows = orders.count()
    write_range_sorted(orders, out, "o_orderkey", n_ranges=5)

    man = range_manifest(spark, out, "o_orderkey").collect()
    assert 1 <= len(man) <= 5
    assert sum(r.n_rows for r in man) == n_rows

    # ranges are disjoint and ordered: every file's max < next file's min
    for a, b in zip(man, man[1:]):
        assert a.min_key <= a.max_key
        assert a.max_key < b.min_key

    # each file is internally sorted (read one file directly, no Spark)
    for r in man:
        path = r.file.replace("file://", "").replace("file:", "")
        keys = pq.read_table(path, columns=["o_orderkey"])["o_orderkey"].to_pylist()
        assert keys == sorted(keys)
        assert keys[0] == r.min_key and keys[-1] == r.max_key

    # round-trip: the dataset is intact (same multiset of keys)
    back = spark.read.parquet(out)
    assert back.count() == n_rows
    assert back.select("o_orderkey").distinct().count() == (
        orders.select("o_orderkey").distinct().count()
    )


def test_equal_keys_share_a_range(spark, sf_dir, tmp_path):
    # lineitem repeats l_orderkey across lines; boundaries fall BETWEEN
    # distinct values, so one key never straddles two files
    out = str(tmp_path / "lineitem_by_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_range_sorted(li, out, "l_orderkey", n_ranges=4)
    man = range_manifest(spark, out, "l_orderkey").collect()
    for a, b in zip(man, man[1:]):
        assert a.max_key < b.min_key  # strict: no key straddles a boundary
