"""The Q5-shape query's two customer-side plans (broadcast map vs
chained native shuffle joins) must produce identical results — the
adaptive threshold only changes the execution shape."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __ray_entry__ import _q_regional_supplier_revenue

SF_DIR = "/root/testdata/sf0.001"


def test_broadcast_and_shuffle_paths_agree():
    broadcast = _q_regional_supplier_revenue(
        SF_DIR, customer_broadcast_bytes=1 << 40)
    shuffled = _q_regional_supplier_revenue(
        SF_DIR, customer_broadcast_bytes=0)
    assert broadcast.column_names == shuffled.column_names
    assert broadcast.to_pylist() == shuffled.to_pylist()
    assert broadcast.num_rows >= 1
