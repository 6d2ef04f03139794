"""Canary freeze pins (r15, VERDICT r14 item 7).

The bench's canary normalizer (`bench.py` canary_mult /
`tools/bench_calibration.json`) is only a legitimate instrument while
the canary entries stay BIT-FROZEN: a code change to any canary in the
same round that re-pins calibration medians (or silently shifts the
canary workload) would let normalization absorb a real regression.

This test pins the md5 of each canary query function's source text.
Changing a canary therefore fails CI loudly; the legitimate path is a
deliberate two-step — change the canary in one commit WITH an updated
pin here and a note in the round's OPTIMIZATION_rNN.md, and never
re-pin `tools/bench_calibration.json` in that same commit.

Pure-python: no SparkSession.
"""

from __future__ import annotations

import hashlib
import inspect

from bigdataproject_formula1_telemetry_spark.plans import queries as Q

#: The 12 pure-JVM TPC-H canaries the normalizer medians over — must
#: match tools/normalize_bench.py's canary set.
CANARY_SOURCE_MD5 = {
    "q01_pricing_summary": "80d394bf9dd7ce08cb618bc6a62270cf",
    "q02_filter_project": "9d065cf5466a910ff335a9af3b173433",
    "q03_star_join": "1184f39f50a5af23ef8a4eaa38b04b26",
    "q05_top1_per_group": "55425373ec77a3fab29679a3a0b7caf4",
    "q06_window_ratio": "830a53111f82a4aa85e4fc6752b9b4da",
    "q08_window_cumsum": "aef8e9b13d1689c43402dcc9430db41b",
    "q09_gaps_islands": "51fc553837ef4849c3df47915d14f3f9",
    "q16_107_rule": "c310f378d9d783544de033f6ec4c7945",
    "q47_shipping_priority": "781cf1cbc4025412d0112fdbf34734d8",
    "q48_regional_revenue": "eb5e2ff001d2c2c2fdecd28dc5bf9477",
    "q52_volume_shipping": "bb727a630230113526940bd3061d799c",
    "q53_returned_top_customers": "ce095ecb13620855d6e9a0b062c95902",
}


def _source_md5(fn) -> str:
    src = inspect.getsource(
        fn.__wrapped__ if hasattr(fn, "__wrapped__") else fn
    )
    return hashlib.md5(src.encode()).hexdigest()


def test_canary_set_matches_calibration_pins():
    import json
    import os

    tools = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    )
    with open(os.path.join(tools, "bench_calibration.json")) as f:
        cal = json.load(f)
    assert set(cal["canaries"]) == set(CANARY_SOURCE_MD5)


def test_canary_sources_are_frozen():
    changed = {
        name: _source_md5(Q.QUERIES[name])
        for name in CANARY_SOURCE_MD5
        if _source_md5(Q.QUERIES[name]) != CANARY_SOURCE_MD5[name]
    }
    assert not changed, (
        "canary query source changed — canaries must stay bit-frozen "
        "for the bench normalizer to stay honest; if the change is "
        "deliberate, update the pin in THIS file in the same commit "
        "(and never re-pin tools/bench_calibration.json alongside): "
        f"{changed}"
    )
