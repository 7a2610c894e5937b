"""Driver-red regression tripwire (VERDICT r6 directive #8).

The driver's per-round CORRECTNESS gate samples a prefix (~50 entries) of
the catalog order. Any entry that has EVER been driver-red and has never
had a green row MUST sit inside that prefix so the next round re-samples
it — otherwise a fixed oracle stays red in driver history forever. This
turns the rotation discipline into CI instead of judge memory.
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PREFIX = 50


def _history():
    hist = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(f)).group(1))
        for name, row in json.load(open(f)).items():
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ) and not row.get("err")
            hist.setdefault(name, {})[rnd] = ok
    return hist


def test_red_entries_front_loaded():
    from geoarrow_rs_spark.queries import _SAMPLE_PRIORITY, QUERIES

    hist = _history()
    red_no_green = {
        name
        for name, rounds in hist.items()
        if name in QUERIES and not any(rounds.values())
    }
    prefix = set(_SAMPLE_PRIORITY[:PREFIX])
    missing = sorted(red_no_green - prefix)
    assert not missing, (
        f"driver-red entries with no green row must be in the first {PREFIX} "
        f"of _SAMPLE_PRIORITY to be re-sampled: {missing}"
    )


def test_never_sampled_entries_front_loaded():
    from geoarrow_rs_spark.queries import _SAMPLE_PRIORITY, QUERIES

    hist = _history()
    never = {name for name in QUERIES if name not in hist}
    prefix = set(_SAMPLE_PRIORITY[:PREFIX])
    missing = sorted(never - prefix)
    assert not missing, (
        f"never-driver-sampled entries must be in the first {PREFIX} of "
        f"_SAMPLE_PRIORITY: {missing}"
    )


def test_priority_list_is_exact_catalog():
    from geoarrow_rs_spark.queries import _SAMPLE_PRIORITY, QUERIES

    assert len(_SAMPLE_PRIORITY) == len(set(_SAMPLE_PRIORITY)), "duplicates"
    assert set(_SAMPLE_PRIORITY) == set(QUERIES), (
        "priority list out of sync with the catalog"
    )
