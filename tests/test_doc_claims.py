"""Doc-check (VERDICT r04 ask #5): every "qNN ✓" gate-status claim in
COVERAGE.md / README.md must correspond to an ever-green driver row in a
committed CORRECTNESS_r*.json (green per the shared ``_row_green``
predicate). Operators without a green driver row must say
"driver-pending" instead — docs may not claim what the driver hasn't
confirmed.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ever_green_prefixes() -> set[str]:
    green: set[str] = set()
    for path in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")):
        rows = json.load(open(path))
        for name, row in rows.items():
            if isinstance(row, dict) and entrymod._row_green(row):
                green.add(name.split("_")[0])
    return green


def test_doc_gate_claims_match_driver_rows():
    green = _ever_green_prefixes()
    assert green, "no CORRECTNESS_r*.json rows found"
    bad: list[str] = []
    for doc in ("COVERAGE.md", "README.md"):
        p = os.path.join(HERE, doc)
        if not os.path.exists(p):
            continue
        for i, line in enumerate(open(p), 1):
            for m in re.finditer(r"\b(q\d+)\w*\s*✓", line):
                if m.group(1) not in green:
                    bad.append(f"{doc}:{i}: claims {m.group(0)!r} with no green driver row")
    assert bad == [], "\n".join(bad)


def test_doc_pending_claims_are_actually_pending():
    """Reverse direction (VERDICT r05 ask #7): a "qNN driver-pending"
    note whose query already HAS a green driver row is stale — docs
    must upgrade it to "qNN ✓ rNN"."""
    green = _ever_green_prefixes()
    bad: list[str] = []
    for doc in ("COVERAGE.md", "README.md"):
        p = os.path.join(HERE, doc)
        if not os.path.exists(p):
            continue
        for i, line in enumerate(open(p), 1):
            for m in re.finditer(r"\b(q\d+)\w*\s+driver-pending", line):
                if m.group(1) in green:
                    bad.append(
                        f"{doc}:{i}: {m.group(0)!r} is stale — the query has a "
                        "green driver row"
                    )
    assert bad == [], "\n".join(bad)


def test_doc_gate_cadence_claim_is_derived():
    """VERDICT r06 #4: the rotation-cadence claim rotted once when the
    registry outgrew 100 queries ("every other round" was only true at
    <=100). Docs must state the DERIVED cadence ceil(len(registry)/50),
    and may only say "every other round" if that is actually the
    cadence."""
    import math

    from quanta_spark import queries as q

    cadence = math.ceil(len(q.QUERY_FNS) / 50)
    for doc in ("README.md", "__spark_entry__.py"):
        p = os.path.join(HERE, doc)
        text = open(p).read()
        assert "ceil(len(registry)/50)" in text, (
            f"{doc}: cadence claim must be stated as ceil(len(registry)/50)"
        )
        if cadence != 2:
            assert "every other round" not in text, (
                f"{doc}: claims 'every other round' but the registry has "
                f"{len(q.QUERY_FNS)} queries => cadence {cadence}"
            )
