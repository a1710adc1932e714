"""PARITY.md must quote PERF.md's numbers of record.

Round-4 verdict (weak #1): PARITY.md claimed to carry the numbers of record
but quoted a stale pre-adoption vintage. This test makes that staleness
impossible: every number in PERF.md's "per-stage throughput — the numbers of
record" table (the single table of record) must literally appear in
PARITY.md. Update both files together or this fails.
"""

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name):
    with open(os.path.join(ROOT, name), encoding="utf-8") as f:
        return f.read()


def _record_table_rows(perf_text):
    """Rows of the (first) 'numbers of record' per-stage table."""
    m = re.search(r"^##.*numbers of record.*$", perf_text, re.M)
    assert m, "PERF.md no longer has a 'numbers of record' heading"
    section = perf_text[m.end():]
    nxt = re.search(r"^## ", section, re.M)
    if nxt:
        section = section[: nxt.start()]
    rows = []
    for line in section.splitlines():
        if line.startswith("|") and not set(line) <= set("|- :"):
            cells = [c.strip() for c in line.strip("|").split("|")]
            if len(cells) >= 2 and cells[0].lower() not in ("stage",):
                rows.append(cells)
    assert rows, "numbers-of-record table not found / empty"
    return rows


def test_parity_quotes_perf_numbers_of_record():
    perf = _read("PERF.md")
    parity = _read("PARITY.md")
    rows = _record_table_rows(perf)
    missing = []
    for cells in rows:
        stage, value = cells[0], cells[1]
        if not stage.lower().startswith("stage"):
            continue  # host-side loader row etc. — not a PARITY model row
        # canonical value: bold stripped, parenthetical history dropped
        canon = re.sub(r"\(.*?\)", "", value.replace("**", "")).strip()
        for num in re.findall(r"\d+(?:\.\d+)?", canon):
            if num not in parity:
                missing.append((stage, num, canon))
    assert not missing, (
        "PARITY.md is stale vs PERF.md's numbers-of-record table; "
        f"missing numbers: {missing}"
    )


def test_parity_points_at_the_consistency_contract():
    parity = _read("PARITY.md")
    assert "test_docs_consistency" in parity, (
        "PARITY.md should state which test enforces its number currency"
    )
