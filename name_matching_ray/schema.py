"""Arrow schemas for every logical table (SURVEY.md §1.2, FIXTURES.md F1/F7).

The reference's tables are implicit/positional CSV (matcher.py:428-430);
here every dataset has a fixed explicit ``pyarrow.Schema``.
"""

from __future__ import annotations

import pyarrow as pa

# F1 — interleaved text+media documents (BASELINE.json input_hint)
SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),       # "text" | "image" | "audio"
        ("text", pa.string()),       # payload when kind == "text", else ""
        ("media_ref", pa.string()),  # opaque ref when kind != "text", else ""
        ("offset", pa.int32()),      # monotonically increasing within the row
    ]
)
DOCS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])

# extracted name records; spans carried verbatim (span-sequence invariant)
NAMES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("name", pa.string()),        # raw extracted name
        ("pre_proc", pa.string()),    # normalized (matcher.py:438-439)
        ("nosuffix", pa.string()),    # suffix-stripped (matcher.py:442-443)
        ("block_key", pa.string()),   # first token of nosuffix
        ("block_key_last", pa.string()),  # last token (secondary recall pass)
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)

# scored candidate pairs (F7); rule_code sign = decision (matcher.py:386)
PAIRS_SCHEMA = pa.schema(
    [
        ("left_doc_id", pa.string()),
        ("right_doc_id", pa.string()),
        ("block_key", pa.string()),
        ("rule_code", pa.int32()),
        ("score", pa.float32()),
    ]
)

CLUSTERS_SCHEMA = pa.schema([("doc_id", pa.string()), ("cluster_id", pa.string())])
