#!/usr/bin/env python3
"""Regenerate SURVEY.md's generated key index (the '### §2b' section).

Usage: python3 tools/gen_survey_index.py <verify-out-dir>
where <verify-out-dir> is a `graft.Verify` dump (needs oracle_sql.json).

The index is one row per SparkEntry.queries key with the file:line of
its queries-map entry — the mechanical audit surface for the
correctness gate. SurveyIndexSpec asserts the table's key set equals
SparkEntry.queries.keySet, so the section cannot silently drift.
"""
import json
import re
import subprocess
import sys

MARKER = "### §2b Generated key index"
SOURCES = [
    "src/main/scala/graft/operators/PipelineQueries.scala",
    "src/main/scala/graft/analytics/Analytics.scala",
    "src/main/scala/graft/storm/StormQueries.scala",
]


def main(out_dir: str) -> None:
    keys = sorted(json.load(open(f"{out_dir}/oracle_sql.json")))
    # first '"<key>" ->' occurrence per key = its queries-map entry
    # (the oracleSql map sits after the queries map in every source)
    loc = {}
    for src in SOURCES:
        # anchor the scan to the queries-map region: start at the
        # `val queries` declaration and stop at `val oracleSql`, so a
        # key name mentioned in an earlier comment/string can't
        # mis-attribute the entry line (ADVICE r17)
        in_queries = False
        for i, line in enumerate(open(src), start=1):
            if re.search(r"\bval queries\b", line):
                in_queries = True
            elif re.search(r"\bval oracleSql\b", line):
                in_queries = False
            if not in_queries:
                continue
            # \s+ not a single space: Analytics.scala pads the arrows
            # into a column, and the padded entries previously fell
            # through to the oracleSql map's single-space arrows —
            # the exact mis-attribution ADVICE r17 flagged
            m = re.search(r'"([a-z0-9_]+)"\s+->', line)
            if m and m.group(1) in keys and m.group(1) not in loc:
                loc[m.group(1)] = f"{src}:{i}"
    missing = [k for k in keys if k not in loc]
    if missing:
        sys.exit(f"keys without a queries-map entry: {missing}")
    rows = "\n".join(f"| `{k}` | {loc[k]} |" for k in keys)
    section = (
        f"{MARKER} (tools/gen_survey_index.py)\n\n"
        f"One row per `SparkEntry.queries` key — the mechanical audit\n"
        f"surface for the {len(keys)}-key correctness gate. Every key has a\n"
        f"DuckDB `oracleSql` entry; `SurveyIndexSpec` asserts this table's\n"
        f"key set equals `SparkEntry.queries.keySet`, so it cannot drift.\n\n"
        f"| key | queries-map entry |\n|---|---|\n{rows}\n"
    )
    survey = open("SURVEY.md").read()
    if MARKER in survey:
        # replace the existing section (ends at the next '## ' heading,
        # or end-of-file if §2b is ever the last section — ADVICE r17)
        start = survey.index(MARKER)
        end = survey.find("\n## ", start)
        if end < 0:
            end = len(survey)
        survey = survey[:start] + section + survey[end:]
    else:
        anchor = "\n## §3 Data model"
        survey = survey.replace(anchor, "\n" + section + anchor, 1)
    open("SURVEY.md", "w").write(survey)
    print(f"indexed {len(keys)} keys")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/v17d")
