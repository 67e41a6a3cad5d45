#!/usr/bin/env python3
"""Generate the query-by-query operator index in docs/OPERATORS.md.

Sources of truth:
  - src/main/scala/graft/queries/*.scala : every `"name" -> ((s, d) =>`
    SparkEntry.queries entry, its preceding `//` comment block (the
    one-line semantics), and the graft public API calls in its body.
  - an oracle_sql.json produced by graft.Verify (which names exactly the
    queries that carry a DuckDB oracle; everything else is rows-only).

Rewrites the section between the BEGIN/END GENERATED INDEX markers; the
hand-written prose above the markers is left untouched.

Usage: tools/gen_operators.py [oracle_sql.json]
"""
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERY_DIR = os.path.join(REPO, "src/main/scala/graft/queries")
DOC = os.path.join(REPO, "docs/OPERATORS.md")
BEGIN = "<!-- BEGIN GENERATED INDEX (tools/gen_operators.py) -->"
END = "<!-- END GENERATED INDEX -->"
FBEGIN = "<!-- BEGIN GENERATED FAMILY COUNTS (tools/gen_operators.py) -->"
FEND = "<!-- END GENERATED FAMILY COUNTS -->"

# graft API objects whose method calls constitute the "public API" column
API_OBJECTS = (
    "Dedup|Similarity|TextOps|Sampling|Packing|Curation|Graph|Sketches|"
    "Multimodal|Streaming|Lift|ZOrder|Registries|FsUtils|PredicateDsl|"
    "SchemaUtils|Upsert"
)
API_CALL = re.compile(r"\b(" + API_OBJECTS + r")\.(\w+)\s*\(")
# ManagedTable method calls (any receiver) — the table-lifecycle surface
TABLE_METHODS = re.compile(
    r"\.\b(setBucket|dropBucket|merge|applyChanges|optimizeIncremental|"
    r"optimize|compactSmall|vacuum|restore|cloneTo|collectStatsFromFooters|"
    r"collectStats|collectBlooms|readWhere|streamAppends|deleteVectorized|"
    r"updateVectorized|mergeVectorized|delete|replaceWhere|updateWhere|"
    r"renameColumn|dropColumn|describeHistory|changesSince|changesWithType|"
    r"registerAs|setCheck|setSchemaEnforced|readVersion|lastTxn|pruneInfo|"
    r"dvInfo|versionAt)\s*\(")
ENTRY = re.compile(r'^(\s*)"([a-z0-9_]+)" -> \(\(s0?, d\) =>', re.M)

FAMILIES = [
    ("l_", "Lift / DSL path: sources, registries, managed-table lifecycle"),
    ("q", "Analytics: TPC-H shapes, windows, rollup/cube, recursive CTE, lateral, sketches"),
    ("t_", "Reference transform vocabulary"),
    ("s_", "Structured Streaming"),
    ("x_", "Training-data pipeline operators"),
]

# Display labels for the family-count table at the top of the doc — the
# counts there are DERIVED (VERDICT r11 "What's wrong #2": the hand-edited
# header drifted), same family assignment as the generated index.
FAMILY_LABELS = {
    "l_": ("`l_*`", "lift/DSL path: sources, registries, managed-table lifecycle"),
    "q": ("`q*`", "TPC-H 1-22 + analytics shapes (windows, rollup/cube, recursive CTE, lateral, pivot, sketches)"),
    "t_": ("`t_*`", "reference transform vocabulary (select/cast/explode/join/union/where DSL/dedup/dates)"),
    "s_": ("`s_stream_*`", "Structured Streaming (windows, sessionization, joins, dedup/near-dup indexes, CDC, upsert, MV, drift)"),
    "x_": ("`x_*`", "training-data pipeline operators (below)"),
}


def first_sentence(comment: str, limit: int = 170) -> str:
    text = " ".join(comment.split())
    # cut at the first sentence boundary that isn't an abbreviation-ish dot
    m = re.search(r"(?<=[a-z)\]])[.;] +(?=[A-Z`(])", text)
    if m:
        text = text[: m.start() + 1]
    if len(text) > limit:
        text = text[: limit - 1].rsplit(" ", 1)[0] + "…"
    return text.replace("|", "\\|")


def parse_file(path):
    src = open(path).read()
    lines = src.splitlines()
    entries = []  # (name, comment, body)
    matches = list(ENTRY.finditer(src))
    for i, m in enumerate(matches):
        name = m.group(2)
        # preceding // comment block
        line_no = src[: m.start()].count("\n")
        comment = []
        j = line_no - 1
        while j >= 0 and lines[j].strip().startswith("//"):
            comment.append(lines[j].strip().lstrip("/").strip())
            j -= 1
        body_end = matches[i + 1].start() if i + 1 < len(matches) else len(src)
        entries.append((name, " ".join(reversed(comment)), src[m.start():body_end]))
    return entries


def api_of(body: str):
    calls = [f"{o}.{m}" for o, m in API_CALL.findall(body)]
    calls += [f"ManagedTable.{m}" for m in TABLE_METHODS.findall(body)]
    seen, out = set(), []
    for c in calls:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out[:6]


def main():
    oracle_path = sys.argv[1] if len(sys.argv) > 1 else None
    oracles = set()
    if oracle_path and os.path.exists(oracle_path):
        oracles = set(json.load(open(oracle_path)).keys())
    allq = []
    for f in sorted(os.listdir(QUERY_DIR)):
        if f.endswith(".scala"):
            allq.extend(parse_file(os.path.join(QUERY_DIR, f)))
    allq.sort(key=lambda e: e[0])
    out = [BEGIN, "", "## Query-by-query index", "",
           f"{len(allq)} queries; `oracle = SQL` rows hash-compare against DuckDB, "
           "`rows-only` rows are non-SQL-expressible (spec-verified instead).", ""]
    for prefix, title in FAMILIES:
        fam = [e for e in allq if e[0].startswith(prefix)
               and not any(e[0].startswith(p2) and len(p2) > len(prefix)
                           for p2, _ in FAMILIES)]
        if not fam:
            continue
        out += [f"### `{prefix}*` — {title}", "",
                "| query | public API | semantics | oracle |", "|---|---|---|---|"]
        for name, comment, body in fam:
            api = ", ".join(f"`{c}`" for c in api_of(body)) or "—"
            sem = first_sentence(comment) or "—"
            orc = "SQL" if name in oracles else "rows-only"
            out.append(f"| `{name}` | {api} | {sem} | {orc} |")
        out.append("")
    out.append(END)

    def fam_of(name):
        for prefix, _ in FAMILIES:
            if name.startswith(prefix) and not any(
                    name.startswith(p2) and len(p2) > len(prefix)
                    for p2, _ in FAMILIES):
                return prefix
        return None
    counts = {p: sum(1 for n, _, _ in allq if fam_of(n) == p)
              for p, _ in FAMILIES}
    fam = [FBEGIN, "", "| prefix | family | count |", "|---|---|---|"]
    for p, _ in FAMILIES:
        label, desc = FAMILY_LABELS[p]
        fam += [f"| {label} | {desc} | {counts[p]} |"]
    fam += [f"| **total** | | **{len(allq)}** |", "", FEND]

    doc = open(DOC).read()
    if FBEGIN in doc:
        doc = (doc[: doc.index(FBEGIN)] + "\n".join(fam)
               + doc[doc.index(FEND) + len(FEND):])
    if BEGIN in doc:
        doc = doc[: doc.index(BEGIN)] + "\n".join(out) + doc[doc.index(END) + len(END):]
    else:
        doc = doc.rstrip() + "\n\n" + "\n".join(out) + "\n"
    open(DOC, "w").write(doc)
    print(f"wrote {len(allq)} rows ({sum(1 for n, _, _ in allq if n in oracles)} SQL oracles)"
          f"; family counts {counts} total {len(allq)}")


if __name__ == "__main__":
    main()
