"""Regenerate docs/QUERY_INDEX.md from the live registry."""
import sys

sys.path.insert(0, ".")
import __spark_entry__  # noqa: F401  (registers all modules)
import _data_engineering_pipeline_project_spark.queries as q

lines = [
    "# Query index (generated)",
    "",
    "Every driver-facing query, its implementing module, and its",
    "verification mode. Regenerate with `python tools/gen_query_index.py`.",
    "",
    "| query | module | check |",
    "|---|---|---|",
]
for name in sorted(q.QUERIES):
    fn = q.QUERIES[name]
    mod = fn.__module__.split(".")[-1]
    check = "DuckDB oracle" if name in q.ORACLES else "rows-only + pytest"
    lines.append(f"| `{name}` | `{mod}` | {check} |")
open("docs/QUERY_INDEX.md", "w").write("\n".join(lines) + "\n")
print(f"wrote docs/QUERY_INDEX.md ({len(q.QUERIES)} queries)")
