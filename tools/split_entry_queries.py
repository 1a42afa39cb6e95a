"""One-shot refactor (verdict r7 task #5): split the 23k-line
``entry_queries.py`` into an ``entry_queries/`` package of ordered
domain modules, re-aggregated by the same registration decorator.

Pure mechanical transform — query source text, registration order, and
the priority-prefix reordering are preserved byte-for-byte; only module
boundaries and the import plumbing change.  The script:

1. parses the original module into top-level segments (a segment =
   the node plus the comment block above it);
2. routes the header (registry dicts, ``query`` decorator, shared
   readers) to ``_registry.py``, the trailing prefix-reorder block to
   ``__init__.py``, and everything between into ordered domain modules
   cut at the file's own section banners;
3. resolves cross-module name dependencies (helpers, SQL templates,
   mid-file imports) into explicit ``from ._registry/.qNN import`` lines —
   forward references abort the run;
4. rewrites package-relative imports one level deeper
   (``from .operators`` → ``from ..operators``);
5. re-exports every top-level name from ``__init__`` so existing
   ``from ...entry_queries import <fn>`` sites keep working.

Verification (run separately, fresh interpreter): the QUERIES/ORACLES
dicts of the package must equal the original module's key order, oracle
SQL, and function source (tests/test_entry_split.py pins this against
the snapshot this script writes).
"""

from __future__ import annotations

import ast
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "imdb_metacritic_data_warehouse_spark")
SRC_PATH = os.path.join(PKG, "entry_queries.py")
OUT_DIR = os.path.join(PKG, "entry_queries")

# (first top-level node lineno, module name) — cut points chosen at the
# original file's section banners so each module is a coherent domain.
CUTS = [
    (89, "q01_warehouse"),
    (1385, "q02_pipeline_parity"),
    (4153, "q03_dedup_lsh"),
    (6452, "q04_retrieval_text"),
    (9033, "q05_sketch_graph"),
    (11753, "q06_stats_dimred"),
    (13944, "q07_resampling_tokenizer"),
    (15375, "q08_graph_ivm"),
    (17929, "q09_quality_cdc"),
    (19568, "q10_text_drift"),
    (20944, "q11_calibration_survival"),
    (22106, "q12_seasonal_incremental"),
]
TAIL_NAME = "_PRIORITY_PREFIX"


def defined_names(node) -> list[str]:
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return [node.name]
    if isinstance(node, ast.Assign):
        out = []
        for t in node.targets:
            if isinstance(t, ast.Name):
                out.append(t.id)
            elif isinstance(t, ast.Tuple):
                out.extend(e.id for e in t.elts if isinstance(e, ast.Name))
        return out
    if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        return [node.target.id]
    if isinstance(node, (ast.Import, ast.ImportFrom)):
        return [
            (a.asname or a.name.split(".")[0]) for a in node.names if a.name != "*"
        ]
    return []


def used_names(node) -> set[str]:
    return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}


def main() -> None:
    src = open(SRC_PATH).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    segments = []  # (start_line 1-based, end_line, node)
    prev_end = 0
    for node in tree.body:
        segments.append((prev_end + 1, node.end_lineno, node))
        prev_end = node.end_lineno
    trailing = "".join(lines[prev_end:])  # comments after the last node

    # --- route segments -------------------------------------------------
    first_cut = CUTS[0][0]
    tail_start = None
    for s, _e, node in segments:
        if TAIL_NAME in defined_names(node):
            tail_start = s
            break
    assert tail_start is not None

    core_segs, tail_segs = [], []
    parts: dict[str, list] = {name: [] for _ln, name in CUTS}
    for seg in segments:
        s, _e, node = seg
        if node.lineno < first_cut:
            core_segs.append(seg)
        elif s >= tail_start:
            tail_segs.append(seg)
        else:
            mod = CUTS[0][1]
            for ln, name in CUTS:
                if node.lineno >= ln:
                    mod = name
            parts[mod].append(seg)

    def seg_text(seg):
        s, e, _ = seg
        return "".join(lines[s - 1 : e])

    def rel_fix(text: str) -> str:
        return re.sub(r"^(\s*)from \.", r"\1from ..", text, flags=re.M)

    # --- name tables ------------------------------------------------------
    order = ["_registry"] + [name for _ln, name in CUTS]
    def_in: dict[str, dict[str, str]] = {}  # name -> defining module (last wins)
    mod_defs: dict[str, list[str]] = {m: [] for m in order}
    for m, segs in [("_registry", core_segs)] + [
        (name, parts[name]) for _ln, name in CUTS
    ]:
        for _s, _e, node in segs:
            for n in defined_names(node):
                mod_defs[m].append(n)
                def_in[n] = m  # later definition wins, like the flat module

    # import-origin names: a part that needs one BEFORE the module that
    # hosts the original mid-file import can just repeat the import —
    # same binding, no ordering constraint.
    import_stmt: dict[str, str] = {}
    for _s, _e, node in segments:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                if a.name != "*":
                    import_stmt[a.asname or a.name.split(".")[0]] = rel_fix(
                        ast.get_source_segment(src, node) + "\n"
                    )

    # duplicate-definition report (name defined in 2+ modules)
    seen: dict[str, str] = {}
    for m in order:
        for n in mod_defs[m]:
            if n in seen and seen[n] != m:
                print(f"NOTE dup def {n}: {seen[n]} then {m} (later wins)")
            seen[n] = m

    # --- emit part modules --------------------------------------------
    os.makedirs(OUT_DIR, exist_ok=True)
    earlier: set[str] = set(mod_defs["_registry"])
    avail_mod = {n: "_registry" for n in mod_defs["_registry"]}
    forward_errors = []
    for _ln, name in CUTS:
        segs = parts[name]
        local = set(mod_defs[name])
        used: set[str] = set()
        for _s, _e, node in segs:
            used |= used_names(node)
        deps = sorted((used & earlier) - local)
        # forward-reference check: a used name defined ONLY in a later module
        later_only = {
            n
            for n in used
            if n in def_in
            and n not in earlier
            and n not in local
        }
        extra_imports = []
        for n in sorted(later_only):
            if n in import_stmt:
                # the original binding is a mid-file import hosted by a
                # later module — repeat the import here (same binding).
                if import_stmt[n] not in extra_imports:
                    extra_imports.append(import_stmt[n])
            else:
                forward_errors.append((name, [n]))
        by_mod: dict[str, list[str]] = {}
        for n in deps:
            by_mod.setdefault(avail_mod[n], []).append(n)
        hdr = [
            '"""Auto-split from the flat entry_queries module (round 8) —\n'
            "registration order and query source preserved verbatim; see\n"
            'entry_queries/__init__.py for the aggregation contract."""\n',
            "\n",
            "from __future__ import annotations\n",
            "\n",
        ]
        for m in order:
            if m in by_mod:
                ns = by_mod[m]
                line = f"from .{m} import {', '.join(ns)}\n"
                if len(line) > 88:
                    line = (
                        f"from .{m} import (\n    "
                        + ",\n    ".join(ns)
                        + ",\n)\n"
                    )
                hdr.append(line)
        hdr.extend(extra_imports)
        body = "".join(rel_fix(seg_text(s)) for s in segs)
        with open(os.path.join(OUT_DIR, f"{name}.py"), "w") as f:
            f.write("".join(hdr) + "\n" + body)
        for n in mod_defs[name]:
            earlier.add(n)
            avail_mod[n] = name

    if forward_errors:
        for name, ns in forward_errors:
            print(f"FORWARD REF in {name}: {ns}", file=sys.stderr)
        sys.exit(1)

    # --- _registry.py -------------------------------------------------------
    core_text = "".join(rel_fix(seg_text(s)) for s in core_segs)
    with open(os.path.join(OUT_DIR, "_registry.py"), "w") as f:
        f.write(core_text)

    # --- __init__.py ------------------------------------------------------
    tail_text = "".join(rel_fix(seg_text(s)) for s in tail_segs) + trailing
    init = [
        '"""Driver-facing query registry — an ordered package of domain\n'
        "modules, split from the original flat entry_queries module\n"
        "(verdict r7 task #5; same registration decorator, same order).\n\n"
        "Importing this package imports every domain module IN ORDER —\n"
        "each ``@query`` registration lands in ``_registry.QUERIES`` exactly\n"
        "as it did in the flat file — then applies the same priority-\n"
        "prefix reordering.  Every top-level name is re-exported so\n"
        "``from ...entry_queries import <query_fn>`` keeps working.\n"
        '"""\n',
        "\n",
        "from __future__ import annotations\n",
        "\n",
        "from ._registry import QUERIES, ORACLES\n",
    ]
    for m in order:
        names = sorted(set(mod_defs[m]) - {"QUERIES", "ORACLES"})
        # re-export only names whose FINAL binding is this module
        names = [n for n in names if def_in[n] == m]
        if not names:
            init.append(f"from . import {m}  # noqa: F401 (registration)\n")
            continue
        init.append(
            f"from .{m} import (  # noqa: F401\n    "
            + ",\n    ".join(names)
            + ",\n)\n"
        )
    init.append("\n")
    init.append(tail_text)
    with open(os.path.join(OUT_DIR, "__init__.py"), "w") as f:
        f.write("".join(init))

    print("wrote", OUT_DIR)


if __name__ == "__main__":
    main()
