"""Driver-prefix rotation policy (verdict r9 task #1) — computed, not
hand-pinned.

The external driver's correctness gate samples the FIRST 50
``queries()`` entries each round, so the prefix is the round's most
valuable artifact.  The standing policy, now mechanized:

1. **Changed-since-last-driver-sample first.**  A query whose builder
   function — or any package code it actually reaches — changed after
   the round in which the driver last sampled it green is running on
   code the driver has never checked; those names must lead the
   prefix.  Ordering inside the tier: most recently CHANGED first
   (freshest unverified code carries the most risk), stalest
   last-sample as the tiebreak.  Never-sampled-green queries (new
   waves, or rows that errored when sampled) count as changed in the
   current round.
2. **Oldest-green rotation fills the remainder** (hand-chosen in
   ``entry_queries.__init__``; this module only validates the head).

Mechanics:

* last green sample per query: the committed ``CORRECTNESS_r*.json``
  files (an entry is green when rows/schema/hash all match and no
  error was recorded);
* round boundaries: the ``round N: verdict/advice/correctness/bench``
  commits — the driver sampled the code state just before each; the
  in-progress round is ``max+1`` and diffs against the working tree;
* reachability: identifiers in each visited function/class source are
  resolved through its globals and in-body imports, recursing through
  package functions — so ``_registry``'s unrelated re-exports do NOT
  drag every operator module into every query;
* change granularity: FUNCTION segments for top-level package
  functions (a one-line edit to ``dedup.lcs_pairs`` flags only the
  lcs queries, not every dedup.py caller) plus the host module's
  SKELETON (top-level code with def/class bodies, comments and the
  module docstring stripped — catches module-level constant changes);
  whole-file for classes, module-object references and anything the
  resolver cannot pin down.

``tests/test_driver_prefix.py`` asserts the rule; run this file
directly to print the computed head for prefix maintenance:

    python tools/prefix_policy.py [--emit]
"""

from __future__ import annotations

import importlib
import inspect
import json
import os
import re
import subprocess
import sys
import types
from functools import lru_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "imdb_metacritic_data_warehouse_spark"
_BOUNDARY_RE = re.compile(r"^round (\d+): verdict/advice/correctness/bench$")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_IMPORT_RE = re.compile(
    r"^\s*from\s+(\.+[\w.]*|imdb_metacritic_data_warehouse_spark[\w.]*)\s+import\s+(.+)$"
)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


@lru_cache(maxsize=1)
def round_boundaries() -> dict[int, str]:
    """round number -> the `round N: verdict/...` record commit sha."""
    out: dict[int, str] = {}
    for line in _git("log", "--format=%H %s").splitlines():
        sha, _, subj = line.partition(" ")
        m = _BOUNDARY_RE.match(subj.strip())
        if m:
            out.setdefault(int(m.group(1)), sha)
    return out


def _current_round() -> int:
    top = max(round_boundaries())
    if PRE_BOUNDARY and _max_record_round() >= top:
        return top
    return top + 1


# When True, the newest round's CORRECTNESS records and boundary are
# ignored — the "pre-boundary" view.  A fresh checkout taken right
# AFTER a round's record commit lands carries CORRECTNESS_r{N} that
# the prefix (frozen just BEFORE the round-N driver sample) could not
# have known about; tests accept either view so the suite stays green
# across the boundary until the next session rotates the prefix.
PRE_BOUNDARY = False


def _max_record_round() -> int:
    out = 0
    for fname in os.listdir(REPO):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if m:
            out = max(out, int(m.group(1)))
    return out


@lru_cache(maxsize=2)
def _last_green_sample(pre_boundary: bool) -> dict[str, int]:
    skip = _max_record_round() if pre_boundary else -1
    out: dict[str, int] = {}
    for fname in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if not m:
            continue
        rnd = int(m.group(1))
        if rnd == skip:
            continue
        with open(os.path.join(REPO, fname)) as fh:
            rec = json.load(fh)
        for name, row in rec.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if green and rnd >= out.get(name, -1):
                out[name] = rnd
    return out


def last_green_sample() -> dict[str, int]:
    """query name -> most recent round whose driver sample was GREEN
    (respects the PRE_BOUNDARY view)."""
    return _last_green_sample(PRE_BOUNDARY)


def set_view(pre_boundary: bool) -> None:
    """Switch between the current and pre-boundary views, clearing the
    round-dependent caches (they key on round numbers whose meaning
    changes with the view)."""
    global PRE_BOUNDARY
    PRE_BOUNDARY = pre_boundary
    _round_diff.cache_clear()
    _src_at_round.cache_clear()
    _skeleton_at_round.cache_clear()


@lru_cache(maxsize=None)
def _round_diff(r: int) -> frozenset[str]:
    """Files changed DURING round r: boundary(r-1)..boundary(r), or
    boundary(last)..working-tree for the in-progress round."""
    b = round_boundaries()
    if r == _current_round():
        return frozenset(_git("diff", "--name-only", b[r - 1]).splitlines())
    if r - 1 not in b or r not in b:
        return frozenset()
    return frozenset(_git("diff", "--name-only", b[r - 1], b[r]).splitlines())


@lru_cache(maxsize=None)
def _show(commit: str, relpath: str) -> str | None:
    try:
        return _git("show", f"{commit}:{relpath}")
    except subprocess.CalledProcessError:
        return None


@lru_cache(maxsize=None)
def _src_at_round(r: int, relpath: str) -> str | None:
    """Module source as of the END of round r (the state the round-r
    driver sampled); working tree for the in-progress round."""
    if r >= _current_round():
        path = os.path.join(REPO, relpath)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return fh.read()
    commit = round_boundaries().get(r)
    return None if commit is None else _show(commit, relpath)


def _segment(src: str, fname: str) -> str | None:
    """The top-level function `fname`'s text inside a module source:
    from its `def` line (plus any directly preceding decorator block)
    to the next column-0 statement.  Whitespace-normalized per line."""
    lines = src.splitlines()
    start = None
    for i, ln in enumerate(lines):
        if re.match(rf"def {re.escape(fname)}\s*\(", ln):
            start = i
            break
    if start is None:
        return None
    # swallow a decorator block immediately above (e.g. @query(...)),
    # scanning up past its (indented) continuation lines
    j = start - 1
    while j >= 0:
        ln = lines[j]
        if ln.startswith("@"):
            start = j
            j -= 1
        elif ln.startswith((" ", ")", "]", '"', "'")) or not ln.strip():
            j -= 1
        else:
            break
    end = len(lines)
    for i in range(start + 1, len(lines)):
        ln = lines[i]
        if ln and not ln[0].isspace() and not ln.startswith((")", "]", '"', "'", "#", "@")):
            if not ln.startswith(f"def {fname}"):
                end = i
                break
    return "\n".join(ln.rstrip() for ln in lines[start:end] if ln.strip())


def _skeleton(src: str) -> str:
    """Module top-level code with def/class bodies, column-0 comments
    and the module docstring stripped — the part whose change affects
    EVERY function in the module (imports, constants, module-level
    statements)."""
    lines = src.splitlines()
    out: list[str] = []
    in_block = False  # inside a top-level def/class body
    in_doc = False
    doc_done = False
    for ln in lines:
        stripped = ln.strip()
        if not doc_done and not in_doc and stripped.startswith(('"""', "'''")):
            if stripped.count('"""') >= 2 or stripped.count("'''") >= 2:
                doc_done = True
                continue
            in_doc = True
            continue
        if in_doc:
            if '"""' in ln or "'''" in ln:
                in_doc = False
                doc_done = True
            continue
        if ln and not ln[0].isspace():
            doc_done = True
            if re.match(r"(def |class |@)", ln):
                in_block = True
                continue
            if ln.startswith("#"):
                continue
            if in_block and ln.startswith((")", "]", '"', "'")):
                # continuation of a signature/decorator at column 0
                continue
            in_block = False
            out.append(ln.rstrip())
        elif not in_block and stripped and not stripped.startswith("#"):
            out.append(ln.rstrip())
    return "\n".join(out)


def _entry_paths_at(relpath: str) -> list[str]:
    """Candidate historical locations of an entry-module function."""
    cands = [relpath]
    if f"{PKG}/entry_queries" in relpath:
        # pre-package-split flat module (rounds <= 7)
        cands.append(f"{PKG}/entry_queries.py")
    return cands


def _seg_at_round(r: int, relpath: str, fname: str) -> str | None:
    for cand in _entry_paths_at(relpath):
        src = _src_at_round(r, cand)
        if src is not None:
            seg = _segment(src, fname)
            if seg is not None:
                return seg
    return None


@lru_cache(maxsize=None)
def _skeleton_at_round(r: int, relpath: str) -> str | None:
    src = _src_at_round(r, relpath)
    return None if src is None else _skeleton(src)


def _rel_of_module(mod) -> str | None:
    f = getattr(mod, "__file__", None)
    if not f:
        return None
    rel = os.path.relpath(f, REPO)
    return rel if not rel.startswith("..") else None


def _import_objects(line: str, modname: str):
    """Objects named by one in-body package import line, resolved by
    actually importing the module (package modules import without a
    Spark session).  Returns (objects, fallback_module_files)."""
    m = _IMPORT_RE.match(line)
    if not m:
        return [], set()
    target, names = m.group(1), m.group(2)
    try:
        absname = (
            importlib.util.resolve_name(target, modname.rsplit(".", 1)[0])
            if target.startswith(".")
            else target
        )
        mod = importlib.import_module(absname)
    except Exception:
        return [], set()
    objs, files = [], set()
    for piece in names.split(","):
        name = piece.replace("(", "").replace(")", "").strip().split(" as ")[0].strip()
        if not name:
            continue
        obj = getattr(mod, name, None)
        if obj is None:
            rel = _rel_of_module(mod)
            if rel:
                files.add(rel)
        else:
            objs.append(obj)
    return objs, files


def _reach(fn) -> tuple[frozenset, frozenset]:
    """(function-granular deps, file-granular deps) reachable from `fn`
    through the actual call graph.  Function-granular: top-level
    package functions, tracked as (module relpath, function name) —
    entry-module helpers included, so a helper edit flags its callers
    without flagging the whole entry module.  File-granular: package
    module references, classes, and unresolvable imports."""
    seen: set[int] = set()
    funcs: set[tuple[str, str]] = set()
    files: set[str] = set()
    stack = [fn]
    first = True
    while stack:
        obj = stack.pop()
        if id(obj) in seen:
            continue
        seen.add(id(obj))
        try:
            src = inspect.getsource(obj)
        except (OSError, TypeError):
            continue
        modname = getattr(obj, "__module__", "") or ""
        g = getattr(obj, "__globals__", None)
        if g is None:
            mod = sys.modules.get(modname)
            g = getattr(mod, "__dict__", {})
        for line in src.splitlines():
            objs, fb = _import_objects(line, modname)
            files |= {f for f in fb if f"{PKG}/entry_queries" not in f}
            stack.extend(objs)
        for ident in set(_IDENT_RE.findall(src)):
            tgt = g.get(ident)
            if tgt is None:
                continue
            if isinstance(tgt, types.ModuleType):
                rel = _rel_of_module(tgt)
                if rel and rel.startswith(PKG) and "entry_queries" not in rel:
                    files.add(rel)
                continue
            tmod = getattr(tgt, "__module__", "") or ""
            if not tmod.startswith(PKG):
                continue
            stack.append(tgt)
            try:
                f = inspect.getsourcefile(tgt)
            except TypeError:
                f = None
            if not f:
                continue
            frel = os.path.relpath(f, REPO)
            if inspect.isfunction(tgt) and tgt.__qualname__ == tgt.__name__:
                if not first or tgt is not fn:
                    funcs.add((frel, tgt.__name__))
            else:
                files.add(frel)
        first = False
    return frozenset(funcs), frozenset(files)


@lru_cache(maxsize=1)
def _dep_index() -> dict:
    """query name -> (entry relpath, builder fn name, function-granular
    deps, file-granular deps)."""
    from imdb_metacritic_data_warehouse_spark import entry_queries as eq

    out = {}
    for name, fn in eq.QUERIES.items():
        relpath = os.path.relpath(inspect.getsourcefile(fn), REPO)
        funcs, files = _reach(fn)
        out[name] = (relpath, fn.__name__, funcs, files)
    return out


def _changed_in_round(r: int, relpath: str, fname: str) -> bool:
    """Did the (function segment OR host-module skeleton) change in
    round r?  Missing source on either side counts as changed."""
    prev_seg = _seg_at_round(r - 1, relpath, fname)
    now_seg = _seg_at_round(r, relpath, fname)
    if prev_seg is None or now_seg is None or prev_seg != now_seg:
        return True
    prev_sk = _skeleton_at_round(r - 1, relpath)
    now_sk = _skeleton_at_round(r, relpath)
    return prev_sk is None or now_sk is None or prev_sk != now_sk


def last_change_round(name: str) -> int | None:
    """Highest round r > last-green-sample(name) in which the query's
    builder segment, a reachable function, or a file-granular dep
    changed; None if untouched since its last green sample.
    Never-sampled queries return the current round."""
    sampled = last_green_sample()
    k = sampled.get(name, -1)
    cur = _current_round()
    if k < 0 or k not in round_boundaries():
        return cur
    relpath, fname, funcs, files = _dep_index()[name]
    for r in range(cur, k, -1):
        diff = _round_diff(r)
        if any(m in diff for m in files):
            return r
        touched_entry = any(p in diff for p in _entry_paths_at(relpath))
        if touched_entry and _changed_in_round(r, relpath, fname):
            return r
        for frel, fnm in funcs:
            if (
                frel in diff or any(p in diff for p in _entry_paths_at(frel))
            ) and _changed_in_round(r, frel, fnm):
                return r
    return None


def changed_since_last_sample() -> dict[str, int]:
    """Names whose code changed after their last green driver sample
    (or that never had one), mapped to the ROUND OF LAST CHANGE."""
    out: dict[str, int] = {}
    for name in _dep_index():
        r = last_change_round(name)
        if r is not None:
            out[name] = r
    return out


def required_head(cap: int = 50) -> list[str]:
    """The names that must lead the prefix: changed-since-sample (and
    never-sampled) queries — most recently CHANGED first, stalest
    last-SAMPLE as the tiebreak — truncated to `cap`."""
    changed = changed_since_last_sample()
    sampled = last_green_sample()
    ordered = sorted(changed, key=lambda n: (-changed[n], sampled.get(n, -1), n))
    return ordered[:cap]


if __name__ == "__main__":
    changed = changed_since_last_sample()
    sampled = last_green_sample()
    head = required_head()
    print(
        f"# {len(changed)} queries changed since their last green driver "
        f"sample; required head (cap 50):"
    )
    for n in head:
        print(f"  changed_r{changed[n]:<2} last_sampled_r{sampled.get(n, -1):<2}  {n}")
    if "--emit" in sys.argv:
        print("\n_PRIORITY_PREFIX = [")
        for n in head:
            print(f'    "{n}",')
        print("]")
