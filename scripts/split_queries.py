"""One-shot mechanical splitter: phoebe_spark/queries.py -> phoebe_spark/queries/.

Round-9 structural ask (VERDICT r8 #8): the single-module registry crossed
26k lines (~3.7k/round growth); split it into one module per 50-query block
with a ``_core`` module holding the registry dicts, the ``query`` decorator
and the shared policy helpers, and an ``__init__`` facade that re-exports
every top-level name so ``from phoebe_spark.queries import X`` keeps working
for every existing importer (driver contract, bench, tests).

Purely mechanical: statements are moved verbatim in file order; cross-block
name references become explicit ``from .blockX import name`` lines, derived
from an AST use/def analysis. The script fails loudly on any backward
(later-block -> earlier-use) reference instead of emitting a circular import.
"""

from __future__ import annotations

import ast
import builtins
import re
from pathlib import Path

SRC = Path("phoebe_spark/queries.py")
OUT = Path("phoebe_spark/queries")
BLOCK = 50

src = SRC.read_text()
lines = src.splitlines(keepends=True)
tree = ast.parse(src)

QNUM = re.compile(r"^_?q(\d+)_")


def defined_names(stmt) -> list[str]:
    if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return [stmt.name]
    if isinstance(stmt, ast.Assign):
        out = []
        for t in stmt.targets:
            if isinstance(t, ast.Name):
                out.append(t.id)
        return out
    if isinstance(stmt, ast.AnnAssign) and isinstance(stmt.target, ast.Name):
        return [stmt.target.id]
    if isinstance(stmt, (ast.Import, ast.ImportFrom)):
        out = []
        for a in stmt.names:
            out.append((a.asname or a.name).split(".")[0])
        return out
    return []


def used_names(stmt) -> set[str]:
    return {n.id for n in ast.walk(stmt) if isinstance(n, ast.Name)}


# ---- segments: attach preceding blank/comment lines to the statement ----
segs = []  # (start_line_1idx, end_line_1idx, stmt)
prev_end = 0
for stmt in tree.body:
    start = stmt.lineno
    if getattr(stmt, "decorator_list", None):
        start = min(start, min(d.lineno for d in stmt.decorator_list))
    # pull comment/blank lines immediately above back to prev segment end
    s = start
    while s - 1 > prev_end:
        t = lines[s - 2].strip()
        if t == "" or t.startswith("#"):
            s -= 1
        else:
            break
    segs.append([s, stmt.end_lineno, stmt])
    prev_end = stmt.end_lineno

# ---- partition: _core = everything before the first numbered def ----
first_q = next(
    i
    for i, (_, _, st) in enumerate(segs)
    if any(QNUM.match(n) for n in defined_names(st))
)
core_segs = segs[:first_q]
rest = segs[first_q:]

parts: list[tuple[str, list]] = []  # (modname, segs)
cur, cur_cap = [], BLOCK
for seg in rest:
    nums = [int(QNUM.match(n).group(1)) for n in defined_names(seg[2]) if QNUM.match(n)]
    if nums and max(nums) > cur_cap and cur:
        lo, hi = cur_cap - BLOCK + 1, cur_cap
        parts.append((f"q{lo:03d}_{hi:03d}", cur))
        cur = []
        while max(nums) > cur_cap:
            cur_cap += BLOCK
    cur.append(seg)
if cur:
    lo, hi = cur_cap - BLOCK + 1, cur_cap
    parts.append((f"q{lo:03d}_{hi:03d}", cur))

# ---- name -> defining module map ----
BUILTINS = set(dir(builtins))
owner: dict[str, str] = {}
core_import_lines: dict[str, str] = {}  # name -> original import source line(s)
for s, e, st in core_segs:
    for n in defined_names(st):
        owner[n] = "_core"
        if isinstance(st, (ast.Import, ast.ImportFrom)):
            core_import_lines[n] = "".join(lines[s - 1 : e])
for modname, psegs in parts:
    for _, _, st in psegs:
        for n in defined_names(st):
            if n not in owner:  # first definition wins (no redefs expected)
                owner[n] = modname

# sanity: no duplicate top-level defs across modules
seen: dict[str, str] = {}
for modname, psegs in [("_core", core_segs)] + parts:
    for _, _, st in psegs:
        for n in defined_names(st):
            if n in seen and seen[n] != modname:
                raise SystemExit(f"name {n} defined in both {seen[n]} and {modname}")
            seen[n] = modname

part_order = ["_core"] + [m for m, _ in parts]


def emit(modname: str, psegs, needed_from: dict[str, list[str]]) -> str:
    lo_hi = modname.replace("q", "").replace("_", "-")
    head = [
        f'"""Query registry block {lo_hi} (mechanically split from the former\n'
        f"single-module registry in round 9; see ``_core`` for the decorator,\n"
        f'the registry dicts, and the float-determinism policy)."""\n',
        "\n",
        "from __future__ import annotations\n",
        "\n",
    ]
    # external imports replicated from the original header, for names used here
    ext = sorted({core_import_lines[n] for n in needed_from.pop("__ext__", [])})
    head += ext
    if ext:
        head.append("\n")
    for src_mod in part_order:
        if src_mod == modname:
            continue
        names = sorted(needed_from.get(src_mod, []))
        if not names:
            continue
        line = f"from .{src_mod} import {', '.join(names)}"
        if len(line) > 88:
            line = (
                f"from .{src_mod} import (\n    "
                + ",\n    ".join(names)
                + ",\n)"
            )
        head.append(line + "\n")
    head.append("\n")
    body = "".join("".join(lines[s - 1 : e]) for s, e, _ in psegs)
    return "".join(head) + body.lstrip("\n")


OUT.mkdir(exist_ok=True)

# _core: verbatim header (docstring, imports, registry, shared helpers)
core_end = core_segs[-1][1]
(OUT / "_core.py").write_text("".join(lines[:core_end]))

for idx, (modname, psegs) in enumerate(parts):
    local = set()
    for _, _, st in psegs:
        local.update(defined_names(st))
    used = set()
    for _, _, st in psegs:
        used |= used_names(st)
    needed = used - local - BUILTINS
    by_mod: dict[str, list[str]] = {}
    for n in sorted(needed):
        if n not in owner:
            continue  # nested-scope name shadowing nothing top-level
        src_mod = owner[n]
        if src_mod == modname:
            continue
        if src_mod != "_core" and part_order.index(src_mod) > part_order.index(
            modname
        ):
            raise SystemExit(
                f"backward reference: {modname} uses {n} defined in {src_mod}"
            )
        if src_mod == "_core" and n in core_import_lines:
            by_mod.setdefault("__ext__", []).append(n)
        else:
            by_mod.setdefault(src_mod, []).append(n)
    (OUT / f"{modname}.py").write_text(emit(modname, psegs, by_mod))

init = '''"""Oracle-checked query registry (package facade).

The registry was a single 26k-line module through round 8; it is now one
module per 50-query block plus ``_core`` (registry dicts, the ``query``
decorator, shared policy helpers). Importing this package imports every
block, so ``QUERIES`` / ``ORACLE`` are fully populated, and every top-level
name of every block is re-exported here so existing importers
(``from phoebe_spark.queries import X``) are unaffected by the split.
"""

from __future__ import annotations

from . import _core
MODS = '''
init += repr([m for m, _ in parts]) + "\n"
init += """
import importlib as _importlib

_mods = [_core] + [_importlib.import_module(f".{m}", __name__) for m in MODS]
for _m in _mods:
    for _k, _v in vars(_m).items():
        if not _k.startswith("__"):
            globals().setdefault(_k, _v)
del _m, _k, _v, _mods, _importlib
"""
(OUT / "__init__.py").write_text(init)

print("parts:", [(m, len(p)) for m, p in parts])
print("core segments:", len(core_segs), "end line", core_end)
