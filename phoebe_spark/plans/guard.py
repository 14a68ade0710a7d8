"""Physical-plan scale guard: detect single-partition sorts over
unbounded frames, including stages hidden behind eager localCheckpoints.

Round-8 post-mortem (VERDICT r8 #2): ``localCheckpoint(eager=True)``
executes a stage at build time, so the final frame's plan shows only
``Scan ExistingRDD`` — a scale-killing unpartitioned window in the
checkpointed input is invisible to any assertion on the final plan
(q321's candidate cut escaped exactly this way). The fix is structural:
:func:`capture_checkpoints` monkeypatches ``DataFrame.localCheckpoint``
to snapshot the *pre-checkpoint* formatted plan of every checkpointed
frame, and :func:`single_partition_sort_violations` flags the
``Sort <- Exchange SinglePartition`` shape (the physical signature of a
``Window.orderBy`` with no ``partitionBy``) unless the exchange's input
subtree is provably bounded (a GlobalLimit / TakeOrderedAndProject /
CollectLimit below it caps the row count, the q320 top-k-then-rank
recipe).

A plain ``df.orderBy(...)`` global sort plans as an Exchange over
*range* partitioning and is NOT flagged — only the all-rows-into-one-
task window shape is. Queries whose unpartitioned window runs over a
frame that is small by *data* contract rather than by *plan* shape
(distinct-value supports, drained streaming state) declare themselves in
the caller's allowlist, keeping every exception explicit and auditable.
"""

from __future__ import annotations

import re
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame

_NODE_RE = re.compile(r"^([-+:*\s]*)(\S.*?)\s+\((\d+)\)\s*$")
_BOUNDED_OPS = (
    "GlobalLimit",
    "CollectLimit",
    "TakeOrderedAndProject",
    "LocalLimit",
)


def explain_formatted(df: DataFrame) -> str:
    """The ``formatted`` explain string of a DataFrame (header tree +
    per-node details), without printing to stdout."""
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class _Node:
    node_id: int
    op: str
    depth: int
    parent: "_Node | None"
    children: list


def _parse_tree(plan: str) -> dict[int, _Node]:
    """Parse the header tree of a formatted explain into parent/child
    links keyed by node id. Codegen stars and branch glyphs are stripped;
    depth is the glyph-prefix length (uniform 3-char steps)."""
    nodes: dict[int, _Node] = {}
    stack: list[_Node] = []
    for line in plan.splitlines():
        if line.startswith("== "):
            if nodes:  # details section reached
                break
            continue
        m = _NODE_RE.match(line)
        if not m:
            if nodes:
                break
            continue
        prefix, op, nid = m.group(1), m.group(2), int(m.group(3))
        op = op.lstrip("* ").strip()
        depth = len(prefix)
        while stack and stack[-1].depth >= depth:
            stack.pop()
        node = _Node(nid, op, depth, stack[-1] if stack else None, [])
        if node.parent is not None:
            node.parent.children.append(node)
        nodes[nid] = node
        stack.append(node)
    return nodes


def _single_partition_ids(plan: str) -> set[int]:
    """Node ids of Exchange operators with SinglePartition arguments."""
    ids: set[int] = set()
    for m in re.finditer(r"\((\d+)\) Exchange\n((?:[^\n(]|\([^\d])*?Arguments: SinglePartition)", plan):
        ids.add(int(m.group(1)))
    # robust fallback: scan the details blocks line-pairwise
    current: int | None = None
    for line in plan.splitlines():
        hm = re.match(r"^\((\d+)\) (Exchange|ReusedExchange)", line)
        if hm:
            current = int(hm.group(1)) if hm.group(2) == "Exchange" else None
            continue
        if current is not None and line.startswith("Arguments:"):
            if "SinglePartition" in line:
                ids.add(current)
            current = None
    return ids


def _subtree_bounded(node: _Node) -> bool:
    """True if any descendant caps the row count (limit / top-k)."""
    todo = list(node.children)
    while todo:
        n = todo.pop()
        if any(n.op.startswith(b) for b in _BOUNDED_OPS):
            return True
        todo.extend(n.children)
    return False


_AGG_OPS = ("HashAggregate", "ObjectHashAggregate", "SortAggregate")


def _subtree_aggregated(node: _Node) -> bool:
    """True if an aggregate sits below this exchange — the sorted frame
    is a grouped support (distinct values, buckets, rollups), not raw
    corpus rows. Collapse-before-sort is the repo's documented exception
    class for unpartitioned windows; it is a policy gate, not a size
    proof, so callers keep a named allowlist for these."""
    todo = list(node.children)
    while todo:
        n = todo.pop()
        if any(n.op.startswith(a) for a in _AGG_OPS):
            return True
        todo.extend(n.children)
    return False


def single_partition_sort_violations(plan: str) -> list[str]:
    """Flag every ``Sort`` whose child is an ``Exchange SinglePartition``
    with an unbounded input subtree — the all-rows-into-one-task window
    shape that dies at 100x. Each entry is prefixed ``raw:`` (the sorted
    frame is un-aggregated source rows — never acceptable) or ``agg:``
    (the frame is a grouped support — acceptable only for audited,
    domain-bounded supports)."""
    nodes = _parse_tree(plan)
    sp_ids = _single_partition_ids(plan)
    out: list[str] = []
    for node in nodes.values():
        if node.node_id not in sp_ids or node.parent is None:
            continue
        if not node.parent.op.startswith("Sort"):
            continue
        if _subtree_bounded(node):
            continue
        kind = "agg" if _subtree_aggregated(node) else "raw"
        out.append(
            f"{kind}: Sort({node.parent.node_id}) over Exchange "
            f"SinglePartition({node.node_id}) with unbounded input"
        )
    return out


def raw_single_partition_sort_violations(plan: str) -> list[str]:
    """Only the ``raw:`` class — an unpartitioned sort directly over
    un-aggregated corpus rows. Zero tolerance: no query may ship one."""
    return [
        v for v in single_partition_sort_violations(plan) if v.startswith("raw:")
    ]


def _checkpoint_classes() -> list[type]:
    """Every DataFrame class that defines its OWN localCheckpoint —
    Spark 4 splits the API into an abstract ``pyspark.sql.DataFrame``
    and the concrete ``pyspark.sql.classic.dataframe.DataFrame``;
    patching only the base would never intercept classic sessions."""
    classes = [DataFrame]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _C

        classes.append(_C)
    except ImportError:
        pass
    return [c for c in classes if "localCheckpoint" in c.__dict__]


@contextmanager
def capture_checkpoints():
    """Patch ``DataFrame.localCheckpoint`` (on every concrete class that
    defines it) to snapshot each frame's formatted plan BEFORE the
    checkpoint truncates it. Yields the list the snapshots accumulate
    into (appended in call order)."""
    captured: list[str] = []
    targets = _checkpoint_classes()
    origs = {cls: cls.__dict__["localCheckpoint"] for cls in targets}

    def make_patched(orig):
        def patched(self, eager=True):
            captured.append(explain_formatted(self))
            return orig(self, eager=eager)

        return patched

    for cls, orig in origs.items():
        cls.localCheckpoint = make_patched(orig)
    try:
        yield captured
    finally:
        for cls, orig in origs.items():
            cls.localCheckpoint = orig
