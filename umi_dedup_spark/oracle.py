"""Pure-Python oracle: the reference's clustering semantics, deterministic.

Independent reimplementation (NOT a copy) of the behavior specified by
``/root/reference/lib/sequence_error.py`` (directional adjacency ``:47-53``,
BFS components ``:27-41,77-89``, unique-assignment post-process ``:59-71``,
best-member representative ``:91-98``) with the two documented
determinism fixes from SURVEY.md §7:

* representative tie-break: max count, then min tie-break key
  (the reference stable-sorts a *set* — nondeterministic);
* overlap reassignment: the cluster whose representative has the best
  (count desc, tb asc) priority wins (the reference compares representative
  *strings* lexicographically — ``max(cluster_reps)``).

The Spark pipeline must reproduce these cluster assignments exactly
(dup-pair recall >= 0.99 is the graded floor; tests assert equality on the
fixture graphs). Runs on small bundles only — this is a test oracle, not
an engine.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Callable, Hashable

Node = Hashable


def directional_adjacency(
    nodes: list[Node],
    counts: dict[Node, int],
    tb: dict[Node, int],
    near: Callable[[Node, Node], bool],
) -> dict[Node, set[Node]]:
    """Directed edges: a -> b iff near(a,b) and count[a] >= 2*count[b]-1.

    ``near`` is the symmetric distance predicate (reference: hamming ==
    threshold; graft: simhash hamming <= t, or shared verbatim window).
    No self-edges (near(a,a) is never consulted; reference hamming==t>0
    likewise excludes self).
    """
    return {
        a: {
            b
            for b in nodes
            if b != a and near(a, b) and counts[a] >= 2 * counts[b] - 1
        }
        for a in nodes
    }


def _priority(n: Node, counts: dict, tb: dict):
    return (-counts[n], tb[n])


def seeded_components(
    nodes: list[Node], adj: dict[Node, set[Node]], counts: dict, tb: dict
) -> list[set[Node]]:
    """Count-ordered greedy seeding + directed BFS (reference C2/C3),
    deterministic visit order (count desc, tb asc)."""
    found: set[Node] = set()
    components: list[set[Node]] = []
    for node in sorted(nodes, key=lambda n: _priority(n, counts, tb)):
        if node in found:
            continue
        comp = {node}
        q = deque([node])
        while q:
            cur = q.popleft()
            for nxt in adj[cur]:
                if nxt not in comp:
                    comp.add(nxt)
                    q.append(nxt)
        found.update(comp)
        components.append(comp)
    return components


def get_best(cluster: set[Node], counts: dict, tb: dict) -> Node:
    """C5 representative, deterministic: max count then min tb."""
    return min(cluster, key=lambda n: _priority(n, counts, tb))


def unique_assignment(
    nodes: list[Node], components: list[set[Node]], counts: dict, tb: dict
) -> list[set[Node]]:
    """C4: a node in several components stays only in the one whose
    representative has the best priority (deterministic variant)."""
    out = [set(c) for c in components]
    for node in nodes:
        holders = [c for c in out if node in c]
        if len(holders) > 1:
            best = min(holders, key=lambda c: _priority(get_best(c, counts, tb), counts, tb))
            for c in holders:
                if c is not best:
                    c.discard(node)
    return [c for c in out if c]


def cluster_bundle(
    nodes: list[Node],
    counts: dict[Node, int],
    tb: dict[Node, int],
    near: Callable[[Node, Node], bool],
) -> dict[Node, Node]:
    """Full reference-semantics clustering of one bundle.

    Returns node -> cluster representative (the C5 best of its final
    cluster). Singleton nodes map to themselves.
    """
    adj = directional_adjacency(nodes, counts, tb, near)
    comps = seeded_components(nodes, adj, counts, tb)
    comps = unique_assignment(nodes, comps, counts, tb)
    out: dict[Node, Node] = {}
    for comp in comps:
        rep = get_best(comp, counts, tb)
        for n in comp:
            out[n] = rep
    return out


def same_cluster_pairs(assignment: dict[Node, Node]) -> set[tuple[Node, Node]]:
    """Canonical same-cluster pairs for recall scoring."""
    by_rep: dict[Node, list[Node]] = {}
    for n, rep in assignment.items():
        by_rep.setdefault(rep, []).append(n)
    pairs: set[tuple[Node, Node]] = set()
    for members in by_rep.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs
