"""Driver-side test oracles — reimplementations of the reference's
algorithms (small-scale only), used to validate the distributed
operators.  SURVEY §5: "Test oracle at every step = reimplemented
reference semantics (DFS components, cartesian baseline) run
driver-side on tiny inputs."
"""

from __future__ import annotations

import re
from collections import defaultdict
from itertools import combinations


def normalize_py(s: str) -> str:
    """Reference normalization chain (pipeline/data_loading.py:23-36)."""
    s = (s or "").lower()
    s = re.sub(r"[^a-z0-9]", " ", s)
    s = re.sub(r" +", " ", s)
    return s.strip()


def levenshtein_py(s1: str, s2: str) -> int:
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def levenshtein_sim_py(s1: str, s2: str) -> float:
    """pipeline/matching.py:95-96."""
    m = max(len(s1), len(s2))
    return 1 - levenshtein_py(s1, s2) / m if m > 0 else 0.0


def jaccard_sim_py(s1: str, s2: str) -> float:
    """pipeline/matching.py:84-87."""
    t1, t2 = set(s1.split()), set(s2.split())
    u = t1 | t2
    return len(t1 & t2) / len(u) if u else 0.0


def char_ngrams_py(text: str, n: int = 3) -> set[str]:
    """pipeline/utils.py:12-19 (space padding both ends)."""
    if not text:
        return set()
    text = " " * (n - 1) + text + " " * (n - 1)
    return {text[x : x + n] for x in range(len(text) - n + 1)}


def trigram_sim_py(s1: str, s2: str, n: int = 3) -> float:
    """pipeline/matching.py:90-92 over utils.py char n-grams."""
    g1, g2 = char_ngrams_py(s1, n), char_ngrams_py(s2, n)
    d = len(g1) + len(g2)
    return 2 * len(g1 & g2) / d if d > 0 else 0.0


def word_ngrams_py(text: str, n: int) -> list[str]:
    """pipeline/utils.py:23-30."""
    words = text.split()
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def token_blocks_py(
    rows: dict[str, str], stopwords: set[str], min_size: int = 2, max_size: int = 1000
) -> dict[str, list[str]]:
    """Dict-based token blocker with the reference's size cap
    (pipeline/utils.py:86-102: keep 1 < len < 1000)."""
    blocks: dict[str, list[str]] = defaultdict(list)
    for rid, text in rows.items():
        for token in sorted(set(text.split()) - stopwords):
            blocks[token].append(rid)
    return {k: v for k, v in blocks.items() if min_size <= len(v) < max_size}


def candidate_pairs_py(blocks: dict[str, list[str]]) -> set[tuple[str, str]]:
    """Within-block dedup'd pairs, canonical id1 < id2
    (pipeline/utils.py:54-63 adapted to single-table self-match)."""
    pairs: set[tuple[str, str]] = set()
    for ids in blocks.values():
        for a, b in combinations(sorted(set(ids)), 2):
            pairs.add((a, b))
    return pairs


def dfs_components_py(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Reference DFS connected components (pipeline/clustering.py:18-37),
    iterative (no recursion limit), labeled by min member id."""
    adj: dict[str, set[str]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seen: set[str] = set()
    labels: dict[str, str] = {}
    for node in adj:
        if node in seen:
            continue
        stack, comp = [node], []
        seen.add(node)
        while stack:
            cur = stack.pop()
            comp.append(cur)
            for nb in adj[cur]:
                if nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        root = min(comp)
        for m in comp:
            labels[m] = root
    return labels
