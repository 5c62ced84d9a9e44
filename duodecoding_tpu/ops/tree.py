"""Prefix-tree draft buffers for tree-attention verification.

Host-side construction of the Medusa-style tree buffers the reference's
vendored zoo uses (reference: src/model/medusa/utils.py:31-196 generates
candidate tree buffers; src/model/rest/DraftRetriever `generate_draft_buffers`
emits the same structure from retrieval paths): given candidate
continuation paths, deduplicate shared prefixes into a tree, and emit

- ``tokens [N]`` — tree node tokens in BFS order,
- ``depths [N]`` — node depth (rope position offset; root children = 0),
- ``mask [N, N]`` — ancestor-or-self visibility (tree attention),
- ``paths`` — per input path, the node indices along it,

padded to a static node budget for the jitted verify step.
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np


class DraftTree(NamedTuple):
    tokens: np.ndarray  # [N] int32 (padded with 0)
    depths: np.ndarray  # [N] int32
    mask: np.ndarray  # [N, N] bool
    parent: np.ndarray  # [N] int32 (-1 for roots)
    paths: List[List[int]]  # node-index chains per input path
    n_nodes: int


def build_draft_tree(paths: List[np.ndarray], max_nodes: int) -> DraftTree:
    """Merge candidate paths into a prefix tree (BFS order, shared prefixes
    deduplicated), truncated to ``max_nodes``."""
    tokens: List[int] = []
    depths: List[int] = []
    parent: List[int] = []
    children: dict[tuple[int, int], int] = {}  # (parent_idx, token) -> node
    out_paths: List[List[int]] = []

    for path in paths:
        cur = -1
        chain: List[int] = []
        for d, tok in enumerate(list(path)):
            key = (cur, int(tok))
            if key in children:
                cur = children[key]
            else:
                if len(tokens) >= max_nodes:
                    break
                idx = len(tokens)
                tokens.append(int(tok))
                depths.append(d)
                parent.append(cur)
                children[key] = idx
                cur = idx
            chain.append(cur)
        out_paths.append(chain)

    n = len(tokens)
    mask = np.zeros((max_nodes, max_nodes), bool)
    for i in range(n):
        j = i
        while j != -1:
            mask[i, j] = True
            j = parent[j]

    tok_arr = np.zeros((max_nodes,), np.int32)
    tok_arr[:n] = tokens
    dep_arr = np.zeros((max_nodes,), np.int32)
    dep_arr[:n] = depths
    par_arr = np.full((max_nodes,), -1, np.int32)
    par_arr[:n] = parent
    return DraftTree(
        tokens=tok_arr, depths=dep_arr, mask=mask, parent=par_arr,
        paths=out_paths, n_nodes=n,
    )


def tree_from_parents(
    tokens: np.ndarray, parents: np.ndarray, max_nodes: int
) -> DraftTree:
    """Build a DraftTree directly from (token, parent-index) arrays — the
    shape EAGLE-style beam drafting emits (parents reference earlier
    indices; -1 = root child). Nodes beyond ``max_nodes`` are dropped;
    since parents always precede children, index truncation keeps the tree
    closed."""
    n = min(len(tokens), max_nodes)
    tok_arr = np.zeros((max_nodes,), np.int32)
    dep_arr = np.zeros((max_nodes,), np.int32)
    par_arr = np.full((max_nodes,), -1, np.int32)
    mask = np.zeros((max_nodes, max_nodes), bool)
    for i in range(n):
        p = int(parents[i])
        tok_arr[i] = int(tokens[i])
        par_arr[i] = p
        dep_arr[i] = 0 if p < 0 else dep_arr[p] + 1
        mask[i, i] = True
        if p >= 0:
            mask[i] |= mask[p]
    return DraftTree(
        tokens=tok_arr, depths=dep_arr, mask=mask, parent=par_arr,
        paths=[], n_nodes=n,
    )


def best_greedy_path(tree: DraftTree, argmax_tokens: np.ndarray, root_pred: int):
    """Walk the tree greedily: starting from the target's prediction at the
    current position (``root_pred``), follow children whose token matches
    the target's argmax at the parent node. Returns (accepted node chain,
    bonus token)."""
    n = tree.n_nodes
    kids: dict[int, List[int]] = {}
    for i in range(n):
        kids.setdefault(int(tree.parent[i]), []).append(i)

    chain: List[int] = []
    cur = -1
    pred = root_pred
    while True:
        nxt = None
        for c in kids.get(cur, []):
            if int(tree.tokens[c]) == int(pred):
                nxt = c
                break
        if nxt is None:
            break
        chain.append(nxt)
        pred = int(argmax_tokens[nxt])
        cur = nxt
    return chain, int(pred)


def best_accept_path(tree: DraftTree, flags) -> List[int]:
    """Longest root-anchored chain of ACCEPTED nodes (typical-acceptance
    sampled verification, reference src/model/medusa/utils.py:274-320:
    pick the candidate with the longest accepted prefix). ``flags[i]`` =
    node i's token passed the threshold test at its parent. BFS order
    guarantees parents precede children."""
    n = tree.n_nodes
    chains: dict[int, List[int] | None] = {}
    best: List[int] = []
    for i in range(n):
        if not bool(flags[i]):
            chains[i] = None
            continue
        p = int(tree.parent[i])
        if p == -1:
            chains[i] = [i]
        else:
            pc = chains.get(p)
            chains[i] = (pc + [i]) if pc is not None else None
        c = chains[i]
        if c is not None and len(c) > len(best):
            best = c
    return best
