"""Vocabulary persistence: native .npz + DBoW2 ORBvoc.txt import.

The reference loads a pretrained ORB vocabulary text file at startup
(src/System.cc:84, TemplatedVocabulary::loadFromTextFile,
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:241). We support that format so
existing users can bring their ORBvoc.txt, plus a fast native .npz format
for vocabularies trained with train_vocabulary.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .vocabulary import Vocabulary


def save_npz(path: str, voc: Vocabulary):
    np.savez_compressed(
        path,
        k=voc.k,
        depth=voc.depth,
        idf=np.asarray(voc.idf),
        **{f"level{i}": np.asarray(l) for i, l in enumerate(voc.levels)},
        **{f"valid{i}": np.asarray(v) for i, v in enumerate(voc.node_valid)},
    )


def load_npz(path: str) -> Vocabulary:
    z = np.load(path)
    k = int(z["k"])
    depth = int(z["depth"])
    return Vocabulary(
        k=k,
        depth=depth,
        levels=tuple(jnp.asarray(z[f"level{i}"]) for i in range(depth)),
        node_valid=tuple(jnp.asarray(z[f"valid{i}"]) for i in range(depth)),
        idf=jnp.asarray(z["idf"]),
    )


def load_orbvoc_txt(path: str) -> Vocabulary:
    """Import a DBoW2 text vocabulary (ORBvoc.txt format).

    Format: header ``k L scoring weighting``; then one node per line:
    ``parent_id is_leaf byte0 .. byte31 weight`` in BFS order. Nodes are
    re-indexed into our dense k-ary level arrays; absent children are
    invalid. Leaf weights become idf entries.
    """
    with open(path) as f:
        header = f.readline().split()
        k, L = int(header[0]), int(header[1])

        # parse all nodes
        parents = []
        descs = []
        weights = []
        is_leaf = []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parents.append(int(parts[0]))
            is_leaf.append(int(parts[1]) != 0)
            descs.append([int(b) for b in parts[2:34]])
            weights.append(float(parts[34]))

    n = len(parents)
    parents = np.asarray(parents)
    descs = np.asarray(descs, np.uint8)
    weights = np.asarray(weights, np.float32)

    # bytes -> 256 bitplanes
    bits = np.unpackbits(descs, axis=1, bitorder="little").astype(np.int8)

    # assign dense k-ary slots level by level (original ids are BFS:
    # node 0 = root, lines are in parent order)
    # our slot of node = slot(parent)*k + sibling_index
    slot = np.full(n + 1, -1, np.int64)     # +1: original ids are 1-based
    level_of = np.full(n + 1, -1, np.int64)
    child_count: dict = {}
    levels = [
        np.zeros((k ** (l + 1), 256), np.int8) for l in range(L)
    ]
    valids = [np.zeros(k ** (l + 1), bool) for l in range(L)]
    idf = np.zeros(k ** L, np.float32)

    for i in range(n):
        nid = i + 1                      # original ids start at 1 (0 = root)
        p = parents[i]
        if p == 0:
            pslot, plvl = 0, -1
        else:
            pslot, plvl = slot[p], level_of[p]
        j = child_count.get(p, 0)
        child_count[p] = j + 1
        if j >= k:
            continue
        lvl = plvl + 1
        if lvl >= L:
            continue
        s = pslot * k + j
        slot[nid] = s
        level_of[nid] = lvl
        levels[lvl][s] = bits[i]
        valids[lvl][s] = True
        if is_leaf[i] or lvl == L - 1:
            # propagate to a leaf slot at the bottom level via first-child
            # chain: a leaf above the bottom occupies slot s*k^(L-1-lvl)
            leaf = s * (k ** (L - 1 - lvl))
            idf[leaf] = weights[i]
            for ll in range(lvl + 1, L):
                s = s * k
                levels[ll][s] = bits[i]
                valids[ll][s] = True

    return Vocabulary(
        k=k,
        depth=L,
        levels=tuple(jnp.asarray(l) for l in levels),
        node_valid=tuple(jnp.asarray(v) for v in valids),
        idf=jnp.asarray(idf),
    )
