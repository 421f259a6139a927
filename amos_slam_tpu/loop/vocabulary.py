"""Binary bag-of-words vocabulary on TPU.

Replaces DBoW2's TemplatedVocabulary (reference
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h: k-branching, L-depth tree of
256-bit ORB descriptors, tf-idf BowVectors, L1 scoring, text-file IO).

TPU-native layout (SURVEY.md section 2b): the tree is *flattened to one
dense array per level* -- level l holds k^l node centroids as {0,1} int8
bitplanes -- so descriptor->word transform is L iterated "argmin popcount
against my k children", each a batched gather + tiny matmul. Training is
hierarchical binary k-means where the centroid update is a *bitwise
majority vote* (the correct 1-median for Hamming distance), all nodes of a
level trained simultaneously via segment sums.

Retrieval scoring (tf-idf + L1) happens against the keyframe database; see
kf_database.py. Matching does NOT use the tree: on TPU a full Hamming
matrix is cheaper than node-windowed candidate lists, so the vocabulary's
only job is retrieval -- exactly the role split that makes sense on this
hardware.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class Vocabulary(NamedTuple):
    """Flattened k^L tree. levels[l] has shape (k^(l+1), 256) int8 -- the
    centroids of all nodes at depth l+1 (children of depth-l nodes).
    node_valid[l]: (k^(l+1),) bool. idf: (k^L,) float32 leaf weights."""

    k: int
    depth: int
    levels: Tuple[jax.Array, ...]
    node_valid: Tuple[jax.Array, ...]
    idf: jax.Array

    @property
    def n_words(self) -> int:
        return self.k ** self.depth


def _hamming(a: jax.Array, b: jax.Array) -> jax.Array:
    """(..., 256) x (..., C, 256) -> (..., C) int32."""
    dot = jnp.einsum(
        "...i,...ci->...c", a.astype(jnp.int32), b.astype(jnp.int32)
    )
    na = jnp.sum(a.astype(jnp.int32), axis=-1)[..., None]
    nb = jnp.sum(b.astype(jnp.int32), axis=-1)
    return na + nb - 2 * dot


@functools.partial(jax.jit, static_argnames=("k", "n_node", "iters"))
def _em_level(centers, cvalid, assign, desc, k: int, n_node: int, iters: int):
    """One vocabulary level's k-means EM, jitted (an eager scan here meant
    a fresh trace+remote-compile per System construction)."""
    N = desc.shape[0]

    def em_step(carry, _):
        centers, cvalid = carry
        # candidates for each descriptor: its parent's k children
        cand = assign[:, None] * k + jnp.arange(k)[None, :]   # (N, k)
        cdesc = centers[cand]                                  # (N, k, 256)
        d = _hamming(desc, cdesc)
        d = jnp.where(cvalid[cand], d, 1 << 20)
        child = jnp.argmin(d, axis=-1)
        new_assign = assign * k + child
        # majority-vote centroid update
        ones = jax.ops.segment_sum(
            desc.astype(jnp.int32), new_assign, num_segments=n_node
        )
        cnt = jax.ops.segment_sum(
            jnp.ones(N, jnp.int32), new_assign, num_segments=n_node
        )
        maj = (2 * ones > cnt[:, None]).astype(jnp.int8)
        has = cnt > 0
        centers = jnp.where(has[:, None], maj, centers)
        return (centers, cvalid | has), new_assign

    (centers, cvalid), assigns = jax.lax.scan(
        em_step, (centers, cvalid), None, length=iters
    )
    return centers, cvalid, assigns[-1]


def train_vocabulary(
    descriptors: np.ndarray,   # (N, 256) {0,1} int8/bool training set
    k: int = 8,
    depth: int = 4,
    iters: int = 6,
    seed: int = 0,
) -> Vocabulary:
    """Hierarchical binary k-means (Hamming metric, majority-vote medians).

    All clusters of a level are refined together: assignment is a masked
    argmin over each descriptor's k sibling centroids; the update is a
    per-cluster bit-majority via segment sums. Empty branches are marked
    invalid and inherit their parent's centroid so transform never selects
    them (distance is +inf-masked).
    """
    rng = np.random.default_rng(seed)
    desc = jnp.asarray(descriptors.astype(np.int8))
    N = desc.shape[0]

    assign = jnp.zeros(N, jnp.int32)          # node id at current level
    levels = []
    valids = []

    for lvl in range(depth):
        n_parent = k ** lvl
        n_node = k ** (lvl + 1)
        # init: for each parent, pick k random members as child seeds
        assign_np = np.asarray(assign)
        centers = np.zeros((n_node, 256), np.int8)
        cvalid = np.zeros(n_node, bool)
        for p in range(n_parent):
            members = np.where(assign_np == p)[0]
            if len(members) == 0:
                continue
            picks = rng.choice(members, size=min(k, len(members)), replace=False)
            for j, m in enumerate(picks):
                centers[p * k + j] = descriptors[m]
                cvalid[p * k + j] = True
        centers = jnp.asarray(centers)
        cvalid_j = jnp.asarray(cvalid)

        centers, cvalid_new, assign = _em_level(
            centers, cvalid_j, assign, desc, k, n_node, iters
        )
        levels.append(np.asarray(centers))
        valids.append(np.asarray(cvalid_new))

    # idf weights: log(N / n_i) like DBoW2's TF_IDF (TemplatedVocabulary.h)
    n_words = k ** depth
    counts = np.bincount(np.asarray(assign), minlength=n_words).astype(np.float64)
    idf = np.log(max(N, 1) / np.maximum(counts, 1.0)).astype(np.float32)
    idf[counts == 0] = 0.0

    return Vocabulary(
        k=k,
        depth=depth,
        levels=tuple(jnp.asarray(l) for l in levels),
        node_valid=tuple(jnp.asarray(v) for v in valids),
        idf=jnp.asarray(idf),
    )


@functools.partial(jax.jit, static_argnames=("k", "depth"))
def _transform_impl(levels, node_valid, desc, k: int, depth: int):
    N = desc.shape[0]
    node = jnp.zeros(N, jnp.int32)
    for lvl in range(depth):
        cand = node[:, None] * k + jnp.arange(k)[None, :]
        cdesc = levels[lvl][cand]
        d = _hamming(desc, cdesc)
        d = jnp.where(node_valid[lvl][cand], d, 1 << 20)
        node = node * k + jnp.argmin(d, axis=-1).astype(jnp.int32)
    return node


def transform(voc: Vocabulary, desc: jax.Array, valid: jax.Array):
    """Descriptors (N, 256) -> (word_ids (N,), tf-idf weights (N,)).

    Invalid rows get word -1 / weight 0. Equivalent contract to
    TemplatedVocabulary::transform (TemplatedVocabulary.h:975-1050).
    """
    words = _transform_impl(voc.levels, voc.node_valid, desc, voc.k, voc.depth)
    w = voc.idf[words]
    words = jnp.where(valid, words, -1)
    return words, jnp.where(valid, w, 0.0)


def bow_vector(words: np.ndarray, weights: np.ndarray, n_words: int):
    """Aggregate per-descriptor words into an L1-normalized sparse BowVector
    (host side): returns (unique_words, normalized_weights)."""
    sel = words >= 0
    w = np.bincount(words[sel], weights=weights[sel], minlength=n_words)
    nz = np.nonzero(w)[0]
    vals = w[nz]
    s = vals.sum()
    if s > 0:
        vals = vals / s
    return nz.astype(np.int64), vals.astype(np.float32)


def l1_score(w1, v1, w2, v2) -> float:
    """DBoW2 L1 similarity: 1 - 0.5*|v1 - v2|_1 over the union support
    (ScoringObject.cpp) = sum of min over common words; vectorized
    (a python merge loop here showed up in keyframe-path profiles)."""
    common, i1, i2 = np.intersect1d(w1, w2, assume_unique=True,
                                    return_indices=True)
    if len(common) == 0:
        return 0.0
    return float(np.minimum(v1[i1], v2[i2]).sum())
