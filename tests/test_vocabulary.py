import numpy as np
import jax.numpy as jnp

from amos_slam_tpu.loop.vocabulary import (
    train_vocabulary, transform, bow_vector, l1_score,
)
from amos_slam_tpu.loop.kf_database import KeyFrameDatabase


def make_descriptor_clusters(rng, n_clusters=20, per=50, flip=12):
    """Clustered binary descriptors: prototypes + bit flips."""
    protos = (rng.uniform(size=(n_clusters, 256)) < 0.5).astype(np.int8)
    descs, labels = [], []
    for c in range(n_clusters):
        for _ in range(per):
            d = protos[c].copy()
            idx = rng.choice(256, flip, replace=False)
            d[idx] ^= 1
            descs.append(d)
            labels.append(c)
    return np.asarray(descs, np.int8), np.asarray(labels), protos


def test_vocab_train_transform_consistency(rng):
    descs, labels, protos = make_descriptor_clusters(rng)
    voc = train_vocabulary(descs, k=4, depth=3, iters=5, seed=1)
    words, w = transform(voc, jnp.asarray(descs), jnp.ones(len(descs), bool))
    words = np.asarray(words)
    # same-cluster descriptors should mostly map to the same word
    purity = []
    for c in np.unique(labels):
        ws = words[labels == c]
        purity.append((ws == np.bincount(ws).argmax()).mean())
    assert np.mean(purity) > 0.6, np.mean(purity)
    # perturbed copies of a descriptor map to its word
    d0 = descs[0].copy()
    idx = rng.choice(256, 4, replace=False)
    d0[idx] ^= 1
    w2, _ = transform(voc, jnp.asarray(d0[None]), jnp.ones(1, bool))
    assert int(w2[0]) == words[0]


def test_bow_scoring_discriminates(rng):
    descs, labels, _ = make_descriptor_clusters(rng, n_clusters=30, per=40)
    voc = train_vocabulary(descs, k=4, depth=3, iters=5, seed=2)
    n_words = voc.n_words

    def frame(ids):
        d = jnp.asarray(descs[ids])
        w, wt = transform(voc, d, jnp.ones(len(ids), bool))
        return np.asarray(w), np.asarray(wt)

    rng2 = np.random.default_rng(1)
    a_ids = rng2.choice(np.where(labels < 10)[0], 200, replace=False)
    a2_ids = rng2.choice(np.where(labels < 10)[0], 200, replace=False)
    b_ids = rng2.choice(np.where(labels >= 20)[0], 200, replace=False)

    wa, va = bow_vector(*frame(a_ids), n_words)
    wa2, va2 = bow_vector(*frame(a2_ids), n_words)
    wb, vb = bow_vector(*frame(b_ids), n_words)
    s_same = l1_score(wa, va, wa2, va2)
    s_diff = l1_score(wa, va, wb, vb)
    assert s_same > 3 * s_diff, (s_same, s_diff)


def test_kf_database_retrieval(rng):
    descs, labels, _ = make_descriptor_clusters(rng, n_clusters=40, per=30)
    voc = train_vocabulary(descs, k=4, depth=3, iters=5, seed=3)
    db = KeyFrameDatabase(voc.n_words)

    rng2 = np.random.default_rng(2)
    # 10 "keyframes", each from a distinct label band
    kf_ids_sets = []
    for kf in range(10):
        band = np.where((labels >= kf * 4) & (labels < (kf + 1) * 4))[0]
        ids = rng2.choice(band, 100, replace=False)
        kf_ids_sets.append(ids)
        w, wt = transform(voc, jnp.asarray(descs[ids]), jnp.ones(100, bool))
        db.add(kf, np.asarray(w), np.asarray(wt))

    # query with a fresh sample from keyframe 3's band
    band = np.where((labels >= 12) & (labels < 16))[0]
    ids = rng2.choice(band, 100, replace=False)
    w, wt = transform(voc, jnp.asarray(descs[ids]), jnp.ones(100, bool))
    cands = db.query(np.asarray(w), np.asarray(wt))
    assert len(cands) >= 1
    assert cands[0] == 3, cands
    # exclusion works
    cands2 = db.query(np.asarray(w), np.asarray(wt), exclude=[3])
    assert 3 not in cands2
