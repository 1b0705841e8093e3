"""Graph constants: structural invariants of the COCO-17 skeleton adjacency."""

import numpy as np

from golfaction_tpu import graph


def test_adjacency_shape_and_dtype():
    A = graph.build_adjacency("spatial")
    assert A.shape == (3, graph.NUM_JOINTS, graph.NUM_JOINTS)
    assert A.dtype == np.float32


def test_partitions_cover_graph_exactly():
    A = graph.build_adjacency("spatial")
    ident, inward, outward = (A[0] != 0), (A[1] != 0), (A[2] != 0)
    # Identity partition is exactly the diagonal.
    assert (ident == np.eye(graph.NUM_JOINTS, dtype=bool)).all()
    # inward/outward are disjoint and their union is the symmetric edge set.
    assert not (inward & outward).any()
    sym = np.zeros((graph.NUM_JOINTS,) * 2, dtype=bool)
    for i, j in graph.COCO_EDGES:
        sym[i, j] = sym[j, i] = True
    assert ((inward | outward) == sym).all()


def test_column_normalization():
    # ST-GCN D^-1 convention: summing all partitions gives a column-stochastic matrix.
    A = graph.build_adjacency("spatial")
    total = A.sum(axis=0)
    np.testing.assert_allclose(total.sum(axis=0), 1.0, atol=1e-6)


def test_uniform_strategy():
    A = graph.build_adjacency("uniform")
    assert A.shape == (1, graph.NUM_JOINTS, graph.NUM_JOINTS)
    np.testing.assert_allclose(A[0].sum(axis=0), 1.0, atol=1e-6)


def test_bone_pairs_rooted_at_hips():
    pairs = graph.bone_pairs()
    assert pairs.shape == (graph.NUM_JOINTS, 2)
    parent = dict(pairs.tolist())
    # Hips are their own parent (centers).
    assert parent[11] == 11 and parent[12] == 12
    # Every chain terminates at a hip.
    for v in range(graph.NUM_JOINTS):
        seen = set()
        while parent[v] != v:
            assert v not in seen, "cycle in bone parents"
            seen.add(v)
            v = parent[v]
        assert v in graph.CENTER_JOINTS


def test_flip_pairs_are_left_right():
    for left, right in graph.FLIP_PAIRS:
        assert graph.COCO_KEYPOINTS[left].startswith("left")
        assert graph.COCO_KEYPOINTS[right].startswith("right")
        assert (
            graph.COCO_KEYPOINTS[left][4:] == graph.COCO_KEYPOINTS[right][5:]
        )
